"""int16 wire-format ingest + pipelined transcribe_stream.

Audio ships host->device as int16 (the mic's native format; half the
bytes of f32 on the serving hot path) and normalizes on device inside
the fused mel+encoder program. transcribe_stream overlaps batch k+1's
window assembly + transfer with batch k's compute (prefetch-to-device).
Both must be transcript-identical to the float32 / synchronous paths.
"""

import time

import numpy as np
import pytest

from spittle_tpu.engine.base import TranscribeParams
from spittle_tpu.engine.whisper_engine import WhisperEngine


@pytest.fixture(scope="module")
def engine():
    e = WhisperEngine()
    e.load_model("random:tiny")
    return e


@pytest.fixture(scope="module")
def audio_pairs():
    rng = np.random.default_rng(7)
    f32 = [
        (rng.standard_normal(16000 * d) * 0.1).astype(np.float32)
        for d in (3, 5, 8)
    ]
    # Quantize THEN take that as the f32 ground truth so both dtypes
    # carry bit-identical signal (the parity being tested is the ingest
    # path, not int16 quantization error).
    i16 = [(np.clip(a, -1, 1) * 32768).astype(np.int16) for a in f32]
    f32q = [a.astype(np.float32) / 32768.0 for a in i16]
    return f32q, i16


PAR = TranscribeParams(
    language="en", condition_on_previous_text=False,
    parallel_windows=True, max_tokens=12, temperatures=(0.0,),
)
SEQ = TranscribeParams(language="en", max_tokens=12, temperatures=(0.0,))


def texts(results):
    return [r.text for r in results]


def test_i16_matches_f32_parallel_windows(engine, audio_pairs):
    f32q, i16 = audio_pairs
    assert texts(engine.transcribe_batch(i16, PAR)) == texts(
        engine.transcribe_batch(f32q, PAR)
    )


def test_i16_matches_f32_sequential(engine, audio_pairs):
    f32q, i16 = audio_pairs
    assert texts(engine.transcribe_batch(i16, SEQ)) == texts(
        engine.transcribe_batch(f32q, SEQ)
    )


def test_mixed_dtype_batch(engine, audio_pairs):
    f32q, i16 = audio_pairs
    mixed = [f32q[0], i16[1], f32q[2]]
    assert texts(engine.transcribe_batch(mixed, SEQ)) == texts(
        engine.transcribe_batch(f32q, SEQ)
    )


def test_stream_matches_batch(engine, audio_pairs):
    f32q, i16 = audio_pairs
    batches = [i16, i16[:2], list(reversed(i16))]
    streamed = [texts(r) for r in engine.transcribe_stream(batches, PAR)]
    direct = [texts(engine.transcribe_batch(b, PAR)) for b in batches]
    assert streamed == direct


def test_stream_overlap_fetch_matches_batch(engine, audio_pairs):
    """overlap_fetch=True dispatches batch k+1 before fetching batch k;
    results must still arrive in order and transcript-identical, with
    the held last dispatch flushed after the queue drains."""
    f32q, i16 = audio_pairs
    for batches in ([i16, i16[:2], list(reversed(i16))], [i16]):
        streamed = [
            texts(r)
            for r in engine.transcribe_stream(batches, PAR,
                                              overlap_fetch=True)
        ]
        direct = [texts(engine.transcribe_batch(b, PAR)) for b in batches]
        assert streamed == direct


def test_stream_overlap_fetch_detected_language(engine, audio_pairs):
    """Language detection must survive the dispatch/finalize split: with
    params.language=None the detect runs on device in the dispatch half
    and the code strings resolve at finalize (multilingual tiny)."""
    _, i16 = audio_pairs
    par = TranscribeParams(
        language=None, condition_on_previous_text=False,
        parallel_windows=True, max_tokens=8, temperatures=(0.0,),
    )
    outs = list(engine.transcribe_stream([i16[:2]], par, overlap_fetch=True))
    direct = engine.transcribe_batch(i16[:2], par)
    assert [r.language for r in outs[0]] == [r.language for r in direct]
    assert all(isinstance(r.language, str) for r in outs[0])


def test_stream_rejects_conditioned_decode(engine):
    bad = TranscribeParams(condition_on_previous_text=True)
    with pytest.raises(ValueError):
        list(engine.transcribe_stream([[np.zeros(16000, np.float32)]], bad))


def test_stream_propagates_producer_error(engine):
    def batches():
        yield [np.zeros(16000, np.float32)]
        raise RuntimeError("source died")

    it = engine.transcribe_stream(batches(), PAR)
    next(it)
    with pytest.raises(RuntimeError, match="source died"):
        next(it)


def test_normalize_pcm_contract():
    from spittle_tpu.engine.base import normalize_pcm

    i16 = np.array([-32768, 0, 16384, 32767], np.int16)
    f = normalize_pcm(i16)
    assert f.dtype == np.float32
    np.testing.assert_allclose(
        f, [-1.0, 0.0, 0.5, 32767 / 32768.0], atol=1e-7
    )
    passthrough = np.array([0.25, -0.5], np.float32)
    assert normalize_pcm(passthrough) is passthrough


def test_parakeet_i16_matches_f32():
    from spittle_tpu.engine.parakeet_engine import ParakeetEngine

    eng = ParakeetEngine()
    eng.load_model("random:parakeet-test")
    rng = np.random.default_rng(3)
    f32 = [(rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)]
    i16 = [(np.clip(a, -1, 1) * 32768).astype(np.int16) for a in f32]
    f32q = [a.astype(np.float32) / 32768.0 for a in i16]
    assert [r.text for r in eng.transcribe_batch(i16)] == [
        r.text for r in eng.transcribe_batch(f32q)
    ]


def test_stream_abandoned_generator_stops_producer(engine):
    """Breaking out of a transcribe_stream loop must terminate the
    prefetch thread (a blocked q.put would pin its staged device buffer
    for the process lifetime)."""
    import threading

    produced = []

    def batches():
        for i in range(50):
            produced.append(i)
            yield [np.zeros(16000, np.float32)]

    before = threading.active_count()
    it = engine.transcribe_stream(batches(), PAR)
    next(it)
    it.close()  # consumer abandons
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    assert len(produced) < 50  # producer stopped early


def test_stream_default_params_work(engine):
    """params=None must be usable (parallel windows, no conditioning)."""
    out = list(engine.transcribe_stream([[np.zeros(16000, np.float32)]]))
    assert len(out) == 1 and len(out[0]) == 1
