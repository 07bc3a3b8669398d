"""End-to-end engine slice on a tiny random model: audio in -> text out."""

import numpy as np
import pytest

from spittle_tpu.engine import MockEngine, TranscribeParams
from spittle_tpu.engine.whisper_engine import WhisperEngine
from spittle_tpu.models.whisper.config import CONFIGS, WhisperConfig


@pytest.fixture(scope="module")
def engine():
    # Patch in a small config so CPU tests stay fast.
    CONFIGS["unit-test"] = WhisperConfig(
        name="unit-test", n_mels=80, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_vocab=51865, n_text_ctx=48,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    eng = WhisperEngine()
    eng.load_model("random:unit-test")
    return eng


def make_audio(seconds, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 330 * t)
            + 0.05 * rng.standard_normal(len(t))).astype(np.float32)


def test_transcribe_runs_end_to_end(engine):
    res = engine.transcribe_samples(make_audio(2.0), TranscribeParams(language="en"))
    assert isinstance(res.text, str)
    assert res.language == "en"
    # Random weights may emit anything; we only require structural sanity.
    for seg in res.segments:
        assert seg.end >= seg.start >= 0


def test_batch_matches_single(engine):
    a = make_audio(1.5, 1)
    b = make_audio(2.5, 2)
    batch = engine.transcribe_batch([a, b], TranscribeParams(language="en"))
    single = engine.transcribe_samples(a, TranscribeParams(language="en"))
    assert batch[0].text == single.text


def test_language_autodetect_runs(engine):
    res = engine.transcribe_samples(make_audio(1.0), TranscribeParams())
    assert res.language in engine.tokenizer.languages


def test_long_audio_multiwindow(engine):
    # 35 s forces at least two windows through the seek loop.
    res = engine.transcribe_samples(
        make_audio(35.0), TranscribeParams(language="en")
    )
    assert isinstance(res.text, str)


def test_unload(engine):
    eng = WhisperEngine()
    eng.load_model("random:unit-test")
    assert eng.is_loaded
    eng.unload_model()
    assert not eng.is_loaded


def test_mock_engine():
    m = MockEngine()
    m.load_model("whatever")
    out = m.transcribe_samples(np.zeros(16000, np.float32))
    assert out.text == ""
    assert m.calls == [16000]


def test_temperature_fallback_machinery(engine):
    # Degenerate text triggers the ladder; ensure it terminates and the
    # compression-ratio gate works as specified.
    assert engine._compression_ratio("") == 0.0
    assert engine._compression_ratio("hello world, this is fine") < 2.4
    assert engine._compression_ratio("aaaaaaa " * 50) > 2.4
    res = engine.transcribe_samples(make_audio(1.0), TranscribeParams(language="en"))
    assert isinstance(res.text, str)


def test_beam_path_through_engine(engine):
    res = engine.transcribe_samples(
        make_audio(1.0, 3), TranscribeParams(language="en", beam_size=2)
    )
    assert isinstance(res.text, str)


def test_word_timestamps_through_engine(engine):
    res = engine.transcribe_samples(
        make_audio(2.0, 7),
        TranscribeParams(language="en", word_timestamps=True),
    )
    assert isinstance(res.words, list)
    for w in res.words:
        assert w.end >= w.start >= 0


def test_speculative_draft_matches_plain(engine):
    """With a draft model loaded, transcripts are identical to plain
    greedy decoding (speculative decoding is exact)."""
    CONFIGS["unit-test-draft"] = WhisperConfig(
        name="unit-test-draft", n_mels=80, n_audio_ctx=1500,
        n_audio_state=64, n_audio_head=4, n_audio_layer=1, n_vocab=51865,
        n_text_ctx=48, n_text_state=64, n_text_head=4, n_text_layer=1,
    )
    audio = make_audio(3.0, seed=5)
    plain = engine.transcribe_samples(audio, TranscribeParams(language="en"))
    engine.load_draft_model("random:unit-test-draft")
    try:
        spec = engine.transcribe_samples(
            audio, TranscribeParams(language="en")
        )
    finally:
        engine.draft_params = None
        engine.draft_cfg = None
    assert spec.text == plain.text
    assert [(s.start, s.end, s.text) for s in spec.segments] == [
        (s.start, s.end, s.text) for s in plain.segments
    ]


def test_draft_layout_mismatch_rejected(engine):
    CONFIGS["unit-test-badvocab"] = WhisperConfig(
        name="unit-test-badvocab", n_mels=80, n_audio_ctx=1500,
        n_audio_state=64, n_audio_head=4, n_audio_layer=1, n_vocab=51864,
        n_text_ctx=48, n_text_state=64, n_text_head=4, n_text_layer=1,
    )
    with pytest.raises(ValueError, match="incompatible"):
        engine.load_draft_model("random:unit-test-badvocab")
    assert engine.draft_params is None


def test_parallel_windows_long_audio(engine):
    """Fixed-stride parallel-window decode covers the whole audio and
    yields the same per-window transcription as sequential no-condition
    decoding."""
    audio = make_audio(75.0, seed=9)  # 3 windows (window=30s for unit cfg)
    seq = engine.transcribe_samples(
        audio,
        TranscribeParams(language="en", condition_on_previous_text=False),
    )
    par = engine.transcribe_samples(
        audio,
        TranscribeParams(language="en", condition_on_previous_text=False,
                         parallel_windows=True),
    )
    # Sequential seek may advance by decoded timestamps; fixed-stride
    # covers >= the same span. (Random weights may emit timestamp-only
    # windows, so assert coverage, not specific text.)
    assert par.segments, "parallel path produced no segments"
    assert par.segments[-1].end >= 60.0  # all three windows decoded
    assert par.language == seq.language == "en"


def test_parallel_windows_requires_no_conditioning(engine):
    with pytest.raises(ValueError, match="condition_on_previous_text"):
        engine.transcribe_samples(
            make_audio(2.0),
            TranscribeParams(parallel_windows=True),
        )


def test_select_core_segments_partition():
    from spittle_tpu.engine.base import Segment
    from spittle_tpu.engine.whisper_engine import select_core_segments

    window, overlap = 30.0, 4.0
    stride = window - overlap
    # Segments scattered across 70 s; every segment must be kept by
    # exactly one window's core region.
    segs = [Segment(s, s + 1.0, f"s{i}")
            for i, s in enumerate(np.arange(0.0, 69.0, 0.7))]
    seeks = [0.0, stride, 2 * stride]
    kept = []
    for wi, seek in enumerate(seeks):
        in_window = [s for s in segs
                     if s.start >= seek - 1 and s.end <= seek + window + 1]
        kept.extend(
            select_core_segments(
                in_window, seek, window, overlap,
                is_first=(wi == 0), is_last=(wi == len(seeks) - 1),
            )
        )
    names = [s.text for s in kept]
    assert len(names) == len(set(names)), "duplicated segment across windows"
    # Every segment fully inside the covered span is kept by some window.
    covered = [s for s in segs if s.end <= seeks[-1] + window]
    assert set(names) >= {s.text for s in covered}


def test_parallel_windows_with_overlap(engine):
    audio = make_audio(70.0, seed=11)
    par = engine.transcribe_samples(
        audio,
        TranscribeParams(language="en", condition_on_previous_text=False,
                         parallel_windows=True, parallel_overlap_s=4.0),
    )
    assert par.segments
    # Core regions must not duplicate: segment midpoints strictly increase.
    mids = [(s.start + s.end) / 2 for s in par.segments]
    assert mids == sorted(mids)
