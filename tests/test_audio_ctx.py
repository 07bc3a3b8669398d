"""Reduced encoder context (whisper.cpp params.audio_ctx analog).

TranscribeParams.audio_ctx encodes only the first audio_ctx positions
(2*audio_ctx mel frames) per window: short utterances skip padded-frame
encoder compute and shrink per-step cross-KV decode reads. Reference:
whisper.cpp whisper_full_params.audio_ctx (the speed/accuracy knob the
reference app leaves at default; transcribe-rs does not expose it).
"""

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
def audio():
    rng = np.random.default_rng(11)
    return [(rng.standard_normal(16000 * d) * 0.1).astype(np.float32)
            for d in (3, 5)]


def texts(rs):
    return [r.text for r in rs]


def test_full_audio_ctx_equals_default(engine, audio):
    """audio_ctx == n_audio_ctx is the identity setting: same window
    geometry, same programs, bit-identical transcripts."""
    base = TranscribeParams(
        language="en", condition_on_previous_text=False,
        parallel_windows=True, max_tokens=12, temperatures=(0.0,),
    )
    full = TranscribeParams(
        language="en", condition_on_previous_text=False,
        parallel_windows=True, max_tokens=12, temperatures=(0.0,),
        audio_ctx=engine.cfg.n_audio_ctx,
    )
    a = engine.transcribe_batch(audio, base)
    b = engine.transcribe_batch(audio, full)
    assert texts(a) == texts(b)
    assert [s for r in a for s in r.segments] == [
        s for r in b for s in r.segments
    ]


def test_reduced_audio_ctx_runs_both_paths(engine, audio):
    """Reduced ctx must produce a well-formed transcript on the parallel
    AND sequential paths, with segments inside the shortened window."""
    ctx = engine.cfg.n_audio_ctx // 2
    par = TranscribeParams(
        language="en", condition_on_previous_text=False,
        parallel_windows=True, max_tokens=12, temperatures=(0.0,),
        audio_ctx=ctx,
    )
    seq = TranscribeParams(
        language="en", max_tokens=12, temperatures=(0.0,), audio_ctx=ctx,
    )
    for params in (par, seq):
        for r in engine.transcribe_batch(audio, params):
            assert isinstance(r.text, str)
            for s in r.segments:
                assert s.start >= 0.0


def test_reduced_ctx_covers_all_content(engine):
    """A reduced window shorter than the audio still transcribes ALL of
    it: the seek/plan loop walks in reduced-window strides."""
    rng = np.random.default_rng(3)
    dur = 6  # seconds; window at ctx covers ~3 s -> needs 2+ windows
    ctx = 150  # 3 s windows for the tiny test cfg? scaled below
    ctx = min(ctx, engine.cfg.n_audio_ctx // 2)
    audio = [(rng.standard_normal(16000 * dur) * 0.1).astype(np.float32)]
    p = TranscribeParams(
        language="en", condition_on_previous_text=False,
        parallel_windows=True, max_tokens=8, temperatures=(0.0,),
        audio_ctx=ctx,
    )
    plan, windows, content, overlap = engine._plan_parallel_windows(
        [np.asarray(a, np.float32) for a in audio], p
    )
    wf = 2 * ctx
    # plan covers the full content in wf strides
    seeks = [s for _, s in plan]
    assert seeks[0] == 0
    assert seeks[-1] + wf >= content[0]
    assert windows.shape[1] == wf * 160


def test_audio_ctx_shrinks_encoder_output(engine):
    """The fused frontend really encodes fewer positions."""
    ctx = engine.cfg.n_audio_ctx // 2
    w = np.zeros((1, ctx * 2 * 160), np.float32)
    xa = engine._frontend(w)
    assert xa.shape[1] == ctx


def test_audio_ctx_with_beam_search(engine, audio):
    """Beam decode threads the true cross-KV length too."""
    p = TranscribeParams(
        language="en", condition_on_previous_text=False,
        parallel_windows=True, max_tokens=10, temperatures=(0.0,),
        beam_size=3, audio_ctx=engine.cfg.n_audio_ctx // 2,
    )
    for r in engine.transcribe_batch(audio, p):
        assert isinstance(r.text, str)


def test_last_window_segments_survive_overlap_stitch(engine):
    """Regression (round-2 review): with the plan stopping at
    content - overlap, the final window can have seek + stride < content
    and a stride-based is_last test dropped the last overlap/2 seconds
    of segments. is_last must come from the actual plan."""
    import dataclasses

    from spittle_tpu.engine.base import Segment

    audios = [np.zeros(16000 * 30, np.float32)]
    p = TranscribeParams(
        language="en", condition_on_previous_text=False,
        parallel_windows=True, parallel_overlap_s=5.0,
        max_tokens=8, temperatures=(0.0,),
    )
    plan, windows, content, overlap = engine._plan_parallel_windows(
        audios, p
    )
    assert [s for _, s in plan] == [0]  # single window covers 30 s
    # A segment in the final 2.5 s (inside overlap/2 of the window end)
    # must survive stitching when this window is the item's last.
    from spittle_tpu.engine.whisper_engine import select_core_segments

    seg = Segment(29.0, 29.9, "tail")
    kept = select_core_segments(
        [seg], 0.0, 30.0, 5.0, is_first=True, is_last=True
    )
    assert kept == [seg]


def test_sequential_advance_clamped_to_reduced_window(engine):
    """Regression: with audio_ctx the timestamp vocabulary still spans
    0-30 s; an unclamped seek advance could skip audio no window ever
    encoded. _parse_window advances are clamped to the window."""
    rng = np.random.default_rng(9)
    audio = [(rng.standard_normal(16000 * 12) * 0.1).astype(np.float32)]
    ctx = engine.cfg.n_audio_ctx // 10  # 3 s windows for tiny (ctx 150)
    p = TranscribeParams(
        language="en", max_tokens=8, temperatures=(0.0,), audio_ctx=ctx,
    )
    results = engine.transcribe_batch(audio, p)
    assert isinstance(results[0].text, str)
    # every segment lies within the audio duration
    for s in results[0].segments:
        assert 0.0 <= s.start <= 12.5
