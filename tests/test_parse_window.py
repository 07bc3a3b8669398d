"""Window-parse semantics: whisper.cpp result_len / OpenAI transcribe-loop.

Tokens after the last consecutive-timestamp pair are dropped (the next
window re-decodes them from the pair's end timestamp); a window ending in
a single trailing timestamp keeps everything and advances the full window.
Mirrors `whisper.cpp` result_len handling driven through
`/root/reference/src-tauri/src/managers/transcription.rs:445-504`.
"""

import numpy as np
import pytest

from spittle_tpu.engine.whisper_engine import WhisperEngine
from spittle_tpu.models.whisper.config import CONFIGS, WhisperConfig


@pytest.fixture(scope="module")
def engine():
    CONFIGS["unit-test-pw"] = WhisperConfig(
        name="unit-test-pw", n_mels=80, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_vocab=51865, n_text_ctx=48,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    eng = WhisperEngine()
    eng.load_model("random:unit-test-pw")
    return eng


def ts(engine, sec):
    return engine.cfg.timestamp_begin + int(round(sec / 0.02))


def text_tokens(engine, s):
    return engine.tokenizer.encode(s)


def test_tail_after_last_pair_is_dropped(engine):
    """<|0.00|> hello <|1.00|><|1.00|> wor... (no closing ts) — the
    unterminated tail is dropped and seek advances to 1.00 s."""
    hello = text_tokens(engine, " hello")
    tail = text_tokens(engine, " wor")
    gen = [ts(engine, 0.0), *hello, ts(engine, 1.0), ts(engine, 1.0), *tail]
    segs, kept, advance = engine._parse_window(gen, 0.0, window_sec=30.0)
    assert len(segs) == 1
    assert segs[0].start == 0.0 and segs[0].end == 1.0
    assert "hello" in segs[0].text
    assert kept == gen[: 2 + len(hello)]  # up to and incl. first ts of pair
    assert advance == 100  # 1.00 s * 100 frames/s


def test_single_timestamp_ending_keeps_all(engine):
    """<|0.00|> a <|1.00|><|1.00|> b <|2.00|> — single trailing ts:
    everything kept, full-window advance."""
    a = text_tokens(engine, " a")
    b = text_tokens(engine, " b")
    gen = [ts(engine, 0.0), *a, ts(engine, 1.0), ts(engine, 1.0), *b,
           ts(engine, 2.0)]
    segs, kept, advance = engine._parse_window(gen, 0.0, window_sec=30.0)
    assert len(segs) == 2
    assert segs[1].end == 2.0
    assert kept == gen
    assert advance == 0  # full window


def test_no_pair_single_segment(engine):
    """No consecutive pair: one segment over the whole window, all tokens
    kept, full-window advance; end = last timestamp when present."""
    words = text_tokens(engine, " hello world")
    gen = [ts(engine, 0.0), *words]
    segs, kept, advance = engine._parse_window(gen, 0.0, window_sec=30.0)
    assert len(segs) == 1
    assert segs[0].start == 0.0
    assert kept == gen
    assert advance == 0


def test_keep_tail_retains_open_segment(engine):
    """Parallel fixed-stride windows keep the unterminated tail (nothing
    re-decodes it); its segment ends at the window edge."""
    hello = text_tokens(engine, " hello")
    tail = text_tokens(engine, " wor")
    gen = [ts(engine, 0.0), *hello, ts(engine, 1.0), ts(engine, 1.0), *tail]
    segs, kept, advance = engine._parse_window(
        gen, 0.0, window_sec=30.0, keep_tail=True
    )
    assert len(segs) == 2
    assert segs[1].start == 1.0 and segs[1].end == 30.0
    assert kept == gen
    assert advance == 0


def test_offset_applied(engine):
    hello = text_tokens(engine, " hi")
    gen = [ts(engine, 0.0), *hello, ts(engine, 1.0), ts(engine, 1.0)]
    segs, kept, advance = engine._parse_window(gen, 60.0, window_sec=30.0)
    assert segs[0].start == 60.0 and segs[0].end == 61.0
    assert advance == 100


def test_two_segments_single_ending(engine):
    """<|0.00|> x <|1.00|><|1.00|> y <|2.00|> — a pair boundary plus a
    single trailing close: two segments, all tokens kept, full advance."""
    x = text_tokens(engine, " x")
    y = text_tokens(engine, " y")
    gen = [ts(engine, 0.0), *x, ts(engine, 1.0), ts(engine, 1.0), *y,
           ts(engine, 2.0)]
    segs, kept, advance = engine._parse_window(gen, 0.0, window_sec=30.0)
    assert [(s.start, s.end) for s in segs] == [(0.0, 1.0), (1.0, 2.0)]
    assert kept == gen
    assert advance == 0


def test_no_speech_window_skip(engine):
    """A window with no_speech_prob above threshold and weak avg_logprob
    is treated as silence: no segments, seek advances the full window
    (OpenAI no_speech_threshold rule)."""
    import spittle_tpu.engine.whisper_engine as we
    from spittle_tpu.engine import TranscribeParams

    orig = WhisperEngine._decode_with_fallback

    def fake(self, xa, opts, params, lt, prompt_tokens, draft_xa=None):
        out = orig(self, xa, opts, params, lt, prompt_tokens,
                   draft_xa=draft_xa)
        out["no_speech_prob"] = np.ones_like(
            np.asarray(out["no_speech_prob"])
        )
        out["avg_logprob"] = np.full_like(
            np.asarray(out["avg_logprob"]), -5.0
        )
        return out

    audio = np.zeros(16000, np.float32)
    try:
        WhisperEngine._decode_with_fallback = fake
        res = engine.transcribe_samples(audio, TranscribeParams(language="en"))
    finally:
        WhisperEngine._decode_with_fallback = orig
    assert res.text == ""
    assert res.segments == []
