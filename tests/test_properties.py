"""Property-based tests (hypothesis) for invariant-heavy components:
diff roundtrips, rolling rewrites, Levenshtein metric laws, CTC collapse,
and resampler length accounting."""

import numpy as np
from hypothesis import given, settings, strategies as st

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
    max_size=60,
)
SMALL_TEXT = st.text(
    alphabet=st.sampled_from("abcdefg äöü 日本"), max_size=24
)


@settings(max_examples=80, deadline=None)
@given(TEXT, TEXT)
def test_text_diff_roundtrip(a, b):
    from spittle_tpu.text.diff import apply_text_diff, compute_text_diff

    d = compute_text_diff(a, b)
    if d is None:
        assert a == b
    else:
        assert apply_text_diff(a, d) == b


@settings(max_examples=80, deadline=None)
@given(TEXT, TEXT)
def test_rolling_rewrite_roundtrip(prev, new):
    from spittle_tpu.app.rolling_session import compute_rolling_rewrite

    delete, insert = compute_rolling_rewrite(prev, new)
    assert 0 <= delete <= len(prev)
    assert prev[: len(prev) - delete] + insert == new


@settings(max_examples=60, deadline=None)
@given(SMALL_TEXT, SMALL_TEXT, SMALL_TEXT)
def test_levenshtein_metric_laws(a, b, c):
    from spittle_tpu.text.filters import levenshtein

    ab = levenshtein(a, b)
    assert ab == levenshtein(b, a)  # symmetry
    assert (ab == 0) == (a == b)  # identity of indiscernibles
    assert ab <= levenshtein(a, c) + levenshtein(c, b)  # triangle
    assert ab <= max(len(a), len(b))  # upper bound


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=9), max_size=12),
    st.data(),
)
def test_ctc_collapse_inverts_expansion(seq, data):
    """Expanding a sequence with repeats and blanks then greedy-collapsing
    recovers it (no adjacent duplicates in the source by construction)."""
    import jax.numpy as jnp

    from spittle_tpu.models.parakeet.decode import ctc_greedy_decode

    blank = 10
    dedup = [t for i, t in enumerate(seq) if i == 0 or t != seq[i - 1]]
    frames = []
    for t in dedup:
        frames.extend([t] * data.draw(st.integers(1, 3)))
        frames.extend([blank] * data.draw(st.integers(1, 2)))
    if not frames:
        frames = [blank]
    logits = np.full((1, len(frames), blank + 1), -5.0, np.float32)
    for i, t in enumerate(frames):
        logits[0, i, t] = 5.0
    fake = {"ctc_w": jnp.eye(blank + 1, dtype=jnp.float32),
            "ctc_b": jnp.zeros(blank + 1, jnp.float32)}
    out = ctc_greedy_decode(fake, jnp.asarray(logits),
                            np.asarray([len(frames)]), blank=blank)
    assert out == [dedup]


@settings(max_examples=20, deadline=None)
@given(
    st.sampled_from([8000, 22050, 44100, 48000]),
    st.integers(min_value=100, max_value=4000),
)
def test_resampled_length_matches_output(in_hz, n):
    from spittle_tpu.audio.resample import resample, resampled_length

    x = np.zeros(n, np.float32)
    out = np.asarray(resample(x, in_hz, 16000))
    assert len(out) == resampled_length(n, in_hz, 16000)


@settings(max_examples=40, deadline=None)
@given(TEXT)
def test_normalize_hypothesis_idempotent(text):
    from spittle_tpu.text.rolling import normalize_hypothesis

    once = normalize_hypothesis(text)
    assert normalize_hypothesis(once) == once


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=40))
def test_mask_protected_spans_roundtrip(text):
    from spittle_tpu.text.cleanup import (
        mask_protected_spans,
        restore_protected_spans,
    )

    masked, spans = mask_protected_spans(text)
    assert restore_protected_spans(masked, spans) == text


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=30))
def test_tokenizer_byte_bpe_roundtrip(text):
    from spittle_tpu.models.whisper.config import WhisperConfig
    from spittle_tpu.models.whisper.tokenizer import (
        WhisperTokenizer,
        make_test_vocab,
    )

    cfg = WhisperConfig(
        name="prop", n_mels=80, n_audio_ctx=60, n_audio_state=64,
        n_audio_head=4, n_audio_layer=1, n_vocab=51865, n_text_ctx=16,
        n_text_state=64, n_text_head=4, n_text_layer=1,
    )
    tok = WhisperTokenizer(cfg, make_test_vocab())
    assert tok.decode(tok.encode(text)) == text


@settings(max_examples=120, deadline=None)
@given(
    duration_s=st.floats(0.1, 120.0),
    audio_ctx=st.one_of(st.none(), st.integers(32, 1500)),
    overlap_s=st.floats(0.0, 10.0),
)
def test_parallel_window_plan_covers_all_content(
    duration_s, audio_ctx, overlap_s
):
    """Invariant: for ANY (duration, audio_ctx, overlap) the parallel
    window plan starts at 0, strides uniformly, and its last window
    reaches the end of the content — nothing silently untranscribed."""
    from spittle_tpu.engine.base import TranscribeParams
    from spittle_tpu.engine.whisper_engine import FRAMES_PER_SECOND

    class GeomOnly:
        window_frames = 3000
        window_samples = 3000 * 160
        from spittle_tpu.engine.whisper_engine import (
            WhisperEngine as _W,
        )
        _window_geometry = _W._window_geometry
        _plan_parallel_windows = _W._plan_parallel_windows
        _assemble_windows = _W._assemble_windows

    eng = GeomOnly()
    params = TranscribeParams(
        parallel_windows=True, condition_on_previous_text=False,
        audio_ctx=audio_ctx, parallel_overlap_s=overlap_s,
    )
    n = max(1, int(16000 * duration_s))
    audios = [np.zeros(n, np.float32)]
    plan, windows, content, overlap = eng._plan_parallel_windows(
        audios, params
    )
    wf, ws = eng._window_geometry(params)
    seeks = [s for _, s in plan]
    assert seeks[0] == 0
    assert seeks == sorted(seeks)
    # full coverage: the last window reaches the content end
    assert seeks[-1] + wf >= content[0]
    # no useless all-overlap tail window
    if len(seeks) > 1:
        assert seeks[-1] < max(content[0] - overlap, 1)
    assert windows.shape == (len(plan), ws)
