"""Word-timestamp alignment tests + cleanup subsystem tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.models.whisper.alignment import (
    WordTiming,
    alignment_heads,
    decoder_cross_attention,
    dtw_path,
    token_emission_times,
    word_timestamps,
    _median_filter,
)
from spittle_tpu.models.whisper.config import WhisperConfig
from spittle_tpu.models.whisper.model import encode, init_params
from spittle_tpu.models.whisper.tokenizer import WhisperTokenizer, make_test_vocab
from spittle_tpu.text.cleanup import (
    CleanupManager,
    mask_protected_spans,
    restore_protected_spans,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = WhisperConfig(
        name="t", n_mels=80, n_audio_ctx=50, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=24, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(1))
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 80, 100)), jnp.float32
    )
    xa = encode(params, mel, cfg)
    return cfg, params, xa


class TestDtw:
    def test_diagonal_preferred(self):
        # Strong diagonal: path should track it.
        n = 6
        cost = np.ones((n, n))
        np.fill_diagonal(cost, 0.0)
        ti, ai = dtw_path(cost)
        on_diag = sum(1 for a, b in zip(ti, ai) if a == b)
        assert on_diag >= n - 1

    def test_monotonic(self):
        rng = np.random.default_rng(0)
        cost = rng.uniform(size=(8, 20))
        ti, ai = dtw_path(cost)
        assert (np.diff(ti) >= 0).all()
        assert (np.diff(ai) >= 0).all()
        assert ti[0] == 0 and ai[0] == 0
        assert ti[-1] == 7 and ai[-1] == 19

    def test_median_filter(self):
        x = np.asarray([[0.0, 10.0, 0.0, 0.0, 0.0]])
        out = _median_filter(x, 3)
        assert out[0, 1] == 0.0  # spike removed


class TestAlignment:
    def test_cross_attention_shapes(self, tiny):
        cfg, params, xa = tiny
        toks = jnp.asarray([[cfg.sot, 100, 200, 300]], jnp.int32)
        attn = np.asarray(decoder_cross_attention(params, toks, xa, cfg))
        assert attn.shape == (2, 1, 4, 4, cfg.n_audio_ctx)
        np.testing.assert_allclose(attn.sum(-1), 1.0, atol=1e-4)

    def test_alignment_heads_upper_half(self, tiny):
        cfg, *_ = tiny
        heads = alignment_heads(cfg)
        assert all(l >= cfg.n_text_layer // 2 for l, _ in heads)
        assert len(heads) == (cfg.n_text_layer - cfg.n_text_layer // 2) * cfg.n_text_head

    def test_token_emission_times_monotonic(self, tiny):
        cfg, params, xa = tiny
        # teacher-forced over prefix [sot] + text [10,20,30] + [eot]
        toks = jnp.asarray([[cfg.sot, 10, 20, 30, cfg.eot]], jnp.int32)
        attn = np.asarray(decoder_cross_attention(params, toks, xa, cfg))
        times = token_emission_times(attn, n_prefix=1, n_frames=40, cfg=cfg)
        assert times.shape == (4,)  # [text0, text1, text2, eot]
        assert (np.diff(times) >= 0).all()
        assert (times >= 0).all() and (times <= 40 * 0.02 + 1e-6).all()

    def test_word_timestamps_end_to_end(self, tiny):
        cfg, params, xa = tiny
        tok = WhisperTokenizer(cfg, make_test_vocab())
        ids = tok.encode(" hello world this is a test")
        words = word_timestamps(
            params, ids, xa, n_frames=40, cfg=cfg, tokenizer=tok,
            prefix=(cfg.sot, cfg.lang_begin, cfg.transcribe),
        )
        assert words
        text = " ".join(w.word for w in words)
        assert "hello" in text and "world" in text
        for w in words:
            assert 0 <= w.start <= w.end <= 40 * 0.02 + 1e-6
        for a, b in zip(words, words[1:]):
            assert b.start >= a.start - 1e-6


class TestCleanup:
    def test_masking_roundtrip(self):
        text = "Run `cargo build` at /usr/local/bin with --verbose and @main.rs"
        masked, spans = mask_protected_spans(text)
        assert "`cargo build`" not in masked
        assert "⟦P0⟧" in masked
        assert restore_protected_spans(masked, spans) == text

    def test_cleanup_fail_open(self):
        mgr = CleanupManager(seq2seq=None)
        assert mgr.cleanup("raw text") == "raw text"
        assert not mgr.is_available

        def boom(prompt):
            raise RuntimeError("nope")

        assert CleanupManager(boom).cleanup("raw text") == "raw text"

    def test_cleanup_provider_path(self):
        def fake(prompt):
            # echo masked payload uppercased, placeholders intact
            return prompt.split(": ", 1)[1].upper()

        mgr = CleanupManager(fake)
        out = mgr.cleanup("hello `code` world")
        assert "HELLO" in out and "WORLD" in out
        assert "`code`" in out  # restored, case untouched

    def test_cleanup_own_placeholders_always_restored(self):
        # The guard covers this call's own spans (reference semantics:
        # cleanup.rs checks restored.contains(placeholder) per span); a
        # provider echoing our placeholder gets it restored in place.
        mgr = CleanupManager(lambda p: "⟦P0⟧ kept")
        out = mgr.cleanup("keep `this` text")
        assert out == "`this` kept"


def test_load_alignment_heads_sidecar(tmp_path):
    import json

    from spittle_tpu.models.whisper.alignment import load_alignment_heads

    assert load_alignment_heads(str(tmp_path)) is None
    (tmp_path / "alignment_heads.json").write_text(
        json.dumps([[2, 4], [3, 1]])
    )
    assert load_alignment_heads(str(tmp_path)) == [(2, 4), (3, 1)]
    # File-path form resolves the containing directory.
    assert load_alignment_heads(str(tmp_path / "model.bin")) == [(2, 4), (3, 1)]
