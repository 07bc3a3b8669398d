"""Whisper forward-pass invariants on a tiny random-weight config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.models.whisper.config import CONFIGS, WhisperConfig
from spittle_tpu.models.whisper.model import (
    decode_step,
    decoder_forward,
    encode,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
)


@pytest.fixture(scope="module")
def tiny():
    # Reduced-depth tiny config for fast CPU tests
    cfg = WhisperConfig(
        name="test",
        n_mels=80,
        n_audio_ctx=60,
        n_audio_state=64,
        n_audio_head=4,
        n_audio_layer=2,
        n_vocab=51865,
        n_text_ctx=24,
        n_text_state=64,
        n_text_head=4,
        n_text_layer=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_special_token_layout():
    for name, want in [
        ("tiny", dict(sot=50258, eot=50257, transcribe=50359,
                      no_timestamps=50363, timestamp_begin=50364, n_langs=99)),
        ("tiny.en", dict(sot=50257, eot=50256, transcribe=50358,
                         no_timestamps=50362, timestamp_begin=50363, n_langs=99)),
        ("large-v3", dict(sot=50258, eot=50257, transcribe=50360,
                          no_timestamps=50364, timestamp_begin=50365, n_langs=100)),
    ]:
        cfg = CONFIGS[name]
        for attr, val in want.items():
            assert getattr(cfg, attr) == val, (name, attr)
        assert cfg.timestamp_begin + 1501 == cfg.n_vocab


def test_encode_shapes(tiny):
    cfg, params = tiny
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, cfg.n_mels, cfg.n_audio_ctx * 2)), jnp.float32)
    xa = encode(params, mel, cfg)
    assert xa.shape == (2, cfg.n_audio_ctx, cfg.n_audio_state)
    assert np.isfinite(np.asarray(xa)).all()


def test_decoder_causality(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((1, cfg.n_mels, cfg.n_audio_ctx * 2)),
                      jnp.float32)
    xa = encode(params, mel, cfg)
    toks = jnp.asarray(rng.integers(0, 100, (1, 8)), jnp.int32)
    base = np.asarray(decoder_forward(params, toks, xa, cfg))
    # Changing a future token must not affect earlier logits.
    toks2 = toks.at[0, 5].set(toks[0, 5] + 1)
    mod = np.asarray(decoder_forward(params, toks2, xa, cfg))
    np.testing.assert_allclose(base[0, :5], mod[0, :5], atol=1e-5)
    assert np.abs(base[0, 5:] - mod[0, 5:]).max() > 1e-6


def test_incremental_matches_teacher_forced(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((2, cfg.n_mels, cfg.n_audio_ctx * 2)),
                      jnp.float32)
    xa = encode(params, mel, cfg)
    toks = jnp.asarray(rng.integers(0, 100, (2, 6)), jnp.int32)
    full = np.asarray(decoder_forward(params, toks, xa, cfg))

    cross_kv = precompute_cross_kv(params, xa, cfg)
    cache = init_kv_cache(cfg, 2)
    step_logits = []
    for t in range(6):
        logits, cache = decode_step(
            params, toks[:, t], jnp.asarray(t, jnp.int32), cache, cross_kv, cfg
        )
        step_logits.append(np.asarray(logits))
    inc = np.stack(step_logits, axis=1)  # [B, T, V]
    np.testing.assert_allclose(inc, full, atol=2e-4)


def test_batch_consistency(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((3, cfg.n_mels, cfg.n_audio_ctx * 2)),
                      jnp.float32)
    xa_b = encode(params, mel, cfg)
    xa_1 = encode(params, mel[1:2], cfg)
    np.testing.assert_allclose(np.asarray(xa_b[1]), np.asarray(xa_1[0]), atol=1e-4)


def test_stem_gemm_matches_conv(monkeypatch):
    """SPITTLE_STEM_GEMM: the im2col GEMM stem must match the conv stem
    (same weights, same unfold order) to float noise."""
    import numpy as np

    from spittle_tpu.models.whisper.config import CONFIGS
    from spittle_tpu.models.whisper.model import _encoder_stem, init_params

    cfg = CONFIGS["tiny"]
    p = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, cfg.n_mels, 3000))
        * 0.3,
        jnp.float32,
    )
    conv = np.asarray(_encoder_stem(p["encoder"], mel, cfg))
    monkeypatch.setenv("SPITTLE_STEM_GEMM", "1")
    gemm = np.asarray(_encoder_stem(p["encoder"], mel, cfg))
    np.testing.assert_allclose(gemm, conv, rtol=1e-5, atol=1e-5)
    # Reduced-context mels (audio_ctx path) go through the same unfold.
    mel_short = mel[:, :, :512]
    gemm = np.asarray(_encoder_stem(p["encoder"], mel_short, cfg))
    monkeypatch.setenv("SPITTLE_STEM_GEMM", "0")
    conv = np.asarray(_encoder_stem(p["encoder"], mel_short, cfg))
    np.testing.assert_allclose(gemm, conv, rtol=1e-5, atol=1e-5)
