"""int8 self-attention KV cache: write-time quantization, step/prefill
parity, greedy + beam integration.

Reference context: whisper.cpp's quantized GGML models quantize weights
only; here the decode-time self-attention cache itself is stored int8
with per-position scales (SURVEY.md §6 north-star RTFx on TPU — the
cache is the second-largest HBM stream each step re-reads after
cross-KV; see docs/PERFORMANCE.md bandwidth-wall analysis).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spittle_tpu.models.whisper.config import CONFIGS, WhisperConfig
from spittle_tpu.models.whisper.decode import DecodeOptions, greedy_decode
from spittle_tpu.models.whisper.model import (
    decode_block,
    decode_step,
    decoder_prefill,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
)

TINY = CONFIGS["tiny"]


def _setup(b=2, seed=0):
    params = init_params(TINY, jax.random.PRNGKey(seed), jnp.float32)
    xa = jax.random.normal(
        jax.random.PRNGKey(seed + 1), (b, TINY.n_audio_ctx, TINY.n_audio_state),
        jnp.float32,
    ) * 0.3
    return params, xa


def test_init_quant_cache_shapes():
    c = init_kv_cache(TINY, 3, ctx=64, quant=True)
    dh = TINY.n_text_state // TINY.n_text_head
    assert c["qw"].shape == (TINY.n_text_layer, 2, 3, TINY.n_text_head, dh, 64)
    assert c["qw"].dtype == jnp.int8
    assert c["scale"].shape == (TINY.n_text_layer, 2, 3, TINY.n_text_head, 64)
    assert float(c["scale"].min()) == 1.0  # unwritten columns: scale 1


def test_prefill_quant_matches_plain_logits_and_cache():
    """Prefill logits are computed from bf16 activations either way
    (quantization only affects the STORED cache), so they must match
    exactly; the stored cache must dequantize back to the plain one
    within half a quantization step."""
    params, xa = _setup()
    cross_kv = precompute_cross_kv(params, xa, TINY)
    toks = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)

    lg_p, cache_p = decoder_prefill(params, toks, cross_kv, TINY, 32)
    lg_q, cache_q = decoder_prefill(
        params, toks, cross_kv, TINY, 32, quant_cache=True
    )
    np.testing.assert_allclose(
        np.asarray(lg_p), np.asarray(lg_q), atol=1e-5
    )
    deq = np.asarray(cache_q["qw"], np.float32) * np.asarray(
        cache_q["scale"], np.float32
    )[..., None, :]
    plain = np.asarray(cache_p, np.float32)
    scale = np.asarray(cache_q["scale"], np.float32)
    # only the 4 written positions carry data
    err = np.abs(deq[..., :4] - plain[..., :4])
    assert (err <= scale[..., None, :4] / 2 + 1e-6).all()


def test_decode_step_quant_cache_close_to_plain():
    """Greedy steps through the int8 cache stay close to the plain-cache
    steps (same weights, same tokens forced), and the top-1 token of the
    very first step matches (one window of drift-free numerics)."""
    params, xa = _setup()
    cross_kv = precompute_cross_kv(params, xa, TINY)
    toks = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)

    lg_p, cache_p = decoder_prefill(params, toks, cross_kv, TINY, 32)
    lg_q, cache_q = decoder_prefill(
        params, toks, cross_kv, TINY, 32, quant_cache=True
    )

    nxt = jnp.asarray([9, 10], jnp.int32)
    out_p, cache_p = decode_step(
        params, nxt, jnp.asarray(3, jnp.int32), cache_p, cross_kv, TINY
    )
    out_q, cache_q = decode_step(
        params, nxt, jnp.asarray(3, jnp.int32), cache_q, cross_kv, TINY
    )
    assert isinstance(cache_q, dict)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_q), atol=0.05, rtol=0.02
    )
    assert (
        np.argmax(np.asarray(out_p), -1) == np.argmax(np.asarray(out_q), -1)
    ).all()


def test_decode_block_quant_cache_runs_and_masks():
    """decode_block (the speculative-verify primitive) through the int8
    cache: rows must be causally masked exactly like the plain path."""
    params, xa = _setup(seed=3)
    cross_kv = precompute_cross_kv(params, xa, TINY)
    toks = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    _, cache_p = decoder_prefill(params, toks, cross_kv, TINY, 32)
    _, cache_q = decoder_prefill(
        params, toks, cross_kv, TINY, 32, quant_cache=True
    )
    blk = jnp.asarray([[7, 8, 9], [10, 11, 12]], jnp.int32)
    lg_p, _ = decode_block(
        params, blk, jnp.asarray(2, jnp.int32), cache_p, cross_kv, TINY
    )
    lg_q, _ = decode_block(
        params, blk, jnp.asarray(2, jnp.int32), cache_q, cross_kv, TINY
    )
    np.testing.assert_allclose(
        np.asarray(lg_p), np.asarray(lg_q), atol=0.08, rtol=0.03
    )


def test_greedy_decode_quant_cache_runs():
    params, xa = _setup(seed=5)
    opts = DecodeOptions(
        language="en", timestamps=False, max_tokens=8, quant_cache=True
    )
    out = greedy_decode(params, xa, TINY, opts)
    toks = np.asarray(out["tokens"])
    assert toks.ndim == 2 and (toks >= 0).all() and (toks < TINY.n_vocab).all()


def test_beam_decode_quant_cache_runs():
    from spittle_tpu.models.whisper.beam import beam_decode

    params, xa = _setup(seed=7)
    opts = DecodeOptions(
        language="en", timestamps=False, max_tokens=6, quant_cache=True
    )
    out = beam_decode(params, xa, TINY, opts, beam_size=2)
    toks = np.asarray(out["tokens"])
    assert toks.ndim == 2 and (toks >= 0).all() and (toks < TINY.n_vocab).all()


def test_engine_flag_and_env(monkeypatch):
    from spittle_tpu.engine.whisper_engine import WhisperEngine

    assert WhisperEngine(quantize_cache=True).quantize_cache is True
    monkeypatch.setenv("SPITTLE_QUANTIZE_CACHE", "1")
    assert WhisperEngine.from_env().quantize_cache is True
