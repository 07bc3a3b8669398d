"""Decode cache-write forms: scan vs hybrid vs deferred must be
token-identical.

The K=1 decode step has three cache-write strategies (measured on-chip,
see model.decode_form docstring + docs/PERFORMANCE.md): the scan form
(cache as layer-scan xs/ys), the hybrid (read-only xs + in-register
fresh column + immediate bulk write), and the deferred form the greedy
loop uses in production (fresh columns ride the while_loop carry and
land next iteration). All three must produce the same logits, the same
token sequences, and the same final cache bytes.

Reference context: whisper.cpp's decoder writes its KV cache in place
per token (decoder.cpp-equivalent semantics at
/root/reference — transcribe-rs WhisperEngine,
managers/transcription.rs:445-504); these forms are TPU scheduling
strategies around identical math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spittle_tpu.models.whisper.config import CONFIGS
from spittle_tpu.models.whisper.decode import DecodeOptions, greedy_decode
from spittle_tpu.models.whisper import model as M

TINY = CONFIGS["tiny"]


def _setup(b=2, seed=0):
    params = M.init_params(TINY, jax.random.PRNGKey(seed), jnp.float32)
    xa = jax.random.normal(
        jax.random.PRNGKey(seed + 1),
        (b, TINY.n_audio_ctx, TINY.n_audio_state),
        jnp.float32,
    ) * 0.3
    return params, xa


def _steps_scan(params, cross_kv, cache, toks, pos0):
    """Reference: per-step scan-form decode_step chain."""
    logits = []
    pos = pos0
    for t in toks:
        lg, cache = M.decode_step(
            params, t, jnp.int32(pos), cache, cross_kv, TINY
        )
        logits.append(lg)
        pos += 1
    return jnp.stack(logits), cache


def _steps_deferred(params, cross_kv, cache, toks, pos0):
    logits = []
    pending = M.init_pending(cache, pos0)
    pos = pos0
    for t in toks:
        lg, cache, pending = M.decode_step_deferred(
            params, t, jnp.int32(pos), cache, pending, cross_kv, TINY
        )
        logits.append(lg)
        pos += 1
    cache = M._write_columns_bulk(cache, pending, jnp.int32(pos - 1))
    return jnp.stack(logits), cache


@pytest.mark.parametrize("quant_cache", [False, True])
def test_deferred_steps_match_scan(quant_cache):
    params, xa = _setup()
    cross_kv = M.precompute_cross_kv(params, xa, TINY)
    prefix = jnp.asarray([[TINY.sot, 50259, 50359]] * 2, jnp.int32)
    _, cache = M.decoder_prefill(
        params, prefix, cross_kv, TINY, 32, quant_cache=quant_cache
    )
    rng = np.random.default_rng(0)
    toks = [
        jnp.asarray(rng.integers(0, TINY.n_vocab, 2), jnp.int32)
        for _ in range(8)
    ]
    lg_s, cache_s = _steps_scan(params, cross_kv, cache, toks, 3)
    lg_d, cache_d = _steps_deferred(params, cross_kv, cache, toks, 3)
    # The fresh-column attend splits the V contraction (cols < pos via
    # the cache einsum + a rank-1 fresh term), so reduction order — and
    # only order — differs from the write-then-attend form: ULP-level
    # deltas, argmax-stable (token identity is asserted end-to-end in
    # test_greedy_forms_token_identical and the HF parity suite).
    np.testing.assert_allclose(
        np.asarray(lg_s), np.asarray(lg_d), rtol=1e-4, atol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(cache_s), jax.tree_util.tree_leaves(cache_d)
    ):
        # Columns beyond the decoded range are never written by the
        # deferred form (the scan form rewrites the whole slice, which
        # preserves the zero init anyway) — compare the full buffers.
        np.testing.assert_allclose(
            np.asarray(a).astype(np.float32),
            np.asarray(b).astype(np.float32),
            rtol=1e-3, atol=1e-3,
        )


def _steps_ring(params, cross_kv, cache, toks, pos0, ring=4):
    """Ring-form decode chain over a cache allocated +ring wide."""
    logits = []
    pend = M.init_ring(cache, ring)
    flush_len = jnp.int32(pos0)
    pos = pos0
    for t in toks:
        lg, cache, pend, flush_len = M.decode_step_ring(
            params, t, jnp.int32(pos), cache, pend, flush_len, cross_kv,
            TINY,
        )
        logits.append(lg)
        pos += 1
    cache = M._ring_flush(cache, pend, flush_len)
    return jnp.stack(logits), cache


@pytest.mark.parametrize("quant_cache", [False, True])
def test_ring_steps_match_scan(quant_cache):
    """Ring form (incl. an in-loop flush: 8 steps, R=4) matches the
    scan form's logits and the written cache columns."""
    params, xa = _setup()
    cross_kv = M.precompute_cross_kv(params, xa, TINY)
    prefix = jnp.asarray([[TINY.sot, 50259, 50359]] * 2, jnp.int32)
    ring = 4
    _, cache_s0 = M.decoder_prefill(
        params, prefix, cross_kv, TINY, 32, quant_cache=quant_cache
    )
    _, cache_r0 = M.decoder_prefill(
        params, prefix, cross_kv, TINY, 32 + ring, quant_cache=quant_cache
    )
    rng = np.random.default_rng(1)
    toks = [
        jnp.asarray(rng.integers(0, TINY.n_vocab, 2), jnp.int32)
        for _ in range(8)
    ]
    lg_s, cache_s = _steps_scan(params, cross_kv, cache_s0, toks, 3)
    lg_r, cache_r = _steps_ring(params, cross_kv, cache_r0, toks, 3, ring)
    np.testing.assert_allclose(
        np.asarray(lg_s), np.asarray(lg_r), rtol=1e-4, atol=1e-4
    )
    # Written region (cols < 3 + 8) must match; the ring cache's extra
    # tail holds stale flush data every reader masks off.
    for a, b in zip(
        jax.tree_util.tree_leaves(cache_s), jax.tree_util.tree_leaves(cache_r)
    ):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a[..., :11].astype(np.float32),
            b[..., :11].astype(np.float32),
            rtol=1e-3, atol=1e-3,
        )


def _steps_tmajor(params, cross_kv, cache, toks, pos0):
    """ctx-major form: transpose at entry/exit like the greedy loop."""
    logits = []
    cache = M.transpose_cache_tmajor(cache)
    pos = pos0
    for t in toks:
        lg, cache = M.decode_step_tmajor(
            params, t, jnp.int32(pos), cache, cross_kv, TINY
        )
        logits.append(lg)
        pos += 1
    return jnp.stack(logits), M.transpose_cache_tmajor(cache)


@pytest.mark.parametrize("quant_cache", [False, True])
def test_tmajor_steps_match_scan(quant_cache):
    """The ctx-major layout form matches the scan form's logits and
    final cache bytes (quantized columns byte-equal: quantize_kv_t is
    quantize_kv on the transposed tensor)."""
    params, xa = _setup()
    cross_kv = M.precompute_cross_kv(params, xa, TINY)
    prefix = jnp.asarray([[TINY.sot, 50259, 50359]] * 2, jnp.int32)
    _, cache = M.decoder_prefill(
        params, prefix, cross_kv, TINY, 32, quant_cache=quant_cache
    )
    rng = np.random.default_rng(2)
    toks = [
        jnp.asarray(rng.integers(0, TINY.n_vocab, 2), jnp.int32)
        for _ in range(8)
    ]
    lg_s, cache_s = _steps_scan(params, cross_kv, cache, toks, 3)
    lg_t, cache_t = _steps_tmajor(params, cross_kv, cache, toks, 3)
    # Same reduction-order caveat as the deferred form (fresh-column
    # split V contraction + a different einsum operand layout): ULP
    # deltas, argmax-stable.
    np.testing.assert_allclose(
        np.asarray(lg_s), np.asarray(lg_t), rtol=1e-4, atol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(cache_s), jax.tree_util.tree_leaves(cache_t)
    ):
        np.testing.assert_allclose(
            np.asarray(a).astype(np.float32),
            np.asarray(b).astype(np.float32),
            rtol=1e-3, atol=1e-3,
        )


@pytest.mark.parametrize("quant_cache", [False, True])
def test_greedy_forms_token_identical(monkeypatch, quant_cache):
    """greedy_decode under scan / hybrid / deferred / ring: same tokens
    and logprobs. Trace-time env forms, so jit caches are cleared
    between runs."""
    params, xa = _setup(b=3, seed=7)
    opts = DecodeOptions(
        language="en", max_tokens=16, timestamps=True,
        quant_cache=quant_cache,
    )
    outs = {}
    monkeypatch.setenv("SPITTLE_DECODE_RING", "4")
    for form in ("scan", "deferred", "hybrid", "ring", "tmajor"):
        monkeypatch.setenv("SPITTLE_DECODE_FORM", form)
        jax.clear_caches()
        outs[form] = greedy_decode(params, xa, TINY, opts)
    monkeypatch.delenv("SPITTLE_DECODE_FORM")
    monkeypatch.delenv("SPITTLE_DECODE_RING")
    jax.clear_caches()
    for form in ("deferred", "hybrid", "ring", "tmajor"):
        np.testing.assert_array_equal(
            np.asarray(outs["scan"]["tokens"]),
            np.asarray(outs[form]["tokens"]),
            err_msg=f"{form} tokens diverge from scan",
        )
        np.testing.assert_allclose(
            np.asarray(outs["scan"]["avg_logprob"]),
            np.asarray(outs[form]["avg_logprob"]),
            rtol=1e-4, atol=1e-5,
            err_msg=f"{form} logprobs diverge from scan",
        )


def test_default_forms():
    """Production default: tmajor for the greedy loop (+35% e2e — the
    copy-on-write law is layout-dependent, see decode_form docstring);
    decode_step/beam/speculative fall back to scan for non-greedy
    forms. Legacy SPITTLE_DECODE_SCAN=1 forces scan."""
    assert M.decode_form() == "tmajor"
    try:
        import os

        os.environ["SPITTLE_DECODE_FORM"] = "ring"
        assert M.decode_form() == "ring"
        os.environ["SPITTLE_DECODE_SCAN"] = "1"
        assert M.decode_form() == "scan"
    finally:
        os.environ.pop("SPITTLE_DECODE_SCAN", None)
        os.environ.pop("SPITTLE_DECODE_FORM", None)
