"""Fused W8A8 GEMM kernel (ops/w8a8_gemm.py): numerics vs the XLA
W8A8 path, epilogue folding (bias / out-scale / GELU), and dispatch
gating. Kernel body runs in interpret mode on CPU; on-chip lowering is
validated by scripts/tpu_checks.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.ops.quant import (
    _mm_w8a8,
    mm_bias,
    quantize_weight_w8a8,
)
from spittle_tpu.ops.w8a8_gemm import w8a8_gemm, w8a8_kernel_ok


@pytest.fixture
def xw():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 384)), jnp.float32)
    return x, w


def test_kernel_matches_xla_w8a8(xw):
    x, w = xw
    q = quantize_weight_w8a8(w)
    ref = _mm_w8a8(x, q)  # env off -> XLA path
    out = w8a8_gemm(x, q["qw8"], q["scale"], interpret=True)
    assert out.dtype == ref.dtype
    # f32 multiply-order noise only (sx/sw broadcast association).
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4
    )


def test_kernel_bf16_activations(xw):
    x, w = xw
    q = quantize_weight_w8a8(w)
    xb = x.astype(jnp.bfloat16)
    ref = _mm_w8a8(xb, q)
    out = w8a8_gemm(xb, q["qw8"], q["scale"], interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.3,  # bf16 output rounding of ~30-magnitude values
    )


def test_epilogue_bias_scale_gelu(xw):
    x, w = xw
    q = quantize_weight_w8a8(w)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(384),
                    jnp.float32)
    s = 0.3
    ref = jax.nn.gelu((_mm_w8a8(x, q) + b) * s, approximate=False)
    out = w8a8_gemm(x, q["qw8"], q["scale"], bias=b, act="gelu",
                    out_scale=s, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_ragged_m_rows_masked(xw):
    """M not a multiple of block_m: partial final block must not corrupt
    in-bounds rows (rows are independent through the row-quantized dot)."""
    x, w = xw
    q = quantize_weight_w8a8(w)
    xr = x[:200]
    ref = _mm_w8a8(xr, q)
    out = w8a8_gemm(xr, q["qw8"], q["scale"], block_m=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4
    )


def test_batch_dims_preserved(xw):
    x, w = xw
    q = quantize_weight_w8a8(w)
    x3 = x.reshape(2, 128, 256)
    out = w8a8_gemm(x3, q["qw8"], q["scale"], interpret=True)
    assert out.shape == (2, 128, 384)
    flat = w8a8_gemm(x, q["qw8"], q["scale"], interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out).reshape(256, 384), np.asarray(flat)
    )


def test_mm_bias_dispatch_and_gate(xw, monkeypatch):
    x, w = xw
    q = quantize_weight_w8a8(w)
    # Gate: CPU backend without the interpret override -> XLA path only.
    assert not w8a8_kernel_ok(x, q["qw8"])
    b = jnp.zeros(384, jnp.float32)
    plain = mm_bias(x, q, b)
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(_mm_w8a8(x, q)), rtol=0, atol=0
    )
    # Kernel on (interpret forced): same numbers through the fused path.
    monkeypatch.setenv("SPITTLE_W8A8_KERNEL", "1")
    monkeypatch.setenv("SPITTLE_W8A8_INTERPRET", "1")
    fused = mm_bias(x, q, b)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), rtol=1e-5, atol=1e-4
    )


def test_gate_rejects_unaligned():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((256, 200)), jnp.float32)
    qw = jnp.zeros((200, 384), jnp.int8)
    assert not w8a8_kernel_ok(x, qw)  # K % 128 != 0
    x2 = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)
    qw2 = jnp.zeros((128, 128), jnp.int8)
    assert not w8a8_kernel_ok(x2, qw2)  # M too small


def test_encoder_block_parity_with_kernel(monkeypatch):
    """Full W8A8-quantized encoder block stack: fused-kernel path vs XLA
    path, end to end through _encoder_blocks."""
    from spittle_tpu.models.whisper.model import _encoder_blocks
    from spittle_tpu.models.whisper.config import CONFIGS
    from spittle_tpu.models.whisper.model import init_params
    from spittle_tpu.ops.quant import (
        WHISPER_ENCODER_QUANT_KEYS, quantize_tree,
    )

    cfg = CONFIGS["tiny"]
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qblocks = quantize_tree(
        params["encoder"]["blocks"], WHISPER_ENCODER_QUANT_KEYS,
        mode="w8a8",
    )
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal(
            (1, 256, cfg.n_audio_state)
        ),
        jnp.float32,
    )
    ref = _encoder_blocks(qblocks, x, cfg.n_audio_head)
    monkeypatch.setenv("SPITTLE_W8A8_KERNEL", "1")
    monkeypatch.setenv("SPITTLE_W8A8_INTERPRET", "1")
    out = _encoder_blocks(qblocks, x, cfg.n_audio_head)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3
    )
