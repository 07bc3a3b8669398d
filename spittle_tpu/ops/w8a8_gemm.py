"""Fused W8A8 GEMM Pallas kernel: quantize -> int8 MXU dot -> dequant.

The XLA W8A8 path (`ops/quant._mm_w8a8`) delivers ~1.26x over bf16 on
the encoder where the int8 MXU mode nominally doubles throughput
(measured: bf16 169 TF/s vs int8 230 TOP/s chained, scripts/
bench_chip.py). The gap is the dynamic-quantization machinery running
OUTSIDE the dot: XLA materializes the int8 activation tensor to HBM
(write + re-read), and the row-amax reduction is its own pass over the
bf16 input — at the encoder's fc2 shape ([B*1500, 5120] at batch 48)
that's ~1.9 GB of avoidable HBM traffic per layer.

This kernel fuses the whole pipeline into one pass:

  - grid over M row-blocks only; the ENTIRE int8 weight [K, N] stays
    resident in VMEM across the grid (<= 6.6 MB for every encoder GEMM
    shape: 1280x1280, 1280x5120, 5120x1280 — the same whole-operand-
    resident design as the full-KV attention kernel in attention.py);
  - each program quantizes its [bm, K] activation block per row on the
    VPU (amax -> scale -> round/clip to int8, all in registers/VMEM —
    the int8 activations NEVER touch HBM);
  - one [bm, K] x [K, N] int8xint8->int32 MXU dot;
  - epilogue: f32 rescale (sx * sw), optional bias add and exact GELU,
    cast to the output dtype. Folding bias+GELU here removes the
    separate [M, N] elementwise passes XLA would run between two
    custom calls (another ~750 MB/layer round trip at fc1's output).

Numerics match `_mm_w8a8` exactly in f32: same amax/round/clip
(round-half-to-even), same int32 accumulation, same rescale order.

Reference analog: whisper.cpp's fused GGML quantized matmul kernels
(the reference catalog serves q4/q5/q8 GGML artifacts); here the fusion
targets the TPU memory hierarchy instead of CPU SIMD.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu_erf(y: jnp.ndarray) -> jnp.ndarray:
    """Exact-form GELU with an in-kernel erf: Mosaic has no erf/erfc
    primitive (jax.nn.gelu(approximate=False) fails to lower — measured
    on-chip), so erf comes from Abramowitz & Stegun 7.1.26 (|err| <=
    1.5e-7, three decimal orders below bf16 output resolution)."""
    x = y * np.float32(2.0 ** -0.5)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + np.float32(0.3275911) * a)
    poly = (
        ((((np.float32(1.061405429) * t + np.float32(-1.453152027)) * t
           + np.float32(1.421413741)) * t + np.float32(-0.284496736)) * t
         + np.float32(0.254829592)) * t
    )
    erf = jnp.sign(x) * (1.0 - poly * jnp.exp(-a * a))
    return 0.5 * y * (1.0 + erf)


def _w8a8_kernel(x_ref, qw_ref, sw_ref, b_ref, o_ref, *, act: str):
    x = x_ref[:].astype(jnp.float32)  # [bm, K]
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    qx = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot(
        qx, qw_ref[:], preferred_element_type=jnp.int32
    )  # [bm, N]
    y = y.astype(jnp.float32) * sx * sw_ref[:]
    if b_ref is not None:
        y = y + b_ref[:].astype(jnp.float32)
    if act == "gelu":
        y = _gelu_erf(y)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "block_m", "out_scale", "interpret")
)
def w8a8_gemm(
    x: jnp.ndarray,        # [..., K] bf16/f32 activations
    qw: jnp.ndarray,       # [K, N] int8 weight
    sw: jnp.ndarray,       # [N] f32 per-output-channel scales
    bias: Optional[jnp.ndarray] = None,  # [N], folded into the epilogue
    act: str = "none",     # "none" | "gelu" (exact, matches _mlp)
    block_m: int = 256,
    out_scale: float = 1.0,  # folds (x@w + b) * s into sw*s and b*s
    interpret: bool = False,
) -> jnp.ndarray:
    """y = act(quant_dyn(x) @ qw * sx * sw + bias) in one fused pass."""
    k, n = qw.shape
    lead = x.shape[:-1]
    assert x.shape[-1] == k, (x.shape, qw.shape)
    xm = x.reshape(-1, k)
    m = xm.shape[0]
    bm = min(block_m, m)
    # out_scale rides the [N]-sized operands (free): (x@w + b)*s ==
    # (qx@qw)*sx*(sw*s) + b*s — no extra [M, N] pass for the attention
    # head-dim scaling.
    swr = (sw * out_scale).reshape(1, n).astype(jnp.float32)
    br = None if bias is None else (bias * out_scale).reshape(1, n)
    kernel = functools.partial(_w8a8_kernel, act=act)
    if bias is None:
        # pallas refs can't be None-shaped: drop the operand entirely.
        kernel_nb = lambda x_ref, qw_ref, sw_ref, o_ref: _w8a8_kernel(
            x_ref, qw_ref, sw_ref, None, o_ref, act=act
        )
        in_specs = [
            pl.BlockSpec((bm, k), lambda mi: (mi, 0)),
            pl.BlockSpec((k, n), lambda mi: (0, 0)),
            pl.BlockSpec((1, n), lambda mi: (0, 0)),
        ]
        operands = (xm, qw, swr)
        kfn = kernel_nb
    else:
        in_specs = [
            pl.BlockSpec((bm, k), lambda mi: (mi, 0)),
            pl.BlockSpec((k, n), lambda mi: (0, 0)),
            pl.BlockSpec((1, n), lambda mi: (0, 0)),
            pl.BlockSpec((1, n), lambda mi: (0, 0)),
        ]
        operands = (xm, qw, swr, br)
        kfn = kernel
    out = pl.pallas_call(
        kfn,
        grid=(pl.cdiv(m, bm),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, n), lambda mi: (mi, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=xm.size * xm.dtype.itemsize + qw.size
            + (m * n) * x.dtype.itemsize,
            transcendentals=(m * n) if act == "gelu" else 0,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(*lead, n)


def w8a8_kernel_enabled() -> bool:
    """SPITTLE_W8A8_KERNEL=1 routes W8A8 matmuls through the fused
    Pallas kernel (trace-time env, same pattern as SPITTLE_ATTN_Q8).
    Opt-in until the on-chip A/B lands; scripts/tpu_checks.py validates
    lowering + numerics on hardware first."""
    return os.environ.get("SPITTLE_W8A8_KERNEL", "0") == "1"


def w8a8_kernel_ok(x: jnp.ndarray, qw: jnp.ndarray) -> bool:
    """Shape/backend gate for the fused kernel: MXU-tileable operands,
    whole weight resident in VMEM (<= 8 MB), TPU backend (CPU tests and
    tiny shapes stay on the XLA path)."""
    if jax.default_backend() != "tpu" and not _force_interpret():
        return False
    k, n = qw.shape
    if k % 128 or n % 128:
        return False
    if k * n > 8 * 1024 * 1024:  # int8 bytes; fc1/fc2 are 6.55 MB
        return False
    m = 1
    for d in x.shape[:-1]:
        m *= d
    return m >= 128


def _force_interpret() -> bool:
    """SPITTLE_W8A8_INTERPRET=1: run the kernel in interpret mode off-TPU
    (unit tests exercise the real kernel body on CPU)."""
    return os.environ.get("SPITTLE_W8A8_INTERPRET", "0") == "1"


def maybe_w8a8_gemm(
    x: jnp.ndarray,
    w: dict,
    bias: Optional[jnp.ndarray] = None,
    act: str = "none",
    out_scale: float = 1.0,
):
    """Fused-kernel dispatch for a quantize_weight_w8a8 dict, or None if
    the kernel path doesn't apply (caller falls back to the XLA path)."""
    if not (w8a8_kernel_enabled() and w8a8_kernel_ok(x, w["qw8"])):
        return None
    bm = int(os.environ.get("SPITTLE_W8A8_BM", "256"))
    return w8a8_gemm(
        x, w["qw8"], w["scale"], bias=bias, act=act, block_m=bm,
        out_scale=out_scale, interpret=_force_interpret(),
    )
