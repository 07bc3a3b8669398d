"""Attention ops: Pallas flash attention for TPU + jnp reference.

The encoder self-attention over 1500 mel frames is the FLOPs hot spot of
Whisper (replacing whisper.cpp's ggml attention, reference engine behind
`managers/transcription.rs:501`). The Pallas kernel is a standard tiled
online-softmax flash attention:

- grid (batch*heads, q_tiles, kv_tiles), kv minor-most so VMEM scratch
  (running max / sum / accumulator) persists across the kv sweep;
- QK^T and PV ride the MXU in f32 accumulation; tiles are 128-aligned;
- optional causal masking and a static kv-length mask (the encoder pads
  1500 -> 1536 for tiling).

Decode-time single-token attention uses plain XLA ops (matmul sizes are
tiny; the KV cache read dominates and XLA handles it well).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
_NEG_INF = -1e30


def attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    kv_len: Optional[int] = None,
) -> jnp.ndarray:
    """Plain XLA attention. q: [B, H, Tq, D]; k/v: [B, H, Tk, D]."""
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    tq, tk = q.shape[2], k.shape[2]
    if kv_len is not None and kv_len < tk:
        mask = jnp.arange(tk)[None, :] < kv_len
        scores = jnp.where(mask[None, None], scores, _NEG_INF)
    if causal:
        cmask = jnp.arange(tq)[:, None] >= jnp.arange(tk)[None, :] - (tk - tq)
        scores = jnp.where(cmask[None, None], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, causal: bool, kv_len: int, block_q: int, block_k: int, num_k: int,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_q, block_k]

    col = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = col < kv_len
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        mask = mask & (row >= col)
    s = jnp.where(mask, s, _NEG_INF)

    m_prev = m_scr[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # [block_q, block_k]
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new

    @pl.when(kj == num_k - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "kv_len", "block_q", "block_k"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    kv_len: Optional[int] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Tiled flash attention. q: [B, H, Tq, D]; k/v: [B, H, Tk, D].

    Tq/Tk must be multiples of the block sizes (pad and pass kv_len for
    ragged kv). Scale q/k before calling (Whisper multiplies both by
    head_dim**-0.25).
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    assert tq % block_q == 0 and tk % block_k == 0, (tq, tk, block_q, block_k)
    kv_len = tk if kv_len is None else kv_len
    num_q = tq // block_q
    num_k = tk // block_k

    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        kv_len=kv_len,
        block_q=block_q,
        block_k=block_k,
        num_k=num_k,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * h, num_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, kj: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, kj: (bh, kj, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, kj: (bh, kj, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, kj: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * d,
            bytes_accessed=(qf.size + kf.size + vf.size + qf.size) * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, tq, d)


def _fullkv_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, causal: bool,
                   block_q: int, q_axis: int = 1):
    """Single-pass attention with the whole K/V resident in VMEM.

    For encoder-scale sequences (1536 x 64 per head: K+V = 384 KB bf16) the
    entire kv fits on-chip, so no online-softmax streaming is needed: one
    big QK^T, one masked softmax, one PV — three large MXU/VPU ops per
    program instead of dozens of 128x128 tiles.

    The softmax is VPU-bound, so it is arranged to touch the [block_q, Tk]
    scores as few times as possible: the max is taken UNMASKED (any score
    is a valid upper bound — masked columns only need to end up zero in p,
    which the multiply handles), padding is a [1, Tk] broadcast multiply
    rather than an iota+compare+where over the full tile, and the 1/l
    normalization happens after PV on the [block_q, D] output instead of
    on the scores."""
    tk = k_ref.shape[1]
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_q, Tk]
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    if causal:
        qi = pl.program_id(q_axis)  # grid axis carrying the q-block index
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        keep = (row >= col) & (col < kv_len)
        p = p * keep.astype(p.dtype)
    elif kv_len < tk:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
        p = p * (col < kv_len).astype(p.dtype)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "kv_len", "block_q")
)
def flash_attention_fullkv(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    kv_len: Optional[int] = None,
    block_q: int = 512,
) -> jnp.ndarray:
    """Full-KV-in-VMEM attention; q/k/v [B, H, T, D], T % block_q == 0."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    assert tq % block_q == 0, (tq, block_q)
    kv_len = tk if kv_len is None else kv_len
    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)
    kernel = functools.partial(
        _fullkv_kernel, kv_len=kv_len, causal=causal, block_q=block_q
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * h, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, tk, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * d,
            bytes_accessed=(qf.size * 2 + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, tq, d)


def _fullkv_pipe_kernel(q_ref, k_ref, v_ref, o_ref, s_ref, *,
                        kv_len: int):
    """Software-pipelined full-KV attention: stage A computes q-block
    i's QK^T scores (MXU) into one half of a double scratch; stage B
    runs block i-1's softmax (VPU) + PV (MXU) from the other half.

    The serial form (_fullkv_kernel) runs ~33 TF/s at encoder shape
    because each grid step is dot -> softmax -> dot with the
    VPU-dominant softmax on the critical path. Staging A and B on
    INDEPENDENT buffers inside one grid step lets Mosaic's scheduler
    overlap block i's MXU dots with block i-1's VPU softmax — the grid
    is flattened to bh*nq + 1 steps (one epilogue step) so the pipeline
    also crosses (bh) boundaries; per-operand index maps keep Q/K on
    the compute step and V/O one step behind."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    tk = k_ref.shape[1]

    @pl.when(i < n - 1)
    def _stage_a():
        s_ref[i % 2] = jax.lax.dot_general(
            q_ref[0], k_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i > 0)
    def _stage_b():
        s = s_ref[(i - 1) % 2]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        if kv_len < tk:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
            p = p * (col < kv_len).astype(p.dtype)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0],
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kv_len", "block_q", "interpret")
)
def flash_attention_fullkv_pipe(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len: Optional[int] = None,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pipelined full-KV attention (non-causal); q/k/v [B, H, T, D],
    T % block_q == 0. See _fullkv_pipe_kernel. Dispatch via
    SPITTLE_ATTN_PIPE=1 (attn_pipe_enabled)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    assert tq % block_q == 0, (tq, block_q)
    kv_len = tk if kv_len is None else kv_len
    nq = tq // block_q
    total = b * h * nq
    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)
    kernel = functools.partial(_fullkv_pipe_kernel, kv_len=kv_len)

    def _a(i):  # compute-stage flat index (clamped for the epilogue)
        return jnp.minimum(i, total - 1)

    def _b(i):  # consume-stage flat index (clamped for the prologue)
        return jnp.maximum(i - 1, 0)

    out = pl.pallas_call(
        kernel,
        grid=(total + 1,),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda i: (_a(i) // nq, _a(i) % nq, 0)
            ),
            pl.BlockSpec((1, tk, d), lambda i: (_a(i) // nq, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda i: (_b(i) // nq, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i: (_b(i) // nq, _b(i) % nq, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((2, block_q, tk), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * d,
            bytes_accessed=(qf.size * 2 + kf.size + vf.size)
            * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, tq, d)


def attn_pipe_enabled() -> bool:
    """SPITTLE_ATTN_PIPE=1 routes non-causal encoder attention through
    flash_attention_fullkv_pipe. Opt-in until validated on hardware and
    A/B'd in-loop (scripts/bench_encoder.py sweeps it)."""
    return os.environ.get("SPITTLE_ATTN_PIPE", "0") == "1"


def _fullkv_q8_kernel(q8_ref, qs_ref, k8_ref, ks_ref, v8_ref, vs_ref,
                      o_ref, *, kv_len: int):
    """Full-KV attention with BOTH dots int8xint8->int32 on the MXU.

    The encoder attention kernel is COMPUTE-bound (measured 2026-08-18:
    ~33 TF/s vs the chip's 92-169 TF/s bf16 chained ceiling — the Dh=64
    contraction runs the MXU at half-tile utilization, and softmax rides
    the VPU). int8 MXU mode doubles the dot rate (measured 230 TOP/s
    chained at 8192^3), so QK^T and PV run int8: q/k/v are quantized
    per-row outside (scales factor out of the dots exactly), and the
    probability rows are quantized in-kernel after folding V's
    per-position scales — same algebra as the w8a8 decode path
    (ops/quant.quantize_kv_w8a8), applied at encoder scale.

    Masking/softmax policy matches _fullkv_kernel: unmasked max (pad
    columns quantize to zero scores, a valid upper bound), post-exp
    broadcast multiply mask, 1/l after PV.
    """
    tk = k8_ref.shape[1]
    s_i32 = jax.lax.dot_general(
        q8_ref[0], k8_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [block_q, Tk]
    s = (
        s_i32.astype(jnp.float32)
        * qs_ref[0]           # [block_q, 1] per-q-row scale
        * ks_ref[0]           # [1, Tk] per-k-position scale
    )
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    if kv_len < tk:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
        p = p * (col < kv_len).astype(p.dtype)
    l = jnp.sum(p, axis=1, keepdims=True)
    pv = p * vs_ref[0]        # fold V's per-position scales, [block_q, Tk]
    mp = jnp.max(pv, axis=1, keepdims=True)
    sp = jnp.where(mp > 0, mp / 127.0, 1.0)
    p8 = jnp.round(pv / sp).astype(jnp.int8)  # values 0..127
    o_i32 = jax.lax.dot(
        p8, v8_ref[0], preferred_element_type=jnp.int32
    )  # [block_q, D]
    o_ref[0] = ((o_i32.astype(jnp.float32) * sp) / l).astype(o_ref.dtype)


def _quantize_rows_i8(x: jnp.ndarray):
    """Symmetric per-row int8 over the last axis: x ≈ x8 * scale[..., None]."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    x8 = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return x8, scale


@functools.partial(
    jax.jit, static_argnames=("kv_len", "block_q", "interpret")
)
def flash_attention_fullkv_q8(
    q: jnp.ndarray,  # [B, H, Tq, D] (pre-scaled), Tq % block_q == 0
    k: jnp.ndarray,  # [B, H, Tk, D], Tk % 128 == 0
    v: jnp.ndarray,
    kv_len: Optional[int] = None,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8-dot full-KV attention (non-causal; encoder path).

    Dynamically quantizes q/k/v per row (cheap VPU work fused into the
    surrounding program by XLA) and runs _fullkv_q8_kernel. Output
    differs from the bf16 kernel only by 8-bit rounding of q/k/v rows
    and probability rows (~1e-2 relative; the encoder's LayerNorms keep
    activations well-conditioned for symmetric quant)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    assert tq % block_q == 0, (tq, block_q)
    kv_len = tk if kv_len is None else kv_len
    q8, qs = _quantize_rows_i8(q)
    k8, ks = _quantize_rows_i8(k)
    v8, vs = _quantize_rows_i8(v)
    qf = q8.reshape(b * h, tq, d)
    qsf = qs.reshape(b * h, tq, 1)
    kf = k8.reshape(b * h, tk, d)
    ksf = ks.reshape(b * h, 1, tk)  # transposed broadcast layout
    vf = v8.reshape(b * h, tk, d)
    vsf = vs.reshape(b * h, 1, tk)
    kernel = functools.partial(_fullkv_q8_kernel, kv_len=kv_len)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, tk, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, 1, tk), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, 1, tk), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * d,
            bytes_accessed=qf.size + kf.size + vf.size
            + (qsf.size + ksf.size + vsf.size) * 4
            + 2 * b * h * tq * d * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )(qf, qsf, kf, ksf, vf, vsf)
    # ks/vs arrive transposed ([B*H, 1, Tk]) so the kernel broadcasts
    # them across score rows without a VMEM transpose.
    return out.reshape(b, h, tq, d)


def attn_q8_enabled() -> bool:
    """SPITTLE_ATTN_Q8=1 routes non-causal encoder-scale attention
    through the int8-dot full-KV kernel (trace-time env, like
    SPITTLE_PACKED_ATTENTION). Opt-in: changes encoder numerics by 8-bit
    rounding, and Mosaic int8-dot support must be validated on hardware
    first (scripts/tpu_checks.py covers it)."""
    import os

    return os.environ.get("SPITTLE_ATTN_Q8", "0") == "1"


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "causal", "kv_len", "block_q", "interpret"),
)
def flash_attention_fullkv_packed(
    q: jnp.ndarray,  # [B, T, H*D] packed heads (raw projection layout)
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_head: int,
    causal: bool = False,
    kv_len: Optional[int] = None,
    block_q: int = 512,
    interpret: bool = False,  # CPU numerics tests (no TPU in CI)
) -> jnp.ndarray:
    """Full-KV attention over PACKED heads: q/k/v stay [B, T, H*D].

    The [B, T, H*D] -> [B, H, T, D] head split is pure data movement, but
    a Pallas custom call pins its operands' physical layout, so feeding
    the split tensors materializes three transposed copies (and the merge
    a fourth) — ~4 x 184 MB of HBM round-trips per layer at the headline
    shape (turbo batch 48). Here the head slice happens in the BlockSpec
    index map instead: program (b, h, qi) reads block [1, block_q, D] at
    column offset h*D straight out of the projection output, and writes
    its output block to the same packed layout the wo matmul consumes.
    Zero transposes touch HBM.

    Grid order (B, H, num_q) iterates qi fastest, so consecutive programs
    reuse the same resident K/V block (Pallas skips the re-DMA when the
    block index is unchanged)."""
    b, tq, hd = q.shape
    d = hd // n_head
    tk = k.shape[1]
    assert tq % block_q == 0, (tq, block_q)
    kv_len = tk if kv_len is None else kv_len
    kernel = functools.partial(
        _fullkv_kernel, kv_len=kv_len, causal=causal, block_q=block_q,
        q_axis=2,  # grid is (b, h, qi)
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_head, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bb, h, qi: (bb, qi, h)),
            pl.BlockSpec((1, tk, d), lambda bb, h, qi: (bb, 0, h)),
            pl.BlockSpec((1, tk, d), lambda bb, h, qi: (bb, 0, h)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda bb, h, qi: (bb, qi, h)
        ),
        out_shape=jax.ShapeDtypeStruct((b, tq, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_head * tq * tk * d,
            bytes_accessed=(q.size * 2 + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * n_head * tq * tk,
        ),
        interpret=interpret,
    )(q, k, v)


def _fullkv_pair_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int,
                        causal: bool, block_q: int, d: int):
    """Two heads per program: blocks are 2*d = 128 lanes wide (aligned to
    Mosaic's lane tiling, unlike the one-head variant's interior 64-wide
    DMA), and the head split happens on VMEM-resident data instead.
    Static two-iteration unroll; each head runs the same lean softmax as
    _fullkv_kernel."""
    tk = k_ref.shape[1]
    for i in range(2):
        sl = slice(i * d, (i + 1) * d)
        s = jax.lax.dot_general(
            q_ref[0, :, sl], k_ref[0, :, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, Tk]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        if causal:
            qi = pl.program_id(2)  # grid (b, h_pairs, num_q)
            row = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, p.shape, 0
            )
            col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
            keep = (row >= col) & (col < kv_len)
            p = p * keep.astype(p.dtype)
        elif kv_len < tk:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
            p = p * (col < kv_len).astype(p.dtype)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0, :, sl],
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "causal", "kv_len", "block_q", "interpret"),
)
def flash_attention_fullkv_packed_pair(
    q: jnp.ndarray,  # [B, T, H*D] packed heads (raw projection layout)
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_head: int,
    causal: bool = False,
    kv_len: Optional[int] = None,
    block_q: int = 512,
    interpret: bool = False,  # CPU numerics tests (no TPU in CI)
) -> jnp.ndarray:
    """Packed-heads full-KV attention with 128-lane-ALIGNED blocks.

    Same zero-HBM-transpose goal as flash_attention_fullkv_packed, but
    each block spans a PAIR of d=64 heads (2*64 = 128 lanes, so every
    DMA offset/width is lane-tile aligned); the kernel splits the pair
    on-chip. n_head must be even (every Whisper config is: 6/8/12/16/20).
    Dispatch via SPITTLE_PACKED_ATTENTION=pair."""
    b, tq, hd = q.shape
    d = hd // n_head
    assert n_head % 2 == 0, n_head
    tk = k.shape[1]
    assert tq % block_q == 0, (tq, block_q)
    kv_len = tk if kv_len is None else kv_len
    kernel = functools.partial(
        _fullkv_pair_kernel, kv_len=kv_len, causal=causal,
        block_q=block_q, d=d,
    )
    w = 2 * d
    return pl.pallas_call(
        kernel,
        grid=(b, n_head // 2, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, w), lambda bb, hp, qi: (bb, qi, hp)),
            pl.BlockSpec((1, tk, w), lambda bb, hp, qi: (bb, 0, hp)),
            pl.BlockSpec((1, tk, w), lambda bb, hp, qi: (bb, 0, hp)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, w), lambda bb, hp, qi: (bb, qi, hp)
        ),
        out_shape=jax.ShapeDtypeStruct((b, tq, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_head * tq * tk * d,
            bytes_accessed=(q.size * 2 + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * n_head * tq * tk,
        ),
        interpret=interpret,
    )(q, k, v)


def multihead_attention_packed(
    q: jnp.ndarray,  # [B, T, H*D] packed heads, q/k pre-scaled
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_head: int,
    causal: bool = False,
    kv_len: Optional[int] = None,
) -> jnp.ndarray:
    """Packed-heads dispatch: fullkv Pallas kernel on TPU without ever
    splitting heads in HBM; falls back to split + multihead_attention
    elsewhere. Returns [B, T, H*D]."""
    b, tq, hd = q.shape
    d = hd // n_head
    tk = k.shape[1]
    mode = packed_attention_mode()
    if (
        mode not in ("1", "pair")
        or (mode == "pair" and (n_head % 2 or d != 64))
        or DISABLE_PALLAS
        or not _on_tpu()
        or d not in (64, 128)
        or tq < 128
        or tk > _FULLKV_MAX_KV
    ):
        def split(x):
            return x.reshape(b, -1, n_head, d).transpose(0, 2, 1, 3)

        o = multihead_attention(
            split(q), split(k), split(v), causal=causal, kv_len=kv_len
        )
        return o.transpose(0, 2, 1, 3).reshape(b, tq, hd)

    real_kv = kv_len if kv_len is not None else tk
    if tq % 768 == 0 or tq > 1024:
        block_q = 768
    elif tq >= 512:
        block_q = 512
    else:
        block_q = 128
    pq = (-tq) % block_q
    pk = (-tk) % 128
    if pq:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0)))
    if pk:
        k = jnp.pad(k, ((0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0)))
    fn = (
        flash_attention_fullkv_packed_pair
        if mode == "pair"
        else flash_attention_fullkv_packed
    )
    out = fn(q, k, v, n_head, causal=causal, kv_len=real_kv, block_q=block_q)
    return out[:, :tq]


def packed_attention_mode() -> str:
    """SPITTLE_PACKED_ATTENTION: '0' (off, default), '1' (one-head
    64-wide blocks), or 'pair' (128-lane-aligned head-pair blocks).

    Opt-in until validated on hardware: the one-head BlockSpec slices
    D=64-wide blocks at column offset h*64 inside the [B, T, H*D] minor
    dimension; Mosaic's lane tiling is 128-wide, and interpret-mode
    tests (the only runs so far — the kernel landed during a TPU tunnel
    outage) cannot catch a tiling-alignment rejection. Default OFF so
    the production encoder path cannot hit an unvalidated Mosaic
    lowering; flip after an on-TPU compile + in-loop A/B of both
    variants."""
    import os

    return os.environ.get("SPITTLE_PACKED_ATTENTION", "0")


def _decode_cross_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int):
    """Decode-time cross attention: tiny q (<=8 rows) vs the full K/V.

    One program per (batch*head): streams that head's whole K and V from
    HBM exactly once — the decode step's dominant traffic — and does the
    [rows, Tk] softmax on a sublane-high tile instead of a 128-row block
    (the fullkv kernel's block_q padding would multiply VPU exp work by
    16x for a single-token query). K/V arrive in the decode layout
    [D, Tk] (time minor), so the QK dot is a plain [rows,D]@[D,Tk] and
    the PV dot contracts the minor axis of both operands."""
    tk = k_ref.shape[2]
    s = jax.lax.dot(
        q_ref[0], k_ref[0], preferred_element_type=jnp.float32
    )  # [rows, Tk]
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    if kv_len < tk:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
        p = p * (col < kv_len).astype(p.dtype)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [rows, D]
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_len",))
def decode_cross_attention(
    q: jnp.ndarray,  # [B, H, R, D], R <= 8 (decode/verify block)
    k: jnp.ndarray,  # [B, H, D, Tk] decode layout, Tk % 128 == 0 (pre-padded)
    v: jnp.ndarray,
    kv_len: Optional[int] = None,
) -> jnp.ndarray:
    b, h, r, d = q.shape
    tk = k.shape[3]
    kv_len = tk if kv_len is None else kv_len
    rows = 8
    qp = q if r == rows else jnp.pad(q, ((0, 0), (0, 0), (0, rows - r), (0, 0)))
    qf = qp.reshape(b * h, rows, d)
    kf = k.reshape(b * h, d, tk)
    vf = v.reshape(b * h, d, tk)
    out = pl.pallas_call(
        functools.partial(_decode_cross_kernel, kv_len=kv_len),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, d, tk), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, d, tk), lambda bh: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, d), lambda bh: (bh, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, rows, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * rows * tk * d,
            bytes_accessed=(kf.size + vf.size) * k.dtype.itemsize,
            transcendentals=b * h * rows * tk,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, rows, d)[:, :, :r]


def _decode_cross_q8_kernel(q_ref, qk_ref, ks_ref, qv_ref, vs_ref, o_ref,
                            *, kv_len: int):
    """int8 cross-attention with IN-KERNEL dequantization.

    The XLA int8 path (quant_kv) measured speed-neutral: the int8->bf16
    convert does not fuse into the dot, so XLA materializes converted
    copies and the halved HBM read is paid back as write-and-reread traffic.
    Here the int8 K/V tiles land in VMEM (HALF the HBM bytes of bf16 —
    the decode step's dominant traffic) and the convert happens on-chip.

    Scale algebra (ops/quant.py quantize_kv): K ≈ qK * ks[t], V ≈ qV *
    vs[t], so scores = (q @ qK) * ks and out = (p * vs) @ qV^T — the
    scales factor out of both dots exactly; only [1, Tk] rescales remain.
    """
    tk = qk_ref.shape[2]
    s = jax.lax.dot(
        q_ref[0], qk_ref[0].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * ks_ref[0]  # [rows, Tk] * [1, Tk]
    if kv_len < tk:
        # Mask BEFORE the max: quantized pad columns carry scales, so a
        # post-exp multiply-mask (the bf16 kernel's zero-pad shortcut)
        # would let garbage dominate m and underflow every real column.
        # The tile is only [rows<=8, Tk]; the extra where is free next
        # to the K/V stream this kernel exists to halve.
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        (p * vs_ref[0]).astype(jnp.bfloat16), qv_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [rows, D]
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_len", "interpret"))
def decode_cross_attention_q8(
    q: jnp.ndarray,   # [B, H, R, D] (pre-scaled by dh**-0.5), R <= 8
    qk: jnp.ndarray,  # int8 [B, H, D, Tk] decode layout, Tk % 128 == 0
    ks: jnp.ndarray,  # f32 [B, H, Tk] per-position K scales
    qv: jnp.ndarray,
    vs: jnp.ndarray,
    kv_len: Optional[int] = None,
    interpret: bool = False,  # CPU numerics tests (no TPU in CI)
) -> jnp.ndarray:
    b, h, r, d = q.shape
    tk = qk.shape[3]
    kv_len = tk if kv_len is None else kv_len
    rows = 8
    qp = q if r == rows else jnp.pad(q, ((0, 0), (0, 0), (0, rows - r), (0, 0)))
    qf = qp.reshape(b * h, rows, d)
    kf = qk.reshape(b * h, d, tk)
    vf = qv.reshape(b * h, d, tk)
    ksf = ks.reshape(b * h, 1, tk).astype(jnp.float32)
    vsf = vs.reshape(b * h, 1, tk).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_decode_cross_q8_kernel, kv_len=kv_len),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, d, tk), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, 1, tk), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, d, tk), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, 1, tk), lambda bh: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, d), lambda bh: (bh, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, rows, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * rows * tk * d,
            bytes_accessed=kf.size + vf.size + (ksf.size + vsf.size) * 4,
            transcendentals=b * h * rows * tk,
        ),
        interpret=interpret,
    )(qf, kf, ksf, vf, vsf)
    return out.reshape(b, h, rows, d)[:, :, :r]


def _decode_cross_q4_kernel(q_ref, qk_ref, ks_ref, qv_ref, vs_ref, o_ref,
                            *, kv_len: int):
    """int4 cross-attention with IN-KERNEL unpack + dequantization.

    Same structure as _decode_cross_q8_kernel but K/V stream from HBM at
    a QUARTER of the bf16 bytes: two int4 values per byte, packed along
    the head dim's halves (ops/quant.py quantize_kv_int4), unpacked here
    by shifts + one sublane concatenate on VMEM-resident data. At
    large-v3 scale this cuts the decode step's dominant stream from
    ~245 MB/row (bf16) to ~61 MB/row.
    """
    tk = qk_ref.shape[2]

    def unpack(p):  # int8 [Dh/2, Tk] -> bf16 [Dh, Tk], values -7..7
        x = p.astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(x, 28), 28)
        hi = jnp.right_shift(jnp.left_shift(x, 24), 28)
        return jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)

    s = jax.lax.dot(
        q_ref[0], unpack(qk_ref[0]),
        preferred_element_type=jnp.float32,
    ) * ks_ref[0]  # [rows, Tk] * [1, Tk]
    if kv_len < tk:
        # Mask BEFORE the max (see _decode_cross_q8_kernel: quantized pad
        # columns carry nonzero scales).
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        (p * vs_ref[0]).astype(jnp.bfloat16), unpack(qv_ref[0]),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [rows, D]
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_len", "interpret"))
def decode_cross_attention_q4(
    q: jnp.ndarray,   # [B, H, R, D] (pre-scaled by dh**-0.5), R <= 8
    qk: jnp.ndarray,  # int8-packed int4 [B, H, D/2, Tk], Tk % 128 == 0
    ks: jnp.ndarray,  # f32 [B, H, Tk] per-position K scales
    qv: jnp.ndarray,
    vs: jnp.ndarray,
    kv_len: Optional[int] = None,
    interpret: bool = False,  # CPU numerics tests (no TPU in CI)
) -> jnp.ndarray:
    b, h, r, d = q.shape
    tk = qk.shape[3]
    kv_len = tk if kv_len is None else kv_len
    rows = 8
    qp = q if r == rows else jnp.pad(q, ((0, 0), (0, 0), (0, rows - r), (0, 0)))
    qf = qp.reshape(b * h, rows, d)
    kf = qk.reshape(b * h, d // 2, tk)
    vf = qv.reshape(b * h, d // 2, tk)
    ksf = ks.reshape(b * h, 1, tk).astype(jnp.float32)
    vsf = vs.reshape(b * h, 1, tk).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_decode_cross_q4_kernel, kv_len=kv_len),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, d // 2, tk), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, 1, tk), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, d // 2, tk), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, 1, tk), lambda bh: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, d), lambda bh: (bh, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, rows, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * rows * tk * d,
            bytes_accessed=kf.size + vf.size + (ksf.size + vsf.size) * 4,
            transcendentals=b * h * rows * tk,
        ),
        interpret=interpret,
    )(qf, kf, ksf, vf, vsf)
    return out.reshape(b, h, rows, d)[:, :, :r]


def use_decode_cross_kernel_q4(q, ck) -> bool:
    """Dispatch predicate for the int4 decode cross-attention kernel:
    int4-packed K/V dict in decode layout, tile-padded T, decode-sized q."""
    return (
        decode_cross_kernel_enabled()
        and not DISABLE_PALLAS
        and _on_tpu()
        and isinstance(ck, dict)
        and "qw4" in ck
        and q.shape[2] <= 8
        and q.shape[3] in (64, 128)
        and ck["qw4"].shape[-1] % 128 == 0
    )


def use_decode_cross_kernel_q8(q, ck) -> bool:
    """Dispatch predicate for the int8 decode cross-attention kernel:
    quantized K/V dict in decode layout, tile-padded T, decode-sized q."""
    return (
        decode_cross_kernel_enabled()
        and not DISABLE_PALLAS
        and _on_tpu()
        and isinstance(ck, dict)
        and "qw" in ck
        and q.shape[2] <= 8
        and q.shape[3] in (64, 128)
        and ck["qw"].shape[-1] % 128 == 0
    )


def decode_cross_kernel_enabled() -> bool:
    """Experimental opt-in (SPITTLE_DECODE_CROSS_KERNEL=1).

    Measured on v5e: the kernel is correct and reads K/V once at ~same
    isolated speed as the XLA einsum (≈1 ms/layer at B16 H20 T1536), but
    inside the full decode loop it REGRESSED the headline (928 -> 776x) —
    the custom call breaks XLA's overlap of cross-attention DMA with
    adjacent compute. Kept for future tuning; off by default.
    """
    import os

    return os.environ.get("SPITTLE_DECODE_CROSS_KERNEL", "0") == "1"


def use_decode_cross_kernel(q, k) -> bool:
    """Dispatch predicate for decode_cross_attention.

    k is in the decode layout [B, H, Dh, T] (time minor)."""
    return (
        decode_cross_kernel_enabled()
        and not DISABLE_PALLAS
        and _on_tpu()
        and not isinstance(k, dict)
        and q.shape[2] <= 8
        and q.shape[3] in (64, 128)
        and k.shape[3] % 128 == 0
    )


def pad_cross_kv(cross_kv, multiple: int = 128):
    """Pad precomputed cross K/V ([L, B, H, Dh, T] each, time minor)
    along T to a tile multiple so decode steps can use the Pallas
    cross-attention kernel. Callers mask with the real kv_len
    (= n_audio_ctx). No-op unless the kernel is enabled (see
    decode_cross_kernel_enabled)."""
    if not decode_cross_kernel_enabled():
        return cross_kv
    k, v = cross_kv
    if isinstance(k, dict):  # int8/int4/w8a8 dicts {qw|qw4|qw8 [...], scale}
        key = "qw4" if "qw4" in k else "qw8" if "qw8" in k else "qw"
        t = k[key].shape[-1]
        pad = (-t) % multiple
        if pad == 0:
            return cross_kv

        def _padq(q):
            qw = jnp.pad(q[key], [(0, 0)] * (q[key].ndim - 1) + [(0, pad)])
            sc = jnp.pad(
                q["scale"], [(0, 0)] * (q["scale"].ndim - 1) + [(0, pad)],
                constant_values=1.0,  # avoid 0-scales; masked by kv_len
            )
            return {key: qw, "scale": sc}

        return _padq(k), _padq(v)
    t = k.shape[-1]
    pad = (-t) % multiple
    if pad == 0:
        return cross_kv
    widths = [(0, 0)] * (k.ndim - 1) + [(0, pad)]
    return jnp.pad(k, widths), jnp.pad(v, widths)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# Kernel selection, measured on v5e (batch 16 x 20 heads x 1536 x 64,
# bf16, per layer):
#   full-KV Pallas (block_q=768, lean softmax):  4.2 ms   <- default on TPU
#   full-KV Pallas (block_q=512, masked softmax): 6.2 ms  (earlier version)
#   XLA fused attention:                         10.6 ms
#   tiled online-softmax flash:                  28.7 ms  (kept for kv > VMEM)
# The full-KV kernel holds the entire K/V in VMEM (encoder scale: 1536 x 64
# = 384 KB bf16) so each grid program is three large MXU/VPU ops; the
# softmax touches the [block_q, Tk] scores a minimal number of times
# (unmasked max, broadcast-multiply padding mask, post-PV normalization).
import os

DISABLE_PALLAS = os.environ.get("SPITTLE_DISABLE_PALLAS", "0") == "1"
# Max kv elements per head we allow resident in VMEM (bf16): 1 MB of K +
# 1 MB of V + f32 scores for a 512-row q block stays well under 16 MB.
_FULLKV_MAX_KV = 4096


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    kv_len: Optional[int] = None,
) -> jnp.ndarray:
    """Dispatch: full-KV Pallas kernel on TPU (encoder-scale kv), tiled
    flash for longer kv, XLA elsewhere. Inputs [B, H, T, D]; pads T up to
    tile multiples as needed."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if DISABLE_PALLAS or not _on_tpu() or d not in (64, 128) or tq < 128:
        return attention_reference(q, k, v, causal=causal, kv_len=kv_len)

    real_kv = kv_len if kv_len is not None else tk
    if tk <= _FULLKV_MAX_KV:
        # Swept on v5e at encoder shape: 768 ≈ 1536 > 512 > 256 > 128.
        if tq % 768 == 0 or tq > 1024:
            block_q = 768
        elif tq >= 512:
            block_q = 512
        else:
            block_q = 128
        pq = (-tq) % block_q
        pk = (-tk) % 128  # keep kv tiles lane/sublane aligned
        if pq:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
        if pk:
            k = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
        if not causal and attn_q8_enabled():
            out = flash_attention_fullkv_q8(
                q, k, v, kv_len=real_kv, block_q=block_q
            )
            return out[:, :, :tq]
        # Pipe kernel gate: its double scratch is 2 * block_q * tk f32;
        # cap it at ~12.6 MB (block_q=768 x tk=2048) so the opt-in flag
        # can't turn longer-kv shapes the serial kernel handles into
        # Mosaic VMEM compile failures.
        if (
            not causal
            and attn_pipe_enabled()
            and block_q * k.shape[2] <= 768 * 2048
        ):
            out = flash_attention_fullkv_pipe(
                q, k, v, kv_len=real_kv, block_q=block_q
            )
            return out[:, :, :tq]
        out = flash_attention_fullkv(
            q, k, v, causal=causal, kv_len=real_kv, block_q=block_q
        )
        return out[:, :, :tq]

    pq = (-tq) % DEFAULT_BLOCK_Q
    pk = (-tk) % DEFAULT_BLOCK_K
    if pq or pk:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
    out = flash_attention(q, k, v, causal=causal, kv_len=real_kv)
    return out[:, :, :tq]
