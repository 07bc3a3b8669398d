"""Micro-bench: decode-time cross-attention variants at large-v3 shape.

Per decode step, large-v3 reads 32 layers x [B,H,Dh,T] K+V — the
dominant HBM traffic (245 MB/row bf16). This sweeps one layer's
cross-attention (B16 H20 Dh64 T1536, rows=1) across:

  xla-bf16      the production einsum path (model.py _cross_attention)
  pallas-bf16   decode_cross_attention (one program per batch*head)
  xla-int8      quant_kv einsum path (convert materializes; neutral)
  pallas-int8   decode_cross_attention_q8 (in-kernel dequant)
  pallas-int8-mh  multi-head-block variant: one program per batch item,
                  heads looped in-kernel -> 20x bigger DMA blocks

Each timing is a host fetch of a reduction (block_until_ready is not a
barrier on the tunneled backend). Prints one JSON line per variant.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/spittle_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spittle_tpu.ops.attention import (  # noqa: E402
    decode_cross_attention,
    decode_cross_attention_q8,
    _NEG_INF,
)
from spittle_tpu.ops.quant import quantize_kv  # noqa: E402

B, H, DH, T = 16, 20, 64, 1536
ROWS = 1
N_ITER = 30


def _mh_q8_kernel(q_ref, qk_ref, ks_ref, qv_ref, vs_ref, o_ref,
                  *, kv_len: int, h: int):
    """All heads of one batch item per program: K/V blocks are
    [H*Dh, T] (1.9 MB int8 at large-v3 shape) so each DMA is 20x the
    per-head kernel's, amortizing transfer latency."""
    tk = qk_ref.shape[2]
    for hi in range(h):
        sl = slice(hi * DH, (hi + 1) * DH)
        s = jax.lax.dot(
            q_ref[0, hi], qk_ref[0, sl].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) * ks_ref[0, hi:hi + 1]
        if kv_len < tk:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            (p * vs_ref[0, hi:hi + 1]).astype(jnp.bfloat16),
            qv_ref[0, sl].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, hi] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_len",))
def mh_q8(q, qk, ks, qv, vs, kv_len):
    b, h, r, d = q.shape
    tk = qk.shape[3]
    rows = 8
    qp = q if r == rows else jnp.pad(q, ((0, 0), (0, 0), (0, rows - r), (0, 0)))
    kf = qk.reshape(b, h * d, tk)
    vf = qv.reshape(b, h * d, tk)
    out = pl.pallas_call(
        functools.partial(_mh_q8_kernel, kv_len=kv_len, h=h),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, rows, d), lambda bi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, h * d, tk), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, h, tk), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, h * d, tk), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, h, tk), lambda bi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, rows, d), lambda bi: (bi, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, rows, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * rows * tk * d,
            bytes_accessed=kf.size + vf.size,
            transcendentals=b * h * rows * tk,
        ),
    )(qp, kf, ks.astype(jnp.float32), vf, vs.astype(jnp.float32))
    return out[:, :, :r]


@functools.partial(jax.jit, static_argnames=())
def xla_bf16(q, k, v):
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhdk->bhqk", q * (dh**-0.25), k * (dh**-0.25),
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhdk->bhqd", p.astype(v.dtype), v)


@functools.partial(jax.jit, static_argnames=())
def xla_q8(q, qk, ks, qv, vs):
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhdk->bhqk", q * (dh**-0.5), qk.astype(q.dtype),
                   preferred_element_type=jnp.float32) * ks[:, :, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhdk->bhqd",
                      (p * vs[:, :, None, :]).astype(q.dtype),
                      qv.astype(q.dtype))


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jnp.sum(out.astype(jnp.float32)))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(N_ITER):
        out = fn(*args)
    host = float(np.asarray(jnp.sum(out.astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / N_ITER
    return dt, host


def main():
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (B, H, ROWS, DH), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, DH, T), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, DH, T), jnp.bfloat16)
    qk, qv = quantize_kv(k), quantize_kv(v)
    qk = {kk2: jnp.asarray(vv) for kk2, vv in qk.items()}
    bytes_bf16 = 2 * B * H * DH * T * 2
    bytes_int8 = 2 * B * H * DH * T

    dh = DH

    def run(name, fn, *args, nbytes=bytes_bf16):
        dt, _ = timed(fn, *args)
        print(json.dumps({
            "variant": name, "ms": round(dt * 1e3, 3),
            "eff_GBps": round(nbytes / dt / 1e9, 1),
        }), flush=True)

    run("xla-bf16", xla_bf16, q, k, v)
    run("pallas-bf16",
        lambda q_, k_, v_: decode_cross_attention(q_ * (dh**-0.5), k_, v_),
        q, k, v)
    run("xla-int8", xla_q8, q, qk["qw"], qk["scale"], qv["qw"], qv["scale"],
        nbytes=bytes_int8)
    run("pallas-int8",
        lambda *a: decode_cross_attention_q8(a[0] * (dh**-0.5), *a[1:]),
        q, qk["qw"], qk["scale"], qv["qw"], qv["scale"], nbytes=bytes_int8)
    run("pallas-int8-mh",
        lambda *a: mh_q8(a[0] * (dh**-0.5), *a[1:], kv_len=T),
        q, qk["qw"], qk["scale"], qv["qw"], qv["scale"], nbytes=bytes_int8)

    # numeric agreement of the mh variant vs the per-head kernel's oracle
    a = np.asarray(mh_q8(q * (dh**-0.5), qk["qw"], qk["scale"],
                         qv["qw"], qv["scale"], kv_len=T), np.float32)
    b_ = np.asarray(xla_q8(q, qk["qw"], qk["scale"], qv["qw"], qv["scale"]),
                    np.float32)
    print(json.dumps({"mh_vs_xla_q8_maxerr": float(np.max(np.abs(a - b_)))}),
          flush=True)


if __name__ == "__main__":
    main()
