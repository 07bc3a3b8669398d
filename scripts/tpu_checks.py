#!/usr/bin/env python
"""On-chip kernel verification: run on the real TPU before trusting perf.

CPU tests can't execute Pallas kernels (the dispatch falls back to XLA
there; interpret-mode covers numerics but not Mosaic lowering), so this
script validates every kernel against the XLA reference on the actual
device: full-KV attention (ragged kv, causal), the packed-heads
variants (one-head and lane-aligned pair), the tiled flash fallback,
the decode cross-attention kernel, its int8/int4 in-kernel-dequant
variants, and the W8A8 int8 GEMM. Each check is isolated — a compile
rejection (e.g. Mosaic lane alignment on the packed one-head variant)
is recorded as a failure without aborting the rest. Exits non-zero on
any failure. Usage: python scripts/tpu_checks.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SPITTLE_JAX_CACHE", "/tmp/spittle_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> int:
    from spittle_tpu.ops.attention import (
        attention_reference,
        decode_cross_attention,
        decode_cross_attention_q4,
        decode_cross_attention_q8,
        flash_attention,
        flash_attention_fullkv,
        flash_attention_fullkv_packed,
        flash_attention_fullkv_packed_pair,
        multihead_attention,
    )
    from spittle_tpu.ops.quant import (
        dequantize_kv,
        dequantize_kv_int4,
        mm,
        quantize_kv,
        quantize_kv_int4,
        quantize_weight_w8a8,
    )

    if jax.devices()[0].platform != "tpu":
        print(json.dumps({"skip": "not on tpu"}))
        return 0

    rng = np.random.default_rng(0)
    failures = []

    def check(name, fn, want_fn, atol):
        """Run fn/want_fn lazily so a Mosaic compile rejection in one
        kernel is recorded without killing the remaining checks."""
        try:
            got = np.asarray(fn(), np.float32)
            want = np.asarray(want_fn(), np.float32)
            diff = float(np.max(np.abs(got - want)))
            ok = diff <= atol
            print(json.dumps({"check": name, "max_diff": diff,
                              "atol": atol, "ok": ok}), flush=True)
        except Exception as e:  # compile/lowering rejection
            ok = False
            print(json.dumps({"check": name, "error":
                              f"{type(e).__name__}: {e}"[:300]}), flush=True)
        if not ok:
            failures.append(name)

    def mk(b, h, t, d, scale=0.3):
        return jnp.asarray(rng.standard_normal((b, h, t, d)),
                           jnp.bfloat16) * scale

    # full-KV kernel: encoder shape, ragged kv
    q, k, v = mk(4, 8, 1536, 64), mk(4, 8, 1536, 64), mk(4, 8, 1536, 64, 1.0)
    check("fullkv_ragged",
          lambda: flash_attention_fullkv(q, k, v, kv_len=1500, block_q=768),
          lambda: attention_reference(q, k, v, kv_len=1500), 4e-3)

    # packed-heads variants: [B, T, H*D] in and out, zero HBM transposes
    def pack(x):  # [B, H, T, D] -> [B, T, H*D]
        b_, h_, t_, d_ = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b_, t_, h_ * d_)

    want_packed = pack(attention_reference(q, k, v, kv_len=1500))
    qp, kp, vp = pack(q), pack(k), pack(v)
    check("fullkv_packed_onehead",
          lambda: flash_attention_fullkv_packed(
              qp, kp, vp, n_head=8, kv_len=1500, block_q=768),
          lambda: want_packed, 4e-3)
    check("fullkv_packed_pair",
          lambda: flash_attention_fullkv_packed_pair(
              qp, kp, vp, n_head=8, kv_len=1500, block_q=768),
          lambda: want_packed, 4e-3)

    # int8-dot full-KV kernel (encoder compute play: both dots on the
    # MXU's int8 mode; validates Mosaic int8 dot_general support).
    from spittle_tpu.ops.attention import flash_attention_fullkv_q8

    check("fullkv_q8",
          lambda: flash_attention_fullkv_q8(
              q, k, v, kv_len=1500, block_q=768),
          lambda: attention_reference(q, k, v, kv_len=1500), 3e-2)

    # Software-pipelined full-KV kernel (double-scratch stage overlap;
    # validates the flattened-grid per-operand index maps on Mosaic).
    from spittle_tpu.ops.attention import flash_attention_fullkv_pipe

    check("fullkv_pipe",
          lambda: flash_attention_fullkv_pipe(
              q, k, v, kv_len=1500, block_q=768),
          lambda: attention_reference(q, k, v, kv_len=1500), 4e-3)

    # causal (decoder teacher-forced shape)
    q2, k2, v2 = mk(2, 4, 512, 64), mk(2, 4, 512, 64), mk(2, 4, 512, 64, 1.0)
    check("fullkv_causal",
          lambda: multihead_attention(q2, k2, v2, causal=True, kv_len=500),
          lambda: attention_reference(q2, k2, v2, causal=True, kv_len=500),
          2e-2)

    # tiled flash (kv > VMEM threshold path)
    q3, k3, v3 = mk(1, 2, 512, 64), mk(1, 2, 5120, 64), mk(1, 2, 5120, 64, 1.0)
    check("tiled_flash",
          lambda: flash_attention(q3, k3, v3, kv_len=5000),
          lambda: attention_reference(q3, k3, v3, kv_len=5000), 4e-3)

    # decode cross-attention kernel: K/V in the decode layout
    # [B, H, D, Tk] (time minor, models/whisper/model.py header);
    # reference runs on the standard [B, H, Tk, D] layout.
    k4s, v4s = mk(4, 8, 1536, 64), mk(4, 8, 1536, 64, 1.0)  # [B,H,T,D]
    k4 = k4s.transpose(0, 1, 3, 2)  # [B, H, D, T]
    v4 = v4s.transpose(0, 1, 3, 2)
    for r in (1, 4):
        q4 = mk(4, 8, r, 64, 0.12)
        check(f"decode_cross_q{r}",
              lambda q4=q4: decode_cross_attention(q4, k4, v4, kv_len=1500),
              lambda q4=q4: attention_reference(q4, k4s, v4s, kv_len=1500),
              4e-3)

    # int8/int4 in-kernel-dequant decode cross-attention: the reference
    # attends over the DEQUANTIZED tensors so the check isolates kernel
    # numerics from quantization error.
    qk8, qv8 = quantize_kv(k4), quantize_kv(v4)
    dk8 = dequantize_kv(qk8).transpose(0, 1, 3, 2)  # back to [B,H,T,D]
    dv8 = dequantize_kv(qv8).transpose(0, 1, 3, 2)
    qd = mk(4, 8, 1, 64, 0.12)
    check("decode_cross_int8_dequant",
          lambda: decode_cross_attention_q8(
              qd, qk8["qw"], qk8["scale"], qv8["qw"], qv8["scale"],
              kv_len=1500),
          lambda: attention_reference(qd, dk8, dv8, kv_len=1500), 4e-3)

    qk4, qv4 = quantize_kv_int4(k4), quantize_kv_int4(v4)
    dk4 = dequantize_kv_int4(qk4).transpose(0, 1, 3, 2)
    dv4 = dequantize_kv_int4(qv4).transpose(0, 1, 3, 2)
    check("decode_cross_int4_dequant",
          lambda: decode_cross_attention_q4(
              qd, qk4["qw4"], qk4["scale"], qv4["qw4"], qv4["scale"],
              kv_len=1500),
          lambda: attention_reference(qd, dk4, dv4, kv_len=1500), 4e-3)

    # W8A8 int8 GEMM (encoder quantization): reference is the f32 matmul
    # against the dequantized weight; tolerance covers the dynamic
    # per-row activation quantization error (|x| <= ~4 after the 0.3
    # scale, 127 levels).
    x8 = jnp.asarray(rng.standard_normal((256, 1280)), jnp.bfloat16) * 0.3
    w8 = jnp.asarray(rng.standard_normal((1280, 1280)), jnp.float32) * 0.02
    qw8 = quantize_weight_w8a8(w8)  # {"qw8" int8 [K,N], "scale" [N]}
    wdq = np.asarray(qw8["qw8"], np.float32) * np.asarray(qw8["scale"],
                                                          np.float32)
    check("w8a8_gemm",
          lambda: mm(x8, qw8),
          lambda: np.asarray(x8, np.float32) @ wdq, 0.05)

    # Fused W8A8 Pallas kernel (quantize->int8 dot->dequant in one
    # pass, ops/w8a8_gemm.py): must lower through Mosaic AND match the
    # XLA W8A8 path (same algebra, so tolerance is f32 noise + bf16
    # output rounding). Also the epilogue-folded bias+gelu form.
    from spittle_tpu.ops.w8a8_gemm import w8a8_gemm

    xf = jnp.asarray(rng.standard_normal((1536, 1280)), jnp.bfloat16) * 0.3
    check("w8a8_fused_kernel",
          lambda: w8a8_gemm(xf, qw8["qw8"], qw8["scale"]),
          lambda: mm(xf, qw8), 0.05)
    b8 = jnp.asarray(rng.standard_normal(1280), jnp.float32) * 0.02
    check("w8a8_fused_bias_gelu",
          lambda: w8a8_gemm(xf, qw8["qw8"], qw8["scale"], bias=b8,
                            act="gelu", out_scale=0.5),
          lambda: jax.nn.gelu((mm(xf, qw8) + b8) * 0.5,
                              approximate=False), 0.05)
    # fc2 shape (K=5120): the largest VMEM-resident weight the gate
    # admits.
    wbig = jnp.asarray(
        rng.standard_normal((5120, 1280)), jnp.float32) * 0.02
    qbig = quantize_weight_w8a8(wbig)
    xbig = jnp.asarray(rng.standard_normal((1536, 5120)),
                       jnp.bfloat16) * 0.3
    check("w8a8_fused_fc2_shape",
          lambda: w8a8_gemm(xbig, qbig["qw8"], qbig["scale"]),
          lambda: mm(xbig, qbig), 0.05)

    print(json.dumps({"result": "FAIL" if failures else "PASS",
                      "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
