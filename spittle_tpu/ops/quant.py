"""Weight-only int8 quantization for memory-bound decode.

Autoregressive decode reads every decoder weight once per step, so it is
HBM-bandwidth-bound on TPU; storing weights as int8 with per-output-channel
scales halves the bytes (vs bf16) for <0.4% relative matmul error.
Measured caveat (docs/PERFORMANCE.md): on the current chip XLA does NOT
fuse the int8->bf16 convert into the dot's operand read, so the paths
here are memory savers (half-size weights/KV at rest), not speedups —
they ship opt-in, never as defaults.

This is a TPU-native capability the reference gets from whisper.cpp's
GGML quantized kernels (SURVEY.md §2.2: the catalog ships q4/q5/q8 GGML
models; `models/whisper/weights.py` already dequantizes those at load).
Here quantization is an engine-side serving option: load any checkpoint,
quantize the decoder tree once, decode with ~half the weight traffic.

Representation: a quantized weight is a dict {"qw": int8 [in, out],
"scale": f32 [out]} — a pytree, so it flows through jit/scan/sharding
like any other param. `mm` dispatches on type at trace time, so plain
float trees trace to byte-identical programs as before.
"""

from __future__ import annotations

from typing import Any, Dict, Union

import jax
import jax.numpy as jnp

QuantW = Dict[str, jnp.ndarray]
WeightLike = Union[jnp.ndarray, QuantW]


def is_quant(w: Any) -> bool:
    return isinstance(w, dict) and "qw" in w and "scale" in w


def is_quant_w8a8(w: Any) -> bool:
    return isinstance(w, dict) and "qw8" in w and "scale" in w


def quantize_weight(w: jnp.ndarray) -> QuantW:
    """Symmetric per-output-channel int8: w ≈ qw * scale[None, :]."""
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0)  # per out-channel (last axis)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    qw = jnp.clip(jnp.round(w32 / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"qw": qw, "scale": scale}


def dequantize_weight(q: QuantW, dtype=jnp.bfloat16) -> jnp.ndarray:
    qw = q["qw8"] if "qw8" in q else q["qw"]
    return (qw.astype(jnp.float32) * q["scale"][None, :]).astype(dtype)


def quantize_weight_w8a8(w: jnp.ndarray) -> QuantW:
    """Symmetric per-output-channel int8 tagged for the W8A8 compute path.

    Same numbers as quantize_weight, different dict key ("qw8") so `mm`
    dispatches to the int8xint8 MXU dot with dynamic activation
    quantization instead of the weight-only convert-and-dot. Kept as a
    distinct representation because the trade is different: weight-only
    halves weight HBM traffic (memory-bound decode), W8A8 doubles MXU
    throughput (compute-bound encoder) at the cost of ~0.5% activation
    rounding error per matmul.
    """
    q = quantize_weight(w)
    return {"qw8": q["qw"], "scale": q["scale"]}


def _mm_w8a8(x: jnp.ndarray, w: QuantW) -> jnp.ndarray:
    """Dynamically quantize activations per row and run an int8 MXU dot.

    x [..., K] @ qw8 [K, N]: per-row symmetric scales factor out of the
    dot exactly — y = (qx @ qw) * sx[..., None] * sw[None, :]. The int8
    dot runs the MXU in int8 mode (2x the bf16 FLOP rate on v5e-class
    chips); amax/round/clip are cheap VPU work fused around it.

    When SPITTLE_W8A8_KERNEL=1 and the shape qualifies, the whole
    quantize->dot->dequant pipeline runs as ONE fused Pallas kernel
    (ops/w8a8_gemm.py) — the int8 activations never touch HBM.
    """
    from spittle_tpu.ops.w8a8_gemm import maybe_w8a8_gemm

    fused = maybe_w8a8_gemm(x, w)
    if fused is not None:
        return fused
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    qx = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        qx, w["qw8"],
        dimension_numbers=(((qx.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * sx * w["scale"]).astype(x.dtype)


def mm(x: jnp.ndarray, w: WeightLike) -> jnp.ndarray:
    """x @ w for plain or quantized weights.

    Weight-only path: int8 -> x.dtype convert feeding straight into the
    dot (fused by XLA), then a per-column rescale folded into the
    epilogue. W8A8 path ("qw8" key): dynamic activation quant + int8 MXU
    dot (see _mm_w8a8). Plain float trees trace to byte-identical
    programs as before.
    """
    if is_quant_w8a8(w):
        return _mm_w8a8(x, w)
    if not is_quant(w):
        return x @ w
    y = x @ w["qw"].astype(x.dtype)
    return y * w["scale"].astype(x.dtype)


def mm_bias(
    x: jnp.ndarray,
    w: WeightLike,
    bias=None,
    act: str = "none",
    out_scale: float = 1.0,
) -> jnp.ndarray:
    """mm + bias + out-scale + optional exact GELU, with epilogue folding.

    On the fused-W8A8-kernel path the bias add, the attention head-dim
    out-scale, and GELU all run inside the kernel's epilogue — removing
    the separate [M, N] elementwise passes (at the encoder's fc1 output
    that's a ~750 MB/layer HBM round trip at batch 48). Every other path
    computes the same values through the plain ops IN THE SAME ORDER as
    the open-coded `(mm(x, w) + b) * s` / `gelu(...)` forms, so the
    float/weight-only programs trace byte-identically to before.
    """
    if is_quant_w8a8(w):
        from spittle_tpu.ops.w8a8_gemm import maybe_w8a8_gemm

        fused = maybe_w8a8_gemm(x, w, bias=bias, act=act,
                                out_scale=out_scale)
        if fused is not None:
            return fused
    y = mm(x, w)
    if bias is not None:
        y = y + bias
    if out_scale != 1.0:
        y = y * out_scale
    if act == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    return y


def quantize_tree(tree: Any, keys: tuple = (), mode: str = "weight") -> Any:
    """Quantize selected weight leaves of a param tree.

    keys: leaf names to quantize (e.g. ("wq","wk","wv","wo","fc1_w",...)).
    Matching leaves must be 2-D [in, out] or stacked 3-D [L, in, out]
    (per-layer scales are computed independently via vmap).
    mode: "weight" (weight-only int8, memory saver) or "w8a8" (int8 MXU
    compute path; see quantize_weight_w8a8).
    """
    kset = set(keys)
    quant = quantize_weight_w8a8 if mode == "w8a8" else quantize_weight

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for name, child in node.items():
                if name in kset and hasattr(child, "ndim"):
                    if child.ndim == 2:
                        out[name] = quant(child)
                    elif child.ndim == 3:
                        out[name] = jax.vmap(quant)(child)
                    else:
                        out[name] = child
                else:
                    out[name] = walk(child)
            return out
        return node

    return walk(tree)


def quantize_kv(kv: jnp.ndarray) -> QuantW:
    """Per-position symmetric int8 for attention K/V tensors.

    kv: [..., Dh, T] (decode layout: head dim second-minor, time minor —
    see models/whisper/model.py header); one scale per (..., T) key/value
    vector. The scale factors out of both attention dots exactly:
    scores = (q @ qK) * scale[t] and out = (probs * scale[t]) @ qV^T, so
    the int8 tensors feed the MXU directly and only cheap [T]-shaped
    rescales remain.
    """
    kv32 = kv.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kv32), axis=-2)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(kv32 / scale[..., None, :]), -127, 127
    ).astype(jnp.int8)
    return {"qw": q, "scale": scale}


def quantize_kv_t(kv: jnp.ndarray) -> QuantW:
    """quantize_kv for the ctx-major decode layout: kv [..., T, Dh],
    one scale per (..., T) vector (max-abs over the minor Dh axis).
    Numerically identical to quantize_kv on the transposed tensor —
    same scale values, same rounding — so the tmajor decode form stores
    byte-equal quantized columns (tests/test_decode_forms.py)."""
    kv32 = kv.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kv32), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(kv32 / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return {"qw": q, "scale": scale}


def dequantize_kv(q: QuantW, dtype=jnp.bfloat16) -> jnp.ndarray:
    qw = q["qw8"] if "qw8" in q else q["qw"]
    return (
        qw.astype(jnp.float32) * q["scale"][..., None, :]
    ).astype(dtype)


def quantize_kv_w8a8(kv: jnp.ndarray) -> QuantW:
    """Per-position symmetric int8 K/V tagged for the W8A8 attention path.

    Same numbers as quantize_kv, different dict key ("qw8") so the
    cross-attention core dispatches to int8xint8->int32 MXU dots with
    dynamically quantized queries/probabilities instead of the
    convert-and-dot math. The distinction matters on the measured chip:
    the weight-only int8 XLA path is speed-NEUTRAL because XLA
    materializes the int8->bf16 convert of the whole K/V tensor, paying
    the halved HBM read back as write+re-read traffic (BENCHMARKS.md,
    large-v3 table). An int8 dot consumes the int8 bytes directly — no
    convert exists in the graph to materialize.
    """
    q = quantize_kv(kv)
    return {"qw8": q["qw"], "scale": q["scale"]}


def is_quant_kv4(w: Any) -> bool:
    return isinstance(w, dict) and "qw4" in w and "scale" in w


def quantize_kv_int4(kv: jnp.ndarray) -> QuantW:
    """Per-position symmetric int4 for attention K/V, two values per byte.

    Quarter the bytes of bf16 (vs int8's half) for the decode step's
    dominant HBM stream — at large-v3 scale the 32-layer cross-KV is
    ~245 MB/row/step in bf16 (docs/PERFORMANCE.md), and decode throughput
    is bandwidth-bound, so bytes ≈ time. Values clip to -7..7 with one f32
    scale per (..., T) position, same exact-factoring algebra as
    quantize_kv.

    Packing puts the head dim's two HALVES in the two nibbles (rows
    [0:Dh/2] in the low nibble, [Dh/2:Dh] in the high) rather than
    interleaving pairs: unpacking is then shifts + one concatenate — no
    lane/sublane shuffles — which both XLA and a Pallas kernel handle
    cheaply.
    """
    if kv.ndim >= 5:
        # Stacked-layer tensors (cross-KV [L, B, H, Dh, T]): quantize one
        # layer at a time with lax.map so intermediates are bounded at a
        # single layer's size regardless of XLA's fusion choices. Without
        # this, the 32-layer large-v3 b32 quantization materialized a
        # 7.5 GB wide temp inside the greedy program and the compile
        # died with an HBM OOM ("tpu_compile_helper subprocess exit
        # code 1" — the round-3 int4 blocker, now diagnosed).
        return jax.lax.map(quantize_kv_int4, kv)

    kv32 = kv.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kv32), axis=-2)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    d = kv.shape[-2]
    assert d % 2 == 0, d
    # Quantize at int8 width (not int32: the old .astype(int32) form made
    # XLA materialize a 4x-wide temp — 7.5 GB at large-v3 b32) over the
    # FULL tensor in one division so rounding ties resolve identically to
    # the original packing, then nibble-pack the halves in uint8.
    q = jnp.clip(
        jnp.round(kv32 / scale[..., None, :]), -7, 7
    ).astype(jnp.int8)
    lo = q[..., : d // 2, :].astype(jnp.uint8) & jnp.uint8(0xF)
    hi = q[..., d // 2 :, :].astype(jnp.uint8) & jnp.uint8(0xF)
    packed = jax.lax.bitcast_convert_type((hi << 4) | lo, jnp.int8)
    return {"qw4": packed, "scale": scale}


def unpack_kv_int4(qw4: jnp.ndarray) -> jnp.ndarray:
    """Packed int8 [..., Dh/2, T] -> int8 [..., Dh, T] (values in -7..7).

    Arithmetic-shift sign extension of each nibble; works on the int32
    widening of the storage byte so the byte's own sign bit is harmless.
    """
    x = qw4.astype(jnp.int32)
    # jnp.right_shift is arithmetic for signed dtypes (numpy semantics).
    lo = jnp.right_shift(jnp.left_shift(x, 28), 28)
    hi = jnp.right_shift(jnp.left_shift(x, 24), 28)
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.int8)


def dequantize_kv_int4(q: QuantW, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (
        unpack_kv_int4(q["qw4"]).astype(jnp.float32)
        * q["scale"][..., None, :]
    ).astype(dtype)


# Decoder weight leaves worth quantizing for Whisper (everything the
# per-token step reads except embeddings/norms/biases).
WHISPER_DECODER_QUANT_KEYS = (
    "wq", "wk", "wv", "wo",
    "cross_wq", "cross_wo",
    "fc1_w", "fc2_w",
)


# Encoder block leaves worth quantizing for W8A8 compute: every GEMM the
# 1500-frame forward runs per layer. The conv stem and layernorms stay
# bf16/f32 (tiny share of the FLOPs; conv quality is disproportionately
# sensitive).
WHISPER_ENCODER_QUANT_KEYS = ("wq", "wk", "wv", "wo", "fc1_w", "fc2_w")


def quantize_whisper_encoder_w8a8(params: Dict[str, Any]) -> Dict[str, Any]:
    """W8A8-quantize the encoder block GEMMs of a Whisper param tree.

    Unlike the decoder (memory-bound: weight-only int8 halves HBM reads),
    the encoder is compute-bound at batch serving shapes — the win is the
    int8 MXU mode's 2x FLOP rate, which needs BOTH operands int8, hence
    dynamic activation quantization inside `mm` (see _mm_w8a8).
    """
    out = dict(params)
    enc = dict(params["encoder"])
    enc["blocks"] = quantize_tree(
        enc["blocks"], WHISPER_ENCODER_QUANT_KEYS, mode="w8a8"
    )
    out["encoder"] = enc
    return out


def quantize_whisper_decoder(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the decoder block weights of a Whisper param tree.

    Cross-attention K/V projections are excluded: they run once per
    utterance (precompute_cross_kv), not per token, so quantizing them
    saves nothing on the step and costs accuracy.
    """
    out = dict(params)
    dec = dict(params["decoder"])
    dec["blocks"] = quantize_tree(dec["blocks"], WHISPER_DECODER_QUANT_KEYS)
    out["decoder"] = dec
    return out
