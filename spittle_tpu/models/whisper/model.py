"""Whisper encoder-decoder forward passes in JAX.

From-scratch implementation of the Whisper architecture (replacing the
whisper.cpp engine the reference drives through transcribe-rs at
`/root/reference/src-tauri/src/managers/transcription.rs:444-504`), designed
TPU-first:

- transformer blocks are *stacked*: every per-layer weight carries a leading
  [L] axis and the layer loop is `lax.scan`, so compile time is O(1) in
  depth and XLA sees one fused block body;
- attention uses the Pallas flash kernel on TPU (spittle_tpu.ops.attention);
- the decoder runs with a static-shape KV cache [L, 2, B, H, Dh, n_ctx]
  updated via dynamic_update_slice, so every decode step hits the same
  compiled program;
- cross-attention K/V over the 1500-frame encoder output are precomputed
  once per segment;
- decode-path K/V tensors are stored TRANSPOSED ([..., Dh, T] rather
  than [..., T, Dh]): TPU tiles the two minor dims as (8, 128), so a
  64-wide head dim in the minor position pads to 128 — a 2.0x memory
  AND HBM-bandwidth tax on the tensors every decode step re-reads
  (measured: the large-v3 batch-32 cross-KV held 7.3 GB padded vs
  3.7 GB unpadded). With Dh second-minor (64 = 8k) and the time axis
  minor (1500 -> 1536), padding overhead drops to 2.4%;
- weights default to bfloat16 with float32 layernorms and logits.

Parameter tree (all jnp arrays):
  encoder: conv1_w [D, n_mels, 3], conv1_b, conv2_w [D, D, 3], conv2_b,
           blocks {attn_ln_g/b [L,D], wq/wk/wv/wo [L,D,D], bq/bv/bo [L,D],
                   mlp_ln_g/b [L,D], fc1_w [L,D,4D], fc1_b [L,4D],
                   fc2_w [L,4D,D], fc2_b [L,D]},
           ln_g, ln_b
  decoder: tok_emb [V, D], pos_emb [n_ctx, D],
           blocks {... self-attn ..., cross same shapes, mlp},
           ln_g, ln_b
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spittle_tpu.ops.attention import (
    attention_reference,
    decode_cross_attention,
    decode_cross_attention_q4,
    decode_cross_attention_q8,
    multihead_attention,
    multihead_attention_packed,
    use_decode_cross_kernel,
    use_decode_cross_kernel_q4,
    use_decode_cross_kernel_q8,
)
from spittle_tpu.ops.quant import (
    is_quant, is_quant_kv4, is_quant_w8a8, mm, mm_bias, unpack_kv_int4,
)
from .config import WhisperConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Small building blocks
# ---------------------------------------------------------------------------


def layer_norm(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (out * g + b).astype(x.dtype)


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def sinusoidal_positions(length: int, channels: int) -> np.ndarray:
    """Whisper encoder positional embedding (log-spaced sinusoids)."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32
    )


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _init_block_stack(key, layers, d, cross: bool, dtype):
    ks = jax.random.split(key, 24)
    mlp_d = 4 * d

    def w(k, shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    scale = d**-0.5
    blocks = {
        "attn_ln_g": jnp.ones((layers, d), jnp.float32),
        "attn_ln_b": jnp.zeros((layers, d), jnp.float32),
        "wq": w(ks[0], (layers, d, d), scale),
        "wk": w(ks[1], (layers, d, d), scale),
        "wv": w(ks[2], (layers, d, d), scale),
        "wo": w(ks[3], (layers, d, d), scale),
        "bq": jnp.zeros((layers, d), dtype),
        "bv": jnp.zeros((layers, d), dtype),
        "bo": jnp.zeros((layers, d), dtype),
        "mlp_ln_g": jnp.ones((layers, d), jnp.float32),
        "mlp_ln_b": jnp.zeros((layers, d), jnp.float32),
        "fc1_w": w(ks[4], (layers, d, mlp_d), scale),
        "fc1_b": jnp.zeros((layers, mlp_d), dtype),
        "fc2_w": w(ks[5], (layers, mlp_d, d), (2 * mlp_d) ** -0.5),
        "fc2_b": jnp.zeros((layers, d), dtype),
    }
    if cross:
        blocks.update(
            {
                "cross_ln_g": jnp.ones((layers, d), jnp.float32),
                "cross_ln_b": jnp.zeros((layers, d), jnp.float32),
                "cross_wq": w(ks[6], (layers, d, d), scale),
                "cross_wk": w(ks[7], (layers, d, d), scale),
                "cross_wv": w(ks[8], (layers, d, d), scale),
                "cross_wo": w(ks[9], (layers, d, d), scale),
                "cross_bq": jnp.zeros((layers, d), dtype),
                "cross_bv": jnp.zeros((layers, d), dtype),
                "cross_bo": jnp.zeros((layers, d), dtype),
            }
        )
    return blocks


def init_params(
    cfg: WhisperConfig, key=None, dtype=jnp.float32
) -> Params:
    """Random-normal initialized parameter tree (tests / benchmarks).

    Real checkpoints load via spittle_tpu.models.whisper.weights.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k_enc, k_dec, k_emb, k1, k2 = jax.random.split(key, 5)
    d = cfg.n_audio_state

    def w(k, shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    encoder = {
        "conv1_w": w(k1, (d, cfg.n_mels, 3), (3 * cfg.n_mels) ** -0.5),
        "conv1_b": jnp.zeros((d,), dtype),
        "conv2_w": w(k2, (d, d, 3), (3 * d) ** -0.5),
        "conv2_b": jnp.zeros((d,), dtype),
        "blocks": _init_block_stack(k_enc, cfg.n_audio_layer, d, False, dtype),
        "ln_g": jnp.ones((d,), jnp.float32),
        "ln_b": jnp.zeros((d,), jnp.float32),
    }
    if cfg.moe_experts:
        # Routed MoE encoder FFN replaces the dense MLP (cfg.moe_experts
        # experts, Switch top-1). Stacked [L, ...] like every block leaf
        # so lax.scan and the mesh sharding rules apply unchanged.
        L, e, ff = cfg.n_audio_layer, cfg.moe_experts, 4 * d
        km1, km2, km3 = jax.random.split(jax.random.fold_in(k_enc, 7), 3)
        blocks = encoder["blocks"]
        del blocks["fc1_w"], blocks["fc1_b"], blocks["fc2_w"], blocks["fc2_b"]
        blocks["moe_router"] = (
            jax.random.normal(km1, (L, d, e), jnp.float32) * d**-0.5
        )
        blocks["moe_w_in"] = w(km2, (L, e, d, ff), d**-0.5)
        blocks["moe_w_out"] = w(km3, (L, e, ff, d), ff**-0.5)
    decoder = {
        "tok_emb": w(k_emb, (cfg.n_vocab, d), d**-0.5),
        "pos_emb": jnp.zeros((cfg.n_text_ctx, d), dtype),
        "blocks": _init_block_stack(k_dec, cfg.n_text_layer, d, True, dtype),
        "ln_g": jnp.ones((d,), jnp.float32),
        "ln_b": jnp.zeros((d,), jnp.float32),
    }
    return {"encoder": encoder, "decoder": decoder}


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _attn_full(x, blk, n_head, causal):
    """Self-attention over a full sequence (encoder / teacher-forced).

    q/k/v stay in the packed [B, T, H*Dh] projection layout end to end:
    the head split happens inside the attention kernel's BlockSpec index
    maps (ops/attention.py:multihead_attention_packed), so no transposed
    copies of the 184 MB-per-tensor activations hit HBM at the headline
    shape. Scaling by head_dim**-0.25 commutes with the (pure reshape)
    head split, so numerics are unchanged."""
    scale = (x.shape[-1] // n_head) ** -0.25
    # mm_bias folds bias + head-dim scale (and GELU in _mlp) into the
    # fused W8A8 kernel's epilogue when that path is active; on every
    # other path it traces byte-identically to the open-coded forms.
    q = mm_bias(x, blk["wq"], blk["bq"], out_scale=scale)
    k = mm_bias(x, blk["wk"], out_scale=scale)
    v = mm_bias(x, blk["wv"], blk["bv"])
    o = multihead_attention_packed(q, k, v, n_head, causal=causal)
    return mm_bias(o, blk["wo"], blk["bo"])


def _mlp(x, blk):
    h = mm_bias(x, blk["fc1_w"], blk["fc1_b"], act="gelu")
    return mm_bias(h, blk["fc2_w"], blk["fc2_b"])


def _moe_mlp(x: jnp.ndarray, blk) -> jnp.ndarray:
    """Switch top-1 routed MoE FFN for MoE-variant encoder blocks.

    Delegates to parallel.expert_parallel.moe_ffn over flattened tokens;
    under a mesh with the moe_w_* leaves sharded over 'model', GSPMD
    inserts the expert dispatch collectives (expert parallelism)."""
    from spittle_tpu.parallel.expert_parallel import moe_ffn

    b, t, d = x.shape
    out, _aux = moe_ffn(
        {
            "router_w": blk["moe_router"],
            "w_in": blk["moe_w_in"],
            "w_out": blk["moe_w_out"],
        },
        x.reshape(-1, d),
    )
    return out.reshape(b, t, d)


def _moe_mlp_aux(x: jnp.ndarray, blk):
    """MoE FFN returning (out, Switch load-balancing aux loss)."""
    from spittle_tpu.parallel.expert_parallel import moe_ffn

    b, t, d = x.shape
    out, aux = moe_ffn(
        {
            "router_w": blk["moe_router"],
            "w_in": blk["moe_w_in"],
            "w_out": blk["moe_w_out"],
        },
        x.reshape(-1, d),
    )
    return out.reshape(b, t, d), aux["aux_loss"]


def encoder_block_body_aux(h: jnp.ndarray, blk, n_head: int):
    """encoder_block_body returning (h, aux_loss) — the training-path
    variant. Kept separate from encoder_block_body so the inference
    encode program's jaxpr (and its persistent compile cache entry) is
    untouched; dense blocks report aux 0."""
    h = h + _attn_full(layer_norm(h, blk["attn_ln_g"], blk["attn_ln_b"]),
                       blk, n_head, causal=False)
    xn = layer_norm(h, blk["mlp_ln_g"], blk["mlp_ln_b"])
    if "moe_w_in" in blk:
        out, aux = _moe_mlp_aux(xn, blk)
    else:
        out, aux = _mlp(xn, blk), jnp.asarray(0.0, jnp.float32)
    return h + out, aux


def encode_with_aux(params: Params, mel: jnp.ndarray, cfg: WhisperConfig):
    """encode() that also returns the MoE aux loss SUMMED over layers.

    Use in training objectives for MoE-variant configs (Switch eq. 4
    applies alpha to each layer's loss and the per-layer losses add into
    the total, so alpha=0.01 weights each layer fully — a mean would
    dilute the balancing pressure by 1/L on deep stacks); 0.0 for dense
    configs. Inference keeps calling encode(), whose compiled program
    carries no aux arithmetic.
    """
    enc = params["encoder"]
    x = _encoder_stem(enc, mel, cfg)

    def body(h, blk):
        h, aux = encoder_block_body_aux(h, blk, cfg.n_audio_head)
        return h, aux

    x, aux = jax.lax.scan(body, x, enc["blocks"])
    return layer_norm(x, enc["ln_g"], enc["ln_b"]), jnp.sum(aux)


def encoder_block_body(h: jnp.ndarray, blk, n_head: int) -> jnp.ndarray:
    """One encoder block (pre-LN attention + MLP residuals).

    Public so pipeline-parallel stages (parallel/pipeline_parallel.py)
    apply exactly the production block. Blocks carrying moe_* leaves
    (cfg.moe_experts > 0) use the routed MoE FFN instead of the dense
    MLP."""
    h = h + _attn_full(layer_norm(h, blk["attn_ln_g"], blk["attn_ln_b"]),
                       blk, n_head, causal=False)
    xn = layer_norm(h, blk["mlp_ln_g"], blk["mlp_ln_b"])
    h = h + (_moe_mlp(xn, blk) if "moe_w_in" in blk else _mlp(xn, blk))
    return h


@functools.partial(jax.jit, static_argnames=("n_head",))
def _encoder_blocks(blocks, x, n_head: int):
    def body(h, blk):
        return encoder_block_body(h, blk, n_head), None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


def _stem_gemm(enc, mel: jnp.ndarray) -> jnp.ndarray:
    """The conv stem as two im2col GEMMs (SPITTLE_STEM_GEMM=1).

    MEASURED OUT on-chip (2026-08-20, scripts/bench_encoder.py b48:
    GEMM form 53.2 ms vs conv lowering 36.0 ms) — the im2col concats
    materialize [B, T, 3C] / [B, T/2, 3D] intermediates whose HBM
    round-trips cost more than the conv lowering's inefficiency. The
    hypothesis that motivated this form came from an earlier 31 ms
    conv draw vs a ~6 ms FLOP floor; the floor ignored the unfold
    bytes. Kept as a tested opt-in for the record. A k=3 conv IS a
    [3*C_in -> C_out] matmul over unfolded windows: three strided
    slices + one concat in time-major layout, window unfold order
    (k-major, C within k) matching w.transpose(2, 1, 0).reshape(3*C,
    D)."""
    w1, w2 = enc["conv1_w"], enc["conv2_w"]  # [D, C, 3], [D, D, 3]
    d, c, _ = w1.shape
    xt = mel.astype(w1.dtype).transpose(0, 2, 1)  # [B, T, C]
    t = xt.shape[1]
    assert t % 2 == 0, t
    xp = jnp.pad(xt, ((0, 0), (1, 1), (0, 0)))
    cat1 = jnp.concatenate(
        [xp[:, 0:t], xp[:, 1:t + 1], xp[:, 2:t + 2]], axis=-1
    )  # [B, T, 3C]
    w1m = w1.transpose(2, 1, 0).reshape(3 * c, d)
    h = jax.nn.gelu(cat1 @ w1m + enc["conv1_b"], approximate=False)
    hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))  # [B, T+2, D]
    cat2 = jnp.concatenate(
        [hp[:, 0:t:2], hp[:, 1:t + 1:2], hp[:, 2:t + 2:2]], axis=-1
    )  # [B, T/2, 3D]
    w2m = w2.transpose(2, 1, 0).reshape(3 * d, d)
    return jax.nn.gelu(cat2 @ w2m + enc["conv2_b"], approximate=False)


def _stem_gemm_enabled() -> bool:
    import os

    return os.environ.get("SPITTLE_STEM_GEMM", "0") == "1"


def _encoder_stem(enc, mel: jnp.ndarray, cfg: WhisperConfig) -> jnp.ndarray:
    """Conv stem + positions: mel [B, n_mels, frames] -> [B, T, D]."""
    if _stem_gemm_enabled():
        x = _stem_gemm(enc, mel)
    else:
        x = jax.lax.conv_general_dilated(
            mel.astype(enc["conv1_w"].dtype), enc["conv1_w"],
            window_strides=(1,), padding=[(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        ) + enc["conv1_b"][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        x = jax.lax.conv_general_dilated(
            x, enc["conv2_w"],
            window_strides=(2,), padding=[(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        ) + enc["conv2_b"][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        x = x.transpose(0, 2, 1)  # [B, T=1500, D]
    pos = jnp.asarray(
        sinusoidal_positions(cfg.n_audio_ctx, cfg.n_audio_state), x.dtype
    )
    # Reduced audio context (whisper.cpp params.audio_ctx analog): a mel
    # shorter than the full 30 s window encodes with the FIRST T
    # positions, so short utterances skip padded-frame compute entirely.
    return x + pos[None, : x.shape[1]]


def encode(params: Params, mel: jnp.ndarray, cfg: WhisperConfig) -> jnp.ndarray:
    """mel [B, n_mels, 3000] -> audio features [B, 1500, D]."""
    enc = params["encoder"]
    x = _encoder_stem(enc, mel, cfg)
    x = _encoder_blocks(enc["blocks"], x, cfg.n_audio_head)
    return layer_norm(x, enc["ln_g"], enc["ln_b"])


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def precompute_cross_kv(params: Params, xa: jnp.ndarray, cfg: WhisperConfig):
    """Per-layer cross-attention K/V from encoder output.

    Returns (k, v) with shape [L, B, H, Dh, 1500] each — the decode
    layout (time minor; see module docstring): Dh=64 in the minor
    position would tile-pad to 128 and double the HBM bytes every decode
    step streams. The transpose is fused into the projection's output
    layout by XLA and runs once per segment.
    """
    blocks = params["decoder"]["blocks"]
    h = cfg.n_text_head

    def body(_, blk):
        k = _split_heads(xa @ blk["cross_wk"], h).swapaxes(-1, -2)
        v = _split_heads(
            xa @ blk["cross_wv"] + blk["cross_bv"], h
        ).swapaxes(-1, -2)
        return None, (k, v)

    _, (ks, vs) = jax.lax.scan(body, None, blocks)
    return ks, vs


def precompute_cross_kv_q8(params: Params, xa: jnp.ndarray,
                           cfg: WhisperConfig):
    """precompute_cross_kv fused with per-layer int8 quantization.

    quantize_kv(precompute_cross_kv(...)) materializes the FULL bf16
    [L, B, H, Dh, 1500] K/V pair (11 GB at large-v3 batch 45) before
    the int8 tensors exist — that transient, not the int8 working set,
    is what capped the batch frontier at b45 (b47 HBM OOM,
    BENCHMARKS.md 2026-08-20). Quantizing inside the layer scan keeps
    one layer of bf16/f32 intermediates live (~350 MB at b64) and emits
    the stacked int8 dict directly. Same arithmetic as the two-step
    path (quantize_kv is per-position): int8 bytes come out equal;
    scales agree to float ULP (XLA fuses the amax/divide differently
    inside the scan) — tests/test_quant.py::
    test_fused_cross_kv_q8_byte_identical."""
    from spittle_tpu.ops.quant import quantize_kv

    blocks = params["decoder"]["blocks"]
    h = cfg.n_text_head

    natural = os.environ.get("SPITTLE_CROSSKV_FORM", "fused") == "natural"

    def _q_natural(x2d: jnp.ndarray):
        """Quantize a NATURAL-layout projection [B, T, D] and emit the
        decode layout ({qw [B, H, Dh, T], scale [B, H, T]}) with the
        transpose applied to the int8 bytes (half the bf16 transpose
        traffic) instead of being fused into the GEMM epilogue.
        Motivation: the cross-KV precompute measured 297 ms at b45 vs a
        ~95 ms floor for its GEMMs (scripts/bench_breakdown.py crosskv
        stage, 2026-08-21) — XLA folds the [B, T, D] -> [B, H, Dh, T]
        transpose into the projection's output layout and the GEMM runs
        ~3x slower. The optimization_barrier pins the natural layout so
        the matmul and the transpose stay separate programs. Same
        per-(head, position) scales as quantize_kv (amax over Dh)."""
        x2d = jax.lax.optimization_barrier(x2d)
        b, t, _ = x2d.shape
        x4 = x2d.reshape(b, t, h, -1).astype(jnp.float32)
        amax = jnp.max(jnp.abs(x4), axis=-1)  # [B, T, H]
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(
            jnp.round(x4 / scale[..., None]), -127, 127
        ).astype(jnp.int8)
        return q.transpose(0, 2, 3, 1), scale.transpose(0, 2, 1)

    def body(_, blk):
        if natural:
            kq_, ksc_ = _q_natural(xa @ blk["cross_wk"])
            vq_, vsc_ = _q_natural(xa @ blk["cross_wv"] + blk["cross_bv"])
            return None, (kq_, ksc_, vq_, vsc_)
        k = _split_heads(xa @ blk["cross_wk"], h).swapaxes(-1, -2)
        v = _split_heads(
            xa @ blk["cross_wv"] + blk["cross_bv"], h
        ).swapaxes(-1, -2)
        qk, qv = quantize_kv(k), quantize_kv(v)
        return None, (qk["qw"], qk["scale"], qv["qw"], qv["scale"])

    _, (kq, ksc, vq, vsc) = jax.lax.scan(body, None, blocks)
    return {"qw": kq, "scale": ksc}, {"qw": vq, "scale": vsc}


def init_kv_cache(cfg: WhisperConfig, batch: int, dtype=jnp.float32,
                  ctx: int = 0, quant: bool = False):
    """Static self-attention cache: [L, 2, B, H, Dh, ctx].

    Head-major, time-minor decode layout (see module docstring): with
    Dh=64 second-minor the tile padding lands on the ctx axis (cheap)
    instead of doubling the minor dim to 128. ctx defaults to
    n_text_ctx; decode loops with a smaller token budget pass it to cut
    per-step cache traffic (every step reads the whole static cache).

    quant: int8 cache {"qw" int8 [L,2,B,H,Dh,ctx], "scale" f32
    [L,2,B,H,ctx]} — per-position scales exactly like the cross-KV
    quantization (ops/quant.py quantize_kv), halving the self-attention
    stream every step re-reads. Columns are quantized as they are
    written; unwritten columns are 0 with scale 1 and are masked by the
    causal position mask anyway."""
    shape = (
        cfg.n_text_layer,
        2,
        batch,
        cfg.n_text_head,
        cfg.n_text_state // cfg.n_text_head,
        ctx or cfg.n_text_ctx,
    )
    if quant:
        return {
            "qw": jnp.zeros(shape, jnp.int8),
            "scale": jnp.ones(shape[:4] + shape[5:], jnp.float32),
        }
    return jnp.zeros(shape, dtype)


def _cross_attention(cq, ck, cv, dh: int, kv_len: int = 0):
    """Cross-attention core shared by decode/verify/prefill paths.

    cq: [Bq, H, q, Dh]; ck/cv: [Bc, H, Dh, T] decode layout (or int8
    quant dicts {qw [Bc,H,Dh,T], scale [Bc,H,T]}) with Bq % Bc == 0.
    Beam search shares one K/V across an item's beams, so beams fold
    into the query axis (cross attention has no per-query masking) and
    K/V stream from HBM once per ITEM instead of once per beam.
    kv_len: real length when K/V are tile-padded (0 = full).
    """
    bq, h, qlen, d = cq.shape
    bc = (
        ck["qw4"] if is_quant_kv4(ck)
        else ck["qw8"] if is_quant_w8a8(ck)
        else ck["qw"] if is_quant(ck)
        else ck
    ).shape[0]
    beams = bq // bc
    if beams > 1:
        cq = (
            cq.reshape(bc, beams, h, qlen, d)
            .transpose(0, 2, 1, 3, 4)
            .reshape(bc, h, beams * qlen, d)
        )
    q4_kernel = is_quant_kv4(ck) and use_decode_cross_kernel_q4(cq, ck)
    if is_quant_kv4(ck) and not q4_kernel:
        # XLA path: unpack to int8 (shifts + concat, fused elementwise;
        # the HBM reads stay quarter-width) and fall into the int8 math.
        ck = {"qw": unpack_kv_int4(ck["qw4"]), "scale": ck["scale"]}
        cv = {"qw": unpack_kv_int4(cv["qw4"]), "scale": cv["scale"]}
    if q4_kernel:
        # In-kernel unpack+dequant: int4 K/V stream from HBM at a QUARTER
        # of the bf16 bytes and widen in VMEM.
        co = decode_cross_attention_q4(
            cq * (dh**-0.5), ck["qw4"], ck["scale"],
            cv["qw4"], cv["scale"],
            kv_len=kv_len or ck["qw4"].shape[-1],
        )
    elif is_quant_w8a8(ck):
        # True-int8 cross-attention: BOTH dots run int8xint8->int32 on
        # the MXU, so the K/V HBM stream stays int8 end-to-end — there
        # is no int8->bf16 convert in the graph for XLA to materialize
        # (the measured failure mode of the weight-only int8 XLA path,
        # BENCHMARKS.md large-v3 table). Query rows and the prob*V-scale
        # rows are dynamically quantized per (b, h, q) with
        # exact-factoring symmetric scales — same algebra as
        # ops/quant._mm_w8a8; V's per-position scales fold into the
        # probabilities BEFORE their quantization so the int8 AV dot is
        # exact up to the 8-bit rounding of the probability rows.
        q32 = (cq * (dh**-0.5)).astype(jnp.float32)
        qa = jnp.max(jnp.abs(q32), axis=-1, keepdims=True)
        sq = jnp.where(qa > 0, qa / 127.0, 1.0)
        qq = jnp.clip(jnp.round(q32 / sq), -127, 127).astype(jnp.int8)
        cscores = jnp.einsum(
            "bhqd,bhdk->bhqk", qq, ck["qw8"],
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * sq * ck["scale"][:, :, None, :]
        kvl = kv_len or ck["qw8"].shape[-1]
        if kvl < ck["qw8"].shape[-1]:  # tile-padded quantized K/V
            cmask = (jnp.arange(ck["qw8"].shape[-1]) < kvl)[None, None, None, :]
            cscores = jnp.where(cmask, cscores, -1e30)
        cprobs = jax.nn.softmax(cscores, axis=-1)
        pv = cprobs * cv["scale"][:, :, None, :]  # [Bc, H, Q, T] >= 0
        pa = jnp.max(pv, axis=-1, keepdims=True)
        sp = jnp.where(pa > 0, pa / 127.0, 1.0)
        qp = jnp.clip(jnp.round(pv / sp), 0, 127).astype(jnp.int8)
        co = (
            jnp.einsum(
                "bhqk,bhdk->bhqd", qp, cv["qw8"],
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * sp
        ).astype(cq.dtype)
    elif is_quant(ck):
        if use_decode_cross_kernel_q8(cq, ck):
            # In-kernel dequant: int8 K/V stream from HBM at HALF the
            # bf16 bytes and convert in VMEM (the XLA path below
            # materializes converted copies, paying the saving back).
            co = decode_cross_attention_q8(
                cq * (dh**-0.5), ck["qw"], ck["scale"],
                cv["qw"], cv["scale"], kv_len=kv_len or ck["qw"].shape[-1],
            )
        else:
            cscores = jnp.einsum(
                "bhqd,bhdk->bhqk", cq * (dh**-0.5), ck["qw"].astype(cq.dtype),
                preferred_element_type=jnp.float32,
            ) * ck["scale"][:, :, None, :]
            kvl = kv_len or ck["qw"].shape[-1]
            if kvl < ck["qw"].shape[-1]:  # tile-padded quantized K/V
                cmask = (jnp.arange(ck["qw"].shape[-1]) < kvl)[None, None, None, :]
                cscores = jnp.where(cmask, cscores, -1e30)
            cprobs = jax.nn.softmax(cscores, axis=-1)
            co = jnp.einsum(
                "bhqk,bhdk->bhqd",
                (cprobs * cv["scale"][:, :, None, :]).astype(cq.dtype),
                cv["qw"].astype(cq.dtype),
            )
    elif use_decode_cross_kernel(cq, ck):
        co = decode_cross_attention(
            cq * (dh**-0.5), ck, cv, kv_len=kv_len or ck.shape[-1]
        )
    else:
        kvl = kv_len or ck.shape[-1]
        cscores = jnp.einsum(
            "bhqd,bhdk->bhqk", cq * (dh**-0.25), ck * (dh**-0.25),
            preferred_element_type=jnp.float32,
        )
        if kvl < ck.shape[-1]:  # padded K/V on the XLA fallback path
            cmask = (jnp.arange(ck.shape[-1]) < kvl)[None, None, None, :]
            cscores = jnp.where(cmask, cscores, -1e30)
        cprobs = jax.nn.softmax(cscores, axis=-1)
        co = jnp.einsum("bhqk,bhdk->bhqd", cprobs.astype(cv.dtype), cv)
    if beams > 1:
        co = (
            co.reshape(bc, h, beams, qlen, d)
            .transpose(0, 2, 1, 3, 4)
            .reshape(bq, h, qlen, d)
        )
    return co


def _cache_write(cache_l, k_new, v_new, pos):
    """Write k/v ([B, H, K, Dh]) at columns pos..pos+K-1 of a per-layer
    cache slice — [2, B, H, Dh, ctx] array, or the int8 dict form (the
    new columns are quantized per position on the way in)."""
    new = jnp.stack([k_new, v_new]).swapaxes(-1, -2)  # [2, B, H, Dh, K]
    if isinstance(cache_l, dict):
        from spittle_tpu.ops.quant import quantize_kv

        q8 = quantize_kv(new)
        return {
            "qw": jax.lax.dynamic_update_slice(
                cache_l["qw"], q8["qw"], (0, 0, 0, 0, pos)
            ),
            "scale": jax.lax.dynamic_update_slice(
                cache_l["scale"], q8["scale"], (0, 0, 0, pos)
            ),
        }
    return jax.lax.dynamic_update_slice(
        cache_l, new.astype(cache_l.dtype), (0, 0, 0, 0, pos)
    )


def _cache_attend(q, cache_l, mask):
    """Masked-softmax attention of q [B, H, Q, Dh] over a per-layer cache
    slice (plain array or int8 dict). Per-position scales factor out of
    both dots exactly (same algebra as the quantized cross path), so the
    int8 tensors feed the MXU directly and the halved HBM stream is the
    only difference."""
    if isinstance(cache_l, dict):
        ks = cache_l["scale"][0]  # [B, H, ctx] f32
        vs = cache_l["scale"][1]
        scores = jnp.einsum(
            "bhqd,bhdk->bhqk", q, cache_l["qw"][0].astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * ks[:, :, None, :]
        scores = jnp.where(mask, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum(
            "bhqk,bhdk->bhqd",
            (probs * vs[:, :, None, :]).astype(q.dtype),
            cache_l["qw"][1].astype(q.dtype),
        )
    k_all, v_all = cache_l[0], cache_l[1]  # [B, H, Dh, ctx]
    scores = jnp.einsum(
        "bhqd,bhdk->bhqk", q, k_all, preferred_element_type=jnp.float32
    )
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v_all.dtype)
    return jnp.einsum("bhqk,bhdk->bhqd", probs, v_all)


def _attend_fresh_column(q, cache_l, k_new, v_new, pos, col):
    """Self-attention of q [B, H, 1, Dh] over cache_l ∪ {this step's
    k/v}, where the fresh column enters the softmax as an in-register
    correction instead of being written to the cache first.

    The stale value at column `pos` of cache_l is replaced in the score
    row (and excluded from the V dot) and the fresh k/v contribute via
    tiny rank-1 terms — so cache_l can stream through the layer scan as
    a READ-ONLY xs and the actual cache write happens once per step for
    all layers (_write_columns_bulk). k/v are cast (or quantized, for
    the int8 dict cache) to exactly what the write will store, so the
    math matches the write-then-attend form.

    Returns (attention output [B, H, 1, Dh], ys) where ys is the
    new column in storage form for the post-scan bulk write."""
    mask_lt = col < pos
    if isinstance(cache_l, dict):
        from spittle_tpu.ops.quant import quantize_kv

        new = jnp.stack([k_new, v_new]).swapaxes(-1, -2)  # [2,B,H,Dh,1]
        q8 = quantize_kv(new)
        ks = cache_l["scale"][0]  # [B, H, ctx] f32
        vs = cache_l["scale"][1]
        s = jnp.einsum(
            "bhqd,bhdk->bhqk", q, cache_l["qw"][0].astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * ks[:, :, None, :]
        s_pos = jnp.einsum(
            "bhqd,bhdk->bhqk", q, q8["qw"][0].astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * q8["scale"][0][:, :, None, :]  # [B, H, 1, 1]
        s = jnp.where(col == pos, s_pos, s)
        s = jnp.where(col <= pos, s, -1e30)
        probs = jax.nn.softmax(s, axis=-1)
        p_pos = jax.lax.dynamic_slice_in_dim(probs, pos, 1, axis=-1)
        o = jnp.einsum(
            "bhqk,bhdk->bhqd",
            ((probs * mask_lt) * vs[:, :, None, :]).astype(q.dtype),
            cache_l["qw"][1].astype(q.dtype),
        )
        o = o + jnp.einsum(
            "bhqk,bhdk->bhqd",
            (p_pos * q8["scale"][1][:, :, None, :]).astype(q.dtype),
            q8["qw"][1].astype(q.dtype),
        )
        return o, (q8["qw"], q8["scale"])
    dtype = cache_l.dtype
    kd = k_new.astype(dtype)  # match the write-then-read cast exactly
    vd = v_new.astype(dtype)
    s = jnp.einsum(
        "bhqd,bhdk->bhqk", q, cache_l[0], preferred_element_type=jnp.float32
    )
    s_pos = jnp.einsum(
        "bhqd,bhkd->bhqk", q, kd, preferred_element_type=jnp.float32
    )  # [B, H, 1, 1]
    s = jnp.where(col == pos, s_pos, s)
    s = jnp.where(col <= pos, s, -1e30)
    probs = jax.nn.softmax(s, axis=-1)
    p_pos = jax.lax.dynamic_slice_in_dim(probs, pos, 1, axis=-1)
    o = jnp.einsum(
        "bhqk,bhdk->bhqd", (probs * mask_lt).astype(dtype), cache_l[1]
    )
    o = o + jnp.einsum("bhqk,bhkd->bhqd", p_pos.astype(dtype), vd)
    return o, jnp.stack([kd, vd]).swapaxes(-1, -2)  # [2, B, H, Dh, 1]


def _write_columns_bulk(cache, cols, pos):
    """ONE in-place dynamic-update-slice of every layer's new column
    into the full stacked cache ([L, 2, B, H, Dh, ctx] array or the
    int8 dict form). ~5 MB at large-v3 batch 32 vs the ~671 MB/step the
    scan-ys form rewrote."""
    if isinstance(cache, dict):
        qw_cols, sc_cols = cols  # [L,2,B,H,Dh,K], [L,2,B,H,K]
        return {
            "qw": jax.lax.dynamic_update_slice(
                cache["qw"], qw_cols, (0, 0, 0, 0, 0, pos)
            ),
            "scale": jax.lax.dynamic_update_slice(
                cache["scale"], sc_cols, (0, 0, 0, 0, pos)
            ),
        }
    return jax.lax.dynamic_update_slice(
        cache, cols.astype(cache.dtype), (0, 0, 0, 0, 0, pos)
    )


def decode_form() -> str:
    """Trace-time cache-write strategy for the K=1 decode step — ONE
    knob (SPITTLE_DECODE_FORM) for every decode path; legacy
    SPITTLE_DECODE_SCAN=1 forces "scan".

    Values (default "tmajor" since 2026-08-19 — the copy-on-write law
    turned out to be layout-dependent and the ctx-major form measured
    +35% e2e, config 19 fullc b32 300.7 -> 405.0, lv3 sustained
    399.5 -> 470.2, turbo headline 849.4 -> 894.6; every OTHER
    alternative measured worse e2e on-chip, 2026-08-18; full table in
    docs/PERFORMANCE.md and the probes in scripts/bench_cache_dus.py):

    - "scan": lax.scan with the cache as xs AND ys rewrites every
      layer's whole 21 MB cache slice per step to change one 160 KB
      column — 7.7 of 23.6 ms/step at large-v3 b32 — yet still wins
      e2e (config 19: 238/277 bf16/int8; headline 787.4).
    - "hybrid": cache as read-only scan xs, fresh column in-register
      (_attend_fresh_column), one bulk column DUS after the scan.
      26.3 ms/step: XLA copy-on-writes a loop-carried buffer that is
      both consumed by the inner layer-scan and DUS-updated in the
      same outer iteration (bench_cache_dus "read+dus" 10.8 ms).
    - "deferred" (greedy loop only): the hybrid attend with the fresh
      columns riding the while_loop carry, landing at the TOP of the
      next step. 26.5 ms/step — the copy-on-write law holds regardless
      of read/write order ("dus-only" 0.34 ms was only cheap because
      that probe had no scan read).
    - "ring" (greedy loop only): pending-ring (decode_step_ring) — big
      cache read-only, last R columns staged in a small ring flushed
      every R steps (SPITTLE_DECODE_RING, default 16). The only form
      that beats scan IN-LOOP (21.4 vs 23.6) but loses e2e (config 19
      int8 220 vs 277: the dict-cache ring attend's extra dequant
      dots).
    - "tmajor" (greedy loop only): the cache rides the while_loop carry
      TRANSPOSED to [L, 2, B, H, ctx, Dh] (transpose_cache_tmajor at
      loop entry/exit); hybrid attend + one ctx-axis bulk DUS
      (decode_step_tmajor). The copy-on-write law is layout-dependent:
      read+DUS costs 1.64 ms/step in this layout vs 10.8 ctx-minor
      (bench_cache_dus sublane arms, 2026-08-19).

    decode_step honors "scan"/"hybrid" ("deferred"/"ring" fall back to
    scan there — their machinery lives in the greedy while_loop, which
    handles all four). One process-wide knob means an A/B of the greedy
    form also flips decode_step's callers (beam, speculative drafts) to
    the same strategy — benches isolate arms per process, so keep A/B
    runs process-per-arm."""
    if os.environ.get("SPITTLE_DECODE_SCAN", "0") == "1":
        return "scan"
    return os.environ.get("SPITTLE_DECODE_FORM", "tmajor")


def _proj_qkv_step(h, blk, n_head, scale):
    """Self-attention projections for one decode token. h: [B, 1, D] ->
    (q, k_new, v_new) each [B, H, 1, Dh]; q and k pre-scaled by
    Dh**-0.25 (Whisper's split scaling). Shared by every K=1 cache-write
    form (decode_form docstring) so the layer math has one home."""
    xn = layer_norm(h, blk["attn_ln_g"], blk["attn_ln_b"])
    q = _split_heads(mm(xn, blk["wq"]) + blk["bq"], n_head) * scale
    k_new = _split_heads(mm(xn, blk["wk"]), n_head) * scale
    v_new = _split_heads(mm(xn, blk["wv"]) + blk["bv"], n_head)
    return q, k_new, v_new


def _layer_rest(h, o, blk, ck, cv, n_head, cross_kv_len):
    """Post-self-attention remainder of a decoder layer: output proj +
    residual, cross-attention (precomputed, optionally quantized /
    beam-shared K/V), MLP. Shared by every K=1 cache-write form."""
    h = h + mm(_merge_heads(o), blk["wo"]) + blk["bo"]
    xn = layer_norm(h, blk["cross_ln_g"], blk["cross_ln_b"])
    dh = xn.shape[-1] // n_head
    cq = _split_heads(mm(xn, blk["cross_wq"]) + blk["cross_bq"], n_head)
    co = _cross_attention(cq, ck, cv, dh, kv_len=cross_kv_len)
    h = h + mm(_merge_heads(co), blk["cross_wo"]) + blk["cross_bo"]
    return h + _mlp(layer_norm(h, blk["mlp_ln_g"], blk["mlp_ln_b"]), blk)


def _step_blocks_layers(blocks, x, kv_cache, cross_k, cross_v, pos, n_head,
                        cross_kv_len, emit_cols: bool):
    """One token through all decoder layers. x: [B, 1, D].

    emit_cols=False: scan form — cache is xs AND ys, each layer writes
    its column into its slice (returns (x, updated_cache)).
    emit_cols=True: hybrid attend — cache is a READ-ONLY xs, the fresh
    column corrects the softmax in-register and is emitted as ys
    (returns (x, cols)); the caller decides when to land the columns
    (_write_columns_bulk) — immediately ("hybrid") or next step
    ("deferred"). See decode_form() for the measurements."""
    scale = (x.shape[-1] // n_head) ** -0.25
    quant = isinstance(kv_cache, dict)
    n_ctx = (kv_cache["qw"] if quant else kv_cache).shape[5]
    mask = (jnp.arange(n_ctx) <= pos)[None, None, None, :]

    if not emit_cols:
        def body(carry, inputs):
            (h,) = carry
            blk, cache_l, ck, cv = inputs
            q, k_new, v_new = _proj_qkv_step(h, blk, n_head, scale)
            cache_l = _cache_write(cache_l, k_new, v_new, pos)
            o = _cache_attend(q, cache_l, mask)
            h = _layer_rest(h, o, blk, ck, cv, n_head, cross_kv_len)
            return (h,), cache_l

        (x,), new_cache = jax.lax.scan(
            body, (x,), (blocks, kv_cache, cross_k, cross_v)
        )
        return x, new_cache

    col = jnp.arange(n_ctx)[None, None, None, :]

    def body(carry, inputs):
        (h,) = carry
        blk, cache_l, ck, cv = inputs
        q, k_new, v_new = _proj_qkv_step(h, blk, n_head, scale)
        o, ys = _attend_fresh_column(q, cache_l, k_new, v_new, pos, col)
        return (_layer_rest(h, o, blk, ck, cv, n_head, cross_kv_len),), ys

    (x,), cols = jax.lax.scan(
        body, (x,), (blocks, kv_cache, cross_k, cross_v)
    )
    return x, cols


def init_ring(kv_cache, ring: int):
    """Zero pending-ring matching the cache form: [L, 2, B, H, Dh, R]
    (or the int8 dict form). Holds the last <=R decoded columns before
    they are flushed into the big cache (_ring_flush)."""
    if isinstance(kv_cache, dict):
        l, _, b, h, dh, _ = kv_cache["qw"].shape
        return {
            "qw": jnp.zeros((l, 2, b, h, dh, ring), kv_cache["qw"].dtype),
            "scale": jnp.zeros((l, 2, b, h, ring), kv_cache["scale"].dtype),
        }
    l, _, b, h, dh, _ = kv_cache.shape
    return jnp.zeros((l, 2, b, h, dh, ring), kv_cache.dtype)


def _ring_flush(kv_cache, pend, flush_len):
    """Merge the whole ring into the big cache at columns
    [flush_len, flush_len + R) — a layer-scan whole-slice rewrite (the
    expensive write, paid once per R steps instead of every step). The
    cache is allocated ctx + R wide so the final partial flush stays in
    bounds; columns beyond the decoded range receive stale ring data
    that every reader masks off (col < flush_len / col <= pos)."""
    if isinstance(kv_cache, dict):
        def fl(carry, xs):
            cq, cs, pq, ps = xs
            cq = jax.lax.dynamic_update_slice(
                cq, pq, (0, 0, 0, 0, flush_len)
            )
            cs = jax.lax.dynamic_update_slice(cs, ps, (0, 0, 0, flush_len))
            return carry, (cq, cs)

        _, (qw, sc) = jax.lax.scan(
            fl, 0,
            (kv_cache["qw"], kv_cache["scale"], pend["qw"], pend["scale"]),
        )
        return {"qw": qw, "scale": sc}

    def fl(carry, xs):
        cache_l, pend_l = xs
        return carry, jax.lax.dynamic_update_slice(
            cache_l, pend_l, (0, 0, 0, 0, flush_len)
        )

    _, new = jax.lax.scan(fl, 0, (kv_cache, pend))
    return new


def _attend_ring(q, cache_l, pend_l, k_new, v_new, pos, flush_len, col):
    """Self-attention of q [B, H, 1, Dh] over three column sources:

    - the big cache slice (cols < flush_len, read-only scan xs),
    - the pending ring (slots r < pos - flush_len hold columns
      flush_len + r),
    - this step's fresh k/v, entering the softmax in-register at ring
      slot pos - flush_len (cast/quantized exactly as the ring write
      will store them, so the math matches write-then-read).

    One softmax over the concatenated [ctx_alloc + R] score row is
    algebraically identical to attending a fully-written cache.
    Returns (attention output, updated ring slot ys) — the ring is
    rewritten as scan ys (small, streams at full bandwidth) instead of
    DUS-updating a live carried buffer (which XLA copy-on-writes, see
    decode_form docstring)."""
    cnt = pos - flush_len  # ring occupancy; fresh column takes slot cnt
    if isinstance(cache_l, dict):
        from spittle_tpu.ops.quant import quantize_kv

        ring = pend_l["qw"].shape[-1]
        r = jnp.arange(ring)[None, None, None, :]
        new = jnp.stack([k_new, v_new]).swapaxes(-1, -2)  # [2,B,H,Dh,1]
        q8 = quantize_kv(new)
        s_big = jnp.einsum(
            "bhqd,bhdk->bhqk", q, cache_l["qw"][0].astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * cache_l["scale"][0][:, :, None, :]
        s_big = jnp.where(col < flush_len, s_big, -1e30)
        s_ring = jnp.einsum(
            "bhqd,bhdk->bhqk", q, pend_l["qw"][0].astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * pend_l["scale"][0][:, :, None, :]
        s_fresh = jnp.einsum(
            "bhqd,bhdk->bhqk", q, q8["qw"][0].astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * q8["scale"][0][:, :, None, :]  # [B,H,1,1]
        s_ring = jnp.where(r == cnt, s_fresh, s_ring)
        s_ring = jnp.where(r <= cnt, s_ring, -1e30)
        probs = jax.nn.softmax(
            jnp.concatenate([s_big, s_ring], axis=-1), axis=-1
        )
        ctxa = s_big.shape[-1]
        pb, pr = probs[..., :ctxa], probs[..., ctxa:]
        p_fresh = jax.lax.dynamic_slice_in_dim(pr, cnt, 1, axis=-1)
        o = jnp.einsum(
            "bhqk,bhdk->bhqd",
            (pb * cache_l["scale"][1][:, :, None, :]).astype(q.dtype),
            cache_l["qw"][1].astype(q.dtype),
        )
        o = o + jnp.einsum(
            "bhqk,bhdk->bhqd",
            ((pr * (r < cnt)) * pend_l["scale"][1][:, :, None, :]).astype(
                q.dtype
            ),
            pend_l["qw"][1].astype(q.dtype),
        )
        o = o + jnp.einsum(
            "bhqk,bhdk->bhqd",
            (p_fresh * q8["scale"][1][:, :, None, :]).astype(q.dtype),
            q8["qw"][1].astype(q.dtype),
        )
        ys = (
            jax.lax.dynamic_update_slice(
                pend_l["qw"], q8["qw"], (0, 0, 0, 0, cnt)
            ),
            jax.lax.dynamic_update_slice(
                pend_l["scale"], q8["scale"], (0, 0, 0, cnt)
            ),
        )
        return o, ys

    ring = pend_l.shape[-1]
    r = jnp.arange(ring)[None, None, None, :]
    dtype = cache_l.dtype
    kd = k_new.astype(dtype)  # match the ring-write cast exactly
    vd = v_new.astype(dtype)
    s_big = jnp.einsum(
        "bhqd,bhdk->bhqk", q, cache_l[0], preferred_element_type=jnp.float32
    )
    s_big = jnp.where(col < flush_len, s_big, -1e30)
    s_ring = jnp.einsum(
        "bhqd,bhdk->bhqk", q, pend_l[0], preferred_element_type=jnp.float32
    )
    s_fresh = jnp.einsum(
        "bhqd,bhkd->bhqk", q, kd, preferred_element_type=jnp.float32
    )  # [B,H,1,1]
    s_ring = jnp.where(r == cnt, s_fresh, s_ring)
    s_ring = jnp.where(r <= cnt, s_ring, -1e30)
    probs = jax.nn.softmax(
        jnp.concatenate([s_big, s_ring], axis=-1), axis=-1
    )
    ctxa = s_big.shape[-1]
    pb, pr = probs[..., :ctxa], probs[..., ctxa:]
    p_fresh = jax.lax.dynamic_slice_in_dim(pr, cnt, 1, axis=-1)
    o = jnp.einsum("bhqk,bhdk->bhqd", pb.astype(dtype), cache_l[1])
    o = o + jnp.einsum(
        "bhqk,bhdk->bhqd", (pr * (r < cnt)).astype(dtype), pend_l[1]
    )
    o = o + jnp.einsum("bhqk,bhkd->bhqd", p_fresh.astype(dtype), vd)
    ys = jax.lax.dynamic_update_slice(
        pend_l, jnp.stack([kd, vd]).swapaxes(-1, -2), (0, 0, 0, 0, cnt)
    )
    return o, ys


def decode_step_ring(params, tokens, pos, kv_cache, pend, flush_len,
                     cross_kv, cfg, audio_ctx: int = 0):
    """One greedy-loop decode step with the PENDING-RING cache strategy
    (opt-in SPITTLE_DECODE_FORM=ring; see decode_form docstring).

    Flushes the full ring into the big cache first when it is full
    (cond, once per R steps), then runs the layer scan with the big
    cache AND ring as read-only xs, the ring rewritten as ys with this
    step's column added (_attend_ring). Probe cost (bench_cache_dus,
    large-v3 b32 shapes): 4.0 ms/step at R=16 vs 14.9 for the per-step
    whole-cache rewrite.

    Returns (logits [B, V], cache, ring, flush_len). Callers must
    _ring_flush once after the loop to materialize the tail."""
    ring = (
        pend["qw"] if isinstance(pend, dict) else pend
    ).shape[-1]
    full = (pos - flush_len) >= ring
    kv_cache = jax.lax.cond(
        full,
        lambda ops: _ring_flush(*ops),
        lambda ops: ops[0],
        (kv_cache, pend, flush_len),
    )
    flush_len = jnp.where(full, flush_len + ring, flush_len)

    dec = params["decoder"]
    n_head = cfg.n_text_head
    cross_kv_len = audio_ctx or cfg.n_audio_ctx
    x = dec["tok_emb"][tokens][:, None, :]  # [B, 1, D]
    x = (x + jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos, 1)[None]).astype(
        dec["tok_emb"].dtype
    )
    scale = (x.shape[-1] // n_head) ** -0.25
    quant = isinstance(kv_cache, dict)
    n_ctx = (kv_cache["qw"] if quant else kv_cache).shape[5]
    col = jnp.arange(n_ctx)[None, None, None, :]

    def body(carry, inputs):
        (h,) = carry
        if quant:
            blk, cq, cs, pq, ps, ck, cv = inputs
            cache_l = {"qw": cq, "scale": cs}
            pend_l = {"qw": pq, "scale": ps}
        else:
            blk, cache_l, pend_l, ck, cv = inputs
        qh, k_new, v_new = _proj_qkv_step(h, blk, n_head, scale)
        o, ys = _attend_ring(
            qh, cache_l, pend_l, k_new, v_new, pos, flush_len, col
        )
        return (_layer_rest(h, o, blk, ck, cv, n_head, cross_kv_len),), ys

    if quant:
        xs = (
            dec["blocks"], kv_cache["qw"], kv_cache["scale"],
            pend["qw"], pend["scale"], cross_kv[0], cross_kv[1],
        )
    else:
        xs = (dec["blocks"], kv_cache, pend, cross_kv[0], cross_kv[1])
    (x,), new_pend = jax.lax.scan(body, (x,), xs)
    if quant:
        new_pend = {"qw": new_pend[0], "scale": new_pend[1]}
    return logits_from_hidden(params, x)[:, 0], kv_cache, new_pend, flush_len


def _decoder_step_blocks(blocks, x, kv_cache, cross_k, cross_v, pos, n_head,
                         cross_kv_len: int = 0):
    """decode_step's layer stack: returns (x, fully-updated cache).

    Form per decode_form(); cross_kv_len: real cross-attention length
    when K/V were padded to a tile multiple for the Pallas decode
    kernel (0 = unpadded)."""
    if decode_form() == "hybrid":
        x, cols = _step_blocks_layers(
            blocks, x, kv_cache, cross_k, cross_v, pos, n_head,
            cross_kv_len, emit_cols=True,
        )
        return x, _write_columns_bulk(kv_cache, cols, pos)
    x, new_cache = _step_blocks_layers(
        blocks, x, kv_cache, cross_k, cross_v, pos, n_head,
        cross_kv_len, emit_cols=False,
    )
    return x, new_cache


def init_pending(kv_cache, pos: int):
    """Identity pending columns for the deferred-write decode loop: the
    columns already stored at position max(pos-1, 0), so the first
    iteration's bulk write re-lands existing data (a no-op by value).
    pos is the loop's static start position (prefix length)."""
    p = max(int(pos) - 1, 0)
    if isinstance(kv_cache, dict):
        return (
            jax.lax.dynamic_slice_in_dim(kv_cache["qw"], p, 1, axis=5),
            jax.lax.dynamic_slice_in_dim(kv_cache["scale"], p, 1, axis=4),
        )
    return jax.lax.dynamic_slice_in_dim(kv_cache, p, 1, axis=5)


def decode_step_deferred(params, tokens, pos, kv_cache, pending, cross_kv,
                         cfg, audio_ctx: int = 0):
    """One greedy-loop decode step with DEFERRED cache writes.

    Lands `pending` (the previous step's fresh columns, positions
    pos-1) with one bulk in-place DUS BEFORE any cache read — XLA
    aliases a write-then-read update in place (~0.34 ms vs ~10.8 ms
    for the read-then-write order at large-v3 b32; bench_cache_dus) —
    then runs the hybrid attend which keeps this step's column
    in-register and returns it as the next `pending`.

    Returns (logits [B, V], cache, new_pending). The caller owns the
    final flush: after the loop, `_write_columns_bulk(cache, pending,
    last_pos)` completes the cache (or skip it if the cache dies)."""
    kv_cache = _write_columns_bulk(kv_cache, pending, pos - 1)
    dec = params["decoder"]
    x = dec["tok_emb"][tokens][:, None, :]  # [B, 1, D]
    x = (x + jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos, 1)[None]).astype(
        dec["tok_emb"].dtype
    )
    x, cols = _step_blocks_layers(
        dec["blocks"], x, kv_cache, cross_kv[0], cross_kv[1], pos,
        cfg.n_text_head, cross_kv_len=audio_ctx or cfg.n_audio_ctx,
        emit_cols=True,
    )
    return logits_from_hidden(params, x)[:, 0], kv_cache, cols


def transpose_cache_tmajor(kv_cache):
    """[L, 2, B, H, Dh, ctx] <-> [L, 2, B, H, ctx, Dh] (dict form: qw
    only — the per-position scale is already ctx-minor). An involution;
    the greedy loop applies it once at entry and once at exit, ~2 full
    cache streams per window (negligible vs the per-step savings)."""
    if isinstance(kv_cache, dict):
        return {
            "qw": kv_cache["qw"].swapaxes(-1, -2),
            "scale": kv_cache["scale"],
        }
    return kv_cache.swapaxes(-1, -2)


def _attend_fresh_column_t(q, cache_l, k_new, v_new, pos, col):
    """_attend_fresh_column for the ctx-major ("tmajor") cache layout:
    cache_l [2, B, H, ctx, Dh] (dict: qw [2, B, H, ctx, Dh], scale
    [2, B, H, ctx]). Same algebra; the einsums contract the minor Dh
    axis and the emitted column is [2, B, H, 1, Dh], so the caller's
    bulk write is a ctx-axis DUS — the layout where XLA updates the
    loop-carried cache in place (bench_cache_dus: read+dus-sub
    1.64 ms/step vs 10.8 for the ctx-minor layout at large-v3 b32)."""
    mask_lt = col < pos
    if isinstance(cache_l, dict):
        from spittle_tpu.ops.quant import quantize_kv_t

        new = jnp.stack([k_new, v_new])  # [2, B, H, 1, Dh]
        q8 = quantize_kv_t(new)
        ks = cache_l["scale"][0]  # [B, H, ctx] f32
        vs = cache_l["scale"][1]
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, cache_l["qw"][0].astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * ks[:, :, None, :]
        s_pos = jnp.einsum(
            "bhqd,bhkd->bhqk", q, q8["qw"][0].astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * q8["scale"][0][:, :, None, :]  # [B, H, 1, 1]
        s = jnp.where(col == pos, s_pos, s)
        s = jnp.where(col <= pos, s, -1e30)
        probs = jax.nn.softmax(s, axis=-1)
        p_pos = jax.lax.dynamic_slice_in_dim(probs, pos, 1, axis=-1)
        o = jnp.einsum(
            "bhqk,bhkd->bhqd",
            ((probs * mask_lt) * vs[:, :, None, :]).astype(q.dtype),
            cache_l["qw"][1].astype(q.dtype),
        )
        o = o + jnp.einsum(
            "bhqk,bhkd->bhqd",
            (p_pos * q8["scale"][1][:, :, None, :]).astype(q.dtype),
            q8["qw"][1].astype(q.dtype),
        )
        return o, (q8["qw"], q8["scale"])
    dtype = cache_l.dtype
    kd = k_new.astype(dtype)
    vd = v_new.astype(dtype)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, cache_l[0], preferred_element_type=jnp.float32
    )
    s_pos = jnp.einsum(
        "bhqd,bhkd->bhqk", q, kd, preferred_element_type=jnp.float32
    )
    s = jnp.where(col == pos, s_pos, s)
    s = jnp.where(col <= pos, s, -1e30)
    probs = jax.nn.softmax(s, axis=-1)
    p_pos = jax.lax.dynamic_slice_in_dim(probs, pos, 1, axis=-1)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", (probs * mask_lt).astype(dtype), cache_l[1]
    )
    o = o + jnp.einsum("bhqk,bhkd->bhqd", p_pos.astype(dtype), vd)
    return o, jnp.stack([kd, vd])  # [2, B, H, 1, Dh]


def _write_columns_bulk_t(cache, cols, pos):
    """_write_columns_bulk for the ctx-major layout: one ctx-axis DUS
    ([L, 2, B, H, ctx, Dh] array or the int8 dict form). In this layout
    XLA performs the update in place even with the layer-scan read in
    the same loop iteration (the ctx-minor layout copy-on-writes the
    whole cache; bench_cache_dus sublane arms)."""
    if isinstance(cache, dict):
        qw_cols, sc_cols = cols  # [L, 2, B, H, K, Dh], [L, 2, B, H, K]
        return {
            "qw": jax.lax.dynamic_update_slice(
                cache["qw"], qw_cols, (0, 0, 0, 0, pos, 0)
            ),
            "scale": jax.lax.dynamic_update_slice(
                cache["scale"], sc_cols, (0, 0, 0, 0, pos)
            ),
        }
    return jax.lax.dynamic_update_slice(
        cache, cols.astype(cache.dtype), (0, 0, 0, 0, pos, 0)
    )


def _step_blocks_layers_t(blocks, x, kv_cache, cross_k, cross_v, pos,
                          n_head, cross_kv_len):
    """One token through all decoder layers, ctx-major cache as a
    READ-ONLY scan xs; returns (x, per-layer fresh columns) for the
    caller's bulk ctx-axis write."""
    scale = (x.shape[-1] // n_head) ** -0.25
    quant = isinstance(kv_cache, dict)
    n_ctx = (kv_cache["qw"] if quant else kv_cache).shape[4]
    col = jnp.arange(n_ctx)[None, None, None, :]

    def body(carry, inputs):
        (h,) = carry
        blk, cache_l, ck, cv = inputs
        q, k_new, v_new = _proj_qkv_step(h, blk, n_head, scale)
        o, ys = _attend_fresh_column_t(q, cache_l, k_new, v_new, pos, col)
        return (_layer_rest(h, o, blk, ck, cv, n_head, cross_kv_len),), ys

    (x,), cols = jax.lax.scan(
        body, (x,), (blocks, kv_cache, cross_k, cross_v)
    )
    return x, cols


def decode_step_tmajor(params, tokens, pos, kv_cache, cross_kv, cfg,
                       audio_ctx: int = 0):
    """One greedy-loop decode step in the ctx-major cache layout
    (decode_form "tmajor"): read-only layer scan + in-register fresh
    column + ONE in-place ctx-axis bulk DUS.

    The copy-on-write law is layout-dependent: with ctx on the minor
    axis, XLA copies the whole loop-carried cache per step (10.8 vs
    0.79 ms read-only at large-v3 b32); with ctx second-minor the same
    read+DUS structure costs 1.64 ms (bench_cache_dus sublane arms,
    2026-08-19). The caller owns the layout transposes at loop
    entry/exit (transpose_cache_tmajor)."""
    dec = params["decoder"]
    x = dec["tok_emb"][tokens][:, None, :]  # [B, 1, D]
    x = (x + jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos, 1)[None]).astype(
        dec["tok_emb"].dtype
    )
    x, cols = _step_blocks_layers_t(
        dec["blocks"], x, kv_cache, cross_kv[0], cross_kv[1], pos,
        cfg.n_text_head, cross_kv_len=audio_ctx or cfg.n_audio_ctx,
    )
    return (
        logits_from_hidden(params, x)[:, 0],
        _write_columns_bulk_t(kv_cache, cols, pos),
    )


def logits_from_hidden(params: Params, h: jnp.ndarray) -> jnp.ndarray:
    dec = params["decoder"]
    h = layer_norm(h, dec["ln_g"], dec["ln_b"])
    return (h @ dec["tok_emb"].T.astype(h.dtype)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "audio_ctx"))
def decode_step(
    params: Params,
    tokens: jnp.ndarray,  # [B] int32 current token
    pos: jnp.ndarray,  # scalar int32 position
    kv_cache: jnp.ndarray,
    cross_kv: Tuple[jnp.ndarray, jnp.ndarray],
    cfg: WhisperConfig,
    audio_ctx: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One incremental decode step -> (logits [B, V], new_cache).

    audio_ctx: true (pre-tile-padding) cross-KV length; 0 means the full
    cfg.n_audio_ctx. Callers that encoded a reduced window pass the
    actual length so tile padding is masked correctly."""
    dec = params["decoder"]
    x = dec["tok_emb"][tokens][:, None, :]  # [B, 1, D]
    x = (x + jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos, 1)[None]).astype(
        dec["tok_emb"].dtype
    )
    x, new_cache = _decoder_step_blocks(
        dec["blocks"], x, kv_cache, cross_kv[0], cross_kv[1], pos,
        cfg.n_text_head, cross_kv_len=audio_ctx or cfg.n_audio_ctx,
    )
    return logits_from_hidden(params, x)[:, 0], new_cache


@functools.partial(jax.jit, static_argnames=("cfg", "audio_ctx"))
def decode_block(
    params: Params,
    tokens: jnp.ndarray,  # [B, K] tokens occupying positions pos..pos+K-1
    pos: jnp.ndarray,  # scalar int32: position of tokens[:, 0]
    kv_cache: jnp.ndarray,
    cross_kv,
    cfg: WhisperConfig,
    audio_ctx: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K-position decode: logits [B, K, V] + cache written at pos..pos+K-1.

    The speculative-verification primitive: one bandwidth-bound pass over
    the decoder weights scores K draft tokens at once (decode_step is the
    K=1 special case). Attention masks causally relative to pos, so stale
    cache entries beyond the accepted point are never read and get
    overwritten by later blocks.
    """
    dec = params["decoder"]
    b, kk = tokens.shape
    n_head = cfg.n_text_head
    scale = (cfg.n_text_state // n_head) ** -0.25
    n_ctx = (
        kv_cache["qw"] if isinstance(kv_cache, dict) else kv_cache
    ).shape[5]

    x = dec["tok_emb"][tokens]
    x = (x + jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos, kk)[None]).astype(
        dec["tok_emb"].dtype
    )

    # Scan form (cache as xs/ys): fine here — decode_block amortizes the
    # per-layer cache-slice rewrite over its K verified tokens, and this
    # path only serves speculative decoding (the hot K=1 greedy path is
    # _decoder_step_blocks / the decode_form strategies).
    # row j (position pos+j) may attend to cache cols <= pos+j
    mask = (
        jnp.arange(n_ctx)[None, :] <= pos + jnp.arange(kk)[:, None]
    )[None, None]
    cross_kv_len = audio_ctx or cfg.n_audio_ctx

    def body(carry, inputs):
        (h,) = carry
        blk, cache_l, ck, cv = inputs
        q, k_new, v_new = _proj_qkv_step(h, blk, n_head, scale)  # K-wide
        cache_l = _cache_write(cache_l, k_new, v_new, pos)
        o = _cache_attend(q, cache_l, mask)
        return (_layer_rest(h, o, blk, ck, cv, n_head, cross_kv_len),), cache_l

    (x,), new_cache = jax.lax.scan(
        body, (x,), (dec["blocks"], kv_cache, cross_kv[0], cross_kv[1])
    )
    return logits_from_hidden(params, x), new_cache


@functools.partial(jax.jit, static_argnames=("cfg", "ctx", "quant_cache"))
def decoder_prefill(
    params: Params,
    tokens: jnp.ndarray,  # [B, P] prefix tokens
    cross_kv,  # (k, v) [L, B, H, Dh, 1500] decode layout — plain or quantized
    cfg: WhisperConfig,
    ctx: int,
    quant_cache: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher-forced prefix pass that also fills the decode KV cache.

    Replaces token-by-token prefill (which re-reads every decoder weight
    and the whole cross-KV once PER TOKEN — ~100x waste for the 224-token
    condition_on_previous_text prompts, whisper.cpp's prompt_past). One
    causal pass computes all P positions, returns per-position logits
    [B, P, V] and a [L, 2, B, H, Dh, ctx] cache holding positions 0..P-1
    in exactly the layout decode_step expects (K pre-scaled by
    head_dim**-0.25, time minor).
    """
    dec = params["decoder"]
    b, p = tokens.shape
    h = cfg.n_text_head
    x = dec["tok_emb"][tokens] + dec["pos_emb"][None, :p]
    x = x.astype(dec["tok_emb"].dtype)
    scale = (cfg.n_text_state // h) ** -0.25

    def body(hcur, inputs):
        blk, ck, cv = inputs
        xn = layer_norm(hcur, blk["attn_ln_g"], blk["attn_ln_b"])
        q = _split_heads(mm(xn, blk["wq"]) + blk["bq"], h) * scale
        k = _split_heads(mm(xn, blk["wk"]), h) * scale  # cached pre-scaled
        v = _split_heads(mm(xn, blk["wv"]) + blk["bv"], h)
        o = multihead_attention(q, k, v, causal=True)
        hcur = hcur + mm(_merge_heads(o), blk["wo"]) + blk["bo"]

        xn = layer_norm(hcur, blk["cross_ln_g"], blk["cross_ln_b"])
        dh = xn.shape[-1] // h
        cq = _split_heads(mm(xn, blk["cross_wq"]) + blk["cross_bq"], h)
        o = _cross_attention(cq, ck, cv, dh)
        hcur = hcur + mm(_merge_heads(o), blk["cross_wo"]) + blk["cross_bo"]
        hcur = hcur + _mlp(
            layer_norm(hcur, blk["mlp_ln_g"], blk["mlp_ln_b"]), blk
        )
        # [2, B, H, Dh, P] per layer (decode layout, time minor)
        return hcur, jnp.stack([k, v]).swapaxes(-1, -2)

    x, kv = jax.lax.scan(body, x, (dec["blocks"], cross_kv[0], cross_kv[1]))
    cache = init_kv_cache(cfg, b, dtype=x.dtype, ctx=ctx, quant=quant_cache)
    if quant_cache:
        from spittle_tpu.ops.quant import quantize_kv

        q8 = quantize_kv(kv)  # per-position scales over Dh (axis -2)
        cache = {
            "qw": jax.lax.dynamic_update_slice(
                cache["qw"], q8["qw"], (0, 0, 0, 0, 0, 0)
            ),
            "scale": jax.lax.dynamic_update_slice(
                cache["scale"], q8["scale"], (0, 0, 0, 0, 0)
            ),
        }
    else:
        cache = jax.lax.dynamic_update_slice(
            cache, kv.astype(cache.dtype), (0, 0, 0, 0, 0, 0)
        )
    return logits_from_hidden(params, x), cache


@functools.partial(jax.jit, static_argnames=("cfg",))
def decoder_forward(
    params: Params,
    tokens: jnp.ndarray,  # [B, T]
    xa: jnp.ndarray,  # [B, 1500, D]
    cfg: WhisperConfig,
) -> jnp.ndarray:
    """Teacher-forced decoder over a full token sequence -> [B, T, V].

    Used for tests, prompt prefill scoring, and training.
    """
    dec = params["decoder"]
    b, t = tokens.shape
    h = cfg.n_text_head
    x = dec["tok_emb"][tokens] + dec["pos_emb"][None, :t]
    x = x.astype(dec["tok_emb"].dtype)
    cross_k, cross_v = precompute_cross_kv(params, xa, cfg)

    def body(hcur, inputs):
        blk, ck, cv = inputs
        hcur = hcur + _attn_full(
            layer_norm(hcur, blk["attn_ln_g"], blk["attn_ln_b"]), blk, h,
            causal=True,
        )
        xn = layer_norm(hcur, blk["cross_ln_g"], blk["cross_ln_b"])
        dh = xn.shape[-1] // h
        cq = _split_heads(mm(xn, blk["cross_wq"]) + blk["cross_bq"], h) * dh**-0.25
        # cross K/V arrive in the decode layout [B, H, Dh, T]; the
        # swapaxes here fuses into the attention dots (full-seq path).
        o = attention_reference(
            cq, ck.swapaxes(-1, -2) * dh**-0.25, cv.swapaxes(-1, -2)
        )
        hcur = hcur + mm(_merge_heads(o), blk["cross_wo"]) + blk["cross_bo"]
        hcur = hcur + _mlp(
            layer_norm(hcur, blk["mlp_ln_g"], blk["mlp_ln_b"]), blk
        )
        return hcur, None

    x, _ = jax.lax.scan(body, x, (dec["blocks"], cross_k, cross_v))
    return logits_from_hidden(params, x)
