"""FastConformer encoder + TDT prediction/joint networks in JAX.

From-scratch implementation of the Parakeet-TDT architecture the reference
drives through transcribe-rs ONNX (`managers/transcription.rs:278-296`),
built TPU-first like the Whisper stack: stacked per-layer weights scanned
with lax.scan, static shapes, bf16-friendly matmuls.

Encoder (FastConformer): 3x stride-2 depthwise-separable conv subsampling
(8x time reduction) -> linear to d_model -> N conformer blocks
(half-FF -> rel-pos MHSA -> conv module (GLU + depthwise + swish) ->
half-FF -> LayerNorm). Relative position encoding follows Transformer-XL
(shared pos projection, shift trick).

Decoder (TDT): LSTM prediction network over emitted tokens; joint network
f(enc) + g(pred) -> relu -> vocab+blank logits and a separate duration
head (0..durations-1 frames to skip).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .config import ParakeetConfig

Params = Dict[str, Any]


def _norm(x, g, b):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (((x32 - mean) * jax.lax.rsqrt(var + 1e-5)) * g + b).astype(x.dtype)


def _w(key, shape, scale, dtype):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_params(cfg: ParakeetConfig, key=None, dtype=jnp.float32) -> Params:
    if key is None:
        key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 64))
    d, L = cfg.d_model, cfg.n_layers
    ff = cfg.ff_mult * d
    ch = cfg.subsampling_channels
    dw_scale = 0.1

    def stack(shape, scale):
        return _w(next(ks), (L, *shape), scale, dtype)

    sub = {
        # conv stem: conv2d stride2 (full) then 2x depthwise-separable stride2
        "conv0_w": _w(next(ks), (ch, 1, 3, 3), 0.2, dtype),
        "conv0_b": jnp.zeros((ch,), dtype),
        "dw1_w": _w(next(ks), (ch, 1, 3, 3), dw_scale, dtype),
        "dw1_b": jnp.zeros((ch,), dtype),
        "pw1_w": _w(next(ks), (ch, ch, 1, 1), ch**-0.5, dtype),
        "pw1_b": jnp.zeros((ch,), dtype),
        "dw2_w": _w(next(ks), (ch, 1, 3, 3), dw_scale, dtype),
        "dw2_b": jnp.zeros((ch,), dtype),
        "pw2_w": _w(next(ks), (ch, ch, 1, 1), ch**-0.5, dtype),
        "pw2_b": jnp.zeros((ch,), dtype),
        "proj_w": _w(next(ks), (ch * (cfg.n_mels // 8), d), 0.02, dtype),
        "proj_b": jnp.zeros((d,), dtype),
    }
    blocks = {
        "ff1_ln_g": jnp.ones((L, d), jnp.float32),
        "ff1_ln_b": jnp.zeros((L, d), jnp.float32),
        "ff1_w1": stack((d, ff), d**-0.5),
        "ff1_b1": jnp.zeros((L, ff), dtype),
        "ff1_w2": stack((ff, d), ff**-0.5),
        "ff1_b2": jnp.zeros((L, d), dtype),
        "attn_ln_g": jnp.ones((L, d), jnp.float32),
        "attn_ln_b": jnp.zeros((L, d), jnp.float32),
        "wq": stack((d, d), d**-0.5),
        "wk": stack((d, d), d**-0.5),
        "wv": stack((d, d), d**-0.5),
        "wo": stack((d, d), d**-0.5),
        "bq": jnp.zeros((L, d), dtype),
        "bk": jnp.zeros((L, d), dtype),
        "bv": jnp.zeros((L, d), dtype),
        "bo": jnp.zeros((L, d), dtype),
        "wpos": stack((d, d), d**-0.5),
        "pos_bias_u": jnp.zeros((L, cfg.n_heads, cfg.head_dim), dtype),
        "pos_bias_v": jnp.zeros((L, cfg.n_heads, cfg.head_dim), dtype),
        "conv_ln_g": jnp.ones((L, d), jnp.float32),
        "conv_ln_b": jnp.zeros((L, d), jnp.float32),
        "conv_pw1_w": stack((d, 2 * d), d**-0.5),
        "conv_pw1_b": jnp.zeros((L, 2 * d), dtype),
        "conv_dw_w": stack((d, cfg.conv_kernel), dw_scale),
        "conv_dw_b": jnp.zeros((L, d), dtype),
        "conv_bn_g": jnp.ones((L, d), jnp.float32),
        "conv_bn_b": jnp.zeros((L, d), jnp.float32),
        "conv_bn_mean": jnp.zeros((L, d), jnp.float32),
        "conv_bn_var": jnp.ones((L, d), jnp.float32),
        "conv_pw2_w": stack((d, d), d**-0.5),
        "conv_pw2_b": jnp.zeros((L, d), dtype),
        "ff2_ln_g": jnp.ones((L, d), jnp.float32),
        "ff2_ln_b": jnp.zeros((L, d), jnp.float32),
        "ff2_w1": stack((d, ff), d**-0.5),
        "ff2_b1": jnp.zeros((L, ff), dtype),
        "ff2_w2": stack((ff, d), ff**-0.5),
        "ff2_b2": jnp.zeros((L, d), dtype),
        "final_ln_g": jnp.ones((L, d), jnp.float32),
        "final_ln_b": jnp.zeros((L, d), jnp.float32),
    }
    ph = cfg.pred_hidden
    decoder = {
        "embed": _w(next(ks), (cfg.vocab_size + 1, ph), 0.02, dtype),
        "lstm_w": _w(next(ks), (ph, 4 * ph), ph**-0.5, dtype),
        "lstm_r": _w(next(ks), (ph, 4 * ph), ph**-0.5, dtype),
        "lstm_b": jnp.zeros((4 * ph,), dtype),
    }
    jh = cfg.joint_hidden
    joint = {
        "enc_w": _w(next(ks), (d, jh), d**-0.5, dtype),
        "enc_b": jnp.zeros((jh,), dtype),
        "pred_w": _w(next(ks), (ph, jh), ph**-0.5, dtype),
        "pred_b": jnp.zeros((jh,), dtype),
        "out_w": _w(next(ks), (jh, cfg.vocab_size + 1), jh**-0.5, dtype),
        "out_b": jnp.zeros((cfg.vocab_size + 1,), dtype),
        "dur_w": _w(next(ks), (jh, cfg.durations), jh**-0.5, dtype),
        "dur_b": jnp.zeros((cfg.durations,), dtype),
    }
    return {
        "subsampling": sub,
        "blocks": blocks,
        "decoder": decoder,
        "joint": joint,
    }


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _conv2d(x, w, b, stride, groups=1, padding=1):
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )
    return out + b[None, :, None, None]


def _subsample(sub, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, n_mels, T] -> [B, T//8, d_model] via three stride-2 convs."""
    mel = mel.astype(sub["conv0_w"].dtype)
    x = mel[:, None, :, :].transpose(0, 1, 3, 2)  # [B, 1, T, n_mels]
    x = jax.nn.relu(_conv2d(x, sub["conv0_w"], sub["conv0_b"], 2))
    ch = x.shape[1]
    x = jax.nn.relu(
        _conv2d(
            _conv2d(x, sub["dw1_w"], sub["dw1_b"], 2, groups=ch),
            sub["pw1_w"], sub["pw1_b"], 1, padding=0,
        )
    )
    x = jax.nn.relu(
        _conv2d(
            _conv2d(x, sub["dw2_w"], sub["dw2_b"], 2, groups=ch),
            sub["pw2_w"], sub["pw2_b"], 1, padding=0,
        )
    )
    b, c, t, f = x.shape
    x = x.transpose(0, 2, 1, 3).reshape(b, t, c * f)
    return x @ sub["proj_w"] + sub["proj_b"]


def _rel_pos_encoding(t: int, d: int) -> np.ndarray:
    """Transformer-XL style sinusoids for positions t-1 .. -(t-1)."""
    pos = np.arange(t - 1, -t, -1, dtype=np.float32)  # [2t-1]
    inv = np.exp(-np.log(10000.0) * np.arange(0, d, 2) / d)
    angles = pos[:, None] * inv[None, :]
    enc = np.zeros((len(pos), d), np.float32)
    enc[:, 0::2] = np.sin(angles)
    enc[:, 1::2] = np.cos(angles)
    return enc


def _rel_shift(x):
    """[B, H, T, 2T-1] -> [B, H, T, T] Transformer-XL relative shift.

    out[q, k] = x[q, (T-1) + (k-q)]: with pos_emb ordered for relative
    positions T-1 .. -(T-1), score(q, k) reads the embedding of distance
    q-k. Semantics verified against the torch implementation
    (tests/test_parakeet_torch_parity.py).
    """
    b, h, t, p = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # [B, H, T, P+1]
    # Flatten, drop the first T elements (the padded "row 0" of the
    # [P+1, T] view), reinterpret as [T, P]: each row shifts left by one.
    x = x.reshape(b, h, t * (p + 1))[:, :, t:]
    x = x.reshape(b, h, t, p)[..., :t]
    return x


def _rel_attention(x, pos_emb, blk, n_heads):
    b, t, d = x.shape
    dh = d // n_heads
    q = (x @ blk["wq"] + blk["bq"]).reshape(b, t, n_heads, dh)
    k = (x @ blk["wk"] + blk["bk"]).reshape(b, t, n_heads, dh)
    v = (x @ blk["wv"] + blk["bv"]).reshape(b, t, n_heads, dh)
    p = (pos_emb @ blk["wpos"]).reshape(1, -1, n_heads, dh)  # [1, 2T-1, H, dh]

    q_u = (q + blk["pos_bias_u"][None, None]).transpose(0, 2, 1, 3)
    q_v = (q + blk["pos_bias_v"][None, None]).transpose(0, 2, 1, 3)
    k_t = k.transpose(0, 2, 1, 3)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k_t,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,phd->bhqp", q_v, p[0],
                    preferred_element_type=jnp.float32)
    bd = _rel_shift(bd)
    scores = (ac + bd) / jnp.sqrt(dh).astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v.transpose(0, 2, 1, 3))
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return o @ blk["wo"] + blk["bo"]


def _conv_module(x, blk):
    """Pointwise->GLU->depthwise->norm->swish->pointwise (NCW internally)."""
    h = x @ blk["conv_pw1_w"] + blk["conv_pw1_b"]  # [B, T, 2D]
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)  # GLU
    d = h.shape[-1]
    k = blk["conv_dw_w"].shape[-1]
    hc = h.transpose(0, 2, 1)  # [B, D, T]
    w = blk["conv_dw_w"][:, None, :]  # [D, 1, K]
    hc = jax.lax.conv_general_dilated(
        hc, w, window_strides=(1,), padding=[(k // 2, k // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=d,
    ) + blk["conv_dw_b"][None, :, None]
    h = hc.transpose(0, 2, 1)
    # BatchNorm1d in eval mode: per-channel affine from running stats
    # (the NeMo/torch conformer conv module uses BatchNorm, not LayerNorm).
    scale = blk["conv_bn_g"] * jax.lax.rsqrt(blk["conv_bn_var"] + 1e-5)
    h = (h.astype(jnp.float32) * scale
         + (blk["conv_bn_b"] - blk["conv_bn_mean"] * scale)).astype(h.dtype)
    h = h * jax.nn.sigmoid(h)  # swish
    return h @ blk["conv_pw2_w"] + blk["conv_pw2_b"]


def _ff(x, ln_g, ln_b, w1, b1, w2, b2):
    h = _norm(x, ln_g, ln_b)
    h = jax.nn.silu(h @ w1 + b1)
    return h @ w2 + b2


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(params: Params, mel: jnp.ndarray, cfg: ParakeetConfig) -> jnp.ndarray:
    """mel [B, n_mels, T] -> encoder states [B, T//8, d_model]."""
    x = _subsample(params["subsampling"], mel)
    # xscaling: FastConformer multiplies subsampled features by sqrt(d).
    # (Python float: weak type, keeps bf16 params in bf16.)
    x = x * float(np.sqrt(cfg.d_model))
    t = x.shape[1]
    pos_emb = jnp.asarray(_rel_pos_encoding(t, cfg.d_model), x.dtype)

    def body(h, blk):
        h = h + 0.5 * _ff(h, blk["ff1_ln_g"], blk["ff1_ln_b"],
                          blk["ff1_w1"], blk["ff1_b1"],
                          blk["ff1_w2"], blk["ff1_b2"])
        hn = _norm(h, blk["attn_ln_g"], blk["attn_ln_b"])
        h = h + _rel_attention(hn, pos_emb, blk, cfg.n_heads)
        hn = _norm(h, blk["conv_ln_g"], blk["conv_ln_b"])
        h = h + _conv_module(hn, blk)
        h = h + 0.5 * _ff(h, blk["ff2_ln_g"], blk["ff2_ln_b"],
                          blk["ff2_w1"], blk["ff2_b1"],
                          blk["ff2_w2"], blk["ff2_b2"])
        h = _norm(h, blk["final_ln_g"], blk["final_ln_b"])
        return h, None

    # No encoder-level final norm: each block ends with its own norm_out
    # (matches the torch FastConformer encoder).
    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x


# ---------------------------------------------------------------------------
# Prediction network + joint
# ---------------------------------------------------------------------------


def pred_init_state(cfg: ParakeetConfig, batch: int, dtype=jnp.float32):
    return (
        jnp.zeros((batch, cfg.pred_hidden), dtype),
        jnp.zeros((batch, cfg.pred_hidden), dtype),
    )


def pred_step(params: Params, token: jnp.ndarray, state, cfg: ParakeetConfig):
    """One prediction-network step. token [B] (blank_id = start)."""
    dec = params["decoder"]
    x = dec["embed"][token]  # [B, ph]
    h, c = state
    gates = x @ dec["lstm_w"] + h @ dec["lstm_r"] + dec["lstm_b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, (h, c)


def joint(params: Params, enc_t: jnp.ndarray, pred: jnp.ndarray):
    """Joint network: returns (token_logits [B, V+1], dur_logits [B, D])."""
    j = params["joint"]
    h = jax.nn.relu(
        enc_t @ j["enc_w"] + j["enc_b"] + pred @ j["pred_w"] + j["pred_b"]
    )
    return h @ j["out_w"] + j["out_b"], h @ j["dur_w"] + j["dur_b"]
