"""T5 (flan-t5) encoder-decoder forward passes in JAX.

The reference ships a flan-t5-small text-cleanup provider running ort
encoder/decoder sessions with greedy decode
(`/root/reference/src-tauri/src/cleanup.rs:166-295`, dormant). This is
its TPU-native replacement: a from-scratch T5 v1.1/flan forward pass —
RMSNorm, unscaled attention (T5 folds the 1/sqrt(dk) into init), shared
relative-position bias computed once and reused by every layer,
gated-GELU feed-forward, untied LM head — structured like the Whisper
model (models/whisper/model.py): stacked [L]-leading per-layer weights
walked with lax.scan, and a static-shape KV cache for incremental
decode so every step hits one compiled program.

Parameter tree:
  shared_emb [V, D]
  encoder: rel_bias [num_buckets, H],
           blocks {attn_ln [L,D], wq/wk/wv [L,D,I], wo [L,I,D],
                   mlp_ln [L,D], wi0/wi1 [L,D,F], wo_ff [L,F,D]},
           ln [D]
  decoder: rel_bias, blocks {+ cross_ln, cross_wq/wk/wv/wo}, ln
  lm_head [D, V]
(I = n_heads * d_kv, which flan keeps == D.)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 1024
    num_layers: int = 8
    num_heads: int = 6
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eos_id: int = 1
    pad_id: int = 0  # doubles as the decoder start token

    @property
    def inner(self) -> int:
        return self.num_heads * self.d_kv


FLAN_T5_SMALL = T5Config()


def rms_norm(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype) * g.astype(x.dtype)


def _relative_bucket(rel: jnp.ndarray, bidirectional: bool, num_buckets: int,
                     max_distance: int) -> jnp.ndarray:
    """HF T5 _relative_position_bucket, vectorized (int32 in/out)."""
    ret = jnp.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        ret = ret + (rel > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(rel)
    else:
        n = jnp.maximum(-rel, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    # log-spaced buckets up to max_distance
    large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, n, large)


def relative_bias(rel_table: jnp.ndarray, q_len: int, k_len: int,
                  bidirectional: bool, cfg: T5Config,
                  q_offset: int | jnp.ndarray = 0) -> jnp.ndarray:
    """[1, H, q_len, k_len] position bias (query positions offset for
    incremental decode)."""
    ctx = jnp.arange(q_len)[:, None] + q_offset
    mem = jnp.arange(k_len)[None, :]
    buckets = _relative_bucket(
        mem - ctx, bidirectional, cfg.rel_buckets, cfg.rel_max_distance
    )
    return rel_table[buckets].transpose(2, 0, 1)[None]  # [1, H, q, k]


def _split(x: jnp.ndarray, h: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)


def _merge(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _attn(q, k, v, bias) -> jnp.ndarray:
    """T5 attention: NO 1/sqrt(dk) scaling; additive position bias."""
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _ff(x, blk):
    h = jax.nn.gelu(x @ blk["wi0"], approximate=True) * (x @ blk["wi1"])
    return h @ blk["wo_ff"]


@functools.partial(jax.jit, static_argnames=("cfg",))
def t5_encode(params: Params, tokens: jnp.ndarray, mask: jnp.ndarray,
              cfg: T5Config) -> jnp.ndarray:
    """tokens [B, T] int32, mask [B, T] bool -> [B, T, D]."""
    enc = params["encoder"]
    h = cfg.num_heads
    x = params["shared_emb"][tokens]
    t = tokens.shape[1]
    bias = relative_bias(enc["rel_bias"], t, t, True, cfg)
    bias = bias + jnp.where(mask, 0.0, -1e9)[:, None, None, :]

    def body(hcur, blk):
        xn = rms_norm(hcur, blk["attn_ln"])
        o = _attn(_split(xn @ blk["wq"], h), _split(xn @ blk["wk"], h),
                  _split(xn @ blk["wv"], h), bias)
        hcur = hcur + _merge(o) @ blk["wo"]
        hcur = hcur + _ff(rms_norm(hcur, blk["mlp_ln"]), blk)
        return hcur, None

    x, _ = jax.lax.scan(body, x, enc["blocks"])
    return rms_norm(x, enc["ln"])


@functools.partial(jax.jit, static_argnames=("cfg",))
def t5_decoder_forward(params: Params, tokens: jnp.ndarray,
                       enc_out: jnp.ndarray, enc_mask: jnp.ndarray,
                       cfg: T5Config) -> jnp.ndarray:
    """Teacher-forced decoder -> logits [B, T, V] (tests/scoring)."""
    dec = params["decoder"]
    h = cfg.num_heads
    b, t = tokens.shape
    x = params["shared_emb"][tokens]
    bias = relative_bias(dec["rel_bias"], t, t, False, cfg)
    causal = jnp.tril(jnp.ones((t, t), bool))
    bias = bias + jnp.where(causal, 0.0, -1e9)[None, None]
    cbias = jnp.where(enc_mask, 0.0, -1e9)[:, None, None, :]

    def body(hcur, blk):
        xn = rms_norm(hcur, blk["attn_ln"])
        o = _attn(_split(xn @ blk["wq"], h), _split(xn @ blk["wk"], h),
                  _split(xn @ blk["wv"], h), bias)
        hcur = hcur + _merge(o) @ blk["wo"]
        xn = rms_norm(hcur, blk["cross_ln"])
        o = _attn(_split(xn @ blk["cross_wq"], h),
                  _split(enc_out @ blk["cross_wk"], h),
                  _split(enc_out @ blk["cross_wv"], h), cbias)
        hcur = hcur + _merge(o) @ blk["cross_wo"]
        hcur = hcur + _ff(rms_norm(hcur, blk["mlp_ln"]), blk)
        return hcur, None

    x, _ = jax.lax.scan(body, x, dec["blocks"])
    x = rms_norm(x, dec["ln"])
    return (x @ params["lm_head"]).astype(jnp.float32)


def precompute_cross_kv(params: Params, enc_out: jnp.ndarray, cfg: T5Config):
    """[L, B, H, T, Dh] cross K/V, computed once per input."""
    h = cfg.num_heads

    def body(_, blk):
        return None, (_split(enc_out @ blk["cross_wk"], h),
                      _split(enc_out @ blk["cross_wv"], h))

    _, (ks, vs) = jax.lax.scan(body, None, params["decoder"]["blocks"])
    return ks, vs


def init_kv_cache(cfg: T5Config, batch: int, ctx: int, dtype=jnp.float32):
    return jnp.zeros(
        (cfg.num_layers, 2, batch, cfg.num_heads, ctx, cfg.d_kv), dtype
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def t5_decode_step(params: Params, tokens: jnp.ndarray, pos: jnp.ndarray,
                   kv_cache: jnp.ndarray, cross_kv, enc_mask: jnp.ndarray,
                   cfg: T5Config) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One incremental step: tokens [B] -> (logits [B, V], new cache)."""
    dec = params["decoder"]
    h = cfg.num_heads
    n_ctx = kv_cache.shape[4]
    x = params["shared_emb"][tokens][:, None, :]
    bias = relative_bias(dec["rel_bias"], 1, n_ctx, False, cfg, q_offset=pos)
    bias = bias + jnp.where(jnp.arange(n_ctx) <= pos, 0.0, -1e9)[None, None, None]
    cbias = jnp.where(enc_mask, 0.0, -1e9)[:, None, None, :]

    def body(carry, inputs):
        (hcur,) = carry
        blk, cache_l, ck, cv = inputs
        xn = rms_norm(hcur, blk["attn_ln"])
        q = _split(xn @ blk["wq"], h)
        k_new = _split(xn @ blk["wk"], h)
        v_new = _split(xn @ blk["wv"], h)
        cache_l = jax.lax.dynamic_update_slice(
            cache_l, jnp.stack([k_new, v_new]), (0, 0, 0, pos, 0)
        )
        o = _attn(q, cache_l[0], cache_l[1], bias)
        hcur = hcur + _merge(o) @ blk["wo"]
        xn = rms_norm(hcur, blk["cross_ln"])
        o = _attn(_split(xn @ blk["cross_wq"], h), ck, cv, cbias)
        hcur = hcur + _merge(o) @ blk["cross_wo"]
        hcur = hcur + _ff(rms_norm(hcur, blk["mlp_ln"]), blk)
        return (hcur,), cache_l

    (x,), new_cache = jax.lax.scan(
        body, (x,), (dec["blocks"], kv_cache, cross_kv[0], cross_kv[1])
    )
    x = rms_norm(x, dec["ln"])
    return (x[:, 0] @ params["lm_head"]).astype(jnp.float32), new_cache


def greedy_generate(params: Params, tokens: np.ndarray, cfg: T5Config,
                    max_tokens: int = 512) -> np.ndarray:
    """Greedy decode (cleanup.rs:243-295 semantics: start at pad, stop at
    EOS or the 512-token cap). tokens [B, T] padded with pad_id.

    Returns [B, <=max_tokens] generated ids (pad after each row's EOS).
    """
    mask = jnp.asarray(tokens != cfg.pad_id)
    enc_out = t5_encode(params, jnp.asarray(tokens, jnp.int32), mask, cfg)
    cross_kv = precompute_cross_kv(params, enc_out, cfg)
    b = tokens.shape[0]
    cache = init_kv_cache(cfg, b, max_tokens, enc_out.dtype)
    cur = jnp.full((b,), cfg.pad_id, jnp.int32)
    done = np.zeros(b, bool)
    out = np.full((b, max_tokens), cfg.pad_id, np.int32)
    for step in range(max_tokens):
        logits, cache = t5_decode_step(
            params, cur, jnp.int32(step), cache, cross_kv, mask, cfg
        )
        nxt = np.asarray(jnp.argmax(logits, -1))
        nxt = np.where(done, cfg.pad_id, nxt)
        out[:, step] = nxt
        done |= nxt == cfg.eos_id
        if done.all():
            out = out[:, : step + 1]
            break
        cur = jnp.asarray(nxt)
    return out
