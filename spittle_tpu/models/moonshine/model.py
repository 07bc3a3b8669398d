"""Moonshine encoder-decoder in JAX.

The reference's MoonshineEngine slot (transcribe-rs ONNX,
`managers/transcription.rs:298-319`; catalog `moonshine-base`, 58 MB,
en-only). Architecture per the public UsefulSensors design: a raw-waveform
conv stem (no mel frontend — k=127/s=64 tanh, then two strided convs for a
~384x reduction), rotary-embedding transformer encoder, and a decoder with
rotary self-attention + cross-attention and tied output embedding.
Variable-length audio needs no 30 s padding (Moonshine's headline
property); batching pads to the longest item only.

TPU-first: stacked layers under lax.scan, static-shape KV cache greedy
decode in one while_loop.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class MoonshineConfig:
    name: str = "moonshine-base"
    dim: int = 416
    enc_layers: int = 8
    dec_layers: int = 8
    n_heads: int = 8
    ff_mult: int = 4
    vocab_size: int = 32768
    max_tokens: int = 224
    sot: int = 1
    eot: int = 2

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


CONFIGS = {
    "moonshine-tiny": MoonshineConfig("moonshine-tiny", dim=288, enc_layers=6,
                                      dec_layers=6),
    "moonshine-base": MoonshineConfig("moonshine-base"),
    "moonshine-test": MoonshineConfig("moonshine-test", dim=64, enc_layers=2,
                                      dec_layers=2, n_heads=4, vocab_size=128,
                                      max_tokens=16),
}


def _norm(x, g):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * g).astype(x.dtype)


def _w(key, shape, scale, dtype):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_params(cfg: MoonshineConfig, key=None, dtype=jnp.float32) -> Params:
    if key is None:
        key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 32))
    d = cfg.dim
    ff = cfg.ff_mult * d

    def attn_stack(L):
        return {
            "ln_g": jnp.ones((L, d), jnp.float32),
            "wq": _w(next(ks), (L, d, d), d**-0.5, dtype),
            "wk": _w(next(ks), (L, d, d), d**-0.5, dtype),
            "wv": _w(next(ks), (L, d, d), d**-0.5, dtype),
            "wo": _w(next(ks), (L, d, d), d**-0.5, dtype),
            "ff_ln_g": jnp.ones((L, d), jnp.float32),
            "ff_w1": _w(next(ks), (L, d, ff), d**-0.5, dtype),
            "ff_b1": jnp.zeros((L, ff), dtype),
            "ff_w2": _w(next(ks), (L, ff, d), ff**-0.5, dtype),
            "ff_b2": jnp.zeros((L, d), dtype),
        }

    enc = {
        "conv1_w": _w(next(ks), (d, 1, 127), 0.05, dtype),
        "conv2_w": _w(next(ks), (2 * d, d, 7), (7 * d) ** -0.5, dtype),
        "conv2_b": jnp.zeros((2 * d,), dtype),
        "conv3_w": _w(next(ks), (d, 2 * d, 3), (6 * d) ** -0.5, dtype),
        "conv3_b": jnp.zeros((d,), dtype),
        "gn_g": jnp.ones((d,), jnp.float32),
        "blocks": attn_stack(cfg.enc_layers),
        "ln_g": jnp.ones((d,), jnp.float32),
    }
    dec_blocks = attn_stack(cfg.dec_layers)
    dec_blocks.update({
        "x_ln_g": jnp.ones((cfg.dec_layers, d), jnp.float32),
        "x_wq": _w(next(ks), (cfg.dec_layers, d, d), d**-0.5, dtype),
        "x_wk": _w(next(ks), (cfg.dec_layers, d, d), d**-0.5, dtype),
        "x_wv": _w(next(ks), (cfg.dec_layers, d, d), d**-0.5, dtype),
        "x_wo": _w(next(ks), (cfg.dec_layers, d, d), d**-0.5, dtype),
    })
    dec = {
        "tok_emb": _w(next(ks), (cfg.vocab_size, d), 0.02, dtype),
        "blocks": dec_blocks,
        "ln_g": jnp.ones((d,), jnp.float32),
    }
    return {"encoder": enc, "decoder": dec}


# -- rotary ------------------------------------------------------------------


def _rope(x: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """Rotary embedding. x: [B, H, T, Dh]; positions: [T]."""
    dh = x.shape[-1]
    half = dh // 2
    freqs = 10000.0 ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions[:, None].astype(jnp.float32) * freqs[None, :]  # [T, half]
    cos = jnp.cos(angles)[None, None]
    sin = jnp.sin(angles)[None, None]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    ).astype(x.dtype)


def _heads(x, n):
    b, t, d = x.shape
    return x.reshape(b, t, n, d // n).transpose(0, 2, 1, 3)


def _merge(x):
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _attn(q, k, v, causal=False):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / np.sqrt(q.shape[-1])
    if causal:
        tq, tk = q.shape[2], k.shape[2]
        mask = jnp.arange(tq)[:, None] >= jnp.arange(tk)[None, :] - (tk - tq)
        scores = jnp.where(mask[None, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# -- encoder -----------------------------------------------------------------


def _conv1d(x, w, b=None, stride=1, padding=0):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(params: Params, audio: jnp.ndarray, cfg: MoonshineConfig) -> jnp.ndarray:
    """Raw 16 kHz PCM [B, T] -> encoder states [B, ~T/384, dim]."""
    enc = params["encoder"]
    x = audio[:, None, :].astype(enc["conv1_w"].dtype)
    x = jnp.tanh(_conv1d(x, enc["conv1_w"], stride=64))
    x = _norm(x.transpose(0, 2, 1), enc["gn_g"]).transpose(0, 2, 1)
    x = jax.nn.gelu(_conv1d(x, enc["conv2_w"], enc["conv2_b"], stride=3),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, enc["conv3_w"], enc["conv3_b"], stride=2),
                    approximate=False)
    x = x.transpose(0, 2, 1)  # [B, T', D]
    t = x.shape[1]
    pos = jnp.arange(t)

    def body(h, blk):
        hn = _norm(h, blk["ln_g"])
        q = _rope(_heads(hn @ blk["wq"], cfg.n_heads), pos)
        k = _rope(_heads(hn @ blk["wk"], cfg.n_heads), pos)
        v = _heads(hn @ blk["wv"], cfg.n_heads)
        h = h + _merge(_attn(q, k, v)) @ blk["wo"]
        hn = _norm(h, blk["ff_ln_g"])
        h = h + jax.nn.gelu(hn @ blk["ff_w1"] + blk["ff_b1"],
                            approximate=False) @ blk["ff_w2"] + blk["ff_b2"]
        return h, None

    x, _ = jax.lax.scan(body, x, enc["blocks"])
    return _norm(x, enc["ln_g"])


# -- greedy decode -----------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "max_tokens"))
def greedy_decode(
    params: Params, xa: jnp.ndarray, cfg: MoonshineConfig, max_tokens: int = 0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode -> (tokens [B, L] eot-padded, lengths [B])."""
    dec = params["decoder"]
    b = xa.shape[0]
    L = max_tokens or cfg.max_tokens
    heads, dh = cfg.n_heads, cfg.head_dim
    layers = cfg.dec_layers

    cache = jnp.zeros((layers, 2, b, heads, L, dh), xa.dtype)

    # Precompute cross K/V per layer.
    def cross_body(_, blk):
        k = _heads(xa @ blk["x_wk"], heads)
        v = _heads(xa @ blk["x_wv"], heads)
        return None, (k, v)

    _, (xk, xv) = jax.lax.scan(cross_body, None, dec["blocks"])

    def step_token(tok, pos, cache):
        x = dec["tok_emb"][tok][:, None, :]  # [B, 1, D]

        def body(carry, inputs):
            h, = carry
            blk, cache_l, ck, cv = inputs
            hn = _norm(h, blk["ln_g"])
            q = _rope(_heads(hn @ blk["wq"], heads), jnp.asarray([pos]))
            k_new = _rope(_heads(hn @ blk["wk"], heads), jnp.asarray([pos]))
            v_new = _heads(hn @ blk["wv"], heads)
            cache_l = jax.lax.dynamic_update_slice(
                cache_l, jnp.stack([k_new, v_new]), (0, 0, 0, pos, 0)
            )
            k_all, v_all = cache_l[0], cache_l[1]
            mask = (jnp.arange(L) <= pos)[None, None, None, :]
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k_all,
                                preferred_element_type=jnp.float32) / np.sqrt(dh)
            scores = jnp.where(mask, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1).astype(v_all.dtype)
            h = h + _merge(jnp.einsum("bhqk,bhkd->bhqd", probs, v_all)) @ blk["wo"]

            hn = _norm(h, blk["x_ln_g"])
            q = _heads(hn @ blk["x_wq"], heads)
            h = h + _merge(_attn(q, ck, cv)) @ blk["x_wo"]

            hn = _norm(h, blk["ff_ln_g"])
            h = h + jax.nn.gelu(hn @ blk["ff_w1"] + blk["ff_b1"],
                                approximate=False) @ blk["ff_w2"] + blk["ff_b2"]
            return (h,), cache_l

        (x,), cache = jax.lax.scan(body, (x,), (dec["blocks"], cache, xk, xv))
        h = _norm(x, dec["ln_g"])
        logits = (h[:, 0] @ dec["tok_emb"].T.astype(h.dtype)).astype(jnp.float32)
        return logits, cache

    state = dict(
        tokens=jnp.full((b, L), cfg.eot, jnp.int32),
        cur=jnp.full((b,), cfg.sot, jnp.int32),
        pos=jnp.asarray(0, jnp.int32),
        cache=cache,
        finished=jnp.zeros(b, bool),
        length=jnp.zeros(b, jnp.int32),
    )

    def cond(s):
        return (s["pos"] < L) & jnp.any(~s["finished"])

    def body(s):
        logits, cache = step_token(s["cur"], s["pos"], s["cache"])
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(s["finished"], cfg.eot, nxt)
        tokens = jax.lax.dynamic_update_slice(
            s["tokens"], nxt[:, None], (0, s["pos"])
        )
        newly = ~s["finished"] & (nxt != cfg.eot)
        return dict(
            tokens=tokens, cur=nxt, pos=s["pos"] + 1, cache=cache,
            finished=s["finished"] | (nxt == cfg.eot),
            length=s["length"] + newly.astype(jnp.int32),
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["tokens"], out["length"]
