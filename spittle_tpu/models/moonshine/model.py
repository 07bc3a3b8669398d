"""Moonshine encoder-decoder in JAX (architecture-verified vs HF).

The reference's MoonshineEngine slot (transcribe-rs ONNX,
`managers/transcription.rs:298-319`; catalog `moonshine-base`, 58 MB,
en-only). Architecture verified field-for-field against the torch
implementation in transformers (tests/test_moonshine_torch_parity.py):

- raw-waveform conv stem: conv(1->D, k127 s64, no bias) -> tanh ->
  GroupNorm(1 group) -> conv(D->2D, k7 s3) gelu -> conv(2D->D, k3 s2)
  gelu (~384x time reduction, no mel frontend, no fixed 30 s window);
- pre-LN transformer layers with bias-free LayerNorms and bias-free
  q/k/v/o projections; attention scaled by head_dim**-0.5;
- partial interleaved rotary embeddings (rotary_dim =
  head_dim * partial_rotary_factor, GPT-NeoX even/odd pairing) on
  encoder and decoder self-attention; none on cross-attention;
- decoder MLP is SwiGLU (fc1 -> [hidden | gate], silu(gate) * hidden ->
  fc2); encoder MLP is plain GELU;
- tied output embedding.

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
    intermediate: int = 1664  # 4x dim (base); tiny uses 1152
    vocab_size: int = 32768
    max_tokens: int = 224
    sot: int = 1
    eot: int = 2
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 0.9

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def rotary_dim(self) -> int:
        # HF default rope with partial factor; even dimension.
        d = int(self.head_dim * self.partial_rotary_factor)
        return d - (d % 2)


CONFIGS = {
    "moonshine-tiny": MoonshineConfig("moonshine-tiny", dim=288, enc_layers=6,
                                      dec_layers=6, intermediate=1152),
    "moonshine-base": MoonshineConfig("moonshine-base"),
    "moonshine-test": MoonshineConfig("moonshine-test", dim=64, enc_layers=2,
                                      dec_layers=2, n_heads=4,
                                      intermediate=128, vocab_size=128,
                                      max_tokens=16),
}


def _ln(x, g):
    """LayerNorm without bias (nn.LayerNorm(..., bias=False))."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * g).astype(x.dtype)


def _group_norm(x, g, b):
    """GroupNorm(num_groups=1) over (C, T) per sample. x: [B, C, T]."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (out * g[None, :, None] + b[None, :, None]).astype(x.dtype)


def _w(key, shape, scale, dtype):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_params(cfg: MoonshineConfig, key=None, dtype=jnp.float32) -> Params:
    if key is None:
        key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 48))
    d = cfg.dim
    inter = cfg.intermediate

    def attn(L):
        return {
            "ln1_g": jnp.ones((L, d), jnp.float32),
            "wq": _w(next(ks), (L, d, d), d**-0.5, dtype),
            "wk": _w(next(ks), (L, d, d), d**-0.5, dtype),
            "wv": _w(next(ks), (L, d, d), d**-0.5, dtype),
            "wo": _w(next(ks), (L, d, d), d**-0.5, dtype),
        }

    enc_blocks = attn(cfg.enc_layers)
    enc_blocks.update({
        "ln2_g": jnp.ones((cfg.enc_layers, d), jnp.float32),
        "fc1_w": _w(next(ks), (cfg.enc_layers, d, inter), d**-0.5, dtype),
        "fc1_b": jnp.zeros((cfg.enc_layers, inter), dtype),
        "fc2_w": _w(next(ks), (cfg.enc_layers, inter, d), inter**-0.5, dtype),
        "fc2_b": jnp.zeros((cfg.enc_layers, d), dtype),
    })
    enc = {
        "conv1_w": _w(next(ks), (d, 1, 127), 0.05, dtype),
        "conv2_w": _w(next(ks), (2 * d, d, 7), (7 * d) ** -0.5, dtype),
        "conv2_b": jnp.zeros((2 * d,), dtype),
        "conv3_w": _w(next(ks), (d, 2 * d, 3), (6 * d) ** -0.5, dtype),
        "conv3_b": jnp.zeros((d,), dtype),
        "gn_g": jnp.ones((d,), jnp.float32),
        "gn_b": jnp.zeros((d,), jnp.float32),
        "blocks": enc_blocks,
        "lnf_g": jnp.ones((d,), jnp.float32),
    }
    L = cfg.dec_layers
    dec_blocks = attn(L)
    dec_blocks.update({
        "ln2_g": jnp.ones((L, d), jnp.float32),
        "xwq": _w(next(ks), (L, d, d), d**-0.5, dtype),
        "xwk": _w(next(ks), (L, d, d), d**-0.5, dtype),
        "xwv": _w(next(ks), (L, d, d), d**-0.5, dtype),
        "xwo": _w(next(ks), (L, d, d), d**-0.5, dtype),
        "ln3_g": jnp.ones((L, d), jnp.float32),
        "fc1_w": _w(next(ks), (L, d, 2 * inter), d**-0.5, dtype),
        "fc1_b": jnp.zeros((L, 2 * inter), dtype),
        "fc2_w": _w(next(ks), (L, inter, d), inter**-0.5, dtype),
        "fc2_b": jnp.zeros((L, d), dtype),
    })
    dec = {
        "tok_emb": _w(next(ks), (cfg.vocab_size, d), 0.02, dtype),
        "blocks": dec_blocks,
        "norm_g": jnp.ones((d,), jnp.float32),
    }
    return {"encoder": enc, "decoder": dec}


# -- rotary (HF interleaved style, partial) ----------------------------------


def _rope_cos_sin(positions: jnp.ndarray, cfg: MoonshineConfig):
    """cos/sin [T, rotary_dim] with interleaved pairing."""
    rd = cfg.rotary_dim
    inv = cfg.rope_theta ** (-jnp.arange(0, rd, 2, dtype=jnp.float32) / rd)
    freqs = positions.astype(jnp.float32)[:, None] * inv[None, :]  # [T, rd/2]
    cos = jnp.repeat(jnp.cos(freqs), 2, axis=-1)  # interleaved
    sin = jnp.repeat(jnp.sin(freqs), 2, axis=-1)
    return cos, sin


def _rotate_half_interleaved(x):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _apply_rope(x, cos, sin, cfg):
    """x: [B, H, T, Dh]; cos/sin [T, rotary_dim]."""
    rd = cfg.rotary_dim
    x_rot, x_pass = x[..., :rd], x[..., rd:]
    c = cos[None, None]
    s = sin[None, None]
    x_emb = x_rot * c + _rotate_half_interleaved(x_rot) * s
    return jnp.concatenate([x_emb, x_pass], axis=-1).astype(x.dtype)


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


def _enc_mlp(x, blk):
    h = jax.nn.gelu(x @ blk["fc1_w"] + blk["fc1_b"], approximate=False)
    return h @ blk["fc2_w"] + blk["fc2_b"]


def _dec_mlp(x, blk):
    h = x @ blk["fc1_w"] + blk["fc1_b"]
    hidden, gate = jnp.split(h, 2, axis=-1)
    return (jax.nn.silu(gate) * hidden) @ blk["fc2_w"] + blk["fc2_b"]


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
    x = _group_norm(x, enc["gn_g"], enc["gn_b"])
    x = jax.nn.gelu(_conv1d(x, enc["conv2_w"], enc["conv2_b"], stride=3),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, enc["conv3_w"], enc["conv3_b"], stride=2),
                    approximate=False)
    x = x.transpose(0, 2, 1)  # [B, T', D]
    t = x.shape[1]
    cos, sin = _rope_cos_sin(jnp.arange(t), cfg)

    def body(h, blk):
        hn = _ln(h, blk["ln1_g"])
        q = _apply_rope(_heads(hn @ blk["wq"], cfg.n_heads), cos, sin, cfg)
        k = _apply_rope(_heads(hn @ blk["wk"], cfg.n_heads), cos, sin, cfg)
        v = _heads(hn @ blk["wv"], cfg.n_heads)
        h = h + _merge(_attn(q, k, v)) @ blk["wo"]
        hn = _ln(h, blk["ln2_g"])
        h = h + _enc_mlp(hn, blk)
        return h, None

    x, _ = jax.lax.scan(body, x, enc["blocks"])
    return _ln(x, enc["lnf_g"])


@functools.partial(jax.jit, static_argnames=("cfg",))
def decoder_forward(
    params: Params, tokens: jnp.ndarray, xa: jnp.ndarray, cfg: MoonshineConfig
) -> jnp.ndarray:
    """Teacher-forced decoder -> logits [B, T, V] (tests/training)."""
    dec = params["decoder"]
    b, t = tokens.shape
    x = dec["tok_emb"][tokens]
    cos, sin = _rope_cos_sin(jnp.arange(t), cfg)

    def body(h, blk):
        hn = _ln(h, blk["ln1_g"])
        q = _apply_rope(_heads(hn @ blk["wq"], cfg.n_heads), cos, sin, cfg)
        k = _apply_rope(_heads(hn @ blk["wk"], cfg.n_heads), cos, sin, cfg)
        v = _heads(hn @ blk["wv"], cfg.n_heads)
        h = h + _merge(_attn(q, k, v, causal=True)) @ blk["wo"]
        hn = _ln(h, blk["ln2_g"])
        q = _heads(hn @ blk["xwq"], cfg.n_heads)
        xk = _heads(xa @ blk["xwk"], cfg.n_heads)
        xv = _heads(xa @ blk["xwv"], cfg.n_heads)
        h = h + _merge(_attn(q, xk, xv)) @ blk["xwo"]
        hn = _ln(h, blk["ln3_g"])
        h = h + _dec_mlp(hn, blk)
        return h, None

    x, _ = jax.lax.scan(body, x, dec["blocks"])
    x = _ln(x, dec["norm_g"])
    return (x @ dec["tok_emb"].T.astype(x.dtype)).astype(jnp.float32)


# -- greedy decode with KV cache ----------------------------------------------


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
    cos_all, sin_all = _rope_cos_sin(jnp.arange(L), cfg)

    def cross_body(_, blk):
        k = _heads(xa @ blk["xwk"], heads)
        v = _heads(xa @ blk["xwv"], heads)
        return None, (k, v)

    _, (xk, xv) = jax.lax.scan(cross_body, None, dec["blocks"])

    def step_token(tok, pos, cache):
        x = dec["tok_emb"][tok][:, None, :]  # [B, 1, D]
        cos = jax.lax.dynamic_slice_in_dim(cos_all, pos, 1)
        sin = jax.lax.dynamic_slice_in_dim(sin_all, pos, 1)

        def body(carry, inputs):
            h, = carry
            blk, cache_l, ck, cv = inputs
            hn = _ln(h, blk["ln1_g"])
            q = _apply_rope(_heads(hn @ blk["wq"], heads), cos, sin, cfg)
            k_new = _apply_rope(_heads(hn @ blk["wk"], heads), cos, sin, cfg)
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

            hn = _ln(h, blk["ln2_g"])
            q = _heads(hn @ blk["xwq"], heads)
            h = h + _merge(_attn(q, ck, cv)) @ blk["xwo"]

            hn = _ln(h, blk["ln3_g"])
            h = h + _dec_mlp(hn, blk)
            return (h,), cache_l

        (x,), cache = jax.lax.scan(body, (x,), (dec["blocks"], cache, xk, xv))
        h = _ln(x, dec["norm_g"])
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
