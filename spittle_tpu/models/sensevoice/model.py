"""SenseVoice-Small: SAN-M encoder + CTC, non-autoregressive.

The reference's SenseVoiceEngine slot (transcribe-rs int8 ONNX,
`managers/transcription.rs:321-339`; catalog `sense-voice-int8`, languages
zh/en/ja/ko/yue with `use_itn`). Architecture per the public FunASR design:
LFR-stacked mel features (7 frames stacked, stride 6), four prompt frames
embedded at the front (language id, event, emotion, text-norm — the
reference's `language` and `use_itn` params select these), SAN-M encoder
blocks (self-attention with an FSMN memory branch on the value path) and a
CTC head decoded greedily. Non-autoregressive: one batched forward pass
transcribes the whole utterance — naturally TPU-shaped.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

LANGUAGES = ("auto", "zh", "en", "yue", "ja", "ko", "nospeech")


@dataclass(frozen=True)
class SenseVoiceConfig:
    name: str = "sense-voice-small"
    n_mels: int = 80
    lfr_m: int = 7  # frames stacked
    lfr_n: int = 6  # stride
    d_model: int = 512
    n_heads: int = 4
    ff_dim: int = 2048
    n_blocks: int = 50
    fsmn_kernel: int = 11
    vocab_size: int = 25055
    blank_id: int = 0
    n_prompt: int = 4  # lid, event, emotion, textnorm frames

    @property
    def input_dim(self) -> int:
        return self.n_mels * self.lfr_m


CONFIGS = {
    "sense-voice-small": SenseVoiceConfig(),
    "sense-voice-test": SenseVoiceConfig(
        name="sense-voice-test", d_model=64, n_heads=4, ff_dim=128,
        n_blocks=2, vocab_size=64,
    ),
}


def lfr_stack(mel: jnp.ndarray, m: int = 7, n: int = 6) -> jnp.ndarray:
    """[B, n_mels, T] -> [B, T', n_mels*m] low-frame-rate stacking."""
    b, d, t = mel.shape
    x = mel.transpose(0, 2, 1)  # [B, T, D]
    # Left-pad (m-1)//2 by repeating the first frame (FunASR semantics).
    pad = (m - 1) // 2
    x = jnp.concatenate([jnp.repeat(x[:, :1], pad, axis=1), x], axis=1)
    t_out = t // n
    idx = np.arange(t_out)[:, None] * n + np.arange(m)[None, :]
    idx = np.minimum(idx, x.shape[1] - 1)
    return x[:, idx].reshape(b, t_out, d * m)


def _norm(x, g, b):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (((x32 - mean) * jax.lax.rsqrt(var + 1e-12)) * g + b).astype(x.dtype)


def _w(key, shape, scale, dtype):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_params(cfg: SenseVoiceConfig, key=None, dtype=jnp.float32) -> Params:
    if key is None:
        key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 16))
    d, L = cfg.d_model, cfg.n_blocks
    return {
        "in_w": _w(next(ks), (cfg.input_dim, d), cfg.input_dim**-0.5, dtype),
        "in_b": jnp.zeros((d,), dtype),
        # Prompt embeddings: 7 languages + event/emotion/itn slots.
        "prompt_emb": _w(next(ks), (16, d), 0.02, dtype),
        "blocks": {
            "ln_g": jnp.ones((L, d), jnp.float32),
            "ln_b": jnp.zeros((L, d), jnp.float32),
            "wq": _w(next(ks), (L, d, d), d**-0.5, dtype),
            "wk": _w(next(ks), (L, d, d), d**-0.5, dtype),
            "wv": _w(next(ks), (L, d, d), d**-0.5, dtype),
            "wo": _w(next(ks), (L, d, d), d**-0.5, dtype),
            "fsmn_w": _w(next(ks), (L, d, cfg.fsmn_kernel), 0.1, dtype),
            "ff_ln_g": jnp.ones((L, d), jnp.float32),
            "ff_ln_b": jnp.zeros((L, d), jnp.float32),
            "ff_w1": _w(next(ks), (L, d, cfg.ff_dim), d**-0.5, dtype),
            "ff_b1": jnp.zeros((L, cfg.ff_dim), dtype),
            "ff_w2": _w(next(ks), (L, cfg.ff_dim, d), cfg.ff_dim**-0.5, dtype),
            "ff_b2": jnp.zeros((L, d), dtype),
        },
        "out_ln_g": jnp.ones((d,), jnp.float32),
        "out_ln_b": jnp.zeros((d,), jnp.float32),
        "ctc_w": _w(next(ks), (d, cfg.vocab_size), d**-0.5, dtype),
        "ctc_b": jnp.zeros((cfg.vocab_size,), dtype),
    }


def _sanm_attention(x, blk, n_heads, fsmn_kernel):
    b, t, d = x.shape
    dh = d // n_heads
    q = (x @ blk["wq"]).reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3)
    k = (x @ blk["wk"]).reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3)
    v_flat = x @ blk["wv"]  # [B, T, D]
    v = v_flat.reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(dh)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, d)
    # FSMN memory branch: depthwise conv over the value sequence.
    pad = fsmn_kernel // 2
    vc = v_flat.transpose(0, 2, 1)  # [B, D, T]
    mem = jax.lax.conv_general_dilated(
        vc, blk["fsmn_w"][:, None, :], window_strides=(1,),
        padding=[(pad, pad)], dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=d,
    ).transpose(0, 2, 1)
    return (attn + mem) @ blk["wo"]


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(
    params: Params,
    features: jnp.ndarray,  # [B, T', input_dim] LFR-stacked
    prompt_ids: jnp.ndarray,  # [B, n_prompt] into prompt_emb
    cfg: SenseVoiceConfig,
) -> jnp.ndarray:
    """-> CTC logits [B, n_prompt + T', vocab]."""
    x = features @ params["in_w"] + params["in_b"]
    prompts = params["prompt_emb"][prompt_ids]  # [B, n_prompt, D]
    x = jnp.concatenate([prompts.astype(x.dtype), x], axis=1)

    def body(h, blk):
        hn = _norm(h, blk["ln_g"], blk["ln_b"])
        h = h + _sanm_attention(hn, blk, cfg.n_heads, cfg.fsmn_kernel)
        hn = _norm(h, blk["ff_ln_g"], blk["ff_ln_b"])
        h = h + jax.nn.relu(hn @ blk["ff_w1"] + blk["ff_b1"]) @ blk["ff_w2"] + blk["ff_b2"]
        return h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = _norm(x, params["out_ln_g"], params["out_ln_b"])
    return (x @ params["ctc_w"] + params["ctc_b"]).astype(jnp.float32)


def ctc_greedy_decode(
    logits: np.ndarray, blank_id: int = 0, skip: int = 4
) -> List[List[int]]:
    """Per-item argmax -> collapse repeats -> drop blanks. `skip` drops the
    prompt frames at the front."""
    out = []
    ids = np.argmax(logits, axis=-1)
    for row in ids:
        row = row[skip:]
        prev = -1
        toks = []
        for t in row:
            if t != prev and t != blank_id:
                toks.append(int(t))
            prev = t
        out.append(toks)
    return out


def prompt_ids_for(
    cfg: SenseVoiceConfig, language: str = "auto", use_itn: bool = True
) -> np.ndarray:
    """[lid, event, emotion, textnorm] indices into prompt_emb."""
    lid = LANGUAGES.index(language) if language in LANGUAGES else 0
    event = 7  # Speech
    emotion = 8
    textnorm = 9 if use_itn else 10  # withitn / woitn
    return np.asarray([lid, event, emotion, textnorm], np.int64)
