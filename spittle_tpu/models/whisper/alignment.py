"""Word-level timestamps via cross-attention DTW.

Parity with whisper.cpp/OpenAI word timestamps (BASELINE config 3: "beam
search + language detection + word timestamps"): re-run the decoder
teacher-forced over the decoded tokens, capture cross-attention
distributions, average the alignment heads (upper half of the decoder
layers when no per-model head mask is known — OpenAI's fallback), median-
filter over audio time, and dynamic-time-warp a monotonic token-to-frame
path. Token boundary frames convert to seconds at 0.02 s per audio
position; tokens merge into words at space boundaries.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .model import (
    _merge_heads,
    _mlp,
    _split_heads,
    attention_reference,
    layer_norm,
    precompute_cross_kv,
)

TIME_PER_FRAME = 0.02


@dataclasses.dataclass
class WordTiming:
    word: str
    start: float
    end: float


@functools.partial(jax.jit, static_argnames=("cfg",))
def decoder_cross_attention(
    params, tokens: jnp.ndarray, xa: jnp.ndarray, cfg: WhisperConfig
) -> jnp.ndarray:
    """Teacher-forced pass capturing cross-attn probs [L, B, H, T, 1500]."""
    dec = params["decoder"]
    b, t = tokens.shape
    h = cfg.n_text_head
    x = dec["tok_emb"][tokens] + dec["pos_emb"][None, :t]
    x = x.astype(dec["tok_emb"].dtype)
    cross_k, cross_v = precompute_cross_kv(params, xa, cfg)

    def body(hcur, inputs):
        blk, ck, cv = inputs
        # causal self-attention (full-sequence reference path)
        xn = layer_norm(hcur, blk["attn_ln_g"], blk["attn_ln_b"])
        scale = (xn.shape[-1] // h) ** -0.25
        q = _split_heads(xn @ blk["wq"] + blk["bq"], h) * scale
        k = _split_heads(xn @ blk["wk"], h) * scale
        v = _split_heads(xn @ blk["wv"] + blk["bv"], h)
        o = attention_reference(q, k, v, causal=True)
        hcur = hcur + _merge_heads(o) @ blk["wo"] + blk["bo"]

        xn = layer_norm(hcur, blk["cross_ln_g"], blk["cross_ln_b"])
        dh = xn.shape[-1] // h
        cq = _split_heads(xn @ blk["cross_wq"] + blk["cross_bq"], h) * dh**-0.25
        # ck/cv arrive in the decode layout [B, H, Dh, T] (time minor)
        scores = jnp.einsum(
            "bhqd,bhdk->bhqk", cq, ck * dh**-0.25,
            preferred_element_type=jnp.float32,
        )
        probs = jax.nn.softmax(scores, axis=-1)
        co = jnp.einsum("bhqk,bhdk->bhqd", probs.astype(cv.dtype), cv)
        hcur = hcur + _merge_heads(co) @ blk["cross_wo"] + blk["cross_bo"]
        hcur = hcur + _mlp(
            layer_norm(hcur, blk["mlp_ln_g"], blk["mlp_ln_b"]), blk
        )
        return hcur, probs

    _, attn = jax.lax.scan(body, x, (dec["blocks"], cross_k, cross_v))
    return attn  # [L, B, H, T, 1500]


def _median_filter(x: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last axis (audio time)."""
    if width <= 1:
        return x
    pad = width // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
    windows = np.stack(
        [xp[..., i : i + x.shape[-1]] for i in range(width)], axis=-1
    )
    return np.median(windows, axis=-1)


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW over cost [N_text, M_audio] -> (text_idx, audio_idx)."""
    n, m = cost.shape
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    trace = np.zeros((n + 1, m + 1), np.int8)
    for i in range(1, n + 1):
        c_row = cost[i - 1]
        for j in range(1, m + 1):
            c0, c1, c2 = D[i - 1, j - 1], D[i - 1, j], D[i, j - 1]
            if c0 <= c1 and c0 <= c2:
                D[i, j] = c0 + c_row[j - 1]
                trace[i, j] = 0
            elif c1 <= c2:
                D[i, j] = c1 + c_row[j - 1]
                trace[i, j] = 1
            else:
                D[i, j] = c2 + c_row[j - 1]
                trace[i, j] = 2
    ti, ai = [], []
    i, j = n, m
    while i > 0 and j > 0:
        ti.append(i - 1)
        ai.append(j - 1)
        step = trace[i, j]
        if step == 0:
            i, j = i - 1, j - 1
        elif step == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(ti[::-1]), np.asarray(ai[::-1])


def alignment_heads(cfg: WhisperConfig) -> List[Tuple[int, int]]:
    """(layer, head) pairs: all heads of the upper half of decoder layers
    (OpenAI's fallback when a model-specific mask is unknown)."""
    start = cfg.n_text_layer // 2
    return [
        (l, h)
        for l in range(start, cfg.n_text_layer)
        for h in range(cfg.n_text_head)
    ]


def load_alignment_heads(model_path: str) -> Optional[List[Tuple[int, int]]]:
    """Model-specific DTW heads from an `alignment_heads.json` sidecar.

    OpenAI publishes per-checkpoint alignment-head sets (word-timestamp
    quality is noticeably better with them than with the upper-half
    fallback). Users drop `[[layer, head], ...]` next to the weights
    (file or directory path accepted); absent sidecar -> None -> fallback.
    """
    import json
    import os

    base = model_path if os.path.isdir(model_path) else os.path.dirname(
        model_path
    )
    path = os.path.join(base, "alignment_heads.json")
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    return [(int(l), int(h)) for l, h in data]


def token_times(
    attn: np.ndarray,  # [L, 1, H, T, 1500] for one item
    n_frames: int,
    cfg: WhisperConfig,
    heads: Optional[Sequence[Tuple[int, int]]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-token (start, end) seconds from the attention alignment."""
    heads = heads or alignment_heads(cfg)
    w = np.stack([attn[l, 0, h] for l, h in heads])  # [NH, T, 1500]
    w = w[:, :, : max(n_frames, 1)]
    # Normalize each head over audio, average, filter.
    w = w / (w.sum(-1, keepdims=True) + 1e-8)
    matrix = _median_filter(w.mean(0))  # [T, frames]
    text_idx, audio_idx = dtw_path(-matrix)
    t = matrix.shape[0]
    starts = np.zeros(t)
    ends = np.zeros(t)
    for tok in range(t):
        frames = audio_idx[text_idx == tok]
        if len(frames):
            starts[tok] = frames[0] * TIME_PER_FRAME
            ends[tok] = (frames[-1] + 1) * TIME_PER_FRAME
        elif tok > 0:
            starts[tok] = ends[tok - 1]
            ends[tok] = ends[tok - 1]
    return starts, ends


def word_timestamps(
    params,
    tokens: Sequence[int],
    xa: jnp.ndarray,  # [1, 1500, D]
    n_frames: int,
    cfg: WhisperConfig,
    tokenizer,
    prefix: Sequence[int] = (),
    heads: Optional[Sequence[Tuple[int, int]]] = None,
) -> List[WordTiming]:
    """Word-level timings for one decoded window.

    tokens: generated token ids (no prefix/EOT). prefix: the SOT sequence
    used during decoding (re-applied for teacher forcing).
    """
    toks = list(prefix) + [t for t in tokens if t < cfg.eot]
    if len(toks) <= len(prefix):
        return []
    # Pad to a length bucket so the teacher-forced pass compiles once per
    # bucket, not per token count (causal attention: padding after the real
    # tokens cannot affect their rows).
    bucket = min(-(-len(toks) // 64) * 64, cfg.n_text_ctx)
    padded = toks[:bucket] + [cfg.eot] * (bucket - len(toks))
    arr = jnp.asarray(padded, jnp.int32)[None]
    attn = np.asarray(decoder_cross_attention(params, arr, xa, cfg))
    attn = attn[:, :, :, : len(toks)]
    starts, ends = token_times(attn, n_frames, cfg, heads=heads)
    gen_start = len(prefix)

    words: List[WordTiming] = []
    cur_tokens: List[int] = []
    cur_start: Optional[float] = None
    cur_end = 0.0

    def flush():
        nonlocal cur_tokens, cur_start, cur_end
        if cur_tokens:
            text = tokenizer.decode(cur_tokens).strip()
            if text:
                words.append(WordTiming(text, cur_start or 0.0, cur_end))
        cur_tokens, cur_start = [], None

    for i in range(gen_start, len(toks)):
        tok = toks[i]
        piece = tokenizer.decode([tok])
        if piece.startswith(" ") and cur_tokens:
            flush()
        if cur_start is None:
            cur_start = starts[i]
        cur_end = ends[i]
        cur_tokens.append(tok)
    flush()
    return words
