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
    """Median filter along the last axis (audio time), reflect-padded —
    OpenAI timing.py `median_filter` uses F.pad(mode="reflect")."""
    if width <= 1 or x.shape[-1] <= 1:
        return x
    pad = min(width // 2, x.shape[-1] - 1)
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = np.stack(
        [xp[..., i : i + x.shape[-1]] for i in range(2 * pad + 1)], axis=-1
    )
    return np.median(windows, axis=-1)


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW over cost [N_text, M_audio] -> (text_idx, audio_idx).

    Tie-breaking matches OpenAI timing.py `dtw_cpu` exactly: diagonal only
    when STRICTLY smaller than both alternatives, then up, else left —
    equal-cost ties fall through to the left move."""
    n, m = cost.shape
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    trace = np.zeros((n + 1, m + 1), np.int8)
    for i in range(1, n + 1):
        c_row = cost[i - 1]
        for j in range(1, m + 1):
            c0, c1, c2 = D[i - 1, j - 1], D[i - 1, j], D[i, j - 1]
            if c0 < c1 and c0 < c2:
                D[i, j] = c0 + c_row[j - 1]
                trace[i, j] = 0
            elif c1 < c0 and c1 < c2:
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


def token_emission_times(
    attn: np.ndarray,  # [L, 1, H, T, 1500] for one item
    n_prefix: int,
    n_frames: int,
    cfg: WhisperConfig,
    heads: Optional[Sequence[Tuple[int, int]]] = None,
) -> np.ndarray:
    """Emission times (seconds) for the generated tokens + EOT.

    OpenAI timing.py `find_alignment` recipe, exactly: stack the alignment
    heads' cross-attention, truncate to the valid audio frames and
    renormalize (== softmax over the truncated frames), z-normalize over
    the token axis per (head, frame) with population std, median-filter
    over audio time, average heads, take the rows whose NEXT-token
    emission is a text token or EOT (row i attends while predicting token
    i+1, hence rows n_prefix-1 .. T-2), DTW, and read each row's first
    path occurrence ("jump") as its emission time.

    attn covers the teacher-forced sequence prefix + text + [eot] of
    length T; returns [T - n_prefix] times for [text..., eot]."""
    heads = heads or alignment_heads(cfg)
    w = np.stack([attn[l, 0, h] for l, h in heads])  # [NH, T, 1500]
    w = w[:, :, : max(n_frames, 1)].astype(np.float64)
    w = w / (w.sum(-1, keepdims=True) + 1e-10)
    mean = w.mean(-2, keepdims=True)
    std = w.std(-2, keepdims=True)  # ddof=0: torch.std_mean(unbiased=False)
    w = (w - mean) / (std + 1e-10)
    w = _median_filter(w)
    matrix = w.mean(0)  # [T, frames]
    matrix = matrix[max(n_prefix, 1) - 1 : -1]
    text_idx, audio_idx = dtw_path(-matrix)
    jumps = np.pad(np.diff(text_idx), (1, 0), constant_values=1).astype(bool)
    return audio_idx[jumps] * TIME_PER_FRAME  # one per matrix row


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
    text_toks = [t for t in tokens if t < cfg.eot]
    if not text_toks or not prefix:
        return []
    full = list(prefix) + text_toks + [cfg.eot]
    # Pad to a length bucket so the teacher-forced pass compiles once per
    # bucket, not per token count (causal attention: padding after the real
    # tokens cannot affect their rows).
    bucket = min(-(-len(full) // 64) * 64, cfg.n_text_ctx)
    padded = full[:bucket] + [cfg.eot] * (bucket - len(full))
    arr = jnp.asarray(padded, jnp.int32)[None]
    attn = np.asarray(decoder_cross_attention(params, arr, xa, cfg))
    attn = attn[:, :, :, : len(full)]
    # jump_times[i] = emission time of text_toks[i]; [-1] = EOT emission
    # (OpenAI timing.py: word start = first token's jump, word end = next
    # group's jump — words tile the audio contiguously).
    jump_times = token_emission_times(
        attn, len(prefix), n_frames, cfg, heads=heads
    )
    n_text = len(text_toks)
    if len(jump_times) != n_text + 1:  # bucket truncation dropped tokens
        n_text = max(len(jump_times) - 1, 0)
        text_toks = text_toks[:n_text]

    # Group tokens into words at space boundaries.
    groups: List[List[int]] = []  # token INDEX groups
    for i, tok in enumerate(text_toks):
        piece = tokenizer.decode([tok])
        if groups and not piece.startswith(" "):
            groups[-1].append(i)
        else:
            groups.append([i])

    words: List[WordTiming] = []
    for g, group in enumerate(groups):
        text = tokenizer.decode([text_toks[i] for i in group]).strip()
        if not text:
            continue
        start = float(jump_times[group[0]])
        next_idx = groups[g + 1][0] if g + 1 < len(groups) else n_text
        end = float(jump_times[next_idx])
        words.append(WordTiming(text, start, end))
    return words
