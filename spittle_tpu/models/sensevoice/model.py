"""SenseVoice-Small: SAN-M encoder + CTC, non-autoregressive (FunASR).

The reference's SenseVoiceEngine slot (transcribe-rs int8 ONNX,
`managers/transcription.rs:321-339`; catalog `sense-voice-int8`, languages
zh/en/ja/ko/yue with `use_itn`). Faithful to the public FunASR
SenseVoiceSmall graph so its released weights load directly
(weights.py maps the state_dict names):

- LFR-stacked fbank (7 stacked / stride 6 -> 560-dim frames), optional
  Kaldi-style CMVN (shift + rescale) on the stacked features;
- 4 prompt frames from a 16-entry `embed` table of *input* width
  (language id / event / emotion / text-norm — the reference's `language`
  and `use_itn` params pick them), concatenated before the encoder;
- input scaled by sqrt(d_model) plus 1-based sinusoidal positions;
- SAN-M blocks: fused q/k/v linear, attention out-projection PLUS an FSMN
  memory branch (depthwise conv over V with residual, NOT through the out
  projection); the first block projects 560 -> 512 and skips its
  attention residual (in_size != size);
- after_norm -> tp (timestamp-predictor) blocks -> tp_norm -> CTC head,
  decoded greedily. Non-autoregressive: one batched pass per utterance —
  naturally TPU-shaped.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

LANGUAGES = ("auto", "zh", "en", "yue", "ja", "ko", "nospeech")
# FunASR SenseVoiceSmall prompt ids: lid_dict + event(1)/emo(2) queries +
# textnorm_dict {withitn: 14, woitn: 15}.
LID_IDS = {"auto": 0, "zh": 3, "en": 4, "yue": 7, "ja": 11, "ko": 12,
           "nospeech": 13}
EVENT_ID = 1
EMO_ID = 2
WITHITN_ID = 14
WOITN_ID = 15


@dataclass(frozen=True)
class SenseVoiceConfig:
    name: str = "sense-voice-small"
    n_mels: int = 80
    lfr_m: int = 7  # frames stacked
    lfr_n: int = 6  # stride
    d_model: int = 512
    n_heads: int = 4
    ff_dim: int = 2048
    n_blocks: int = 50  # encoders0 (1) + encoders (n_blocks - 1)
    tp_blocks: int = 20  # timestamp-predictor blocks feeding the CTC head
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
        n_blocks=2, tp_blocks=1, vocab_size=64,
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


def sinusoidal_positions(t: int, depth: int) -> np.ndarray:
    """FunASR SinusoidalPositionEncoder: 1-based positions,
    [sin | cos] split at depth/2."""
    positions = np.arange(1, t + 1, dtype=np.float32)
    half = depth // 2
    log_inc = np.log(10000.0) / (half - 1)
    inv = np.exp(np.arange(half, dtype=np.float32) * -log_inc)
    scaled = positions[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)


def _norm(x, g, b):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    # torch LayerNorm default eps (FunASR uses nn.LayerNorm defaults)
    return (((x32 - mean) * jax.lax.rsqrt(var + 1e-5)) * g + b).astype(x.dtype)


def _w(key, shape, scale, dtype):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def _layer_params(ks, in_dim: int, d: int, ff: int, k: int, dtype,
                  stacked: int | None = None):
    def shape(*s):
        return (stacked, *s) if stacked else s

    def ones(*s):
        return jnp.ones(shape(*s), jnp.float32)

    def zeros(*s):
        return jnp.zeros(shape(*s), dtype)

    return {
        "ln1_g": ones(in_dim), "ln1_b": jnp.zeros(shape(in_dim), jnp.float32),
        "wqkv": _w(next(ks), shape(in_dim, 3 * d), in_dim**-0.5, dtype),
        "bqkv": zeros(3 * d),
        "fsmn_w": _w(next(ks), shape(d, k), 0.1, dtype),
        "wo": _w(next(ks), shape(d, d), d**-0.5, dtype),
        "bo": zeros(d),
        "ln2_g": ones(d), "ln2_b": jnp.zeros(shape(d), jnp.float32),
        "ff_w1": _w(next(ks), shape(d, ff), d**-0.5, dtype),
        "ff_b1": zeros(ff),
        "ff_w2": _w(next(ks), shape(ff, d), ff**-0.5, dtype),
        "ff_b2": zeros(d),
    }


def init_params(cfg: SenseVoiceConfig, key=None, dtype=jnp.float32) -> Params:
    if key is None:
        key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 64))
    d, ff, k = cfg.d_model, cfg.ff_dim, cfg.fsmn_kernel
    return {
        "embed": _w(next(ks), (16, cfg.input_dim), 0.02, dtype),
        "enc0": _layer_params(ks, cfg.input_dim, d, ff, k, dtype),
        "blocks": _layer_params(ks, d, d, ff, k, dtype,
                                stacked=cfg.n_blocks - 1),
        "after_ln_g": jnp.ones((d,), jnp.float32),
        "after_ln_b": jnp.zeros((d,), jnp.float32),
        "tp_blocks": _layer_params(ks, d, d, ff, k, dtype,
                                   stacked=cfg.tp_blocks),
        "tp_ln_g": jnp.ones((d,), jnp.float32),
        "tp_ln_b": jnp.zeros((d,), jnp.float32),
        "ctc_w": _w(next(ks), (d, cfg.vocab_size), d**-0.5, dtype),
        "ctc_b": jnp.zeros((cfg.vocab_size,), dtype),
    }


def _sanm_layer(x, blk, n_heads: int, d: int, residual_attn: bool):
    """One SAN-M encoder layer (FunASR EncoderLayerSANM semantics)."""
    k_size = blk["fsmn_w"].shape[-1]
    res = x
    xn = _norm(x, blk["ln1_g"], blk["ln1_b"])
    qkv = xn @ blk["wqkv"] + blk["bqkv"]
    q, kk, v = jnp.split(qkv, 3, axis=-1)  # each [B, T, D]
    b, t, _ = q.shape
    dh = d // n_heads
    qh = q.reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3) * dh**-0.5
    kh = kk.reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, d)
    # FSMN memory: depthwise conv over V plus residual — added AFTER the
    # attention out-projection (forward_fsmn + linear_out(att)).
    pad_l = (k_size - 1) // 2
    mem = jax.lax.conv_general_dilated(
        v.transpose(0, 2, 1), blk["fsmn_w"][:, None, :],
        window_strides=(1,), padding=[(pad_l, k_size - 1 - pad_l)],
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=d,
    ).transpose(0, 2, 1) + v
    x = attn @ blk["wo"] + blk["bo"] + mem
    if residual_attn:
        x = x + res
    res = x
    xn = _norm(x, blk["ln2_g"], blk["ln2_b"])
    x = jax.nn.relu(xn @ blk["ff_w1"] + blk["ff_b1"]) @ blk["ff_w2"] + blk["ff_b2"]
    return x + res


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(
    params: Params,
    features: jnp.ndarray,  # [B, T', input_dim] LFR-stacked
    prompt_ids: jnp.ndarray,  # [B, n_prompt] into the 16-entry embed table
    cfg: SenseVoiceConfig,
) -> jnp.ndarray:
    """-> CTC logits [B, n_prompt + T', vocab]."""
    d = cfg.d_model
    if "cmvn_shift" in params:
        features = (features + params["cmvn_shift"]) * params["cmvn_scale"]
    # Compute in the weight dtype: float32 LFR features against bf16
    # weights would promote every activation back to f32 and crash the
    # depthwise FSMN conv on the dtype mismatch.
    features = features.astype(params["enc0"]["wqkv"].dtype)
    prompts = params["embed"][prompt_ids].astype(features.dtype)
    x = jnp.concatenate([prompts, features], axis=1)
    x = x * (d**0.5)
    pe = jnp.asarray(sinusoidal_positions(x.shape[1], cfg.input_dim))
    x = x + pe[None].astype(x.dtype)

    x = _sanm_layer(x, params["enc0"], cfg.n_heads, d, residual_attn=False)

    def body(h, blk):
        return _sanm_layer(h, blk, cfg.n_heads, d, residual_attn=True), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = _norm(x, params["after_ln_g"], params["after_ln_b"])
    x, _ = jax.lax.scan(body, x, params["tp_blocks"])
    x = _norm(x, params["tp_ln_g"], params["tp_ln_b"])
    return (x @ params["ctc_w"] + params["ctc_b"]).astype(jnp.float32)


def ctc_collapse_ids(
    ids: np.ndarray, blank_id: int = 0, skip: int = 4
) -> List[List[int]]:
    """Collapse repeats -> drop blanks on per-frame argmax ids [B, T].
    `skip` drops the prompt frames at the front. The argmax should run
    on device (the id matrix is kB; the full logits are hundreds of MB
    at the 25k CTC vocab)."""
    out = []
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


def ctc_greedy_decode(
    logits: np.ndarray, blank_id: int = 0, skip: int = 4
) -> List[List[int]]:
    """Per-item argmax -> collapse repeats -> drop blanks (host-side
    convenience for tests/small inputs; production argmaxes on device
    and calls ctc_collapse_ids)."""
    return ctc_collapse_ids(np.argmax(logits, axis=-1), blank_id, skip)


def prompt_ids_for(
    cfg: SenseVoiceConfig, language: str = "auto", use_itn: bool = True
) -> np.ndarray:
    """[lid, event, emotion, textnorm] FunASR prompt-table indices."""
    lid = LID_IDS.get(language, 0)
    textnorm = WITHITN_ID if use_itn else WOITN_ID
    return np.asarray([lid, EVENT_ID, EMO_ID, textnorm], np.int64)


# -- Kaldi-style CMVN (am.mvn) -------------------------------------------------

def parse_kaldi_cmvn(path: str) -> Optional[Dict[str, np.ndarray]]:
    """FunASR am.mvn: <AddShift> means + <Rescale> inverse stddevs over the
    LFR-stacked feature width."""
    with open(path, encoding="utf-8") as f:
        text = f.read()
    import re

    def section_vector(tag: str) -> Optional[np.ndarray]:
        m = re.search(tag + r".*?\[([^\]]*)\]", text, re.DOTALL)
        if not m or not m.group(1).strip():
            return None
        return np.asarray([float(v) for v in m.group(1).split()], np.float32)

    shift = section_vector(r"<AddShift>")
    scale = section_vector(r"<Rescale>")
    if shift is None or scale is None:
        return None
    return {"cmvn_shift": shift, "cmvn_scale": scale}
