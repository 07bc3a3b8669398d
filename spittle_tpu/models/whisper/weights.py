"""Whisper checkpoint loading: HF safetensors and whisper.cpp GGML.

The reference's model manager downloads whisper.cpp GGML files
(`/root/reference/src-tauri/resources/model_catalog.json`: ggml-small.bin,
whisper-medium-q4_1.bin, ggml-large-v3-turbo.bin, ggml-large-v3-q5_0.bin,
breeze-asr-q5_k.bin) and custom user `.bin` models discovered on disk
(`managers/model.rs:265-382`). This module reads those files directly —
header, mel filterbank, vocabulary, and tensors with dequantization of the
common GGML quant formats — plus HF-format safetensors checkpoints, mapping
both into the spittle_tpu stacked-layer parameter tree.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .config import WhisperConfig

# ---------------------------------------------------------------------------
# GGML dequantization (public whisper.cpp/ggml block formats)
# ---------------------------------------------------------------------------

GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q5_0, GGML_Q5_1 = 6, 7
GGML_Q8_0 = 8
# ggml ftype ids in tensor headers:
_TENSOR_TYPE_SIZES = {
    GGML_F32: (1, 4),  # (block elems, block bytes)
    GGML_F16: (1, 2),
    GGML_Q4_0: (32, 2 + 16),
    GGML_Q4_1: (32, 4 + 16),
    GGML_Q5_0: (32, 2 + 4 + 16),
    GGML_Q5_1: (32, 4 + 4 + 16),
    GGML_Q8_0: (32, 2 + 32),
}


def _dequant(data: bytes, ttype: int, n: int) -> np.ndarray:
    """Dequantize a GGML tensor payload to float32 (n elements)."""
    if ttype == GGML_F32:
        return np.frombuffer(data, np.float32, n).copy()
    if ttype == GGML_F16:
        return np.frombuffer(data, np.float16, n).astype(np.float32)
    block_n, block_b = _TENSOR_TYPE_SIZES[ttype]
    nb = n // block_n
    raw = np.frombuffer(data, np.uint8, nb * block_b).reshape(nb, block_b)

    def f16(cols):
        return raw[:, cols].copy().view(np.float16).astype(np.float32)[:, 0]

    if ttype == GGML_Q4_0:
        d = f16(range(2))[:, None]
        q = raw[:, 2:18]
        lo = (q & 0x0F).astype(np.int8) - 8
        hi = (q >> 4).astype(np.int8) - 8
        vals = np.concatenate([lo, hi], axis=1).astype(np.float32)
        return (vals * d).reshape(-1)[:n]
    if ttype == GGML_Q4_1:
        d = f16(range(2))[:, None]
        m = f16(range(2, 4))[:, None]
        q = raw[:, 4:20]
        lo = (q & 0x0F).astype(np.float32)
        hi = (q >> 4).astype(np.float32)
        vals = np.concatenate([lo, hi], axis=1)
        return (vals * d + m).reshape(-1)[:n]
    if ttype == GGML_Q5_0:
        d = f16(range(2))[:, None]
        qh = raw[:, 2:6].copy().view(np.uint32)[:, 0]
        q = raw[:, 6:22]
        bits = (qh[:, None] >> np.arange(32)[None, :]) & 1
        lo = (q & 0x0F).astype(np.int32) | (bits[:, :16] << 4)
        hi = (q >> 4).astype(np.int32) | (bits[:, 16:] << 4)
        vals = (np.concatenate([lo, hi], axis=1) - 16).astype(np.float32)
        return (vals * d).reshape(-1)[:n]
    if ttype == GGML_Q5_1:
        d = f16(range(2))[:, None]
        m = f16(range(2, 4))[:, None]
        qh = raw[:, 4:8].copy().view(np.uint32)[:, 0]
        q = raw[:, 8:24]
        bits = (qh[:, None] >> np.arange(32)[None, :]) & 1
        lo = (q & 0x0F).astype(np.int32) | (bits[:, :16] << 4)
        hi = (q >> 4).astype(np.int32) | (bits[:, 16:] << 4)
        vals = np.concatenate([lo, hi], axis=1).astype(np.float32)
        return (vals * d + m).reshape(-1)[:n]
    if ttype == GGML_Q8_0:
        d = f16(range(2))[:, None]
        q = raw[:, 2:34].copy().view(np.int8).astype(np.float32)
        return (q * d).reshape(-1)[:n]
    raise ValueError(f"unsupported ggml tensor type {ttype}")


GGML_MAGIC = 0x67676D6C  # 'ggml'


def load_ggml(path: str) -> Tuple[WhisperConfig, Dict[str, np.ndarray],
                                   np.ndarray, List[bytes]]:
    """Parse a whisper.cpp GGML model file.

    Returns (config, raw tensor dict keyed by OpenAI names, mel filterbank
    [n_mels, 201], vocab token bytes list).
    """
    with open(path, "rb") as f:
        buf = f.read()
    off = 0

    def u32():
        nonlocal off
        (v,) = struct.unpack_from("<i", buf, off)
        off += 4
        return v

    magic = struct.unpack_from("<I", buf, 0)[0]
    off = 4
    if magic != GGML_MAGIC:
        raise ValueError(f"{path}: not a ggml file (magic {magic:#x})")

    (n_vocab, n_audio_ctx, n_audio_state, n_audio_head, n_audio_layer,
     n_text_ctx, n_text_state, n_text_head, n_text_layer, n_mels,
     ftype) = (u32() for _ in range(11))

    cfg = WhisperConfig(
        name=os.path.basename(path),
        n_mels=n_mels,
        n_audio_ctx=n_audio_ctx,
        n_audio_state=n_audio_state,
        n_audio_head=n_audio_head,
        n_audio_layer=n_audio_layer,
        n_vocab=n_vocab,
        n_text_ctx=n_text_ctx,
        n_text_state=n_text_state,
        n_text_head=n_text_head,
        n_text_layer=n_text_layer,
    )

    # mel filterbank
    fb_mel = u32()
    fb_fft = u32()
    filters = np.frombuffer(buf, np.float32, fb_mel * fb_fft, off).reshape(
        fb_mel, fb_fft
    ).copy()
    off += 4 * fb_mel * fb_fft

    # vocabulary
    vn = u32()
    vocab: List[bytes] = []
    for _ in range(vn):
        ln = u32()
        vocab.append(buf[off : off + ln])
        off += ln

    tensors: Dict[str, np.ndarray] = {}
    while off < len(buf):
        n_dims = u32()
        name_len = u32()
        ttype = u32()
        dims = [u32() for _ in range(n_dims)]
        name = buf[off : off + name_len].decode()
        off += name_len
        n = int(np.prod(dims))
        block_n, block_b = _TENSOR_TYPE_SIZES[ttype]
        nbytes = (n // block_n) * block_b
        vals = _dequant(buf[off : off + nbytes], ttype, n)
        off += nbytes
        # ggml dims are reversed relative to row-major numpy
        tensors[name] = vals.reshape(tuple(reversed(dims)))
    return cfg, tensors, filters, vocab


# ---------------------------------------------------------------------------
# safetensors (HF format)
# ---------------------------------------------------------------------------


def load_safetensors_dir(model_dir: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    tensors: Dict[str, np.ndarray] = {}
    for fname in sorted(os.listdir(model_dir)):
        if fname.endswith(".safetensors"):
            tensors.update(load_file(os.path.join(model_dir, fname)))
    if not tensors:
        raise FileNotFoundError(f"no .safetensors in {model_dir}")
    return tensors


# ---------------------------------------------------------------------------
# Mapping into the stacked parameter tree
# ---------------------------------------------------------------------------


def _stack(arrs: List[np.ndarray]) -> np.ndarray:
    return np.stack(arrs, axis=0)


def params_from_openai_tensors(
    t: Dict[str, np.ndarray], cfg: WhisperConfig, dtype=np.float32
) -> Dict[str, Any]:
    """OpenAI-naming tensors (GGML files use these) -> stacked param tree.

    Linear weights are [out, in] on disk; our convention is x @ w = [in, out].
    """

    def lin(name):
        return np.ascontiguousarray(t[name].T).astype(dtype)

    def get(name):
        return t[name].astype(dtype)

    def enc_block_stack(n, fmt):
        keys = {
            "attn_ln_g": (f"{fmt}.attn_ln.weight", np.float32, False),
            "attn_ln_b": (f"{fmt}.attn_ln.bias", np.float32, False),
            "wq": (f"{fmt}.attn.query.weight", dtype, True),
            "bq": (f"{fmt}.attn.query.bias", dtype, False),
            "wk": (f"{fmt}.attn.key.weight", dtype, True),
            "wv": (f"{fmt}.attn.value.weight", dtype, True),
            "bv": (f"{fmt}.attn.value.bias", dtype, False),
            "wo": (f"{fmt}.attn.out.weight", dtype, True),
            "bo": (f"{fmt}.attn.out.bias", dtype, False),
            "mlp_ln_g": (f"{fmt}.mlp_ln.weight", np.float32, False),
            "mlp_ln_b": (f"{fmt}.mlp_ln.bias", np.float32, False),
            "fc1_w": (f"{fmt}.mlp.0.weight", dtype, True),
            "fc1_b": (f"{fmt}.mlp.0.bias", dtype, False),
            "fc2_w": (f"{fmt}.mlp.2.weight", dtype, True),
            "fc2_b": (f"{fmt}.mlp.2.bias", dtype, False),
        }
        out = {}
        for our, (name_fmt, dt, transpose) in keys.items():
            arrs = []
            for i in range(n):
                a = t[name_fmt.format(i=i)]
                if transpose:
                    a = np.ascontiguousarray(a.T)
                arrs.append(a.astype(dt))
            out[our] = _stack(arrs)
        return out

    enc_blocks = enc_block_stack(
        cfg.n_audio_layer, "encoder.blocks.{i}"
    )
    dec_blocks = enc_block_stack(cfg.n_text_layer, "decoder.blocks.{i}")
    cross_keys = {
        "cross_ln_g": ("decoder.blocks.{i}.cross_attn_ln.weight", np.float32, False),
        "cross_ln_b": ("decoder.blocks.{i}.cross_attn_ln.bias", np.float32, False),
        "cross_wq": ("decoder.blocks.{i}.cross_attn.query.weight", dtype, True),
        "cross_bq": ("decoder.blocks.{i}.cross_attn.query.bias", dtype, False),
        "cross_wk": ("decoder.blocks.{i}.cross_attn.key.weight", dtype, True),
        "cross_wv": ("decoder.blocks.{i}.cross_attn.value.weight", dtype, True),
        "cross_bv": ("decoder.blocks.{i}.cross_attn.value.bias", dtype, False),
        "cross_wo": ("decoder.blocks.{i}.cross_attn.out.weight", dtype, True),
        "cross_bo": ("decoder.blocks.{i}.cross_attn.out.bias", dtype, False),
    }
    for our, (name_fmt, dt, transpose) in cross_keys.items():
        arrs = []
        for i in range(cfg.n_text_layer):
            a = t[name_fmt.format(i=i)]
            if transpose:
                a = np.ascontiguousarray(a.T)
            arrs.append(a.astype(dt))
        dec_blocks[our] = _stack(arrs)

    params = {
        "encoder": {
            "conv1_w": get("encoder.conv1.weight"),
            "conv1_b": get("encoder.conv1.bias"),
            "conv2_w": get("encoder.conv2.weight"),
            "conv2_b": get("encoder.conv2.bias"),
            "blocks": enc_blocks,
            "ln_g": t["encoder.ln_post.weight"].astype(np.float32),
            "ln_b": t["encoder.ln_post.bias"].astype(np.float32),
        },
        "decoder": {
            "tok_emb": get("decoder.token_embedding.weight"),
            "pos_emb": get("decoder.positional_embedding"),
            "blocks": dec_blocks,
            "ln_g": t["decoder.ln.weight"].astype(np.float32),
            "ln_b": t["decoder.ln.bias"].astype(np.float32),
        },
    }
    return params


_HF_TO_OPENAI = [
    ("model.encoder.conv1.", "encoder.conv1."),
    ("model.encoder.conv2.", "encoder.conv2."),
    ("model.encoder.layer_norm.", "encoder.ln_post."),
    ("model.decoder.embed_tokens.weight", "decoder.token_embedding.weight"),
    ("model.decoder.embed_positions.weight", "decoder.positional_embedding"),
    ("model.decoder.layer_norm.", "decoder.ln."),
]

_HF_LAYER_MAP = {
    "self_attn.q_proj": "attn.query",
    "self_attn.k_proj": "attn.key",
    "self_attn.v_proj": "attn.value",
    "self_attn.out_proj": "attn.out",
    "self_attn_layer_norm": "attn_ln",
    "encoder_attn.q_proj": "cross_attn.query",
    "encoder_attn.k_proj": "cross_attn.key",
    "encoder_attn.v_proj": "cross_attn.value",
    "encoder_attn.out_proj": "cross_attn.out",
    "encoder_attn_layer_norm": "cross_attn_ln",
    "fc1": "mlp.0",
    "fc2": "mlp.2",
    "final_layer_norm": "mlp_ln",
}


def hf_to_openai_names(t: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename HF WhisperForConditionalGeneration tensors to OpenAI names."""
    out: Dict[str, np.ndarray] = {}
    for name, arr in t.items():
        mapped = None
        for pre, sub in _HF_TO_OPENAI:
            if name.startswith(pre):
                mapped = sub + name[len(pre):]
                break
        if mapped is None:
            for side, oside in (("encoder", "encoder"), ("decoder", "decoder")):
                pre = f"model.{side}.layers."
                if name.startswith(pre):
                    rest = name[len(pre):]
                    idx, sub = rest.split(".", 1)
                    for hf_key, oa_key in _HF_LAYER_MAP.items():
                        if sub.startswith(hf_key + "."):
                            tail = sub[len(hf_key) + 1 :]
                            mapped = f"{oside}.blocks.{idx}.{oa_key}.{tail}"
                            break
                    break
        if mapped is None:
            if name == "model.encoder.embed_positions.weight":
                mapped = "encoder.positional_embedding"
            elif name in ("proj_out.weight", "lm_head.weight"):
                continue  # tied to token embedding
            else:
                continue
        out[mapped] = arr
    return out


def save_npz_checkpoint(path: str, cfg: WhisperConfig, params,
                        vocab: Optional[Dict[bytes, int]] = None) -> None:
    """Spittle-native checkpoint: one .npz holding the stacked parameter
    tree (float leaves stored f16 — loaders cast back to the requested
    dtype; goldens are recorded against the SAVED artifact so the f16
    round-trip is part of the contract), the config as embedded JSON, and
    optionally the token table. Purpose: committable MB-scale trained
    checkpoints so fidelity tests run non-random weights in CI
    (VERDICT r3 next-round #2)."""
    import dataclasses
    import jax

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        arr = np.asarray(leaf)
        flat["param:" + name] = (
            arr.astype(np.float16) if arr.dtype.kind == "f" else arr
        )
    flat["__config__"] = np.frombuffer(
        json.dumps(dataclasses.asdict(cfg)).encode(), np.uint8
    )
    if vocab is not None:
        table = [""] * (max(vocab.values()) + 1)
        for tok, i in vocab.items():
            table[i] = tok.decode("latin1")
        flat["__vocab__"] = np.frombuffer(
            json.dumps(table).encode(), np.uint8
        )
    np.savez_compressed(path, **flat)


def load_npz_checkpoint(path: str, dtype=np.float32):
    """Inverse of save_npz_checkpoint -> (cfg, params, extras)."""
    z = np.load(path)
    cfg = WhisperConfig(**json.loads(bytes(z["__config__"]).decode()))
    params: Dict[str, Any] = {}
    for key in z.files:
        if not key.startswith("param:"):
            continue
        node = params
        parts = key[len("param:"):].split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = z[key]
        node[parts[-1]] = (
            arr.astype(dtype) if arr.dtype.kind == "f" else arr
        )
    extras: Dict[str, Any] = {}
    if "__vocab__" in z.files:
        table = json.loads(bytes(z["__vocab__"]).decode())
        extras["vocab"] = [t.encode("latin1") for t in table]
    return cfg, params, extras


def load_params(
    model_path: str, cfg: Optional[WhisperConfig] = None, dtype=np.float32
):
    """Load a Whisper checkpoint (GGML file, HF safetensors dir, or a
    spittle-native .npz from save_npz_checkpoint).

    Returns (cfg, params, extras) where extras may contain "mel_filters"
    and "vocab" (GGML files embed both; npz may embed "vocab").
    """
    import jax.numpy as jnp
    import jax

    if model_path.endswith(".npz"):
        cfg, params, extras = load_npz_checkpoint(model_path, dtype=dtype)
        params = jax.tree.map(jnp.asarray, params)
        return cfg, params, extras

    extras: Dict[str, Any] = {}
    if os.path.isdir(model_path):
        tensors = load_safetensors_dir(model_path)
        tensors = hf_to_openai_names(tensors)
        if cfg is None:
            cfg_file = os.path.join(model_path, "config.json")
            with open(cfg_file) as f:
                hf_cfg = json.load(f)
            cfg = WhisperConfig(
                name=os.path.basename(model_path),
                n_mels=hf_cfg["num_mel_bins"],
                n_audio_ctx=hf_cfg["max_source_positions"],
                n_audio_state=hf_cfg["d_model"],
                n_audio_head=hf_cfg["encoder_attention_heads"],
                n_audio_layer=hf_cfg["encoder_layers"],
                n_vocab=hf_cfg["vocab_size"],
                n_text_ctx=hf_cfg["max_target_positions"],
                n_text_state=hf_cfg["d_model"],
                n_text_head=hf_cfg["decoder_attention_heads"],
                n_text_layer=hf_cfg["decoder_layers"],
            )
    else:
        cfg_g, tensors, filters, vocab = load_ggml(model_path)
        cfg = cfg or cfg_g
        extras["mel_filters"] = filters
        extras["vocab"] = vocab
    params = params_from_openai_tensors(tensors, cfg, dtype=dtype)
    params = jax.tree.map(jnp.asarray, params)
    return cfg, params, extras
