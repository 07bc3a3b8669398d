"""HF flan-t5 checkpoint -> stacked JAX parameter tree.

Maps a torch T5ForConditionalGeneration state_dict (or the safetensors
equivalent downloaded the way the reference's CleanupManager pulls
flan-t5-small from HF, cleanup.rs:105-160) into model.py's layout:
per-layer weights stacked on a leading [L] axis, torch [out, in] Linear
weights transposed to matmul-ready [in, out].
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from .model import Params, T5Config


def _stack(tensors: Dict[str, np.ndarray], fmt: str, layers: int,
           transpose: bool = True) -> jnp.ndarray:
    mats = [tensors[fmt.format(i)] for i in range(layers)]
    if transpose:
        mats = [m.T for m in mats]
    return jnp.asarray(np.stack(mats))


def params_from_hf_tensors(tensors: Dict[str, np.ndarray],
                           cfg: T5Config) -> Params:
    t = {k: np.asarray(v) for k, v in tensors.items()}
    L = cfg.num_layers

    def blocks(side: str, cross: bool):
        attn = f"{side}.block.{{}}.layer.0.SelfAttention"
        ff_idx = 2 if cross else 1
        ff = f"{side}.block.{{}}.layer.{ff_idx}.DenseReluDense"
        out = {
            "attn_ln": _stack(
                t, f"{side}.block.{{}}.layer.0.layer_norm.weight", L, False
            ),
            "wq": _stack(t, attn + ".q.weight", L),
            "wk": _stack(t, attn + ".k.weight", L),
            "wv": _stack(t, attn + ".v.weight", L),
            "wo": _stack(t, attn + ".o.weight", L),
            "mlp_ln": _stack(
                t, f"{side}.block.{{}}.layer.{ff_idx}.layer_norm.weight",
                L, False,
            ),
            "wi0": _stack(t, ff + ".wi_0.weight", L),
            "wi1": _stack(t, ff + ".wi_1.weight", L),
            "wo_ff": _stack(t, ff + ".wo.weight", L),
        }
        if cross:
            cattn = f"{side}.block.{{}}.layer.1.EncDecAttention"
            out.update({
                "cross_ln": _stack(
                    t, f"{side}.block.{{}}.layer.1.layer_norm.weight", L,
                    False,
                ),
                "cross_wq": _stack(t, cattn + ".q.weight", L),
                "cross_wk": _stack(t, cattn + ".k.weight", L),
                "cross_wv": _stack(t, cattn + ".v.weight", L),
                "cross_wo": _stack(t, cattn + ".o.weight", L),
            })
        return out

    shared = jnp.asarray(t["shared.weight"])
    lm_head = (
        jnp.asarray(t["lm_head.weight"].T)
        if "lm_head.weight" in t
        # tied-embedding checkpoints (original T5): scaled shared table
        else shared.T * cfg.d_model**-0.5
    )
    return {
        "shared_emb": shared,
        "lm_head": lm_head,
        "encoder": {
            "rel_bias": jnp.asarray(
                t["encoder.block.0.layer.0.SelfAttention"
                  ".relative_attention_bias.weight"]
            ),
            "blocks": blocks("encoder", False),
            "ln": jnp.asarray(t["encoder.final_layer_norm.weight"]),
        },
        "decoder": {
            "rel_bias": jnp.asarray(
                t["decoder.block.0.layer.0.SelfAttention"
                  ".relative_attention_bias.weight"]
            ),
            "blocks": blocks("decoder", True),
            "ln": jnp.asarray(t["decoder.final_layer_norm.weight"]),
        },
    }


def load_t5_dir(model_dir: str, cfg: T5Config | None = None):
    """Load (cfg, params) from an HF checkpoint dir (safetensors +
    config.json)."""
    import json
    import os

    from spittle_tpu.models.whisper.weights import load_safetensors_dir

    cfg_path = os.path.join(model_dir, "config.json")
    if cfg is None and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            hf = json.load(f)
        cfg = T5Config(
            vocab_size=hf["vocab_size"], d_model=hf["d_model"],
            d_kv=hf["d_kv"], d_ff=hf["d_ff"], num_layers=hf["num_layers"],
            num_heads=hf["num_heads"],
            rel_buckets=hf.get("relative_attention_num_buckets", 32),
            rel_max_distance=hf.get("relative_attention_max_distance", 128),
            eos_id=hf.get("eos_token_id", 1),
            pad_id=hf.get("pad_token_id", 0),
        )
    assert cfg is not None
    return cfg, params_from_hf_tensors(load_safetensors_dir(model_dir), cfg)
