"""Device mesh + sharding rules.

The reference is a single-process desktop app with no distributed layer
(SURVEY.md §2.8); scaling here comes from the TPU-native design: a
('data', 'model') mesh where batched utterances shard over 'data' and the
Whisper weights shard over 'model' (tensor parallelism over attention heads
and MLP hidden). XLA inserts the collectives (psum over ICI) from these
annotations — there is no hand-written communication.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    tp: int = 1,
    devices=None,
) -> Mesh:
    """('data', 'model') mesh over the first n_devices devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % tp == 0, (n, tp)
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, ("data", "model"))


# Sharding rules for the stacked Whisper parameter tree. Leaves not listed
# are replicated. Axis conventions per model.py:
#   wq/wk/wv [L, D, D]: output (head) dim sharded -> column parallel
#   wo       [L, D, D]: input dim sharded -> row parallel (psum after)
#   fc1 [L, D, 4D] column-parallel; fc2 [L, 4D, D] row-parallel
_BLOCK_RULES: Dict[str, P] = {
    "wq": P(None, None, "model"),
    "wk": P(None, None, "model"),
    "wv": P(None, None, "model"),
    "bq": P(None, "model"),
    "bv": P(None, "model"),
    "wo": P(None, "model", None),
    "fc1_w": P(None, None, "model"),
    "fc1_b": P(None, "model"),
    "fc2_w": P(None, "model", None),
    "cross_wq": P(None, None, "model"),
    "cross_wk": P(None, None, "model"),
    "cross_wv": P(None, None, "model"),
    "cross_bq": P(None, "model"),
    "cross_bv": P(None, "model"),
    "cross_wo": P(None, "model", None),
    # MoE-variant encoder blocks (cfg.moe_experts > 0): expert weights
    # shard over 'model' = expert parallelism; router replicates.
    "moe_w_in": P(None, "model", None, None),
    "moe_w_out": P(None, "model", None, None),
}

_TOP_RULES: Dict[str, P] = {
    "tok_emb": P("model", None),  # vocab-sharded; logits gather at argmax
}


def whisper_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching a Whisper parameter tree."""

    def spec_for(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in _BLOCK_RULES:
            return _BLOCK_RULES[name]
        if name in _TOP_RULES:
            return _TOP_RULES[name]
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a parameter tree onto the mesh per the sharding rules.

    Works on process-spanning (multi-host) meshes too: placement routes
    through parallel.multihost.global_put, which falls back to
    make_array_from_callback when the mesh holds non-addressable devices
    (jax.device_put can only fill local shards)."""
    from spittle_tpu.parallel.multihost import global_put

    specs = whisper_param_specs(params)
    return jax.tree.map(
        lambda leaf, spec: global_put(leaf, mesh, spec), params, specs
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))
