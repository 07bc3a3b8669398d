"""Expert parallelism (ep): Switch-style top-1 MoE FFN over a device mesh.

The reference has nothing distributed (SURVEY.md §2.8) and the speech
models here are dense, so this module exists to complete the rebuild's
parallelism checklist (dp/tp/pp/sp/ep) with the TPU-idiomatic pattern: a
top-1 routed mixture-of-experts feed-forward whose expert weights are
sharded over the mesh's 'model' axis. Routing is expressed as dense
dispatch/combine einsums (Switch Transformer style) under `pjit` — with
the expert axis sharded, XLA's SPMD partitioner inserts the all-to-all /
all-gather collectives; nothing is hand-scheduled.

Capacity semantics: each expert processes at most C = ceil(N/E * cf)
tokens; overflow tokens are dropped (their output is the residual zero),
exactly like the public Switch/GShard recipes.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

Params = Dict[str, Any]


def init_moe_params(key, d_model: int, d_ff: int, n_experts: int,
                    dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    s1 = d_model**-0.5
    s2 = d_ff**-0.5
    return {
        "router_w": (jax.random.normal(k1, (d_model, n_experts)) * s1).astype(
            jnp.float32
        ),
        "w_in": (jax.random.normal(k2, (n_experts, d_model, d_ff)) * s1)
        .astype(dtype),
        "w_out": (jax.random.normal(k3, (n_experts, d_ff, d_model)) * s2)
        .astype(dtype),
    }


def moe_param_specs() -> Params:
    """PartitionSpecs: experts shard over the mesh's 'model' axis."""
    return {
        "router_w": P(None, None),
        "w_in": P("model", None, None),
        "w_out": P("model", None, None),
    }


def shard_moe_params(params: Params, mesh) -> Params:
    specs = moe_param_specs()
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in params.items()
    }


def moe_ffn(params: Params, x: jnp.ndarray, capacity_factor: float = 1.25):
    """Top-1 routed MoE feed-forward.

    x: [N, D] tokens (flatten [B, T, D] first). Returns ([N, D] output,
    aux) where aux carries the load-balancing loss (Switch eq. 4) and the
    per-expert assignment counts.
    """
    n, d = x.shape
    e = params["w_in"].shape[0]
    capacity = max(int(-(-n // e) * capacity_factor), 1)

    router_logits = x.astype(jnp.float32) @ params["router_w"]  # [N, E]
    probs = jax.nn.softmax(router_logits, axis=-1)
    expert_idx = jnp.argmax(probs, axis=-1)  # [N]
    gate = jnp.take_along_axis(probs, expert_idx[:, None], axis=1)[:, 0]

    onehot = jax.nn.one_hot(expert_idx, e, dtype=jnp.float32)  # [N, E]
    # Position of each token within its expert's queue; >= capacity drops.
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0  # [N, E], -1 elsewhere
    kept = (pos >= 0) & (pos < capacity)
    pos_cap = jnp.clip(pos, 0, capacity - 1).astype(jnp.int32)
    dispatch = (
        onehot[:, :, None]
        * kept.astype(jnp.float32)[:, :, None]
        * jax.nn.one_hot(pos_cap, capacity, dtype=jnp.float32)
    )  # [N, E, C]

    xd = x.astype(jnp.float32)
    expert_in = jnp.einsum("nec,nd->ecd", dispatch, xd)
    expert_in = expert_in.astype(params["w_in"].dtype)
    h = jax.nn.gelu(
        jnp.einsum("ecd,edf->ecf", expert_in, params["w_in"]),
        approximate=False,
    )
    expert_out = jnp.einsum("ecf,efd->ecd", h, params["w_out"])
    combine = dispatch * gate[:, None, None].astype(jnp.float32)
    out = jnp.einsum("nec,ecd->nd", combine, expert_out.astype(jnp.float32))

    # Switch load-balancing loss: E * sum_e(fraction_tokens_e * mean_prob_e).
    frac = jnp.mean(onehot, axis=0)
    mean_prob = jnp.mean(probs, axis=0)
    aux_loss = e * jnp.sum(frac * mean_prob)
    return out.astype(x.dtype), {
        "aux_loss": aux_loss,
        "expert_counts": jnp.sum(onehot, axis=0),
        "dropped": n - jnp.sum(dispatch),
    }


def moe_ffn_dense_reference(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Per-token dense evaluation of the routed expert (oracle for tests;
    no capacity drops)."""
    probs = jax.nn.softmax(x.astype(jnp.float32) @ params["router_w"], axis=-1)
    idx = jnp.argmax(probs, axis=-1)
    gate = jnp.take_along_axis(probs, idx[:, None], axis=1)[:, 0]
    w_in = params["w_in"][idx].astype(jnp.float32)  # [N, D, F]
    w_out = params["w_out"][idx].astype(jnp.float32)
    h = jax.nn.gelu(jnp.einsum("nd,ndf->nf", x.astype(jnp.float32), w_in),
                    approximate=False)
    out = jnp.einsum("nf,nfd->nd", h, w_out) * gate[:, None]
    return out.astype(x.dtype)
