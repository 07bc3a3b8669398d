"""GPipe-style pipeline parallelism over stacked transformer layers.

The stacked-[L] layer layout (models.whisper / models.parakeet) makes
pipeline stages a pure reshape: [L, ...] -> [S, L/S, ...] with the stage
axis sharded over a mesh axis. Microbatches flow through stages with
`shard_map` + `ppermute` (GPipe schedule): at step t, stage s processes
microbatch t-s, so a full round takes M + S - 1 steps. Used by the
multichip dry-run to exercise pp alongside dp/tp/sp; inference serving
normally prefers dp+tp (depth fits one chip for these models).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(
    mesh: Mesh,
    axis: str,
    block_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stage_params: Any,
    microbatches: jnp.ndarray,  # [M, mb, ...] all microbatches
) -> jnp.ndarray:
    """Run microbatches through S pipeline stages on mesh axis `axis`.

    stage_params: pytree whose leaves have leading dim [S, L/S, ...] —
    sharded so each device holds its stage's layers. block_fn(params_1stage,
    x) applies one stage's layers to a microbatch. Returns outputs [M, mb, ...].
    """
    s = mesh.shape[axis]
    m = microbatches.shape[0]
    steps = m + s - 1

    param_specs = jax.tree.map(lambda _: P(axis), stage_params)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, P()),  # microbatches replicated
        out_specs=P(),
        check_vma=False,
    )
    def run(params_local, mbs):
        # params_local leaves: [1, L/S, ...] (this stage's layers)
        params_local = jax.tree.map(lambda a: a[0], params_local)
        stage = jax.lax.axis_index(axis)
        mb_shape = mbs.shape[1:]
        state = jnp.zeros(mb_shape, mbs.dtype)  # current in-flight activation
        outputs = jnp.zeros_like(mbs)

        def step(carry, t):
            state, outputs = carry
            # Stage 0 ingests microbatch t (when valid); others use the
            # activation received from the previous stage.
            feed = jax.lax.dynamic_index_in_dim(
                mbs, jnp.clip(t, 0, m - 1), axis=0, keepdims=False
            )
            x = jnp.where(stage == 0, feed, state)
            y = block_fn(params_local, x)
            # Last stage emits microbatch t - (s - 1) when in range.
            out_idx = t - (s - 1)
            valid_out = (stage == s - 1) & (out_idx >= 0) & (out_idx < m)
            outputs = jax.lax.cond(
                valid_out,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, y, jnp.clip(out_idx, 0, m - 1), axis=0
                ),
                lambda o: o,
                outputs,
            )
            # Rotate activations to the next stage.
            next_state = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % s) for i in range(s)]
            )
            return (next_state, outputs), None

        (_, outputs), _ = jax.lax.scan(
            step, (state, outputs), jnp.arange(steps)
        )
        # Only the last stage holds real outputs; share them with everyone.
        outputs = jax.lax.ppermute(
            outputs, axis, [(i, (i + 1) % s) for i in range(s)]
        )  # stage s-1 -> stage 0
        # Broadcast from stage 0 by summing one-hot contributions.
        keep = (jax.lax.axis_index(axis) == 0).astype(outputs.dtype)
        return jax.lax.psum(outputs * keep, axis)

    return run(stage_params, microbatches)


def stack_to_stages(stacked: Any, num_stages: int) -> Any:
    """[L, ...] pytree -> [S, L/S, ...] for pipeline_apply."""

    def reshape(a):
        l = a.shape[0]
        assert l % num_stages == 0, (l, num_stages)
        return a.reshape(num_stages, l // num_stages, *a.shape[1:])

    return jax.tree.map(reshape, stacked)
