"""Pipeline-parallel schedule correctness on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from spittle_tpu.parallel.pipeline_parallel import pipeline_apply, stack_to_stages


def mlp_block(params, x):
    """Apply a stage's stack of simple MLP layers sequentially."""

    def body(h, layer):
        return jnp.tanh(h @ layer["w"] + layer["b"]), None

    out, _ = jax.lax.scan(body, x, params)
    return out


@pytest.mark.parametrize("stages", [2, 4])
def test_pipeline_matches_sequential(stages):
    devices = jax.devices()
    if len(devices) < stages:
        pytest.skip("not enough devices")
    mesh = Mesh(np.asarray(devices[:stages]), ("stage",))

    L, D, M, MB = 8, 16, 6, 4
    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.standard_normal((L, D, D)) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((L, D)) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((M, MB, D)), jnp.float32)

    # Sequential reference: all L layers on every microbatch.
    ref = mlp_block(params, x.reshape(M * MB, D)).reshape(M, MB, D)

    staged = stack_to_stages(params, stages)
    out = pipeline_apply(mesh, "stage", mlp_block, staged, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
