"""Expert parallelism (parallel/expert_parallel.py): routing correctness
and sharded execution over the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from spittle_tpu.parallel.expert_parallel import (
    init_moe_params,
    moe_ffn,
    moe_ffn_dense_reference,
    shard_moe_params,
)
from spittle_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup():
    params = init_moe_params(jax.random.PRNGKey(0), d_model=16, d_ff=32,
                             n_experts=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    return params, x


def test_matches_dense_reference_with_ample_capacity(setup):
    params, x = setup
    out, aux = moe_ffn(params, x, capacity_factor=8.0)  # no drops possible
    ref = moe_ffn_dense_reference(params, x)
    assert float(aux["dropped"]) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_capacity_drops_zero_output(setup):
    params, x = setup
    # capacity_factor small enough to force drops
    out, aux = moe_ffn(params, x, capacity_factor=0.25)
    assert float(aux["dropped"]) > 0
    ref = moe_ffn_dense_reference(params, x)
    # Dropped tokens produce exactly zero; kept tokens match the oracle.
    out_np, ref_np = np.asarray(out), np.asarray(ref)
    zero_rows = np.all(out_np == 0, axis=-1)
    assert zero_rows.sum() == float(aux["dropped"])
    np.testing.assert_allclose(out_np[~zero_rows], ref_np[~zero_rows],
                               atol=1e-5)


def test_aux_loss_balanced_lower_than_skewed(setup):
    params, x = setup
    _, aux = moe_ffn(params, x, capacity_factor=4.0)
    # Perfectly balanced assignment gives aux_loss ~= 1; it must be finite
    # and >= 1 by Cauchy-Schwarz.
    assert 1.0 - 1e-3 <= float(aux["aux_loss"]) < 4.0


def test_sharded_execution_matches_single_device(setup):
    params, x = setup
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs the virtual multi-device mesh")
    mesh = make_mesh(n_dev, tp=2 if n_dev % 2 == 0 else 1)

    ref, _ = moe_ffn(params, x, capacity_factor=8.0)

    with mesh:
        sharded = shard_moe_params(params, mesh)
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))

        @jax.jit
        def run(p, xx):
            out, aux = moe_ffn(p, xx, capacity_factor=8.0)
            return out, aux["expert_counts"]

        out, counts = run(sharded, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    assert float(jnp.sum(counts)) == x.shape[0]
