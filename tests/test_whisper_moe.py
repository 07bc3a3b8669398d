"""MoE-variant Whisper encoder (cfg.moe_experts > 0).

The Switch top-1 MoE FFN (parallel/expert_parallel.py) integrates into
the production encoder block: moe_* leaves replace fc1/fc2 in the
stacked block tree, lax.scan and the mesh sharding rules apply
unchanged, and expert weights shard over 'model' (expert parallelism).
No published Whisper checkpoint is MoE — this is the research/fine-tune
variant that makes ep a model-integrated capability.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.models.whisper.config import CONFIGS, WhisperConfig
from spittle_tpu.models.whisper.model import encode, init_params

TINY_MOE = dataclasses.replace(
    CONFIGS["tiny"], name="tiny-moe-test", moe_experts=4
)


def test_moe_params_replace_dense_mlp():
    params = init_params(TINY_MOE, jax.random.PRNGKey(0))
    blocks = params["encoder"]["blocks"]
    for key in ("moe_router", "moe_w_in", "moe_w_out"):
        assert key in blocks
    for key in ("fc1_w", "fc1_b", "fc2_w", "fc2_b"):
        assert key not in blocks
    L, e, d = TINY_MOE.n_audio_layer, 4, TINY_MOE.n_audio_state
    assert blocks["moe_w_in"].shape == (L, e, d, 4 * d)
    # decoder stays dense
    assert "fc1_w" in params["decoder"]["blocks"]


def test_moe_encode_runs_and_is_finite():
    params = init_params(TINY_MOE, jax.random.PRNGKey(0))
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, TINY_MOE.n_mels, 96)),
        jnp.float32,
    )
    xa = encode(params, mel, TINY_MOE)
    assert xa.shape == (2, 48, TINY_MOE.n_audio_state)
    assert bool(jnp.all(jnp.isfinite(xa)))


def test_single_expert_matches_dense_ffn():
    """E=1 routing is the identity: gate prob 1.0, every token kept (at
    capacity_factor >= 1), so the MoE block equals the plain (bias-free)
    two-matmul FFN with that expert's weights."""
    cfg = dataclasses.replace(TINY_MOE, moe_experts=1)
    params = init_params(cfg, jax.random.PRNGKey(1))
    blk = params["encoder"]["blocks"]
    from spittle_tpu.models.whisper.model import _moe_mlp

    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.standard_normal((2, 8, cfg.n_audio_state)), jnp.float32
    )
    blk0 = jax.tree.map(lambda a: a[0], blk)
    got = _moe_mlp(x, blk0)
    w_in = blk0["moe_w_in"][0]
    w_out = blk0["moe_w_out"][0]
    want = jax.nn.gelu(x @ w_in, approximate=False) @ w_out
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5
    )


def test_moe_encoder_sharded_matches_single_device():
    """Expert-parallel execution over the virtual mesh produces the same
    encoder output as unsharded execution."""
    from spittle_tpu.parallel.mesh import (
        batch_sharding, make_mesh, shard_params,
    )

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs the virtual multi-device mesh")
    params = init_params(TINY_MOE, jax.random.PRNGKey(3))
    mel = jnp.asarray(
        np.random.default_rng(4).standard_normal((4, TINY_MOE.n_mels, 96)),
        jnp.float32,
    )
    ref = np.asarray(encode(params, mel, TINY_MOE))

    mesh = make_mesh(n_dev, tp=2 if n_dev % 2 == 0 else 1)
    with mesh:
        # encoder subtree only: the odd 51865-row tok_emb can't split
        # over 'model' (the sharded-decode dryrun handles that case)
        sp = {"encoder": shard_params(params["encoder"], mesh)}
        mel_s = jax.device_put(mel, batch_sharding(mesh))
        got = np.asarray(
            jax.jit(lambda p, m: encode(p, m, TINY_MOE))(sp, mel_s)
        )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_encode_with_aux_matches_encode_and_reports_loss():
    """encode_with_aux must produce the same features as encode and a
    positive Switch aux loss for MoE configs; dense configs report 0."""
    import jax
    import numpy as np

    from spittle_tpu.models.whisper.model import (
        encode,
        encode_with_aux,
        init_params,
    )

    rng = np.random.default_rng(0)
    params = init_params(TINY_MOE, jax.random.PRNGKey(0))
    mel = jnp.asarray(
        rng.standard_normal(
            (2, TINY_MOE.n_mels, TINY_MOE.n_audio_ctx * 2)
        ).astype(np.float32)
    )
    xa = np.asarray(encode(params, mel, TINY_MOE))
    xa2, aux = encode_with_aux(params, mel, TINY_MOE)
    np.testing.assert_allclose(np.asarray(xa2), xa, atol=1e-5)
    aux = float(aux)
    # Per layer the Switch aux loss is >= 1.0 at perfect balance and ~E
    # when collapsed; encode_with_aux SUMS over layers (Switch applies
    # alpha per layer, so the sum keeps alpha's calibration independent
    # of depth).
    L = TINY_MOE.n_audio_layer
    assert 0.5 * L < aux < L * (TINY_MOE.moe_experts + 1), aux

    from spittle_tpu.models.whisper.config import CONFIGS

    dense = CONFIGS["tiny"]
    dparams = init_params(dense, jax.random.PRNGKey(0))
    dmel = jnp.asarray(
        rng.standard_normal((1, dense.n_mels, 40)).astype(np.float32)
    )
    _, daux = encode_with_aux(dparams, dmel, dense)
    assert float(daux) == 0.0


def test_train_step_moe_aux_in_objective():
    """The MoE training objective must include the aux term: the loss at
    alpha=0 differs from alpha>0 by exactly alpha * aux, and a step runs
    (routing gradients flow) without error."""
    import jax
    import numpy as np

    from spittle_tpu.models.whisper.model import encode_with_aux, init_params
    from spittle_tpu.train.step import cross_entropy_loss, make_train_step

    rng = np.random.default_rng(1)
    params = init_params(TINY_MOE, jax.random.PRNGKey(0))
    b, t = 2, 6
    mel = jnp.asarray(
        rng.standard_normal(
            (b, TINY_MOE.n_mels, TINY_MOE.n_audio_ctx * 2)
        ).astype(np.float32)
    )
    tokens = jnp.asarray(
        rng.integers(0, TINY_MOE.n_vocab, (b, t)), jnp.int32
    )
    targets = jnp.asarray(
        rng.integers(0, TINY_MOE.n_vocab, (b, t)), jnp.int32
    )
    mask = jnp.ones((b, t), jnp.float32)

    l0 = float(cross_entropy_loss(
        params, mel, tokens, targets, mask, TINY_MOE, moe_aux_weight=0.0
    ))
    l1 = float(cross_entropy_loss(
        params, mel, tokens, targets, mask, TINY_MOE, moe_aux_weight=0.01
    ))
    _, aux = encode_with_aux(params, mel, TINY_MOE)
    np.testing.assert_allclose(l1 - l0, 0.01 * float(aux), rtol=1e-3)

    init_opt, step = make_train_step(TINY_MOE, learning_rate=1e-4)
    opt = init_opt(params)
    # train_step donates params/opt_state: snapshot the router first
    router_before = np.asarray(params["encoder"]["blocks"]["moe_router"])
    p2, opt, loss = step(params, opt, dict(
        mel=mel, tokens=tokens, targets=targets, mask=mask
    ))
    assert np.isfinite(float(loss))
    # router weights must receive gradient (Switch gate term)
    delta = np.abs(
        np.asarray(p2["encoder"]["blocks"]["moe_router"]) - router_before
    ).max()
    assert delta > 0
