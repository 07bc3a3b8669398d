"""Training step + checkpoint/resume tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.models.whisper.config import WhisperConfig
from spittle_tpu.models.whisper.model import init_params
from spittle_tpu.train.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from spittle_tpu.train.step import make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = WhisperConfig(
        name="t", n_mels=80, n_audio_ctx=32, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=512, n_text_ctx=16, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    init_opt, train_step = make_train_step(cfg, learning_rate=1e-3)
    opt_state = init_opt(params)
    rng = np.random.default_rng(0)
    batch = {
        "mel": jnp.asarray(rng.standard_normal((2, 80, 64)), jnp.float32),
        "tokens": jnp.asarray(rng.integers(0, 512, (2, 16)), jnp.int32),
        "targets": jnp.asarray(rng.integers(0, 512, (2, 16)), jnp.int32),
        "mask": jnp.ones((2, 16), jnp.float32),
    }
    return cfg, params, opt_state, train_step, batch


def _copy(tree):
    return jax.tree.map(jnp.copy, tree)


def test_loss_decreases(setup):
    cfg, params, opt_state, train_step, batch = setup
    params, opt_state = _copy(params), _copy(opt_state)  # train_step donates
    losses = []
    for _ in range(8):
        params, opt_state, loss = train_step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_checkpoint_roundtrip(tmp_path, setup):
    cfg, params, opt_state, train_step, batch = setup
    params2, opt_state2, loss = train_step(_copy(params), _copy(opt_state), batch)
    save_checkpoint(str(tmp_path), params2, opt_state2, step=1)
    assert latest_step(str(tmp_path)) == 1

    fresh = init_params(cfg, jax.random.PRNGKey(99))
    init_opt, _ = make_train_step(cfg, learning_rate=1e-3)
    restored = restore_checkpoint(str(tmp_path), (fresh, init_opt(fresh)))
    assert restored is not None
    r_params, r_opt, step = restored
    assert step == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(r_params)[0]),
        np.asarray(jax.tree.leaves(params2)[0]),
    )


def test_restore_empty_returns_none(tmp_path):
    assert restore_checkpoint(str(tmp_path / "nothing"), (None, None)) is None


def test_remat_matches_plain_gradients():
    """jax.checkpoint rematerialization must not change loss or grads."""
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spittle_tpu.models.whisper.config import WhisperConfig
    from spittle_tpu.models.whisper.model import init_params
    from spittle_tpu.train.step import cross_entropy_loss

    cfg = WhisperConfig(
        name="remat-test", n_mels=80, n_audio_ctx=32, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_vocab=512, n_text_ctx=16,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 80, 64)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, 512, (2, 16)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 512, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.float32)

    def loss_fn(p, remat):
        return cross_entropy_loss(p, mel, tokens, targets, mask, cfg,
                                  None, remat)

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss_fn(p, True))(
        copy.deepcopy(params)
    )
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
