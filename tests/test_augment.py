"""SpecAugment (train/augment.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from spittle_tpu.train.augment import spec_augment


def test_spec_augment_masks_bands():
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 80, 200)).astype(np.float32)) + 5.0
    out = spec_augment(jax.random.PRNGKey(0), mel)
    out = np.asarray(out)
    assert out.shape == mel.shape
    changed = out != np.asarray(mel)
    # Some (but not all) cells masked.
    frac = changed.mean()
    assert 0.01 < frac < 0.9
    # Masked cells are set to the per-sample mean.
    for i in range(2):
        if changed[i].any():
            np.testing.assert_allclose(
                out[i][changed[i]], np.asarray(mel)[i].mean(), rtol=1e-5
            )


def test_spec_augment_deterministic_per_key():
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((1, 80, 100)).astype(np.float32))
    a = np.asarray(spec_augment(jax.random.PRNGKey(1), mel))
    b = np.asarray(spec_augment(jax.random.PRNGKey(1), mel))
    c = np.asarray(spec_augment(jax.random.PRNGKey(2), mel))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_spec_augment_batch_independent():
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((4, 40, 120)).astype(np.float32))
    out = np.asarray(spec_augment(jax.random.PRNGKey(3), mel))
    masks = [out[i] != np.asarray(mel)[i] for i in range(4)]
    # With 10 time masks the chance all four samples mask identically
    # is negligible.
    assert any(not np.array_equal(masks[0], m) for m in masks[1:])


def test_spec_augment_zero_masks_identity():
    mel = jnp.asarray(np.random.default_rng(1).standard_normal((1, 80, 50)),
                      jnp.float32)
    out = spec_augment(jax.random.PRNGKey(0), mel, freq_masks=0, time_masks=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(mel))
