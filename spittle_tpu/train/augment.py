"""SpecAugment for ASR fine-tuning (Park et al. 2019), TPU-native.

The reference has no training pipeline; this complements train/step.py for
fine-tuning the speech models. Implemented as pure jittable transforms on
the mel spectrogram with static mask counts — mask POSITIONS and WIDTHS
are traced (PRNG-driven) but the number of masks is a Python int, so the
program shape is fixed and XLA compiles one kernel regardless of the
random draws. Masks are built from `arange` comparisons (no scatter, no
dynamic shapes), which lowers to cheap vectorized selects on the VPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _axis_mask(key, length: int, max_width: int, n_masks: int) -> jnp.ndarray:
    """[length] bool — True where masked, union of n_masks random bands."""
    kw, ks = jax.random.split(key)
    widths = jax.random.randint(kw, (n_masks,), 0, max_width + 1)
    starts = jax.random.randint(
        ks, (n_masks,), 0, jnp.maximum(length - widths, 1)
    )
    idx = jnp.arange(length)[None, :]  # [1, L]
    bands = (idx >= starts[:, None]) & (idx < (starts + widths)[:, None])
    return jnp.any(bands, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("freq_masks", "time_masks", "freq_width", "time_frac"),
)
def spec_augment(
    key: jnp.ndarray,
    mel: jnp.ndarray,  # [B, n_mels, T]
    freq_masks: int = 2,
    time_masks: int = 10,
    freq_width: int = 27,
    time_frac: float = 0.05,
    mask_value: Optional[float] = None,
) -> jnp.ndarray:
    """Apply frequency + time masking independently per batch element.

    time mask width is bounded by time_frac * T (adaptive masking, as in
    the NeMo/ESPnet recipes). mask_value defaults to the per-sample mean
    (masking log-mels to 0 would inject a loud band).
    """
    b, n_mels, t = mel.shape
    max_t = max(int(t * time_frac), 1)
    fill = (
        jnp.mean(mel, axis=(1, 2), keepdims=True)
        if mask_value is None
        else jnp.asarray(mask_value, mel.dtype)
    )

    def one(key, x):
        kf, kt = jax.random.split(key)
        fmask = _axis_mask(kf, n_mels, freq_width, freq_masks)  # [n_mels]
        tmask = _axis_mask(kt, t, max_t, time_masks)  # [T]
        masked = fmask[:, None] | tmask[None, :]
        return masked

    keys = jax.random.split(key, b)
    masks = jax.vmap(one)(keys, mel)  # [B, n_mels, T] bool
    return jnp.where(masks, fill, mel)
