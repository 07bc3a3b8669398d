"""Parakeet/NeMo-style audio features.

NeMo AudioToMelSpectrogramPreprocessor semantics (the frontend inside the
reference's parakeet ONNX bundles): 25 ms Hann window (400 samples, padded
into a 512-point FFT), 10 ms hop, slaney mel filterbank, log with 2^-24
zero guard, per-feature mean/std normalization over the utterance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spittle_tpu.audio.mel import _frame, mel_filterbank

N_FFT = 512
WIN_LENGTH = 400
HOP = 160
LOG_GUARD = 2.0**-24


@functools.lru_cache(maxsize=None)
def _window() -> np.ndarray:
    # Periodic Hann over win_length, zero-padded symmetrically to n_fft.
    n = np.arange(WIN_LENGTH)
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / WIN_LENGTH))
    pad = (N_FFT - WIN_LENGTH) // 2
    return np.pad(win, (pad, pad)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_mels",))
def parakeet_features(audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """[B, T] 16 kHz PCM -> [B, n_mels, frames] normalized log-mel."""
    frames = _frame(audio.astype(jnp.float32), N_FFT, HOP)
    spec = jnp.fft.rfft(frames * jnp.asarray(_window()), axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    fb = jnp.asarray(mel_filterbank(n_mels, N_FFT).T)
    mel = power @ fb  # [B, F, n_mels]
    logmel = jnp.log(mel + LOG_GUARD)
    mean = jnp.mean(logmel, axis=1, keepdims=True)
    std = jnp.std(logmel, axis=1, keepdims=True) + 1e-5
    out = (logmel - mean) / std
    return jnp.swapaxes(out, 1, 2)  # [B, n_mels, F]
