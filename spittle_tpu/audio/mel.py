"""Whisper log-mel frontend as TPU-friendly matmuls.

Replaces the reference's native mel pipeline (whisper.cpp's Hann/160-hop/
Slaney-filterbank log-mel, consumed via transcribe-rs at
`/root/reference/src-tauri/src/managers/transcription.rs:501`).

TPU-first design: instead of a streaming FFT loop, the STFT is expressed as
one matmul of framed audio against a precomputed windowed DFT basis, and the
mel projection as a second matmul — both land on the MXU and XLA fuses the
elementwise log/clamp chain. Everything is static-shape and batched.

Numerics match OpenAI Whisper's `log_mel_spectrogram` (and therefore
whisper.cpp): n_fft=400, hop=160, periodic Hann, center reflect padding,
power spectrum with the final frame dropped, Slaney-scale/Slaney-normalized
mel filterbank, log10 clamped at 1e-10, 8-dB dynamic-range floor, (x+4)/4.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30  # seconds per Whisper window
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000


def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False)."""
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    above = freq >= min_log_hz
    mels = np.where(above, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    above = mels >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    n_mels: int = 80, n_fft: int = N_FFT, sample_rate: int = SAMPLE_RATE
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape [n_mels, n_fft//2+1].

    Matches librosa.filters.mel(sr, n_fft, n_mels) — the exact filterbank
    OpenAI Whisper ships (and whisper.cpp embeds in its GGML files).
    """
    fmax = sample_rate / 2
    fftfreqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(fmax), n_mels + 2))

    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_basis(n_fft: int = N_FFT) -> np.ndarray:
    """Windowed real-DFT basis, shape [n_fft, 2*(n_fft//2+1)].

    Column k is cos(2*pi*k*n/N)*w(n); column (n_bins+k) is -sin(...)*w(n),
    so `frames @ basis` yields interleaved [real | imag] rFFT components.
    """
    n = np.arange(n_fft)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))  # periodic Hann
    k = np.arange(n_fft // 2 + 1)
    angle = 2.0 * np.pi * np.outer(n, k) / n_fft
    real = np.cos(angle) * window[:, None]
    imag = -np.sin(angle) * window[:, None]
    return np.concatenate([real, imag], axis=1).astype(np.float32)


def _frame(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Center-padded overlapping frames: [..., T] -> [..., n_frames, n_fft].

    Reflect-pads n_fft//2 on both sides (torch.stft center=True semantics)
    and drops the final frame like Whisper's `magnitudes = stft[..., :-1]`.
    """
    pad = n_fft // 2
    padded = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    num_frames = audio.shape[-1] // hop  # one more exists; Whisper drops it
    # Static-shape gather of overlapping windows.
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return padded[..., idx]


@functools.lru_cache(maxsize=None)
def _hann(n_fft: int) -> np.ndarray:
    n = np.arange(n_fft)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))).astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("n_mels", "n_fft", "hop", "use_fft")
)
def log_mel_spectrogram(
    audio: jnp.ndarray,
    n_mels: int = 80,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
    use_fft: bool = False,
    filters: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Batched Whisper log-mel: [..., T] float32 PCM -> [..., n_mels, T//hop].

    The input should already be 16 kHz mono in [-1, 1]. For a standard
    Whisper window pass exactly 30 s (480k samples) per item.

    Default path: the STFT is ONE strided convolution of the raw audio
    against the windowed DFT basis at Precision.HIGHEST (f32-exact 6-pass
    MXU) — no [B, 3000, 400] framing gather, no FFT. XLA's rFFT at length
    400 (non power of two) plus the frame gather measured ~2 s for a
    batch-48 x 30 s mel on v5e, ~60x this conv. use_fft=True keeps the
    rFFT path for numeric cross-checks.
    """
    audio = audio.astype(jnp.float32)
    n_bins = n_fft // 2 + 1
    if use_fft:
        frames = _frame(audio, n_fft, hop)  # [..., F, n_fft]
        spec = jnp.fft.rfft(frames * jnp.asarray(_hann(n_fft)), axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        # [..., F, bins] -> [..., bins, F]
        power = jnp.swapaxes(power, -1, -2)
    else:
        lead = audio.shape[:-1]
        t = audio.shape[-1]
        x = audio.reshape((-1, 1, t))
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
        basis = jnp.asarray(_dft_basis(n_fft))  # [n_fft, 2*bins]
        kernel = basis.T[:, None, :]  # [2*bins, 1, n_fft]
        spec = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(hop,), padding=[(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, 2*bins, F+1]
        spec = spec[..., : t // hop]  # Whisper drops the final frame
        power = spec[:, :n_bins] ** 2 + spec[:, n_bins:] ** 2
        power = power.reshape(lead + power.shape[1:])  # [..., bins, F]
    if filters is None:
        mel_w = jnp.asarray(mel_filterbank(n_mels, n_fft))  # [n_mels, bins]
    else:
        mel_w = filters
    mel = jnp.einsum(
        "mf,...ft->...mt", mel_w, power,
        precision=jax.lax.Precision.HIGHEST,
    )  # [..., n_mels, F]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # Dynamic-range floor: per-item max over (mels, frames), minus 8.
    flat_max = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, flat_max - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec  # [..., n_mels, F]


def pad_or_trim(audio: jnp.ndarray, length: int = N_SAMPLES) -> jnp.ndarray:
    """Pad with zeros or trim to exactly `length` samples on the last axis."""
    t = audio.shape[-1]
    if t > length:
        return audio[..., :length]
    if t < length:
        return jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, length - t)])
    return audio
