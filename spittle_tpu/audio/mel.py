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


@functools.lru_cache(maxsize=None)
def _ct_tables(n1: int = 20, n2: int = 20):
    """Cooley-Tukey factor tables for a length-N=N1*N2 DFT (float32).

    Index split n = n1_size*b + a (b: inner DFT position, a: residue);
    output split k = k1 + n1_size*k2. Returns (inner cos/sin [n1, n1],
    twiddle cos/sin [n2, n1], outer cos/sin [n2, n2])."""
    n = n1 * n2
    b = np.arange(n1)
    k1 = np.arange(n1)
    inner = 2 * np.pi * np.outer(b, k1) / n1
    a = np.arange(n2)
    tw = 2 * np.pi * np.outer(a, k1) / n
    k2 = np.arange(n2)
    outer = 2 * np.pi * np.outer(a, k2) / n2
    f32 = lambda x: x.astype(np.float32)  # noqa: E731
    return (
        f32(np.cos(inner)), f32(np.sin(inner)),
        f32(np.cos(tw)), f32(np.sin(tw)),
        f32(np.cos(outer)), f32(np.sin(outer)),
    )


def _frame_strided(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Center-padded overlapping frames via strided slices (no gather).

    With g = gcd(n_fft, hop) (80 for Whisper's 400/160): reflect-pad,
    view the audio as g-sample blocks, and build each frame from
    n_fft//g block-slices of stride hop//g — XLA lowers these as cheap
    strided slices instead of a [B, F, n_fft] gather."""
    g = int(np.gcd(n_fft, hop))
    blocks_per_frame = n_fft // g  # 5
    stride_blocks = hop // g  # 2
    pad = n_fft // 2
    t = audio.shape[-1]
    num_frames = t // hop
    padded = jnp.pad(
        audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect"
    )
    nb = padded.shape[-1] // g
    bl = padded.reshape(audio.shape[:-1] + (nb, g))
    segs = [
        jax.lax.slice_in_dim(
            bl, j, j + (num_frames - 1) * stride_blocks + 1,
            stride=stride_blocks, axis=audio.ndim - 1,
        )
        for j in range(blocks_per_frame)
    ]
    return jnp.concatenate(segs, axis=-1)  # [..., F, n_fft]


def _ct_rdft_power(frames: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Power spectrum of windowed frames via a factored (Cooley-Tukey)
    DFT: two stages of tiny matmuls instead of one dense [n_fft, 2*bins]
    basis. The dense basis is ~46 TFLOP for a batch-48 x 30 s mel at
    f32 precision (~1.5-2 s on a v5e chip); the factored form is ~10
    GFLOP. frames [..., F, n_fft] -> power [..., bins, F]."""
    n1 = int(np.sqrt(n_fft))
    while n_fft % n1:
        n1 -= 1
    n2 = n_fft // n1
    ic, is_, twc, tws, oc, os_ = map(jnp.asarray, _ct_tables(n1, n2))
    hp = jax.lax.Precision.HIGHEST

    x = frames * jnp.asarray(_hann(n_fft))
    x2 = x.reshape(x.shape[:-1] + (n1, n2))  # [..., b, a], n = n2? no:
    # row-major: x[..., i, j] = frame[i*n2 + j] -> n = n2*b + a with
    # b = i (inner position), a = j (residue). Inner DFT runs over b.
    yr = jnp.einsum("...ba,bk->...ak", x2, ic, precision=hp)
    yi = -jnp.einsum("...ba,bk->...ak", x2, is_, precision=hp)
    # twiddle e^{-2 pi i a k1 / N}  (a indexes the residue axis)
    zr = yr * twc + yi * tws  # (yr + i yi)(cos - i sin)
    zi = yi * twc - yr * tws
    # outer DFT over a: X[k1 + n1*k2]
    xr = (
        jnp.einsum("...ak,ao->...ko", zr, oc, precision=hp)
        + jnp.einsum("...ak,ao->...ko", zi, os_, precision=hp)
    )
    xi = (
        jnp.einsum("...ak,ao->...ko", zi, oc, precision=hp)
        - jnp.einsum("...ak,ao->...ko", zr, os_, precision=hp)
    )
    power = xr**2 + xi**2  # [..., F, k1, k2]
    # k = k1 + n1*k2 -> lay out as [k2, k1] row-major and flatten
    power = jnp.swapaxes(power, -1, -2).reshape(power.shape[:-2] + (n_fft,))
    power = power[..., : n_fft // 2 + 1]
    return jnp.swapaxes(power, -1, -2)  # [..., bins, F]


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
    elif audio.shape[-1] % hop == 0:
        # Default: strided-slice framing + factored Cooley-Tukey DFT as
        # tiny matmuls (~10 GFLOP vs the dense basis's ~46 TFLOP for
        # batch-48 x 30 s). Exactness vs the float64 oracle is covered by
        # tests/test_mel.py.
        frames = _frame_strided(audio, n_fft, hop)
        power = _ct_rdft_power(frames, n_fft)
    else:
        # Fallback for lengths not divisible by hop: dense windowed-DFT
        # basis as one strided conv (f32-exact via Precision.HIGHEST).
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
