"""Log-mel frontend tests against an independent numpy/FFT oracle."""

import numpy as np
import pytest

from spittle_tpu.audio.mel import (
    HOP_LENGTH,
    N_FFT,
    log_mel_spectrogram,
    mel_filterbank,
    pad_or_trim,
)


def oracle_filterbank(n_mels: int, n_fft: int = 400, sr: int = 16000) -> np.ndarray:
    """From-scratch Slaney-scale mel filterbank (librosa `filters.mel`
    semantics with `htk=False, norm='slaney'`), sharing zero code with
    `spittle_tpu.audio.mel`. The break-point math is written directly from
    the Slaney Auditory Toolbox definition: linear below 1 kHz at
    200/3 Hz per mel, logarithmic above with step log(6.4)/27."""
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        return np.where(
            f >= min_log_hz,
            min_log_mel + np.log(np.maximum(f, 1e-12) / min_log_hz) / logstep,
            f / f_sp,
        )

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        return np.where(
            m >= min_log_mel,
            min_log_hz * np.exp(logstep * (m - min_log_mel)),
            m * f_sp,
        )

    hz = mel_to_hz(np.linspace(0.0, hz_to_mel(sr / 2.0), n_mels + 2))
    fft_freqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    fdiff = np.diff(hz)
    ramps = hz[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: scale each triangle to unit area over Hz.
    weights *= (2.0 / (hz[2 : n_mels + 2] - hz[:n_mels]))[:, None]
    return weights


def oracle_log_mel(audio: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """Reference implementation with np.fft, mirroring OpenAI Whisper's
    torch.stft-based log_mel_spectrogram step by step. Uses the
    independent `oracle_filterbank`, not the package's."""
    pad = N_FFT // 2
    padded = np.pad(audio, (pad, pad), mode="reflect")
    n = np.arange(N_FFT)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / N_FFT))
    num_frames = 1 + (len(padded) - N_FFT) // HOP_LENGTH
    frames = np.stack(
        [padded[i * HOP_LENGTH : i * HOP_LENGTH + N_FFT] for i in range(num_frames)]
    )
    stft = np.fft.rfft(frames * window, axis=-1)
    power = (np.abs(stft) ** 2)[:-1]  # drop final frame
    mel = power @ oracle_filterbank(n_mels).T
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).T  # [n_mels, frames]


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    t = np.arange(16000 * 2) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(len(t))
    return sig.astype(np.float32)


def test_matches_fft_oracle(audio):
    ours = np.asarray(log_mel_spectrogram(audio))
    ref = oracle_log_mel(audio.astype(np.float64))
    assert ours.shape == ref.shape == (80, len(audio) // HOP_LENGTH)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_128_mel_variant(audio):
    ours = np.asarray(log_mel_spectrogram(audio, n_mels=128))
    ref = oracle_log_mel(audio.astype(np.float64), n_mels=128)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_matmul_dft_path(audio):
    # The pure-MXU DFT-basis path is looser (f32 cancellation) but must
    # agree with the FFT path within the documented envelope.
    fft_path = np.asarray(log_mel_spectrogram(audio))
    mxu_path = np.asarray(log_mel_spectrogram(audio, use_fft=False))
    np.testing.assert_allclose(mxu_path, fft_path, atol=5e-2)


def test_batched(audio):
    batch = np.stack([audio, audio * 0.3])
    out = np.asarray(log_mel_spectrogram(batch))
    assert out.shape == (2, 80, len(audio) // HOP_LENGTH)
    single = np.asarray(log_mel_spectrogram(audio))
    np.testing.assert_allclose(out[0], single, atol=1e-5)


def test_filterbank_matches_independent_oracle():
    # Direct filterbank parity against the from-scratch Slaney oracle —
    # the log-mel parity tests above go through this same oracle, so a
    # filterbank bug in the package can no longer cancel out.
    for n_mels in (80, 128):
        np.testing.assert_allclose(
            np.asarray(mel_filterbank(n_mels), dtype=np.float64),
            oracle_filterbank(n_mels),
            atol=1e-6,
        )


def test_filterbank_properties():
    fb = mel_filterbank(80)
    assert fb.shape == (80, 201)
    # Slaney normalization: each triangle integrates to ~1 over Hz.
    bin_hz = 8000.0 / 200.0
    areas = fb.sum(axis=1) * bin_hz
    assert np.all(areas > 0.8) and np.all(areas < 1.2)
    # Filters are band-limited and ordered: peak bin indices non-decreasing.
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0)


def test_filterbank_triangle_spotcheck():
    # Independent direct evaluation of the Slaney triangle for filter 0.
    # Below 1 kHz the mel scale is linear (hz = mel * 200/3), so the first
    # filter's break points are exactly [0, edge, 2*edge] Hz where
    # edge = mel(8000)/81 * 200/3.
    fb = mel_filterbank(80)
    f_sp = 200.0 / 3
    mel_max = 1000.0 / f_sp + np.log(8.0) / (np.log(6.4) / 27.0)
    edge = (mel_max / 81.0) * f_sp  # first filter peak at ~37.24 Hz
    bin1 = 8000.0 / 200.0  # 40 Hz: past the peak, on the falling edge
    expected = ((2 * edge - bin1) / edge) * (2.0 / (2 * edge))
    assert fb[0, 0] == pytest.approx(0.0, abs=1e-8)
    assert fb[0, 1] == pytest.approx(expected, rel=1e-5)


def test_pad_or_trim():
    x = np.ones((3, 1000), np.float32)
    assert pad_or_trim(x, 1600).shape == (3, 1600)
    assert pad_or_trim(x, 500).shape == (3, 500)
    assert np.asarray(pad_or_trim(x, 1600))[:, 1000:].sum() == 0
