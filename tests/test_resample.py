"""Resampler tests against the scipy.signal.resample_poly oracle."""

import numpy as np
import pytest
from scipy.signal import resample_poly

from spittle_tpu.audio.resample import (
    FrameResampler,
    resample,
    resampled_length,
)


def make_audio(n, sr, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    sig = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1330 * t + 0.7)
        + 0.02 * rng.standard_normal(n)
    )
    return sig.astype(np.float32)


@pytest.mark.parametrize(
    "in_hz,n",
    [(48000, 48000), (44100, 44100), (32000, 16000), (22050, 22050), (8000, 8000)],
)
def test_matches_scipy_resample_poly(in_hz, n):
    x = make_audio(n, in_hz)
    import math

    g = math.gcd(in_hz, 16000)
    L, M = 16000 // g, in_hz // g
    ref = resample_poly(x.astype(np.float64), L, M)
    ours = np.asarray(resample(x, in_hz, 16000))
    assert ours.shape == ref.shape
    assert len(ours) == resampled_length(n, in_hz, 16000)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_identity_passthrough():
    x = make_audio(1000, 16000)
    assert resample(x, 16000, 16000) is x


def test_batched():
    x = np.stack([make_audio(48000, 48000, s) for s in range(3)])
    out = np.asarray(resample(x, 48000, 16000))
    assert out.shape == (3, 16000)
    single = np.asarray(resample(x[1], 48000, 16000))
    np.testing.assert_allclose(out[1], single, atol=1e-6)


class TestFrameResampler:
    def test_frame_sizes_and_total_length(self):
        x = make_audio(48000, 48000)  # 1 s
        fr = FrameResampler(48000)
        frames = []
        # push in awkward sizes to exercise buffering
        pos = 0
        for size in [333, 1024, 7, 4096, 100000]:
            fr.push(x[pos : pos + size], frames.append)
            pos += size
            if pos >= len(x):
                break
        fr.push(x[pos:], frames.append)
        fr.finish(frames.append)
        assert all(len(f) == 480 for f in frames)
        total = sum(len(f) for f in frames)
        # ~16000 output samples, zero-padded up to frame multiple
        assert total >= 16000
        assert total - 16000 < 480 + 160  # tail pad + chunk pad slack

    def test_identity_rate_framing(self):
        x = make_audio(1600, 16000)
        fr = FrameResampler(16000)
        frames = []
        fr.push(x, frames.append)
        fr.finish(frames.append)
        assert len(frames) == 4  # 1600 = 3*480 + 160 -> 3 full + 1 padded
        np.testing.assert_array_equal(np.concatenate(frames)[:1600], x)
        assert np.all(np.concatenate(frames)[1600:] == 0)

    @pytest.mark.parametrize("in_hz", [48000, 44100, 22050])
    def test_streaming_matches_offline(self, in_hz):
        # Cross-push polyphase state: streamed output must equal the offline
        # resample of the concatenated input, regardless of push sizes.
        x = make_audio(in_hz * 2, in_hz)
        fr = FrameResampler(in_hz)
        frames = []
        pos = 0
        rng = np.random.default_rng(1)
        while pos < len(x):
            size = int(rng.integers(1, 5000))
            fr.push(x[pos : pos + size], frames.append)
            pos += size
        fr.finish(frames.append)
        stream = np.concatenate(frames)
        offline = np.asarray(resample(x, in_hz, 16000))
        assert len(stream) >= len(offline)
        np.testing.assert_allclose(stream[: len(offline)], offline, atol=1e-5)
        assert np.all(stream[len(offline) :] == 0)  # zero-padded tail frame
