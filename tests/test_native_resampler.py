"""Native streaming resampler vs Python streaming vs offline MXU path."""

import numpy as np
import pytest

from spittle_tpu.audio.resample import FrameResampler, resample, resampled_length
from spittle_tpu.native.resampler import (
    NativeFrameResampler,
    make_frame_resampler,
    native_resampler_available,
)

pytestmark = pytest.mark.skipif(
    not native_resampler_available(), reason="g++ toolchain unavailable"
)


def _collect(resampler, audio, chunks):
    frames = []
    pos = 0
    for c in chunks:
        resampler.push(audio[pos : pos + c], frames.append)
        pos += c
    assert pos == len(audio)
    resampler.finish(frames.append)
    return np.concatenate(frames) if frames else np.zeros(0, np.float32)


@pytest.mark.parametrize("in_hz", [48000, 44100, 32000, 8000])
def test_native_matches_python_streaming(in_hz):
    rng = np.random.default_rng(in_hz)
    audio = rng.standard_normal(in_hz // 2).astype(np.float32)  # 0.5 s
    chunks = []
    left = len(audio)
    while left:
        c = min(left, int(rng.integers(100, 1500)))
        chunks.append(c)
        left -= c

    nat = _collect(NativeFrameResampler(in_hz), audio, chunks)
    py = _collect(FrameResampler(in_hz), audio, chunks)
    assert nat.shape == py.shape
    np.testing.assert_allclose(nat, py, atol=2e-6)


def test_native_matches_offline():
    in_hz = 48000
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(in_hz).astype(np.float32)  # 1 s
    nat = _collect(NativeFrameResampler(in_hz), audio, [311] * (len(audio) // 311) + [len(audio) % 311])

    out_len = resampled_length(len(audio), in_hz, 16000)
    offline = np.asarray(resample(audio, in_hz))
    # Streamed output is frame-padded to a 480 multiple; compare the real part.
    assert len(nat) >= out_len
    np.testing.assert_allclose(nat[:out_len], offline, atol=2e-5)
    assert np.all(nat[out_len:] == 0)  # zero-padded tail frame


def test_identity_passthrough_frames():
    audio = np.arange(1000, dtype=np.float32)
    frames = []
    r = NativeFrameResampler(16000)
    r.push(audio, frames.append)
    r.finish(frames.append)
    out = np.concatenate(frames)
    assert len(out) % 480 == 0
    np.testing.assert_array_equal(out[:1000], audio)


def test_factory_returns_native_when_available():
    r = make_frame_resampler(48000)
    assert isinstance(r, NativeFrameResampler)
