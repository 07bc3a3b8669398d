"""Native ring buffer / PCM conversion tests (builds the C++ lib)."""

import shutil
import threading
import time

import numpy as np
import pytest

from spittle_tpu.native.ringbuffer import (
    NativeRingBuffer,
    RingBufferSource,
    native_available,
    pcm_to_mono_f32,
)

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


def test_native_builds():
    assert native_available()


def test_ring_write_read_roundtrip():
    rb = NativeRingBuffer(1024)
    assert rb.capacity == 1024
    data = np.arange(100, dtype=np.float32)
    assert rb.write(data) == 100
    assert rb.available == 100
    out = rb.read(100)
    np.testing.assert_array_equal(out, data)
    assert rb.available == 0


def test_ring_wraparound():
    rb = NativeRingBuffer(256)
    for i in range(10):
        data = np.full(100, i, np.float32)
        rb.write(data)
        out = rb.read(100)
        np.testing.assert_array_equal(out, data)


def test_ring_overflow_drops():
    rb = NativeRingBuffer(128)
    wrote = rb.write(np.ones(500, np.float32))
    assert wrote == rb.capacity
    assert rb.dropped == 500 - rb.capacity


def test_ring_spsc_threads():
    rb = NativeRingBuffer(1 << 14)
    total = 200_000
    src = np.random.default_rng(0).standard_normal(total).astype(np.float32)
    got = []

    def producer():
        i = 0
        while i < total:
            n = rb.write(src[i : i + 1000])
            i += n
            if n == 0:
                time.sleep(0.0005)

    def consumer():
        count = 0
        while count < total:
            out = rb.read(4096)
            if len(out):
                got.append(out)
                count += len(out)
            else:
                time.sleep(0.0005)

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start()
    tp.join(10); tc.join(10)
    all_got = np.concatenate(got)
    np.testing.assert_array_equal(all_got, src)


def test_pcm_i16_stereo_downmix():
    stereo = np.asarray([10000, -10000, 16384, 16384], np.int16)  # 2 frames
    mono = pcm_to_mono_f32(stereo, 2)
    np.testing.assert_allclose(mono, [0.0, 0.5], atol=1e-4)


def test_pcm_u8():
    data = np.asarray([128, 255, 0], np.uint8)
    mono = pcm_to_mono_f32(data, 1)
    np.testing.assert_allclose(mono, [0.0, 127 / 128, -1.0], atol=1e-6)


def test_write_i16_convenience():
    rb = NativeRingBuffer(1024)
    stereo = np.asarray([32767, 32767, -32768, -32768], np.int16)
    assert rb.write_i16(stereo, channels=2) == 2
    out = rb.read(2)
    np.testing.assert_allclose(out, [32767 / 32768, -1.0], atol=1e-5)


def test_ringbuffer_source_with_recorder():
    from spittle_tpu.audio.recorder import AudioRecorder

    src = RingBufferSource(16000)
    rec = AudioRecorder(src)
    rec.open()
    rec.start()
    audio = np.sin(np.linspace(0, 50, 4800)).astype(np.float32)
    src.ring.write(audio)
    time.sleep(0.2)
    out = rec.stop()
    rec.close()
    src.close()
    assert len(out) >= 4800
    np.testing.assert_allclose(out[:4800], audio, atol=1e-6)


def test_native_levenshtein_matches_python():
    import random
    import string

    from spittle_tpu.text.filters import (
        _levenshtein_py,
        _resolve_native_lev,
        levenshtein,
    )

    if not _resolve_native_lev():
        import pytest

        pytest.skip("native lib unavailable")
    rng = random.Random(0)
    alphabet = string.ascii_lowercase + "äöüßé日本語 "
    for _ in range(200):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 24)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 24)))
        assert levenshtein(a, b) == _levenshtein_py(a, b), (a, b)
