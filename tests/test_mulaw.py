"""mu-law wire format (audio/mulaw.py): companding numerics and the
engine's opt-in 8-bit host->device path."""

import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.audio.mulaw import (
    MU,
    mulaw_decode_jnp,
    mulaw_decode_np,
    mulaw_encode,
)


def test_roundtrip_snr_speech_like():
    """Companded 8-bit must hold ~35+ dB SNR on a speech-like signal
    (mixture of tones with wide dynamic range) — the G.711 design point."""
    rng = np.random.default_rng(0)
    t = np.arange(16000, dtype=np.float32) / 16000.0
    x = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.1 * np.sin(2 * np.pi * 1330 * t)
        + 0.01 * rng.standard_normal(16000).astype(np.float32)
    )
    x = np.clip(x, -1, 1)
    y = mulaw_decode_np(mulaw_encode(x))
    snr = 10 * np.log10(np.sum(x**2) / np.sum((x - y) ** 2))
    assert snr > 35.0, snr


def test_quiet_signal_keeps_relative_precision():
    """The point of log companding: a -40 dBFS signal keeps far more
    precision than linear 8-bit (which would quantize it to ~2 levels)."""
    t = np.arange(16000, dtype=np.float32) / 16000.0
    x = (0.01 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    y = mulaw_decode_np(mulaw_encode(x))
    snr = 10 * np.log10(np.sum(x**2) / np.sum((x - y) ** 2))
    assert snr > 25.0, snr
    lin8 = np.round(x * 127) / 127
    lin_snr = 10 * np.log10(np.sum(x**2) / np.sum((x - lin8) ** 2) + 1e-12)
    assert snr > lin_snr + 10


def test_int16_input_matches_f32_input():
    rng = np.random.default_rng(1)
    f = np.clip(rng.standard_normal(1000).astype(np.float32) * 0.3, -1, 1)
    i16 = (f * 32768.0).clip(-32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(
        mulaw_encode(i16), mulaw_encode(i16.astype(np.float32) / 32768.0)
    )


def test_device_decode_matches_numpy():
    codes = np.arange(256, dtype=np.uint8)
    np.testing.assert_allclose(
        np.asarray(mulaw_decode_jnp(jnp.asarray(codes))),
        mulaw_decode_np(codes),
        atol=1e-6,
    )


def test_zero_padding_decodes_near_silence():
    """Window zero-padding encodes to a code that decodes ~0 (no DC
    thump into the mel frontend)."""
    z = mulaw_decode_np(mulaw_encode(np.zeros(16, np.float32)))
    assert np.max(np.abs(z)) < 1e-3


def test_extremes_clip_not_wrap():
    x = np.array([-2.0, -1.0, 1.0, 2.0], np.float32)
    y = mulaw_decode_np(mulaw_encode(x))
    np.testing.assert_allclose(y, [-1, -1, 1, 1], atol=5e-3)


def test_mel_close_after_companding():
    """log-mel of companded audio stays close to the original's —
    transcription-level equivalence evidence."""
    from spittle_tpu.audio.mel import log_mel_spectrogram

    rng = np.random.default_rng(2)
    t = np.arange(48000, dtype=np.float32) / 16000.0
    x = np.clip(
        0.4 * np.sin(2 * np.pi * 200 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
        + 0.05 * rng.standard_normal(len(t)).astype(np.float32),
        -1, 1,
    )
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(x[None])))
    got = np.asarray(
        log_mel_spectrogram(
            jnp.asarray(mulaw_decode_np(mulaw_encode(x))[None])
        )
    )
    # log-mel is clamp-normalized to a ~4-unit range; companding noise
    # sits far below speech energy in every band
    assert np.mean(np.abs(got - ref)) < 0.02
    assert np.max(np.abs(got - ref)) < 0.35


def test_engine_mulaw_wire_end_to_end():
    """WhisperEngine(wire='mulaw') assembles uint8 windows and produces
    the same transcript tokens as the int16 wire on a random tiny model
    (synthetic tone: companding error far below decision margins)."""
    from spittle_tpu.engine.base import TranscribeParams
    from spittle_tpu.engine.whisper_engine import WhisperEngine

    t = np.arange(32000, dtype=np.float32) / 16000.0
    audio = (np.sin(2 * np.pi * 440 * t) * 0.3 * 32768).astype(np.int16)

    ref_eng = WhisperEngine(dtype=jnp.float32)
    ref_eng.load_model("random:tiny")
    ref = ref_eng.transcribe_batch([audio], TranscribeParams(language="en"))

    mu_eng = WhisperEngine(dtype=jnp.float32, wire="mulaw")
    mu_eng.load_model("random:tiny")
    windows = mu_eng._assemble_windows([audio], [(0, 0)])
    assert windows.dtype == np.uint8
    got = mu_eng.transcribe_batch([audio], TranscribeParams(language="en"))

    assert [s.text for r in got for s in r.segments] == [
        s.text for r in ref for s in r.segments
    ]


def test_transcribe_stream_mulaw_staged_path():
    """The prefetch/staging pipeline (stage_batch -> transcribe_staged)
    must carry uint8 mu-law windows to the device and decode there."""
    from spittle_tpu.engine.base import TranscribeParams
    from spittle_tpu.engine.whisper_engine import WhisperEngine

    t = np.arange(16000 * 3) / 16000.0
    mk = lambda f: (np.sin(2 * np.pi * f * t) * 0.3 * 32768).astype(np.int16)
    eng = WhisperEngine(wire="mulaw")
    eng.load_model("random:tiny")
    p = TranscribeParams(
        language="en", condition_on_previous_text=False,
        parallel_windows=True, max_tokens=8, temperatures=(0.0,),
    )
    batches = [[mk(300), mk(500)], [mk(700)]]
    out = list(eng.transcribe_stream(batches, p))
    assert [len(r) for r in out] == [2, 1]
    for group in out:
        for r in group:
            assert r.segments is not None


def test_native_encode_bit_exact_full_domain():
    """The native one-pass/table encoder (native/spittle_audio.cpp) must
    match the numpy reference over the ENTIRE int16 domain and a dense
    f32 sweep (knife-edge rounding is precision-chain-sensitive)."""
    from spittle_tpu.audio.mulaw import _mulaw_encode_native

    def np_ref(x):
        if x.dtype == np.int16:
            xf = x.astype(np.float32) / 32768.0
        else:
            xf = np.clip(x.astype(np.float32), -1.0, 1.0)
        y = np.sign(xf) * np.log1p(MU * np.abs(xf)) / np.log1p(MU)
        return np.round((y + 1.0) * 127.5).astype(np.uint8)

    nat = _mulaw_encode_native
    allv = np.arange(-32768, 32768, dtype=np.int32).astype(np.int16)
    got = nat(allv)
    if got is None:
        pytest.skip("native lib unavailable (no g++)")
    np.testing.assert_array_equal(got, np_ref(allv))

    f = np.linspace(-1.2, 1.2, 2_000_001).astype(np.float32)
    np.testing.assert_array_equal(nat(f), np_ref(f))


def test_engine_rejects_unknown_wire():
    """SPITTLE_WIRE typos (e.g. 'mu-law') must fail loudly instead of
    silently degrading to the 'auto' wire."""
    from spittle_tpu.engine.whisper_engine import WhisperEngine

    with pytest.raises(ValueError, match="wire"):
        WhisperEngine(wire="mu-law")
