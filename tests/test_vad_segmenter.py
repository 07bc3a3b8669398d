"""VAD segmentation of long-form audio + engine integration."""

import numpy as np
import pytest

from spittle_tpu.audio.vad.segmenter import gated_audio, segment_speech
from spittle_tpu.audio.vad.silero import load_silero_params


def synth_vowel(n, sr=16000, f0=120):
    from scipy.signal import lfilter

    pulses = np.zeros(n)
    pulses[:: sr // f0] = 1.0

    def res(x, f, bw):
        r = np.exp(-np.pi * bw / sr)
        th = 2 * np.pi * f / sr
        return lfilter([1 - r], [1, -2 * r * np.cos(th), r * r], x)

    v = res(pulses, 700, 80) + 0.7 * res(pulses, 1200, 90) + 0.3 * res(pulses, 2600, 120)
    return (0.5 * v / np.abs(v).max()).astype(np.float32)


@pytest.fixture(scope="module")
def params():
    return load_silero_params()


def test_speech_in_silence_located(params):
    sr = 16000
    silence = np.zeros(sr * 2, np.float32)
    speech = synth_vowel(sr * 2)
    audio = np.concatenate([silence, speech, silence])
    segs = segment_speech(audio, params=params, onset=2, prefill=4, hangover=4)
    assert len(segs) >= 1
    # The detected span overlaps the true speech region [2s, 4s).
    s = segs[0]
    assert s.start_sec < 4.0 and s.end_sec > 2.0
    # and mostly excludes silence
    total = sum(x.end_sample - x.start_sample for x in segs)
    assert total < len(audio) * 0.6


def test_all_silence_no_segments(params):
    audio = (0.001 * np.random.default_rng(0).standard_normal(16000 * 3)).astype(
        np.float32
    )
    assert segment_speech(audio, params=params) == []


def test_gated_audio_concatenates(params):
    sr = 16000
    audio = np.concatenate(
        [np.zeros(sr, np.float32), synth_vowel(sr), np.zeros(sr, np.float32)]
    )
    segs = segment_speech(audio, params=params, onset=1, prefill=2, hangover=2)
    gated = gated_audio(audio, segs)
    assert 0 < len(gated) < len(audio)


def test_two_utterances_split(params):
    sr = 16000
    audio = np.concatenate([
        synth_vowel(sr), np.zeros(sr * 3, np.float32), synth_vowel(sr),
    ])
    segs = segment_speech(audio, params=params, onset=1, prefill=2, hangover=3)
    assert len(segs) >= 2


def test_engine_vad_integration(params):
    from spittle_tpu.engine.whisper_engine import WhisperEngine
    from spittle_tpu.models.whisper.config import CONFIGS, WhisperConfig

    CONFIGS.setdefault(
        "unit-test",
        WhisperConfig(
            name="unit-test", n_mels=80, n_audio_ctx=1500, n_audio_state=64,
            n_audio_head=4, n_audio_layer=2, n_vocab=51865, n_text_ctx=48,
            n_text_state=64, n_text_head=4, n_text_layer=2,
        ),
    )
    eng = WhisperEngine()
    eng.load_model("random:unit-test")
    sr = 16000
    audio = np.concatenate(
        [np.zeros(sr * 2, np.float32), synth_vowel(sr * 2),
         np.zeros(sr * 2, np.float32)]
    )
    res = eng.transcribe_vad_segments(
        audio, None
    )
    assert isinstance(res.text, str)
    for seg in res.segments:
        # timestamps live in absolute long-form time
        assert 0 <= seg.start <= len(audio) / sr + 30
