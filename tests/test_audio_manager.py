"""Recorder, recording pipeline, and audio manager tests."""

import time

import numpy as np
import pytest

from spittle_tpu.audio.recorder import AudioRecorder, QueueSource
from spittle_tpu.audio.visualizer import AudioVisualizer
from spittle_tpu.audio.wav import load_wav_file, save_wav_file
from spittle_tpu.events import EventBus, MIC_LEVEL
from spittle_tpu.managers.audio import AudioRecordingManager
from spittle_tpu.managers.recording_pipeline import (
    Busy,
    Committed,
    RecordingPipeline,
    should_trigger_health_recovery,
)


class TestRecordingPipeline:
    def test_two_phase_start(self):
        p = RecordingPipeline()
        assert p.can_attempt_start()
        r = p.commit_start("transcribe")
        assert isinstance(r, Committed)
        assert p.is_recording()
        assert p.active_binding() == "transcribe"
        r2 = p.commit_start("other")
        assert isinstance(r2, Busy)
        assert r2.active_binding == "transcribe"

    def test_stop_requires_owner(self):
        p = RecordingPipeline()
        p.commit_start("a")
        assert not p.stop_for_binding("b")
        assert p.is_recording()
        assert p.stop_for_binding("a")
        assert not p.is_recording()

    def test_cancel(self):
        p = RecordingPipeline()
        assert not p.cancel()
        p.commit_start("a")
        assert p.cancel()
        assert not p.is_recording()

    def test_health_predicate(self):
        assert not should_trigger_health_recovery(False, 0, 20_000, 10_000)
        assert not should_trigger_health_recovery(True, None, 20_000, 10_000)
        assert not should_trigger_health_recovery(True, 15_000, 20_000, 10_000)
        assert should_trigger_health_recovery(True, 5_000, 20_000, 10_000)


class TestRecorder:
    def test_records_pushed_audio(self):
        src = QueueSource(16000)
        rec = AudioRecorder(src)
        rec.open()
        rec.start()
        audio = np.sin(np.linspace(0, 100, 4800)).astype(np.float32)
        src.push(audio)
        time.sleep(0.3)
        out = rec.stop()
        rec.close()
        # 4800 samples -> 10 full frames; tail padded to frame multiple
        assert len(out) % 480 == 0
        assert len(out) >= 4800
        np.testing.assert_allclose(out[:4800], audio, atol=1e-6)

    def test_level_callback_fires(self):
        src = QueueSource(16000)
        levels = []
        rec = AudioRecorder(src).with_level_callback(levels.append)
        rec.open()
        src.push(np.random.default_rng(0).standard_normal(2048).astype(np.float32))
        time.sleep(0.3)
        rec.close()
        assert levels and len(levels[0]) == 16

    def test_segment_emission(self):
        src = QueueSource(16000)
        segments = []
        rec = AudioRecorder(src).with_segment_emission(1600, segments.append)
        rec.open()
        rec.start()
        src.push(np.ones(8000, np.float32) * 0.1)
        time.sleep(0.3)
        rec.stop()
        rec.close()
        assert segments
        assert all(len(s) >= 1600 for s in segments[:-1])


class TestAudioRecordingManager:
    def _mk(self, **kw):
        src = QueueSource(16000)
        mgr = AudioRecordingManager(
            source_factory=lambda: src, events=EventBus(), **kw
        )
        return src, mgr

    def test_start_stop_roundtrip(self):
        src, mgr = self._mk()
        assert mgr.try_start_recording("transcribe")
        assert mgr.is_recording()
        assert not mgr.try_start_recording("other")  # busy
        src.push(np.ones(32000, np.float32) * 0.05)
        time.sleep(0.1)  # let the consumer pick up the start command
        out = mgr.stop_recording("transcribe")  # stop drains pending audio
        assert out is not None and len(out) >= 32000
        assert not mgr.is_recording()
        mgr.shutdown()

    def test_short_recording_padded(self):
        src, mgr = self._mk()
        mgr.try_start_recording("t")
        src.push(np.ones(1600, np.float32))  # 0.1 s
        time.sleep(0.3)
        out = mgr.stop_recording("t")
        assert len(out) == int(1.25 * 16000)
        mgr.shutdown()

    def test_stop_wrong_binding_returns_none(self):
        src, mgr = self._mk()
        mgr.try_start_recording("a")
        assert mgr.stop_recording("b") is None
        mgr.cancel_recording()
        mgr.shutdown()

    def test_mic_level_events(self):
        src = QueueSource(16000)
        bus = EventBus()
        got = []
        bus.listen(MIC_LEVEL, got.append)
        mgr = AudioRecordingManager(source_factory=lambda: src, events=bus,
                                    always_on=True)
        src.push(np.random.default_rng(1).standard_normal(4096).astype(np.float32))
        time.sleep(0.3)
        mgr.shutdown()
        assert got and len(got[0]) == 16


class TestVisualizer:
    def test_shapes_and_range(self):
        viz = AudioVisualizer()
        out = viz.feed(np.random.default_rng(0).standard_normal(512).astype(np.float32))
        assert out is not None and len(out) == 16
        assert all(0.0 <= v <= 1.0 for v in out)

    def test_buffers_until_window(self):
        viz = AudioVisualizer()
        assert viz.feed(np.zeros(100, np.float32)) is None
        assert viz.feed(np.zeros(500, np.float32)) is not None

    def test_loud_tone_registers(self):
        viz = AudioVisualizer()
        t = np.arange(512) / 16000.0
        tone = (0.8 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
        out = viz.feed(tone)
        assert max(out) > 0.3


class TestWav:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.wav")
        audio = (0.5 * np.sin(np.linspace(0, 50, 16000))).astype(np.float32)
        save_wav_file(path, audio)
        loaded, rate = load_wav_file(path)
        assert rate == 16000
        np.testing.assert_allclose(loaded, audio, atol=1e-3)
