"""Microphone capture source: fake-subprocess integration + probe errors.

The real surface (`spittle-tpu record` / `transcribe --mic`) needs a
capture tool; these tests substitute a fake process producing
deterministic PCM, matching the reference recorder's worker-thread
capture semantics (`recorder.rs:83-135`).
"""

import io
import threading
import time

import numpy as np
import pytest

from spittle_tpu.shell.mic import (
    CAPTURE_TOOLS,
    CaptureUnavailableError,
    MicSource,
    pick_capture_tool,
    probe_capture_tools,
)


class FakeProc:
    """Subprocess stand-in: stdout yields PCM then EOF. An optional gate
    holds the stream until the consumer is ready (real mics deliver in
    real time; tests release the gate after recorder.start())."""

    def __init__(self, pcm_bytes: bytes, chunk: int = 1000, gate=None):
        self._buf = io.BytesIO(pcm_bytes)
        self._chunk = chunk
        self._gate = gate
        self.terminated = False
        self.stdout = self

    def read(self, n: int) -> bytes:
        if self._gate is not None:
            self._gate.wait(timeout=10)
        # return odd-sized blocks to exercise partial-sample reassembly
        return self._buf.read(min(n, self._chunk))

    def terminate(self):
        self.terminated = True

    def wait(self, timeout=None):
        return 0

    def poll(self):
        return 0


@pytest.fixture
def sine_pcm():
    t = np.arange(16000) / 16000.0
    samples = (0.25 * np.sin(2 * np.pi * 440 * t)).astype("<f4")
    return samples, samples.tobytes()


def make_source(pcm_bytes, monkeypatch):
    # force the tool probe to succeed regardless of environment
    monkeypatch.setattr(
        "spittle_tpu.shell.mic.shutil.which", lambda name: "/usr/bin/" + name
    )
    return MicSource(popen=lambda cmd: FakeProc(pcm_bytes))


def test_mic_source_streams_all_samples(sine_pcm, monkeypatch):
    samples, pcm = sine_pcm
    src = make_source(pcm, monkeypatch)
    got = []
    deadline = time.time() + 10
    while time.time() < deadline:
        chunk = src.read(timeout=0.2)
        if chunk is None:
            break
        if len(chunk):
            got.append(chunk)
    out = np.concatenate(got)
    assert len(out) == len(samples)
    np.testing.assert_allclose(out, samples, rtol=0, atol=1e-7)
    src.close()
    assert src._proc.terminated


def test_mic_source_handles_partial_sample_blocks(monkeypatch):
    """Blocks that split a float32 across reads reassemble correctly."""
    samples = np.arange(100, dtype="<f4") / 100.0
    monkeypatch.setattr(
        "spittle_tpu.shell.mic.shutil.which", lambda name: "/usr/bin/" + name
    )
    src = MicSource(popen=lambda cmd: FakeProc(samples.tobytes(), chunk=7))
    got = []
    deadline = time.time() + 10
    while time.time() < deadline:
        chunk = src.read(timeout=0.2)
        if chunk is None:
            break
        if len(chunk):
            got.append(chunk)
    out = np.concatenate(got)
    np.testing.assert_array_equal(out, samples.astype(np.float32))
    src.close()


def test_mic_through_recorder(sine_pcm, monkeypatch):
    """Full capture chain: fake mic process -> ring -> AudioRecorder
    (resample passthrough at 16 kHz) -> accumulated samples."""
    from spittle_tpu.audio.recorder import AudioRecorder

    samples, pcm = sine_pcm
    monkeypatch.setattr(
        "spittle_tpu.shell.mic.shutil.which", lambda name: "/usr/bin/" + name
    )
    gate = threading.Event()
    src = MicSource(popen=lambda cmd: FakeProc(pcm, gate=gate))
    rec = AudioRecorder(src)
    rec.open()
    rec.start()
    gate.set()  # mic audio begins arriving once recording is active
    time.sleep(0.5)
    audio = rec.stop()
    rec.close()
    src.close()
    # 1 s of audio minus at most one partial 30 ms frame
    assert len(audio) >= 16000 - 480
    assert np.abs(audio).max() > 0.2


def test_probe_unavailable_error(monkeypatch):
    monkeypatch.setattr("spittle_tpu.shell.mic.shutil.which", lambda n: None)
    assert probe_capture_tools() == []
    with pytest.raises(CaptureUnavailableError, match="probed: parec"):
        pick_capture_tool()
    with pytest.raises(CaptureUnavailableError, match="not found"):
        pick_capture_tool("arecord")
    with pytest.raises(ValueError, match="unknown capture tool"):
        pick_capture_tool("sox-but-wrong")


def test_tool_command_lines():
    by_name = {t.name: t for t in CAPTURE_TOOLS}
    assert by_name["parec"].command(16000, None) == [
        "parec", "--rate=16000", "--channels=1", "--format=float32le",
    ]
    assert by_name["parec"].command(16000, "usb-mic")[-2:] == ["-d", "usb-mic"]
    assert by_name["arecord"].command(48000, None)[:2] == ["arecord", "-q"]
    assert by_name["pw-record"].command(16000, None)[-1] == "-"


def test_cli_record_probe_and_mic_error(monkeypatch, capsys):
    from spittle_tpu.cli import main

    monkeypatch.setattr("spittle_tpu.shell.mic.shutil.which", lambda n: None)
    assert main(["record", "--probe"]) == 1
    assert "(none)" in capsys.readouterr().out
    assert main(["record", "--seconds", "0.1"]) == 2
    assert "no microphone capture tool" in capsys.readouterr().err
    assert main(["transcribe", "--mic", "--seconds", "0.1"]) == 2


def test_cli_transcribe_requires_input(capsys):
    from spittle_tpu.cli import main

    assert main(["transcribe"]) == 2
    assert "WAV path or --mic" in capsys.readouterr().err


def test_default_source_factory_headless(tmp_path, monkeypatch):
    """Without capture tools AppServices falls back to a QueueSource."""
    from spittle_tpu.app.services import AppServices
    from spittle_tpu.audio.recorder import QueueSource

    monkeypatch.setattr("spittle_tpu.shell.mic.shutil.which", lambda n: None)
    services = AppServices(str(tmp_path), use_mock_engine=True)
    assert isinstance(services.audio._source_factory(), QueueSource)
    services.shutdown()
