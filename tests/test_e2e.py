"""End-to-end: mic audio -> recorder -> manager -> JAX Whisper -> pasted text.

The full assembled stack with the real (random-weight, tiny-config)
Whisper engine behind the TranscriptionManager seam — the framework
analog of the reference's full dictation flow (SURVEY §3.1-3.2)."""

import time

import numpy as np
import pytest

from spittle_tpu.app.actions import ActionContext
from spittle_tpu.app.services import AppServices
from spittle_tpu.audio.recorder import QueueSource
from spittle_tpu.engine.whisper_engine import WhisperEngine
from spittle_tpu.models.whisper.config import CONFIGS, WhisperConfig
from spittle_tpu.pipeline import BufferTextOutput

CONFIGS.setdefault(
    "unit-test",
    WhisperConfig(
        name="unit-test", n_mels=80, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_vocab=51865, n_text_ctx=40,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    ),
)


class TinyWhisperEngine(WhisperEngine):
    def load_model(self, model_path: str) -> None:
        super().load_model("random:unit-test")


@pytest.mark.slow
def test_full_dictation_flow(tmp_path):
    src = QueueSource(16000)
    services = AppServices(
        str(tmp_path),
        source_factory=lambda: src,
        engine_factory=lambda et: TinyWhisperEngine(),
    )
    out = BufferTextOutput()
    actions = ActionContext(services, out)

    # Load the engine synchronously (the action path does this async).
    services.transcription.load_model("unit-test", "random:unit-test", "whisper")

    actions.handle_shortcut_event("transcribe", "ctrl+space", True)
    assert services.audio.is_recording()
    t = np.arange(24000) / 16000.0
    audio = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    src.push(audio)
    time.sleep(0.2)
    actions.handle_shortcut_event("transcribe", "ctrl+space", False)

    # The pipeline runs in a background thread; wait for completion.
    deadline = time.time() + 120
    while time.time() < deadline:
        with services.toggle_lock:
            done = not services.toggle_state.get("transcribe", True)
        if done and not services.audio.is_recording():
            break
        time.sleep(0.1)
    # Random weights produce arbitrary text (possibly filtered to empty);
    # the assertion is that the full path executed without errors and the
    # engine was exercised.
    assert services.transcription.is_model_loaded
    assert isinstance(out.buffer, str)
    # History got an entry if post-processing was on; with defaults the
    # non-post-process path pastes directly.
    services.shutdown()


def test_dictation_pastes_exact_text_and_saves_history(tmp_path):
    """Deterministic mock engine: the full shortcut->record->transcribe->
    paste path delivers the exact canned text, and the post-process path
    writes the history row (VERDICT r1: assert content, not just type)."""
    src = QueueSource(16000)
    services = AppServices(
        str(tmp_path), source_factory=lambda: src, use_mock_engine=True
    )
    out = BufferTextOutput()
    actions = ActionContext(services, out)
    services.transcription.load_model("mock", "/fake", "whisper")
    services.transcription._engine.canned_text = "exact canned output"

    actions.handle_shortcut_event("transcribe", "ctrl+space", True)
    src.push((0.2 * np.sin(
        2 * np.pi * 300 * np.arange(24000) / 16000.0)).astype(np.float32))
    time.sleep(0.2)
    actions.handle_shortcut_event("transcribe", "ctrl+space", False)

    deadline = time.time() + 30
    while time.time() < deadline and "exact canned output" not in out.buffer:
        time.sleep(0.05)
    assert "exact canned output" in out.buffer
    # default settings append a trailing space (append_trailing_space)
    assert out.buffer.endswith(" ")

    # Post-process path saves a history row (LLM absent -> raw fallback,
    # pipeline.rs:888-899 semantics).
    services.update_settings(post_process_enabled=True)
    actions.handle_shortcut_event(
        "transcribe_with_post_process", "ctrl+shift+space", True)
    src.push(np.zeros(24000, np.float32))
    time.sleep(0.2)
    actions.handle_shortcut_event(
        "transcribe_with_post_process", "ctrl+shift+space", False)
    deadline = time.time() + 30
    while time.time() < deadline:
        entries = services.history.get_history_entries()
        if entries:
            break
        time.sleep(0.05)
    assert entries and entries[0].transcription_text == "exact canned output"
    services.shutdown()
