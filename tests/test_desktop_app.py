"""Desktop assembly: the complete hotkey -> record -> transcribe ->
paste loop with zero external shell.

Key events enter through the REAL evdev wire format (kernel
input_event structs over a pipe into the production listener thread),
drive the ShortcutRegistry -> handle_shortcut_event -> recorder ->
engine -> pipeline -> paste. Reference: lib.rs:160-320 boot +
spittle-keys.rs listener.
"""

import os
import time

import numpy as np
import pytest

from spittle_tpu.app.desktop import build_app
from spittle_tpu.audio.recorder import QueueSource
from spittle_tpu.config.settings import KeyboardImplementation
from spittle_tpu.pipeline import BufferTextOutput
from spittle_tpu.shell.autostart import AutostartManager
from spittle_tpu.shell.evdev_keys import EvdevBackend, pack_key


def wait_for(cond, timeout=10.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.02)
    return False


@pytest.fixture
def app(tmp_path):
    r, w = os.pipe()
    be = EvdevBackend(fds=[r])
    src = QueueSource(16000)
    out = BufferTextOutput()
    a = build_app(
        str(tmp_path),
        port=0,
        output=out,
        source_factory=lambda: src,
        use_mock_engine=True,
        backends={KeyboardImplementation.HANDY_KEYS: be},
        player=lambda path, vol: None,
        autostart=AutostartManager(home=str(tmp_path)),
    )
    a.services.transcription.load_model("mock", "/fake", "whisper")
    a.services.transcription._engine.canned_text = "typed by hotkey"
    yield a, w, src, out
    os.close(w)
    a.shutdown()


class TestFullLoop:
    def test_hotkey_records_and_pastes(self, app):
        a, w, src, out = app
        # The linux default binding is ctrl+space (settings defaults).
        os.write(w, pack_key("ctrl", True) + pack_key("space", True))
        assert wait_for(lambda: a.services.audio.is_recording()), (
            "hotkey press did not start recording"
        )
        for _ in range(8):
            src.push(
                (0.1 * np.sin(2 * np.pi * 330 * np.arange(1600) / 16000))
                .astype(np.float32)
            )
            time.sleep(0.05)
        os.write(w, pack_key("space", False) + pack_key("ctrl", False))
        assert wait_for(lambda: not a.services.audio.is_recording())
        assert wait_for(lambda: "typed by hotkey" in out.buffer), (
            f"nothing pasted; buffer={out.buffer!r}"
        )

    def test_cancel_hotkey_while_recording(self, app):
        a, w, src, out = app
        os.write(w, pack_key("ctrl", True) + pack_key("space", True))
        assert wait_for(lambda: a.services.audio.is_recording())
        src.push(np.zeros(1600, np.float32))
        # escape = the default cancel binding; only fires while recording
        os.write(w, pack_key("escape", True))
        assert wait_for(lambda: not a.services.audio.is_recording())
        os.write(w, pack_key("escape", False))
        os.write(w, pack_key("space", False) + pack_key("ctrl", False))
        time.sleep(0.5)
        assert out.buffer == ""

    def test_registry_bound_from_settings(self, app):
        a, _w, _src, _out = app
        assert set(a.registry._bindings) >= {
            "transcribe", "transcribe_with_post_process", "cancel",
        }
