"""Shell text output, context providers, signal handler, tracing, CLI."""

import json
import os
import signal
import time

import numpy as np
import pytest

from spittle_tpu.app.context_providers import (
    get_cursor_workspace,
    get_terminal_context_cwd,
    get_workspace_root,
    is_terminal_bundle_id,
    update_mru,
)
from spittle_tpu.config.settings import (
    AppSettings,
    ClipboardHandling,
    PasteMethod,
    TypingTool,
)
from spittle_tpu.shell.textout import (
    PASTE_KEYS,
    SystemTextOutput,
    choose_typing_tool,
    clipboard_write_command,
    get_available_typing_tools,
    key_command,
    type_command,
    type_stdin,
)
from spittle_tpu.utils.tracing import Tracer


class FakeRunner:
    def __init__(self):
        self.calls = []

    def __call__(self, cmd, stdin=None):
        self.calls.append((list(cmd), stdin))
        return True


class TestTypingTools:
    def test_probe_order(self):
        have = {"ydotool", "xdotool"}
        tools = get_available_typing_tools(which=lambda t: t in have)
        assert tools == ["auto", "ydotool", "xdotool"]

    def test_choose_auto_priority(self):
        have = {"dotool", "xdotool"}
        assert choose_typing_tool(TypingTool.AUTO, lambda t: t in have) == "dotool"

    def test_choose_explicit_missing(self):
        assert choose_typing_tool(TypingTool.WTYPE, lambda t: False) is None

    def test_command_builders(self):
        assert type_command("xdotool", "hi")[-1] == "hi"
        assert type_command("wtype", "hi") == ["wtype", "--", "hi"]
        assert type_stdin("dotool", "hi") == b"type hi\n"
        assert key_command("xdotool", "ctrl+v")[-1] == "ctrl+v"
        wt = key_command("wtype", "ctrl+v")
        assert wt[:3] == ["wtype", "-M", "ctrl"]

    def test_clipboard_command_selection(self):
        cmd, data = clipboard_write_command("x", True, lambda t: t == "wl-copy")
        assert cmd == ["wl-copy"]
        cmd, _ = clipboard_write_command("x", False, lambda t: t == "xclip")
        assert cmd[0] == "xclip"
        cmd, _ = clipboard_write_command("x", False, lambda t: False)
        assert cmd is None


class TestSystemTextOutput:
    def _out(self, settings, have=("xdotool", "xclip")):
        runner = FakeRunner()
        out = SystemTextOutput(
            settings_provider=lambda: settings,
            runner=runner,
            reader=lambda cmd: "OLDCLIP",
            which=lambda t: t in have,
        )
        return out, runner

    def test_direct_typing(self):
        s = AppSettings()
        s.paste_method = PasteMethod.DIRECT
        s.typing_tool = TypingTool.AUTO
        out, runner = self._out(s)
        out.paste_raw("hello")
        assert runner.calls[0][0][:2] == ["xdotool", "type"]

    def test_ctrl_v_saves_and_restores_clipboard(self):
        s = AppSettings()
        s.paste_method = PasteMethod.CTRL_V
        s.clipboard_handling = ClipboardHandling.DONT_MODIFY
        s.paste_delay_ms = 0
        out, runner = self._out(s)
        out.paste_raw("hello")
        cmds = [c[0][0] for c in runner.calls]
        # write clip, key, restore clip
        assert cmds.count("xclip") == 2
        assert "xdotool" in cmds
        assert runner.calls[0][1] == b"hello"
        assert runner.calls[-1][1] == b"OLDCLIP"

    def test_none_method_copy_to_clipboard(self):
        s = AppSettings()
        s.paste_method = PasteMethod.NONE
        s.clipboard_handling = ClipboardHandling.COPY_TO_CLIPBOARD
        out, runner = self._out(s)
        out.paste_raw("hello")
        assert runner.calls[0][0][0] == "xclip"
        assert len(runner.calls) == 1

    def test_apply_text_diff_keystrokes(self):
        s = AppSettings()
        s.paste_method = PasteMethod.DIRECT
        out, runner = self._out(s)
        out.apply_text_diff(2, 3, "ab")
        keys = [c[0][-1] for c in runner.calls]
        assert keys.count("Left") == 2
        assert keys.count("BackSpace") == 3
        assert keys.count("Right") == 2
        assert any("ab" in c[0] for c in runner.calls)


class TestContextProviders:
    def test_cursor_workspace(self, tmp_path):
        cache = tmp_path / ".cache" / "spittle"
        cache.mkdir(parents=True)
        ws = tmp_path / "project"
        ws.mkdir()
        (cache / "cursor_context.json").write_text(
            json.dumps({"workspaceRoots": [str(ws)]})
        )
        os.environ["XDG_CACHE_HOME"] = str(tmp_path / ".cache")
        try:
            assert get_cursor_workspace(str(tmp_path)) == str(ws)
        finally:
            del os.environ["XDG_CACHE_HOME"]

    def test_terminal_bundle_detection(self):
        assert is_terminal_bundle_id("com.googlecode.iterm2")
        assert is_terminal_bundle_id("net.kovidgoyal.kitty")
        assert not is_terminal_bundle_id("com.todesktop.cursor")

    def test_workspace_root_mru_fallback(self, tmp_path):
        s = AppSettings()
        s.recent_workspace_roots = ["/nonexistent", str(tmp_path)]
        root = get_workspace_root(s, frontmost_bundle_id=lambda: None)
        assert root == str(tmp_path)

    def test_update_mru(self):
        roots = update_mru(["a", "b"], "b")
        assert roots == ["b", "a"]
        roots = update_mru(["1", "2", "3", "4", "5"], "6")
        assert roots == ["6", "1", "2", "3", "4"]


class TestTracer:
    def test_spans_and_stats(self):
        t = Tracer()
        with t.span("op", kind="test"):
            time.sleep(0.01)
        with t.span("op"):
            pass
        stats = t.stats()
        assert stats["op"]["count"] == 2
        assert stats["op"]["max_s"] >= 0.01
        assert len(t.spans("op")) == 2

    def test_dump(self, tmp_path):
        t = Tracer()
        with t.span("x"):
            pass
        p = tmp_path / "trace.json"
        t.dump_json(str(p))
        assert "x" in json.loads(p.read_text())


class TestSignalHandler:
    def test_trigger_toggles(self, tmp_path):
        from spittle_tpu.app.actions import ActionContext
        from spittle_tpu.app.services import AppServices
        from spittle_tpu.app.signal_handle import SignalHandler
        from spittle_tpu.audio.recorder import QueueSource
        from spittle_tpu.pipeline import BufferTextOutput

        src = QueueSource(16000)
        services = AppServices(
            str(tmp_path), source_factory=lambda: src, use_mock_engine=True
        )
        services.transcription.load_model("m", "/fake", "whisper")
        actions = ActionContext(services, BufferTextOutput())
        handler = SignalHandler(actions)
        handler.trigger()
        assert services.audio.is_recording()
        handler.trigger()
        deadline = time.time() + 5
        while services.audio.is_recording() and time.time() < deadline:
            time.sleep(0.02)
        assert not services.audio.is_recording()
        services.shutdown()


class TestCli:
    def test_catalog(self, capsys):
        from spittle_tpu.cli import main

        assert main(["catalog"]) == 0
        out = capsys.readouterr().out
        assert "parakeet-tdt-0.6b-v3" in out

    def test_rolling(self, capsys):
        from spittle_tpu.cli import main

        scenario = os.path.join(
            os.path.dirname(__file__), "data", "rolling_scenarios",
            "okay_prefix_drift.json",
        )
        assert main(["rolling", scenario]) == 0
        assert "PASS" in capsys.readouterr().out

    def test_vad_and_transcribe(self, tmp_path, capsys):
        from spittle_tpu.audio.wav import save_wav_file
        from spittle_tpu.cli import main
        from spittle_tpu.models.whisper.config import CONFIGS, WhisperConfig

        CONFIGS.setdefault(
            "unit-test",
            WhisperConfig(
                name="unit-test", n_mels=80, n_audio_ctx=1500,
                n_audio_state=64, n_audio_head=4, n_audio_layer=2,
                n_vocab=51865, n_text_ctx=32, n_text_state=64, n_text_head=4,
                n_text_layer=2,
            ),
        )
        wav = str(tmp_path / "x.wav")
        rng = np.random.default_rng(0)
        save_wav_file(wav, (0.1 * rng.standard_normal(16000)).astype(np.float32))
        assert main(["vad", wav]) == 0
        assert main(["transcribe", wav, "--model", "random:unit-test",
                     "--language", "en"]) == 0


def test_context_writers_roundtrip(tmp_path):
    import os as _os
    from spittle_tpu.app.context_providers import (
        write_cursor_context, write_terminal_context,
    )

    _os.environ["XDG_CACHE_HOME"] = str(tmp_path / ".cache")
    try:
        ws = tmp_path / "proj"
        ws.mkdir()
        write_cursor_context([str(ws)], home=str(tmp_path))
        assert get_cursor_workspace(str(tmp_path)) == str(ws)
        write_terminal_context(str(ws), home=str(tmp_path))
        assert get_terminal_context_cwd(str(tmp_path)) == str(ws)
    finally:
        del _os.environ["XDG_CACHE_HOME"]


class TestLogging:
    def test_file_level_runtime_adjustable(self, tmp_path):
        from spittle_tpu.config.settings import LogLevel
        from spittle_tpu.utils.logging import LogSystem

        sys_ = LogSystem(str(tmp_path))
        log = sys_.logger
        sys_.set_file_level(LogLevel.ERROR)
        log.debug("hidden debug line")
        log.error("visible error line")
        sys_.set_file_level(LogLevel.DEBUG)
        log.debug("now visible debug")
        for h in log.handlers:
            h.flush()
        content = open(sys_.log_path).read()
        assert "hidden debug line" not in content
        assert "visible error line" in content
        assert "now visible debug" in content

    def test_rotation_config(self, tmp_path):
        from spittle_tpu.utils.logging import FILE_BACKUPS, FILE_MAX_BYTES, LogSystem

        assert FILE_MAX_BYTES == 500_000 and FILE_BACKUPS == 1
        sys_ = LogSystem(str(tmp_path))
        import logging as _l
        rot = [h for h in sys_.logger.handlers
               if isinstance(h, _l.handlers.RotatingFileHandler)][0]
        assert rot.maxBytes == 500_000 and rot.backupCount == 1


class TestAudioDevices:
    PACTL = "0\talsa_input.pci.analog-stereo\tmodule\ts16le\tRUNNING\n" \
            "1\talsa_output.pci.analog-stereo.monitor\tmodule\ts16le\tIDLE\n" \
            "2\tusb_mic.mono\tmodule\ts16le\tSUSPENDED\n"
    ARECORD = ("**** List of CAPTURE Hardware Devices ****\n"
               "card 0: PCH [HDA Intel PCH], device 0: ALC295 Analog "
               "[ALC295 Analog]\n"
               "card 1: Webcam [USB Webcam], device 0: USB Audio [USB Audio]\n")

    def test_parse_pactl(self):
        from spittle_tpu.shell.audio_devices import parse_pactl_sources

        devs = parse_pactl_sources(self.PACTL, "usb_mic.mono")
        names = [d.name for d in devs]
        assert "alsa_input.pci.analog-stereo" in names
        assert all(not n.endswith(".monitor") for n in names)
        assert [d.is_default for d in devs] == [False, True]

    def test_parse_arecord(self):
        from spittle_tpu.shell.audio_devices import parse_arecord_l

        devs = parse_arecord_l(self.ARECORD)
        assert len(devs) == 2
        assert devs[0].is_default
        assert "hw:1,0" in devs[1].name

    def test_list_with_injected_runners(self):
        from spittle_tpu.shell.audio_devices import list_input_devices

        def run(cmd):
            if cmd[:2] == ["pactl", "get-default-source"]:
                return "usb_mic.mono\n"
            if cmd[:2] == ["pactl", "list"]:
                return self.PACTL
            return None

        devs = list_input_devices(which=lambda t: t == "pactl", run=run)
        assert any(d.is_default for d in devs)

    def test_no_tools_empty(self):
        from spittle_tpu.shell.audio_devices import list_input_devices

        assert list_input_devices(which=lambda t: None) == []


def test_cursor_extension_contract():
    """The bundled Cursor extension writes the exact JSON contract
    context_providers reads (cursor_context.json with workspaceRoots /
    activeFile in the platform cache dir)."""
    import os

    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "extensions", "cursor-context", "src", "extension.ts",
    )
    with open(src, encoding="utf-8") as f:
        code = f.read()
    assert "cursor_context.json" in code
    assert "workspaceRoots" in code and "activeFile" in code
    # cache dir parity with context_providers.cache_dir()
    assert "XDG_CACHE_HOME" in code and "Library" in code

    from spittle_tpu.app.context_providers import (
        get_cursor_workspace,
        write_cursor_context,
    )

    import tempfile

    home = tempfile.mkdtemp()
    workspace = tempfile.mkdtemp()  # must exist (isdir check)
    write_cursor_context([workspace], home=home)
    assert get_cursor_workspace(home=home) == workspace
