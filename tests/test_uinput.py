"""uinput keystroke backend: native build, key parsing, and the textout
preference order (uinput first under AUTO, tool chain fallback —
input.rs enigo analog + clipboard.rs tool chain)."""

import os
import subprocess

import numpy as np  # noqa: F401  (import parity with sibling tests)
import pytest

from spittle_tpu.config.settings import AppSettings, PasteMethod, TypingTool
from spittle_tpu.shell.textout import SystemTextOutput
from spittle_tpu.shell.uinput import MOD_CTRL, MOD_META, MOD_SHIFT


def test_native_lib_builds():
    """The C++ builds standalone even off-Linux (stubbed)."""
    src = os.path.join(
        os.path.dirname(__file__), "..", "native", "spittle_input.cpp"
    )
    out = "/tmp/test_spittle_input.so"
    r = subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", out, src],
        capture_output=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr.decode()[-800:]


def test_parse_key():
    p = SystemTextOutput._parse_key
    assert p("ctrl+v") == (MOD_CTRL, "v")
    assert p("ctrl+shift+v") == (MOD_CTRL | MOD_SHIFT, "v")
    assert p("shift+Insert") == (MOD_SHIFT, "insert")
    assert p("Left") == (0, "left")
    assert p("BackSpace") == (0, "backspace")
    assert p("super+Return") == (MOD_META, "enter")
    assert p("weird+x") is None
    assert p("F13") is None  # unmapped -> tool fallback


class FakeKeyboard:
    def __init__(self, ascii_only=True):
        self.typed = []
        self.keys = []
        self.ascii_only = ascii_only

    def type_text(self, text):
        return self.type_prefix(text) == len(text)

    def type_prefix(self, text):
        if self.ascii_only:
            i = 0
            while i < len(text) and ord(text[i]) < 128:
                i += 1
            if i < len(text):
                if i:
                    self.typed.append(text[:i])
                return i
        self.typed.append(text)
        return len(text)

    def key(self, name, mods=0, count=1):
        self.keys.append((name, mods, count))
        return True


def _out(kb, settings=None, runner_calls=None):
    s = settings or AppSettings()
    runner_calls = runner_calls if runner_calls is not None else []

    def runner(cmd, stdin=None):
        runner_calls.append(cmd)
        return True

    return SystemTextOutput(
        lambda: s, runner=runner, which=lambda t: t == "xdotool",
        uinput_factory=lambda: kb,
    ), runner_calls


def test_direct_typing_prefers_uinput():
    kb = FakeKeyboard()
    s = AppSettings()
    s.paste_method = PasteMethod.DIRECT
    out, calls = _out(kb, s)
    out.paste_raw("hello world")
    assert kb.typed == ["hello world"]
    assert calls == []  # no subprocess fallback needed


def test_non_ascii_falls_back_to_tool_chain():
    kb = FakeKeyboard(ascii_only=True)
    s = AppSettings()
    s.paste_method = PasteMethod.DIRECT
    out, calls = _out(kb, s)
    out.paste_raw("naïve café")
    assert kb.typed == []
    assert calls and calls[0][0] == "xdotool"


def test_paste_keystroke_via_uinput():
    kb = FakeKeyboard()
    s = AppSettings()
    s.paste_method = PasteMethod.CTRL_V
    out, calls = _out(kb, s)
    out.paste_raw("text")
    # clipboard write still uses the system tool; the ctrl+v press is
    # injected natively
    assert ("v", MOD_CTRL, 1) in kb.keys


def test_diff_apply_batches_arrow_movement():
    kb = FakeKeyboard()
    out, _ = _out(kb)
    out.apply_text_diff(suffix_chars=7, delete_chars=3, insert="fix")
    assert ("left", 0, 7) in kb.keys
    assert ("backspace", 0, 3) in kb.keys
    assert kb.typed == ["fix"]
    assert ("right", 0, 7) in kb.keys


def test_explicit_tool_choice_bypasses_uinput():
    kb = FakeKeyboard()
    s = AppSettings()
    s.paste_method = PasteMethod.DIRECT
    s.typing_tool = TypingTool.XDOTOOL
    out, calls = _out(kb, s)
    out.paste_raw("hello")
    assert kb.typed == []
    assert calls and calls[0][0] == "xdotool"


def test_unavailable_uinput_degrades():
    def boom():
        raise OSError("no /dev/uinput")

    s = AppSettings()
    s.paste_method = PasteMethod.DIRECT
    calls = []

    def runner(cmd, stdin=None):
        calls.append(cmd)
        return True

    out = SystemTextOutput(
        lambda: s, runner=runner, which=lambda t: t == "wtype",
        uinput_factory=boom,
    )
    out.paste_raw("hello")
    assert calls and calls[0][0] == "wtype"


@pytest.mark.skipif(
    not (os.path.exists("/dev/uinput") and os.access("/dev/uinput", os.W_OK)),
    reason="/dev/uinput not writable here",
)
def test_real_uinput_device():
    from spittle_tpu.shell.uinput import UinputKeyboard

    kb = UinputKeyboard()
    try:
        assert kb.type_text("hello")
        assert kb.key("enter")
        assert kb.key("left", count=3)
    finally:
        kb.close()
