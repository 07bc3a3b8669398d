"""macOS AX selection-replace: pure range math + injectable backend.

Mirrors `/root/reference/src-tauri/src/macos_ax.rs` semantics and the
clipboard.rs:690-790 apply_text_diff integration, exercised off-macOS
through a fake AX backend.
"""

import pytest

from spittle_tpu.shell.macos_ax import (
    AXError,
    compute_replace_range,
    try_select_replace_range_before_cursor,
)


class FakeBackend:
    def __init__(self, location=20, length=0, settable=True, fail=None):
        self.location = location
        self.length = length
        self.settable = settable
        self.fail = fail
        self.set_calls = []

    def range_settable(self):
        if self.fail == "settable":
            raise RuntimeError("ax down")
        return self.settable

    def selected_range(self):
        if self.fail == "read":
            raise AXError("no element")
        return self.location, self.length

    def set_selected_range(self, location, length):
        if self.fail == "set":
            raise AXError("set failed")
        self.set_calls.append((location, length))


def test_compute_replace_range():
    # cursor at 20, delete 5 chars that sit 3 before the cursor:
    # selection [20-5-3, 5] (macos_ax.rs:144-157)
    assert compute_replace_range(20, 5, 3) == (12, 5)
    assert compute_replace_range(8, 8, 0) == (0, 8)


def test_compute_replace_range_underflow():
    with pytest.raises(AXError, match="before required replace boundary"):
        compute_replace_range(4, 5, 3)


def test_selection_applied():
    be = FakeBackend(location=20)
    assert try_select_replace_range_before_cursor(5, 3, backend=be) is True
    assert be.set_calls == [(12, 5)]


@pytest.mark.parametrize("fail", ["settable", "read", "set"])
def test_failures_fall_back(fail):
    be = FakeBackend(fail=fail)
    assert try_select_replace_range_before_cursor(2, 1, backend=be) is False


def test_not_settable_falls_back():
    be = FakeBackend(settable=False)
    assert try_select_replace_range_before_cursor(2, 1, backend=be) is False
    assert be.set_calls == []


def test_no_backend_off_macos():
    # default backend resolves to None off-darwin -> keyboard fallback
    import sys

    if sys.platform != "darwin":
        assert try_select_replace_range_before_cursor(2, 1) is False


# -- integration with SystemTextOutput.apply_text_diff -----------------------


class RecordingRunner:
    def __init__(self):
        self.commands = []

    def __call__(self, cmd, stdin=None):
        self.commands.append((tuple(cmd), stdin))
        return True


def make_output(ax_backend, paste_method=None):
    from spittle_tpu.config.settings import AppSettings, PasteMethod
    from spittle_tpu.shell.textout import SystemTextOutput

    s = AppSettings()
    if paste_method is not None:
        s.paste_method = paste_method
    runner = RecordingRunner()
    out = SystemTextOutput(
        settings_provider=lambda: s,
        runner=runner,
        which=lambda name: "/usr/bin/" + name if name == "xdotool" else None,
        ax_backend=ax_backend,
    )
    return out, runner


def keys_pressed(runner):
    return [c for c, _ in runner.commands if "key" in c]


def test_apply_diff_uses_ax_path():
    """With a working AX backend: no arrows/backspaces before the type,
    Right x suffix after (clipboard.rs step 4 runs on both paths)."""
    be = FakeBackend(location=30)
    out, runner = make_output(be)
    out.apply_text_diff(suffix_chars=2, delete_chars=4, insert="new")
    assert be.set_calls == [(24, 4)]
    joined = [" ".join(c) for c, _ in runner.commands]
    assert not any("Left" in j or "BackSpace" in j for j in joined)
    assert sum("Right" in j for j in joined) == 2
    assert any("type" in j and "new" in j for j in joined)


def test_apply_diff_keyboard_fallback():
    be = FakeBackend(settable=False)
    out, runner = make_output(be)
    out.apply_text_diff(suffix_chars=2, delete_chars=3, insert="x")
    joined = [" ".join(c) for c, _ in runner.commands]
    assert sum("Left" in j for j in joined) == 2
    assert sum("BackSpace" in j for j in joined) == 3
    assert sum("Right" in j for j in joined) == 2


def test_apply_diff_ax_empty_insert_clears_selection():
    be = FakeBackend(location=30)
    out, runner = make_output(be)
    out.apply_text_diff(suffix_chars=0, delete_chars=4, insert="")
    joined = [" ".join(c) for c, _ in runner.commands]
    assert sum("BackSpace" in j for j in joined) == 1  # clears selection


def test_apply_diff_paste_method_none_skips():
    from spittle_tpu.config.settings import PasteMethod

    be = FakeBackend(location=30)
    out, runner = make_output(be, paste_method=PasteMethod.NONE)
    out.apply_text_diff(suffix_chars=2, delete_chars=4, insert="new")
    assert runner.commands == []
    assert be.set_calls == []
