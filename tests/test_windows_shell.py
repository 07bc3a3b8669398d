"""Windows shell branch: COM mute, SendInput keystrokes, CF_UNICODETEXT
clipboard, topmost-popup overlay — all loopback-tested through their
injectable seams (the macos_ax/x11 pattern; no Windows in this image).

The COM tests build REAL ctypes vtables in real memory so
windows_audio.vtbl_call's pointer math (iface -> *vtable -> slot ->
stdcall with implicit this) is exercised genuinely, not mocked away.

Reference behavior being matched:
  mute      src-tauri/src/managers/audio.rs:17-104
  keystrokes src-tauri/src/input.rs:28-52,120-150
  overlay   src-tauri/src/overlay.rs (windows cfg)
"""

import ctypes
import sys
import time

import pytest

from spittle_tpu.shell.uinput import MOD_CTRL, MOD_SHIFT
from spittle_tpu.shell.windows_audio import (
    CLSID_MMDeviceEnumerator,
    GUID,
    IID_IAudioEndpointVolume,
    IID_IMMDeviceEnumerator,
    set_mute,
)
from spittle_tpu.shell.windows_clipboard import (
    CF_UNICODETEXT,
    clipboard_read,
    clipboard_write,
)
from spittle_tpu.shell.windows_input import (
    INPUT,
    INPUT_KEYBOARD,
    KEYEVENTF_KEYUP,
    KEYEVENTF_UNICODE,
    SendInputKeyboard,
    unicode_events,
    vk_for_name,
)
from spittle_tpu.shell.windows_overlay import (
    WinBackend,
    attach_windows_overlay,
    rgb_to_colorref,
)


# ---------------------------------------------------------------------------
# COM mute: fake interfaces with real vtables
# ---------------------------------------------------------------------------

C = ctypes


class FakeComIface:
    """A COM interface pointer backed by a real in-memory vtable."""

    def __init__(self, slots):
        n = max(slots) + 1
        self._keep = list(slots.values())
        self._arr = (C.c_void_p * n)()
        for i, fn in slots.items():
            self._arr[i] = C.cast(fn, C.c_void_p)
        # iface -> slot containing &vtable
        self._vt = C.c_void_p(C.addressof(self._arr))
        self.addr = C.addressof(self._vt)


def _guid_str(g: GUID) -> str:
    d4 = bytes(g.Data4)
    return "{%08X-%04X-%04X-%s-%s}" % (
        g.Data1, g.Data2, g.Data3, d4[:2].hex().upper(), d4[2:].hex().upper()
    )


def build_com_world(calls, activate_hr=0, endpoint_hr=0, mute_hr=0):
    """MMDeviceEnumerator -> IMMDevice -> IAudioEndpointVolume chain."""

    def release_for(name):
        @C.CFUNCTYPE(C.c_uint32, C.c_void_p)
        def rel(this):
            calls.append(("Release", name))
            return 0

        return rel

    @C.CFUNCTYPE(C.c_int32, C.c_void_p, C.c_int32, C.c_void_p)
    def slot_set_mute(this, mute, ctx):
        calls.append(("SetMute", mute))
        return mute_hr

    vol = FakeComIface({2: release_for("vol"), 14: slot_set_mute})

    @C.CFUNCTYPE(C.c_int32, C.c_void_p, C.POINTER(GUID), C.c_uint32,
                 C.c_void_p, C.POINTER(C.c_void_p))
    def slot_activate(this, iid, ctx, params, out):
        calls.append(("Activate", _guid_str(iid.contents)))
        if activate_hr == 0:
            out[0] = vol.addr
        return activate_hr

    dev = FakeComIface({2: release_for("dev"), 3: slot_activate})

    @C.CFUNCTYPE(C.c_int32, C.c_void_p, C.c_uint32, C.c_uint32,
                 C.POINTER(C.c_void_p))
    def slot_get_endpoint(this, dataflow, role, out):
        calls.append(("GetDefaultAudioEndpoint", dataflow, role))
        if endpoint_hr == 0:
            out[0] = dev.addr
        return endpoint_hr

    enum = FakeComIface({2: release_for("enum"), 4: slot_get_endpoint})

    class FakeOle32:
        def __init__(self):
            self.world = (vol, dev, enum)  # keepalive

        def CoInitializeEx(self, reserved, flags):
            calls.append(("CoInitializeEx", flags))
            return 0

        def CoCreateInstance(self, clsid_ref, outer, ctx, iid_ref, out_ref):
            calls.append((
                "CoCreateInstance",
                _guid_str(clsid_ref._obj),
                _guid_str(iid_ref._obj),
            ))
            out_ref._obj.value = enum.addr
            return 0

    return FakeOle32()


class TestComMute:
    def test_mute_true_walks_the_chain(self):
        calls = []
        assert set_mute(True, ole32=build_com_world(calls)) is True
        assert ("CoCreateInstance", CLSID_MMDeviceEnumerator,
                IID_IMMDeviceEnumerator) in calls
        # eRender=0, eMultimedia=1 (audio.rs GetDefaultAudioEndpoint args)
        assert ("GetDefaultAudioEndpoint", 0, 1) in calls
        assert ("Activate", IID_IAudioEndpointVolume) in calls
        assert ("SetMute", 1) in calls
        # Release discipline: every acquired interface released once.
        rels = [c for c in calls if c[0] == "Release"]
        assert sorted(r[1] for r in rels) == ["dev", "enum", "vol"]

    def test_unmute_sends_zero(self):
        calls = []
        assert set_mute(False, ole32=build_com_world(calls)) is True
        assert ("SetMute", 0) in calls

    def test_endpoint_failure_releases_enum_only(self):
        calls = []
        assert set_mute(True, ole32=build_com_world(calls, endpoint_hr=-1)) \
            is False
        rels = [c[1] for c in calls if c[0] == "Release"]
        assert rels == ["enum"]
        assert not any(c[0] == "SetMute" for c in calls)

    def test_activate_failure_releases_dev_and_enum(self):
        calls = []
        assert set_mute(True, ole32=build_com_world(calls, activate_hr=-1)) \
            is False
        rels = [c[1] for c in calls if c[0] == "Release"]
        assert sorted(rels) == ["dev", "enum"]

    def test_setmute_hresult_failure_is_false_but_released(self):
        calls = []
        assert set_mute(True, ole32=build_com_world(calls, mute_hr=-1)) \
            is False
        rels = [c[1] for c in calls if c[0] == "Release"]
        assert sorted(rels) == ["dev", "enum", "vol"]

    def test_guid_roundtrip(self):
        g = GUID.from_str(IID_IAudioEndpointVolume)
        assert _guid_str(g) == IID_IAudioEndpointVolume
        assert g.Data1 == 0x5CDF2C82


# ---------------------------------------------------------------------------
# SendInput keystrokes
# ---------------------------------------------------------------------------


class FakeUser32:
    def __init__(self, fail=False):
        self.batches = []
        self.fail = fail

    def SendInput(self, n, arr, size):
        assert size == ctypes.sizeof(INPUT)
        if self.fail:
            return 0
        self.batches.append([
            (arr[i].type, arr[i].u.ki.wVk, arr[i].u.ki.wScan,
             arr[i].u.ki.dwFlags)
            for i in range(n)
        ])
        return n


class TestSendInputKeyboard:
    def _kb(self, fail=False):
        sleeps = []
        u32 = FakeUser32(fail=fail)
        kb = SendInputKeyboard(user32=u32, sleep=sleeps.append)
        return kb, u32, sleeps

    def test_input_struct_matches_win64_abi(self):
        # Real Win64 INPUT is 40 bytes (4 type + 4 pad + 32 union); the
        # union must be at least MOUSEINPUT-sized or SendInput rejects
        # the cbSize.
        assert ctypes.sizeof(INPUT) == 40

    def test_unicode_text_down_up_pairs(self):
        kb, u32, _ = self._kb()
        assert kb.type_text("hi") is True
        (batch,) = u32.batches
        assert [e[2] for e in batch] == [ord("h"), ord("h"),
                                         ord("i"), ord("i")]
        assert all(e[0] == INPUT_KEYBOARD and e[1] == 0 for e in batch)
        assert batch[0][3] == KEYEVENTF_UNICODE
        assert batch[1][3] == KEYEVENTF_UNICODE | KEYEVENTF_KEYUP

    def test_surrogate_pairs_ship_as_separate_units(self):
        events = unicode_events("\U0001f600")  # 😀 = D83D DE00
        scans = [e.u.ki.wScan for e in events]
        assert scans == [0xD83D, 0xD83D, 0xDE00, 0xDE00]

    def test_combo_holds_modifier_100ms(self):
        kb, u32, sleeps = self._kb()
        assert kb.key("v", MOD_CTRL) is True
        first, second = u32.batches
        # ctrl down, v down, v up — then hold — then ctrl up
        assert [(e[1], e[3]) for e in first] == [
            (0x11, 0), (ord("V"), 0), (ord("V"), KEYEVENTF_KEYUP)
        ]
        assert sleeps == [SendInputKeyboard.COMBO_HOLD_S]
        assert [(e[1], e[3]) for e in second] == [(0x11, KEYEVENTF_KEYUP)]

    def test_multi_modifier_release_order_reversed(self):
        kb, u32, _ = self._kb()
        assert kb.key("insert", MOD_CTRL | MOD_SHIFT) is True
        first, second = u32.batches
        assert [e[1] for e in first][:2] == [0x11, 0x10]  # ctrl, shift down
        assert [e[1] for e in second] == [0x10, 0x11]  # shift, ctrl up

    def test_arrow_batching_one_call(self):
        kb, u32, sleeps = self._kb()
        assert kb.key("left", 0, count=5) is True
        (batch,) = u32.batches  # input.rs:120-150 batching semantics
        assert len(batch) == 10
        assert all(e[1] == 0x25 for e in batch)
        assert sleeps == []  # no modifiers, no hold

    def test_unknown_key_refused(self):
        kb, u32, _ = self._kb()
        assert kb.key("f13") is False
        assert u32.batches == []

    def test_failure_is_all_or_nothing(self):
        kb, _, _ = self._kb(fail=True)
        assert kb.type_prefix("hello") == 0
        assert kb.type_text("hello") is False

    def test_vk_names_cover_textout_parse_keys(self):
        for name in ("left", "right", "up", "down", "backspace", "enter",
                     "tab", "escape", "insert", "delete", "home", "end",
                     "v", "z", "5"):
            assert vk_for_name(name) is not None, name
        assert vk_for_name("v") == ord("V")


# ---------------------------------------------------------------------------
# Clipboard: fakes hand out real memory, so the module's memmove/decode
# run against genuine allocations
# ---------------------------------------------------------------------------


class FakeKernel32:
    def __init__(self):
        self.allocs = {}
        self.locked = []
        self.unlocked = []

    def GlobalAlloc(self, flags, size):
        assert flags == 0x0002  # GMEM_MOVEABLE
        buf = ctypes.create_string_buffer(size)
        addr = ctypes.addressof(buf)
        self.allocs[addr] = (buf, size)
        return addr

    def GlobalLock(self, h):
        self.locked.append(h)
        return h

    def GlobalUnlock(self, h):
        self.unlocked.append(h)
        return 1

    def GlobalSize(self, h):
        return self.allocs[h][1]


class FakeClipUser32:
    def __init__(self):
        self.data = None
        self.open_count = 0
        self.close_count = 0

    def OpenClipboard(self, owner):
        self.open_count += 1
        return 1

    def CloseClipboard(self):
        self.close_count += 1
        return 1

    def EmptyClipboard(self):
        self.data = None
        return 1

    def SetClipboardData(self, fmt, handle):
        assert fmt == CF_UNICODETEXT
        self.data = handle
        return handle

    def GetClipboardData(self, fmt):
        assert fmt == CF_UNICODETEXT
        return self.data or 0


class TestWindowsClipboard:
    def test_roundtrip_unicode(self):
        u32, k32 = FakeClipUser32(), FakeKernel32()
        text = "héllo wörld \U0001f600"
        assert clipboard_write(text, user32=u32, kernel32=k32) is True
        assert clipboard_read(user32=u32, kernel32=k32) == text
        # open/close balanced across both operations
        assert u32.open_count == u32.close_count == 2
        assert k32.unlocked == k32.locked

    def test_read_empty_clipboard_none(self):
        u32, k32 = FakeClipUser32(), FakeKernel32()
        assert clipboard_read(user32=u32, kernel32=k32) is None
        assert u32.close_count == 1

    def test_off_windows_default_binding_fails_silently(self):
        if sys.platform != "win32":
            assert clipboard_write("x") is False
            assert clipboard_read() is None


# ---------------------------------------------------------------------------
# Overlay backend + shared controller
# ---------------------------------------------------------------------------


class FakeWinUser32:
    def __init__(self):
        self.calls = []

    def GetSystemMetrics(self, i):
        return 1920 if i == 0 else 1080

    def CreateWindowExW(self, ex, cls, name, style, x, y, w, h,
                        parent, menu, inst, param):
        self.calls.append(("create", ex, cls, style, x, y, w, h))
        return 111

    def ShowWindow(self, hwnd, cmd):
        self.calls.append(("show", cmd))
        return 1

    def SetWindowPos(self, hwnd, after, x, y, w, h, flags):
        self.calls.append(("pos", after, x, y, flags))
        return 1

    def GetDC(self, hwnd):
        return 222

    def ReleaseDC(self, hwnd, hdc):
        self.calls.append(("releasedc",))
        return 1

    def FillRect(self, hdc, rect_ref, brush):
        r = rect_ref._obj
        self.calls.append(("fill", r.left, r.top, r.right, r.bottom, brush))
        return 1

    def DestroyWindow(self, hwnd):
        self.calls.append(("destroy",))
        return 1


class FakeGdi32:
    def __init__(self):
        self.brushes = []
        self.deleted = []

    def CreateSolidBrush(self, colorref):
        self.brushes.append(colorref)
        return 333

    def DeleteObject(self, h):
        self.deleted.append(h)
        return 1

    def GdiFlush(self):
        return 1


def test_rgb_to_colorref_swaps_channels():
    assert rgb_to_colorref(0xE05F5F) == 0x5F5FE0
    assert rgb_to_colorref(0xFF0000) == 0x0000FF
    assert rgb_to_colorref(0xFFFFFF) == 0xFFFFFF


class TestWinBackend:
    def _backend(self):
        u32, g32 = FakeWinUser32(), FakeGdi32()
        return WinBackend(user32=u32, gdi32=g32), u32, g32

    def test_window_recipe(self):
        from spittle_tpu.shell.windows_overlay import (
            SW_SHOWNOACTIVATE,
            SWP_NOACTIVATE,
            WS_EX_NOACTIVATE,
            WS_EX_TOOLWINDOW,
            WS_EX_TOPMOST,
            WS_POPUP,
        )

        b, u32, g32 = self._backend()
        assert b.open()
        assert b.screen_size() == (1920, 1080)
        b.create_window(874, 4, 172, 36, 0xE05F5F)
        create = u32.calls[0]
        assert create[0] == "create"
        ex, cls, style = create[1], create[2], create[3]
        # No-focus-steal, no-taskbar, topmost frameless popup
        assert ex & WS_EX_TOPMOST and ex & WS_EX_TOOLWINDOW \
            and ex & WS_EX_NOACTIVATE
        assert style == WS_POPUP and cls == "STATIC"
        b.map()
        assert ("show", SW_SHOWNOACTIVATE) in u32.calls
        pos = [c for c in u32.calls if c[0] == "pos"][-1]
        assert pos[4] & SWP_NOACTIVATE
        # map repaints the background: recording red as COLORREF
        assert g32.brushes[-1] == rgb_to_colorref(0xE05F5F)

    def test_fill_rect_brush_discipline(self):
        b, u32, g32 = self._backend()
        b.create_window(0, 0, 172, 36, 0)
        b.fill_rect(0xFFFFFF, 2, 4, 6, 28)
        fill = [c for c in u32.calls if c[0] == "fill"][-1]
        assert fill[1:5] == (2, 4, 8, 32)  # RECT is right/bottom-exclusive
        assert g32.deleted == [333]  # brush freed
        assert ("releasedc",) in u32.calls

    def test_move_no_activate_no_resize(self):
        from spittle_tpu.shell.windows_overlay import (
            SWP_NOACTIVATE,
            SWP_NOSIZE,
        )

        b, u32, _ = self._backend()
        b.create_window(0, 0, 172, 36, 0)
        b.move(100, 1044)
        pos = [c for c in u32.calls if c[0] == "pos"][-1]
        assert pos[2:4] == (100, 1044)
        assert pos[4] & SWP_NOSIZE and pos[4] & SWP_NOACTIVATE

    def test_close_destroys_once(self):
        b, u32, _ = self._backend()
        b.create_window(0, 0, 172, 36, 0)
        b.close()
        b.close()
        assert u32.calls.count(("destroy",)) == 1


class TestWindowsOverlayController:
    def _wait(self, cond, timeout=5):
        deadline = time.time() + timeout
        while not cond() and time.time() < deadline:
            time.sleep(0.02)
        assert cond()

    def test_show_positions_and_paints(self, tmp_path):
        from spittle_tpu.app.services import AppServices
        from spittle_tpu.config.settings import OverlayPosition
        from spittle_tpu.events import HIDE_OVERLAY, SHOW_OVERLAY
        from spittle_tpu.shell.windows_overlay import SW_HIDE
        from spittle_tpu.shell.x11_overlay import (
            OVERLAY_TOP_OFFSET,
            OVERLAY_WIDTH,
        )

        services = AppServices(str(tmp_path), use_mock_engine=True)
        services.update_settings(overlay_position=OverlayPosition("top"))
        u32, g32 = FakeWinUser32(), FakeGdi32()
        ov = attach_windows_overlay(
            services, backend=WinBackend(user32=u32, gdi32=g32)
        )
        try:
            assert ov is not None
            services.events.emit(SHOW_OVERLAY, "recording")
            self._wait(lambda: ("show", 4) in u32.calls)
            pos = [c for c in u32.calls if c[0] == "pos"][-2]
            assert pos[2] == (1920 - OVERLAY_WIDTH) // 2
            assert pos[3] == OVERLAY_TOP_OFFSET
            services.events.emit(HIDE_OVERLAY, None)
            self._wait(lambda: ("show", SW_HIDE) in u32.calls)
        finally:
            if ov:
                ov.close()
            services.shutdown()


# ---------------------------------------------------------------------------
# Platform wiring: win32 dispatches reach the Windows modules
# ---------------------------------------------------------------------------


class TestWin32Wiring:
    def test_platform_keyboard_picks_sendinput(self, monkeypatch):
        import spittle_tpu.shell.textout as textout
        import spittle_tpu.shell.windows_input as wi

        made = []

        class Stub:
            @staticmethod
            def available():
                return True

            def __init__(self):
                made.append(self)

        monkeypatch.setattr(sys, "platform", "win32")
        monkeypatch.setattr(wi, "SendInputKeyboard", Stub)
        kb = textout._platform_keyboard()
        assert made and kb is made[0]

    def test_mute_dispatches_to_com_chain(self, monkeypatch):
        import spittle_tpu.managers.audio as audio
        import spittle_tpu.shell.windows_audio as wa

        calls = []
        monkeypatch.setattr(sys, "platform", "win32")
        monkeypatch.setattr(wa, "set_mute", lambda m: calls.append(m) or True)
        monkeypatch.setattr(audio, "_mute_state", {"muted": False})
        audio.apply_mute()
        audio.remove_mute()
        assert calls == [True, False]

    def test_overlay_select_picks_windows(self, monkeypatch):
        import spittle_tpu.shell.overlay_select as osel
        import spittle_tpu.shell.windows_overlay as wo

        sentinel = object()
        monkeypatch.setattr(sys, "platform", "win32")
        monkeypatch.setattr(
            wo, "attach_windows_overlay", lambda services: sentinel
        )
        assert osel.attach_session_overlay(object()) is sentinel

    def test_clipboard_write_routes_win32(self, monkeypatch):
        import spittle_tpu.shell.windows_clipboard as wc
        from spittle_tpu.config.settings import AppSettings
        from spittle_tpu.shell.textout import SystemTextOutput

        written = []
        monkeypatch.setattr(sys, "platform", "win32")
        monkeypatch.setattr(
            wc, "clipboard_write", lambda t: written.append(t) or True
        )
        out = SystemTextOutput(lambda: AppSettings())
        assert out._clipboard_write("hello") is True
        assert written == ["hello"]
