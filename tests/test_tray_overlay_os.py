"""Real OS surfaces: StatusNotifierItem tray + X11 overlay window.

The tray tests run against a REAL private dbus-daemon: a mock
StatusNotifierWatcher (built on the same from-scratch D-Bus client)
receives the registration, then drives the tray exactly like a desktop
shell would — property reads, menu layout, click events, icon-change
signals. The overlay tests drive the production window logic through a
recording fake of the thin ctypes Xlib seam (no X server here).

Reference: src-tauri/src/tray.rs:9-60, overlay.rs:23-95.
"""

import os
import shutil
import subprocess
import threading
import time

import pytest

from spittle_tpu.app.ui_state import TrayIconState

pytestmark = pytest.mark.skipif(
    shutil.which("dbus-daemon") is None, reason="no dbus-daemon"
)


@pytest.fixture(scope="module")
def bus():
    proc = subprocess.Popen(
        ["dbus-daemon", "--session", "--print-address", "--nofork"],
        stdout=subprocess.PIPE,
    )
    addr = proc.stdout.readline().decode().strip()
    assert addr.startswith("unix:")
    yield addr
    proc.terminate()
    proc.wait(timeout=5)


@pytest.fixture
def watcher(bus):
    """A desktop shell's StatusNotifierWatcher, for the tray to find."""
    from spittle_tpu.shell.dbus_client import DBusConnection, ExportedObject
    from spittle_tpu.shell.tray_sni import (
        WATCHER_IFACE,
        WATCHER_NAME,
        WATCHER_PATH,
    )

    conn = DBusConnection(bus)
    obj = ExportedObject()
    registered = []
    ev = threading.Event()

    def register(service):
        registered.append(service)
        ev.set()

    obj.methods[(WATCHER_IFACE, "RegisterStatusNotifierItem")] = register
    conn.export(WATCHER_PATH, obj)
    assert conn.request_name(WATCHER_NAME) == 1
    yield conn, registered, ev
    conn.close()


class TestDBusClient:
    def test_call_props_and_signals(self, bus):
        from spittle_tpu.shell.dbus_client import (
            DBusConnection,
            ExportedObject,
            Variant,
        )

        a = DBusConnection(bus)
        b = DBusConnection(bus)
        try:
            obj = ExportedObject()
            obj.methods[("t.I", "Echo")] = (
                lambda s, n: ("si", (s.upper(), n + 1))
            )
            obj.properties["t.I"] = {"V": Variant("s", "1")}
            a.export("/t", obj)
            a.request_name("t.Svc")
            assert b.call("t.Svc", "/t", "t.I", "Echo", "si",
                          ("hey", 4)) == ("HEY", 5)
            props = b.call("t.Svc", "/t",
                           "org.freedesktop.DBus.Properties", "GetAll",
                           "s", ("t.I",))[0]
            assert props["V"].value == "1"

            got = threading.Event()
            b.add_match("type='signal',interface='t.I'")
            b.on_signal(lambda m: got.set() if m.member == "Ping" else None)
            a.emit_signal("/t", "t.I", "Ping")
            assert got.wait(5)
        finally:
            a.close()
            b.close()

    def test_marshal_roundtrip_complex(self):
        from spittle_tpu.shell.dbus_client import (
            Marshaller,
            Unmarshaller,
            Variant,
        )

        sig = "ua{sv}a(ia{sv}av)"
        values = (
            7,
            {"k": Variant("s", "v"), "n": Variant("i", -3)},
            [(1, {"label": Variant("s", "héllo")},
              [Variant("(ia{sv}av)", (2, {}, []))])],
        )
        m = Marshaller()
        m.write(sig, values)
        out = Unmarshaller(m.getvalue()).read(sig)
        assert out[0] == 7
        assert out[1]["k"].value == "v" and out[1]["n"].value == -3
        item = out[2][0]
        assert item[0] == 1 and item[1]["label"].value == "héllo"
        assert item[2][0].value[0] == 2


class TestSniTray:
    def test_registers_and_serves_the_shell(self, bus, watcher):
        from spittle_tpu.shell.dbus_client import DBusConnection
        from spittle_tpu.shell.tray_sni import MENU_IFACE, SNI_IFACE, SniTray

        wconn, registered, ev = watcher
        clicks, activated = [], []
        tray = SniTray(
            [("settings", "Einstellungen"), ("quit", "Beenden")],
            on_activate=lambda: activated.append(1),
            on_menu=clicks.append,
            address=bus,
        )
        shell = DBusConnection(bus)
        try:
            # 1. The watcher heard the registration.
            assert ev.wait(5)
            assert registered == [tray.service_name]
            assert tray.registered

            # 2. The shell reads the item like a real host.
            props = shell.call(
                tray.service_name, "/StatusNotifierItem",
                "org.freedesktop.DBus.Properties", "GetAll",
                "s", (SNI_IFACE,),
            )[0]
            assert props["Id"].value == "spittle-tpu"
            assert props["IconName"].value == "audio-input-microphone"
            assert props["Menu"].value == "/MenuBar"

            # 3. Localized menu layout over dbusmenu.
            rev, layout = shell.call(
                tray.service_name, "/MenuBar", MENU_IFACE, "GetLayout",
                "iias", (0, -1, []),
            )
            children = layout[2]
            labels = [c.value[1]["label"].value for c in children]
            assert labels == ["Einstellungen", "Beenden"]

            # 4. Click events dispatch by item id.
            shell.call(
                tray.service_name, "/MenuBar", MENU_IFACE, "Event",
                "isvu", (2, "clicked", "", 0),
            )
            deadline = time.time() + 5
            while not clicks and time.time() < deadline:
                time.sleep(0.02)
            assert clicks == ["quit"]

            # 5. Activation (left click on the icon).
            shell.call(
                tray.service_name, "/StatusNotifierItem", SNI_IFACE,
                "Activate", "ii", (0, 0),
            )
            deadline = time.time() + 5
            while not activated and time.time() < deadline:
                time.sleep(0.02)
            assert activated

            # 6. State change swaps the live icon + emits NewIcon.
            saw_icon = threading.Event()
            shell.add_match(
                f"type='signal',interface='{SNI_IFACE}'"
            )
            shell.on_signal(
                lambda m: saw_icon.set() if m.member == "NewIcon" else None
            )
            tray.set_state(TrayIconState.RECORDING)
            assert saw_icon.wait(5)
            props = shell.call(
                tray.service_name, "/StatusNotifierItem",
                "org.freedesktop.DBus.Properties", "Get",
                "ss", (SNI_IFACE, "IconName"),
            )[0]
            assert props.value == "media-record"
        finally:
            shell.close()
            tray.close()

    def test_attach_tray_wires_app_graph(self, bus, watcher, tmp_path):
        from spittle_tpu.app.actions import ActionContext
        from spittle_tpu.app.services import AppServices
        from spittle_tpu.app.ui_state import AppUi
        from spittle_tpu.pipeline import BufferTextOutput
        from spittle_tpu.shell.tray_sni import attach_tray

        services = AppServices(str(tmp_path), use_mock_engine=True)
        try:
            ui = AppUi(services, player=lambda p, v: None)
            actions = ActionContext(services, BufferTextOutput(), ui=ui)
            tray = attach_tray(services, actions, ui, address=bus)
            assert tray is not None
            try:
                # TrayController.set_state drives the live icon.
                ui.tray.set_state(TrayIconState.TRANSCRIBING)
                deadline = time.time() + 5
                while (tray.state is not TrayIconState.TRANSCRIBING
                       and time.time() < deadline):
                    time.sleep(0.02)
                assert tray.state is TrayIconState.TRANSCRIBING
            finally:
                tray.close()
        finally:
            services.shutdown()


class FakeX:
    """Recording stand-in for the ctypes Xlib seam."""

    def __init__(self, fail_open=False):
        self.fail_open = fail_open
        self.calls = []
        self.mapped = False
        self.background = None

    def open(self):
        return not self.fail_open

    def screen_size(self):
        return (1920, 1080)

    def create_window(self, x, y, w, h, color):
        self.calls.append(("create", x, y, w, h))

    def set_background(self, color):
        self.background = color
        self.calls.append(("bg", color))

    def map(self):
        self.mapped = True
        self.calls.append(("map",))

    def unmap(self):
        self.mapped = False
        self.calls.append(("unmap",))

    def move(self, x, y):
        self.calls.append(("move", x, y))

    def fill_rect(self, color, x, y, w, h):
        self.calls.append(("rect", color, x, y, w, h))

    def flush(self):
        pass

    def close(self):
        self.calls.append(("close",))


class TestX11Overlay:
    def _mk(self, tmp_path, position="bottom"):
        from spittle_tpu.app.services import AppServices
        from spittle_tpu.config.settings import OverlayPosition
        from spittle_tpu.shell.x11_overlay import X11Overlay

        services = AppServices(str(tmp_path), use_mock_engine=True)
        services.update_settings(overlay_position=OverlayPosition(position))
        fake = FakeX()
        ov = X11Overlay(services.events, services.get_settings, backend=fake)
        return services, fake, ov

    def _wait(self, cond, timeout=5):
        deadline = time.time() + timeout
        while not cond() and time.time() < deadline:
            time.sleep(0.02)
        assert cond()

    def test_show_hide_and_position(self, tmp_path):
        from spittle_tpu.events import HIDE_OVERLAY, SHOW_OVERLAY
        from spittle_tpu.shell.x11_overlay import (
            OVERLAY_BOTTOM_OFFSET,
            OVERLAY_HEIGHT,
            OVERLAY_WIDTH,
        )

        services, fake, ov = self._mk(tmp_path, "bottom")
        try:
            services.events.emit(SHOW_OVERLAY, "recording")
            self._wait(lambda: fake.mapped)
            move = [c for c in fake.calls if c[0] == "move"][-1]
            assert move[1] == (1920 - OVERLAY_WIDTH) // 2
            assert move[2] == 1080 - OVERLAY_HEIGHT - OVERLAY_BOTTOM_OFFSET
            services.events.emit(HIDE_OVERLAY, None)
            self._wait(lambda: not fake.mapped)
        finally:
            ov.close()
            services.shutdown()

    def test_state_colors_and_bars(self, tmp_path):
        from spittle_tpu.events import MIC_LEVEL, SHOW_OVERLAY
        from spittle_tpu.shell.x11_overlay import BAR_COLOR, STATE_COLORS

        services, fake, ov = self._mk(tmp_path, "top")
        try:
            services.events.emit(SHOW_OVERLAY, "transcribing")
            self._wait(lambda: fake.background == STATE_COLORS["transcribing"])
            services.events.emit(MIC_LEVEL, [0.5] * 16)
            self._wait(lambda: any(
                c[0] == "rect" and c[1] == BAR_COLOR for c in fake.calls
            ))
        finally:
            ov.close()
            services.shutdown()

    def test_position_none_never_shows(self, tmp_path):
        from spittle_tpu.events import SHOW_OVERLAY

        services, fake, ov = self._mk(tmp_path, "none")
        try:
            services.events.emit(SHOW_OVERLAY, "recording")
            time.sleep(0.3)
            assert not fake.mapped
        finally:
            ov.close()
            services.shutdown()

    def test_no_display_inactive(self, tmp_path):
        from spittle_tpu.app.services import AppServices
        from spittle_tpu.shell.x11_overlay import X11Overlay

        services = AppServices(str(tmp_path), use_mock_engine=True)
        try:
            ov = X11Overlay(
                services.events, services.get_settings,
                backend=FakeX(fail_open=True),
            )
            assert not ov.active
        finally:
            services.shutdown()


def test_xbackend_declares_64bit_safe_prototypes():
    """Display*/GC are 64-bit pointers: without explicit restype ctypes
    truncates them to c_int and any real X session segfaults. Every
    libX11 function the backend calls must carry argtypes + restype."""
    import ctypes
    import ctypes.util

    if not ctypes.util.find_library("X11"):
        pytest.skip("libX11 not present")
    from spittle_tpu.shell.x11_overlay import XBackend

    b = XBackend()
    pointer_returning = ("XOpenDisplay", "XCreateGC")
    xid_returning = ("XRootWindow", "XCreateSimpleWindow")
    used = [
        "XOpenDisplay", "XDefaultScreen", "XDisplayWidth",
        "XDisplayHeight", "XRootWindow", "XCreateSimpleWindow",
        "XChangeWindowAttributes", "XCreateGC", "XSetWindowBackground",
        "XClearWindow", "XMapRaised", "XUnmapWindow", "XMoveWindow",
        "XSetForeground", "XFillRectangle", "XFlush", "XCloseDisplay",
    ]
    for name in used:
        fn = getattr(b.x, name)
        assert fn.argtypes is not None, f"{name} missing argtypes"
        assert fn.restype is not None, f"{name} missing restype"
    for name in pointer_returning:
        assert getattr(b.x, name).restype is ctypes.c_void_p, name
    for name in xid_returning:
        assert getattr(b.x, name).restype is ctypes.c_ulong, name
