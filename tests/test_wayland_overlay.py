"""Wayland layer-shell overlay vs a fake compositor speaking the real wire.

The fake in this file is an independent implementation of the Wayland
wire format (its own struct parsing, not the client's WaylandWire), so
these tests validate the client's actual marshalling — object ids,
opcodes, sizes, string padding, SCM_RIGHTS fd passing — the same
pattern as the D-Bus loopback tests. Matches the reference's primary
Linux overlay path (overlay.rs:70-95 gtk-layer-shell + KDE bailout).
"""

import array
import mmap
import os
import socket
import struct
import threading

import pytest

from spittle_tpu.config.settings import AppSettings
from spittle_tpu.events import (
    EventBus,
    HIDE_OVERLAY,
    MIC_LEVEL,
    SHOW_OVERLAY,
)
from spittle_tpu.shell.wayland_overlay import (
    WaylandBackend,
    marshal_string,
    session_is_kde_wayland,
)


def _pad(n):
    return (n + 3) & ~3


class FakeCompositor:
    """Single-client fake compositor: advertises wl_compositor, wl_shm and
    zwlr_layer_shell_v1, acks syncs, sends layer-surface configure on the
    first commit, and records every request with decoded args."""

    def __init__(self, path):
        self.path = path
        self.server = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self.server.bind(path)
        self.server.listen(1)
        self.requests = []  # (interface, request_name, args)
        self.ifaces = {1: "wl_display"}
        self.shm_fd = None
        self.buffer_meta = None
        self._configured_sent = False
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    # -- independent wire parsing -------------------------------------------

    def _serve(self):
        conn, _ = self.server.accept()
        self.conn = conn
        buf = b""
        fds = []
        while True:
            try:
                msg, anc, _, _ = conn.recvmsg(65536, 4096)
            except OSError:
                return
            if not msg:
                return
            for level, typ, data in anc:
                if level == socket.SOL_SOCKET and typ == socket.SCM_RIGHTS:
                    a = array.array("i")
                    a.frombytes(data[: len(data) - len(data) % 4])
                    fds.extend(a.tolist())
            buf += msg
            while len(buf) >= 8:
                obj, sizeop = struct.unpack_from("<II", buf)
                size, opcode = sizeop >> 16, sizeop & 0xFFFF
                if len(buf) < size:
                    break
                body = buf[8:size]
                buf = buf[size:]
                self._dispatch(obj, opcode, body, fds)

    def _u32s(self, body):
        return struct.unpack(f"<{len(body)//4}I", body)

    def _string(self, body, off):
        slen = struct.unpack_from("<I", body, off)[0]
        s = body[off + 4 : off + 4 + slen - 1].decode()
        return s, off + 4 + _pad(slen)

    def _send(self, obj, opcode, body=b""):
        size = 8 + len(body)
        self.conn.sendall(struct.pack("<II", obj, (size << 16) | opcode) + body)

    def _dispatch(self, obj, opcode, body, fds):
        iface = self.ifaces.get(obj, "?")
        if iface == "wl_display" and opcode == 0:  # sync(callback)
            cb = self._u32s(body)[0]
            self._send(cb, 0, struct.pack("<I", 1))  # callback.done
            self.requests.append(("wl_display", "sync", (cb,)))
        elif iface == "wl_display" and opcode == 1:  # get_registry
            reg = self._u32s(body)[0]
            self.ifaces[reg] = "wl_registry"
            for name, g, ver in ((1, "wl_compositor", 4), (2, "wl_shm", 1),
                                 (3, "zwlr_layer_shell_v1", 1)):
                self._send(reg, 0, struct.pack("<I", name)
                           + marshal_string(g) + struct.pack("<I", ver))
            self.requests.append(("wl_display", "get_registry", (reg,)))
        elif iface == "wl_registry" and opcode == 0:  # bind
            name = struct.unpack_from("<I", body)[0]
            g, off = self._string(body, 4)
            ver, new_id = struct.unpack_from("<II", body, off)
            self.ifaces[new_id] = g
            self.requests.append(("wl_registry", "bind", (name, g, ver)))
        elif iface == "wl_compositor" and opcode == 0:  # create_surface
            sid = self._u32s(body)[0]
            self.ifaces[sid] = "wl_surface"
            self.requests.append(("wl_compositor", "create_surface", (sid,)))
        elif iface == "zwlr_layer_shell_v1" and opcode == 0:
            ls, surface, output, layer = struct.unpack_from("<IIII", body)
            ns, _ = self._string(body, 16)
            self.ifaces[ls] = "zwlr_layer_surface_v1"
            self.layer_surface = ls
            self.requests.append(
                ("layer_shell", "get_layer_surface",
                 (surface, output, layer, ns)))
        elif iface == "zwlr_layer_surface_v1":
            names = {0: "set_size", 1: "set_anchor", 2: "set_exclusive",
                     3: "set_margin", 4: "set_keyboard", 6: "ack_configure"}
            if opcode == 3:
                args = struct.unpack(f"<{len(body)//4}i", body)
            else:
                args = self._u32s(body)
            self.requests.append(("layer_surface", names[opcode], args))
        elif iface == "wl_shm" and opcode == 0:  # create_pool(id, fd, size)
            pid, size = struct.unpack_from("<Ii", body)
            self.ifaces[pid] = "wl_shm_pool"
            self.shm_fd = fds.pop(0)
            self.requests.append(("wl_shm", "create_pool", (pid, size)))
        elif iface == "wl_shm_pool" and opcode == 0:  # create_buffer
            bid, off, w, h, stride, fmt = struct.unpack_from("<IiiiiI", body)
            self.ifaces[bid] = "wl_buffer"
            self.buffer_meta = (w, h, stride, fmt)
            self.requests.append(
                ("wl_shm_pool", "create_buffer", (bid, off, w, h, stride, fmt)))
        elif iface == "wl_surface":
            names = {1: "attach", 2: "damage", 6: "commit"}
            name = names.get(opcode, str(opcode))
            args = (struct.unpack(f"<I{len(body)//4 - 1}i", body)
                    if body else ())
            self.requests.append(("wl_surface", name, args))
            if name == "commit" and not self._configured_sent:
                # first commit (no buffer yet): send configure
                self._send(self.layer_surface, 0,
                           struct.pack("<III", 7, 172, 36))
                self._configured_sent = True
        else:
            self.requests.append((iface, f"op{opcode}", ()))

    def names(self):
        return [(i, n) for i, n, _ in self.requests]

    def close(self):
        self.server.close()


@pytest.fixture
def compositor(tmp_path):
    path = str(tmp_path / "wayland-test")
    fake = FakeCompositor(path)
    yield fake, path
    fake.close()


def test_backend_full_lifecycle_over_the_wire(compositor):
    fake, path = compositor
    b = WaylandBackend(display=path)
    assert b.open()
    b.create_window(874, 4, 172, 36, 0xE05F5F)
    b.map()
    b.fill_rect(0xFFFFFF, 10, 10, 4, 20)
    b.flush()
    b.unmap()
    b.close()
    fake.thread.join(timeout=5)

    names = fake.names()
    # globals bound
    bound = [a[1] for i, n, a in fake.requests if n == "bind"]
    assert set(bound) == {"wl_compositor", "wl_shm", "zwlr_layer_shell_v1"}
    # layer surface on the OVERLAY layer with our namespace
    ls = next(a for i, n, a in fake.requests
              if n == "get_layer_surface")
    assert ls[2] == 3 and ls[3] == "spittle-overlay"
    # configure was acked
    assert ("layer_surface", "ack_configure") in names
    ack = next(a for i, n, a in fake.requests if n == "ack_configure")
    assert ack[0] == 7  # the serial the fake sent
    # anchored top (ypos 4 < half screen) with a 4px top margin
    anchor = next(a for i, n, a in fake.requests if n == "set_anchor")
    assert anchor[0] == 1
    margin = next(a for i, n, a in fake.requests if n == "set_margin")
    assert margin == (4, 0, 0, 0)
    # buffer: 172x36 xrgb8888, stride 688
    assert fake.buffer_meta == (172, 36, 172 * 4, 1)
    # map attached the buffer then committed; unmap attached null
    attaches = [a for i, n, a in fake.requests if n == "attach"]
    assert attaches[0][0] != 0 and attaches[-1][0] == 0
    assert ("wl_surface", "commit") in names
    # the shm pixels carry the pill color (fd passed via SCM_RIGHTS)
    mm = mmap.mmap(fake.shm_fd, 172 * 36 * 4)
    pixel = struct.unpack_from("<I", mm, (5 * 172 + 5) * 4)[0]
    assert pixel & 0xFFFFFF == 0xE05F5F
    bar = struct.unpack_from("<I", mm, (12 * 172 + 11) * 4)[0]
    assert bar & 0xFFFFFF == 0xFFFFFF
    mm.close()
    os.close(fake.shm_fd)


def test_overlay_controller_drives_wayland_backend(compositor):
    """The shared overlay controller (x11_overlay.X11Overlay) runs the
    Wayland backend end-to-end from bus events."""
    import time

    from spittle_tpu.shell.x11_overlay import X11Overlay

    from spittle_tpu.config.settings import OverlayPosition

    fake, path = compositor
    events = EventBus()
    settings = AppSettings()
    settings.overlay_position = OverlayPosition.BOTTOM  # Linux default NONE
    overlay = X11Overlay(events, lambda: settings,
                         backend=WaylandBackend(display=path))
    assert overlay.active
    events.emit(SHOW_OVERLAY, "recording")
    events.emit(MIC_LEVEL, [0.5] * 16)
    events.emit(HIDE_OVERLAY, None)
    deadline = time.time() + 5
    while time.time() < deadline:
        if [1 for i, n, a in fake.requests
                if n == "attach" and a[0] == 0]:
            break
        time.sleep(0.05)
    overlay.close()
    names = fake.names()
    assert ("layer_surface", "ack_configure") in names
    attaches = [a for i, n, a in fake.requests if n == "attach"]
    assert attaches and attaches[-1][0] == 0  # hidden at the end
    assert ("wl_surface", "damage") in names


def test_kde_bailout(monkeypatch):
    monkeypatch.setenv("XDG_SESSION_TYPE", "wayland")
    monkeypatch.setenv("XDG_CURRENT_DESKTOP", "KDE")
    assert session_is_kde_wayland()
    monkeypatch.setenv("XDG_CURRENT_DESKTOP", "GNOME")
    assert not session_is_kde_wayland()
    monkeypatch.setenv("XDG_SESSION_TYPE", "x11")
    monkeypatch.setenv("XDG_CURRENT_DESKTOP", "KDE")
    assert not session_is_kde_wayland()


def test_attach_selects_by_session(monkeypatch, compositor):
    """overlay_select routes wayland sessions to the layer-shell backend
    and KDE sessions away from it."""
    from spittle_tpu.shell import overlay_select, wayland_overlay

    fake, path = compositor
    monkeypatch.setenv("XDG_SESSION_TYPE", "wayland")
    monkeypatch.setenv("WAYLAND_DISPLAY", path)
    monkeypatch.setenv("XDG_CURRENT_DESKTOP", "GNOME")
    monkeypatch.delenv("DISPLAY", raising=False)

    class Services:
        events = EventBus()

        @staticmethod
        def get_settings():
            return AppSettings()

    overlay = overlay_select.attach_session_overlay(Services)
    assert overlay is not None and overlay.active
    overlay.close()

    # KDE: no layer-shell, and with no DISPLAY no overlay at all
    monkeypatch.setenv("XDG_CURRENT_DESKTOP", "KDE")
    assert wayland_overlay.attach_wayland_overlay(Services) is None
