"""Linux evdev hotkey capture: the listener side of the hotkey loop.

The container has no /dev/input, so these tests feed the exact kernel
`input_event` wire format through pipes into the real reader thread —
chord tracking, hotkey matching, broken-chord release, capture mode,
and the ShortcutRegistry integration all run on the production code
path. A real-device smoke test is gated on /dev/input existing.

Reference: src-tauri/src/shortcut/spittle-keys.rs:45-57,90,263-380.
"""

import os
import time

import pytest

from spittle_tpu.app.shortcuts import ShortcutRegistry
from spittle_tpu.config.settings import KeyboardImplementation
from spittle_tpu.events import EventBus, HANDY_KEYS_EVENT
from spittle_tpu.shell.evdev_keys import (
    EVENT_SIZE,
    EvdevBackend,
    normalize_hotkey,
    pack_event,
    pack_key,
)


def wait_for(cond, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.01)
    return False


class TestNormalize:
    def test_basic(self):
        assert normalize_hotkey("ctrl+shift+space") == (
            frozenset({"ctrl", "shift"}), "space",
        )
        assert normalize_hotkey("space") == (frozenset(), "space")

    def test_aliases(self):
        assert normalize_hotkey("control+option+a") == (
            frozenset({"ctrl", "alt"}), "a",
        )
        assert normalize_hotkey("cmd+b") == (frozenset({"super"}), "b")

    def test_invalid(self):
        assert normalize_hotkey("") is None


@pytest.fixture
def backend():
    r, w = os.pipe()
    be = EvdevBackend(fds=[r])
    yield be, w
    os.close(w)
    be.close()


class TestChordMatching:
    def test_press_and_release(self, backend):
        be, w = backend
        events = []
        assert be.register("ctrl+space", lambda hk, p: events.append((hk, p)))
        os.write(w, pack_key("ctrl", True))
        os.write(w, pack_key("space", True))
        assert wait_for(lambda: events == [("ctrl+space", True)])
        os.write(w, pack_key("space", False))
        assert wait_for(lambda: events[-1] == ("ctrl+space", False))

    def test_broken_chord_ends_ptt(self, backend):
        be, w = backend
        events = []
        be.register("ctrl+space", lambda hk, p: events.append(p))
        os.write(w, pack_key("ctrl", True) + pack_key("space", True))
        assert wait_for(lambda: events == [True])
        # Modifier released while the key is still held: PTT must end.
        os.write(w, pack_key("ctrl", False))
        assert wait_for(lambda: events == [True, False])
        # The later key release must not fire a second release.
        os.write(w, pack_key("space", False))
        time.sleep(0.2)
        assert events == [True, False]

    def test_missing_modifier_does_not_fire(self, backend):
        be, w = backend
        events = []
        be.register("ctrl+space", lambda hk, p: events.append(p))
        os.write(w, pack_key("space", True) + pack_key("space", False))
        time.sleep(0.3)
        assert events == []

    def test_most_specific_chord_wins(self, backend):
        # Subset matching with most-specific-wins: ctrl+shift+space
        # fires only the post-process-style binding, never both.
        be, w = backend
        events = []
        be.register("ctrl+space", lambda hk, p: events.append(("plain", p)))
        be.register(
            "ctrl+shift+space", lambda hk, p: events.append(("pp", p))
        )
        os.write(
            w,
            pack_key("ctrl", True) + pack_key("shift", True)
            + pack_key("space", True),
        )
        assert wait_for(lambda: ("pp", True) in events)
        os.write(
            w,
            pack_key("space", False) + pack_key("shift", False)
            + pack_key("ctrl", False),
        )
        assert wait_for(lambda: ("pp", False) in events)
        assert all(tag != "plain" for tag, _ in events)

    def test_cancel_fires_while_ptt_chord_held(self, backend):
        # The reference's escape cancel works mid-recording even though
        # the user still holds the push-to-talk chord.
        be, w = backend
        events = []
        be.register("ctrl+space", lambda hk, p: events.append(("ptt", p)))
        be.register("escape", lambda hk, p: events.append(("cancel", p)))
        os.write(w, pack_key("ctrl", True) + pack_key("space", True))
        assert wait_for(lambda: ("ptt", True) in events)
        os.write(w, pack_key("escape", True))
        assert wait_for(lambda: ("cancel", True) in events)

    def test_autorepeat_ignored(self, backend):
        be, w = backend
        events = []
        be.register("a", lambda hk, p: events.append(p))
        from spittle_tpu.shell.evdev_keys import KEY_TO_CODE

        os.write(w, pack_key("a", True))
        os.write(w, pack_event(KEY_TO_CODE["a"], 2))  # autorepeat
        os.write(w, pack_key("a", False))
        assert wait_for(lambda: events == [True, False])

    def test_partial_reads_reassemble(self, backend):
        be, w = backend
        events = []
        be.register("b", lambda hk, p: events.append(p))
        data = pack_key("b", True)
        os.write(w, data[: EVENT_SIZE // 2])
        time.sleep(0.05)
        os.write(w, data[EVENT_SIZE // 2 :])
        assert wait_for(lambda: events == [True])

    def test_unregister(self, backend):
        be, w = backend
        events = []
        be.register("c", lambda hk, p: events.append(p))
        assert be.unregister("c")
        os.write(w, pack_key("c", True))
        time.sleep(0.2)
        assert events == []

    def test_capture_streams_raw_keys(self, backend):
        be, w = backend
        seen = []
        be.start_capture(lambda key, pressed, mods: seen.append((key, pressed, mods)))
        os.write(w, pack_key("ctrl", True) + pack_key("x", True))
        assert wait_for(lambda: len(seen) == 2)
        assert seen[0] == ("ctrl", True, ["ctrl"])
        assert seen[1] == ("x", True, ["ctrl"])
        be.stop_capture()
        os.write(w, pack_key("x", False))
        time.sleep(0.2)
        assert len(seen) == 2


class TestRegistryIntegration:
    def test_hotkey_drives_registry_handler(self):
        r, w = os.pipe()
        be = EvdevBackend(fds=[r])
        try:
            fired = []
            reg = ShortcutRegistry(
                backends={KeyboardImplementation.HANDY_KEYS: be},
                handler=lambda b, hk, p: fired.append((b, p)),
                implementation=KeyboardImplementation.HANDY_KEYS,
            )
            assert reg.register_binding("transcribe", "ctrl+space")
            os.write(w, pack_key("ctrl", True) + pack_key("space", True))
            assert wait_for(lambda: fired == [("transcribe", True)])
            os.write(w, pack_key("space", False))
            assert wait_for(lambda: fired[-1] == ("transcribe", False))
        finally:
            os.close(w)
            be.close()

    def test_capture_mode_emits_frontend_events(self):
        r, w = os.pipe()
        be = EvdevBackend(fds=[r])
        try:
            bus = EventBus()
            stream = []
            bus.listen(HANDY_KEYS_EVENT, stream.append)
            reg = ShortcutRegistry(
                backends={KeyboardImplementation.HANDY_KEYS: be},
                handler=lambda b, hk, p: None,
                events=bus,
                implementation=KeyboardImplementation.HANDY_KEYS,
            )
            reg.start_key_capture()
            be.start_capture(reg.feed_captured_key)
            os.write(w, pack_key("shift", True) + pack_key("q", True))
            assert wait_for(lambda: len(stream) == 2)
            assert stream[1].key == "q"
            assert stream[1].is_key_down
            assert stream[1].modifiers == ["shift"]
            # reference FrontendKeyEvent carries the assembled hotkey
            # string the UI displays (spittle-keys.rs:84-85)
            assert stream[1].hotkey_string == "shift+q"
        finally:
            os.close(w)
            be.close()

    def test_no_devices_falls_back(self):
        be = EvdevBackend(fds=[])
        try:
            assert not be.register("ctrl+space", lambda hk, p: None)
        finally:
            be.close()


@pytest.mark.skipif(
    not os.path.exists("/dev/input"), reason="no /dev/input on this host"
)
class TestRealDevices:
    def test_discovery_runs(self):
        from spittle_tpu.shell.evdev_keys import discover_keyboards

        fds = discover_keyboards()
        for fd in fds:
            os.close(fd)
