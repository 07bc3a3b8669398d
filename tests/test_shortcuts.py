"""Shortcut registry: validation, fallback, capture mode."""

import pytest

from spittle_tpu.app.shortcuts import (
    FrontendKeyEvent,
    InMemoryBackend,
    ShortcutRegistry,
    validate_hotkey,
)
from spittle_tpu.config.settings import KeyboardImplementation
from spittle_tpu.events import EventBus, HANDY_KEYS_EVENT


def test_validate_hotkey():
    assert validate_hotkey("ctrl+space")
    assert validate_hotkey("option+shift+space")
    assert validate_hotkey("escape")
    assert validate_hotkey("f13")
    assert not validate_hotkey("")
    assert not validate_hotkey("bogus+x")
    assert not validate_hotkey("ctrl+")


def make_registry(fail_handy=False):
    events = []
    backends = {
        KeyboardImplementation.HANDY_KEYS: InMemoryBackend(fail_register=fail_handy),
        KeyboardImplementation.TAURI: InMemoryBackend(),
    }
    persisted = []
    reg = ShortcutRegistry(
        backends,
        handler=lambda b, hk, p: events.append((b, hk, p)),
        implementation=KeyboardImplementation.HANDY_KEYS,
        persist_implementation=persisted.append,
    )
    return reg, backends, events, persisted


def test_register_and_fire():
    reg, backends, events, _ = make_registry()
    assert reg.register_binding("transcribe", "ctrl+space")
    backends[KeyboardImplementation.HANDY_KEYS].fire("ctrl+space", True)
    backends[KeyboardImplementation.HANDY_KEYS].fire("ctrl+space", False)
    assert events == [("transcribe", "ctrl+space", True),
                      ("transcribe", "ctrl+space", False)]


def test_rebind_unregisters_old():
    reg, backends, events, _ = make_registry()
    reg.register_binding("transcribe", "ctrl+space")
    reg.register_binding("transcribe", "f13")
    hk = backends[KeyboardImplementation.HANDY_KEYS]
    assert "ctrl+space" not in hk.registered
    assert "f13" in hk.registered


def test_fallback_to_tauri_persisted():
    reg, backends, events, persisted = make_registry(fail_handy=True)
    assert reg.register_binding("transcribe", "ctrl+space")
    assert reg.implementation is KeyboardImplementation.TAURI
    assert persisted == [KeyboardImplementation.TAURI]
    backends[KeyboardImplementation.TAURI].fire("ctrl+space", True)
    assert events


def test_invalid_hotkey_raises():
    reg, *_ = make_registry()
    with pytest.raises(ValueError):
        reg.register_binding("transcribe", "not a hotkey!")


def test_cancel_register_unregister():
    reg, backends, *_ = make_registry()
    assert reg.register_cancel()
    assert "escape" in backends[KeyboardImplementation.HANDY_KEYS].registered
    assert reg.unregister_cancel()
    assert "escape" not in backends[KeyboardImplementation.HANDY_KEYS].registered
    assert not reg.unregister_cancel()  # idempotent


def test_key_capture_streams_events_and_swallows_actions():
    reg, backends, events, _ = make_registry()
    bus_events = []
    reg.events.listen(HANDY_KEYS_EVENT, bus_events.append)
    reg.register_binding("transcribe", "ctrl+space")
    reg.start_key_capture()
    backends[KeyboardImplementation.HANDY_KEYS].fire("ctrl+space", True)
    assert events == []  # action routing suppressed during capture
    reg.feed_captured_key("space", True, ["ctrl"])
    assert bus_events and bus_events[0].key == "space"
    assert bus_events[0].is_key_down
    assert bus_events[0].hotkey_string == "ctrl+space"
    reg.stop_key_capture()
    backends[KeyboardImplementation.HANDY_KEYS].fire("ctrl+space", True)
    assert events  # routing restored


def test_suspend_resume_binding():
    """Suspend unregisters the OS hotkey but remembers it; resume
    re-registers (shortcut/mod.rs:214-238)."""
    from spittle_tpu.config.settings import KeyboardImplementation

    fired = []
    backend = InMemoryBackend()
    reg = ShortcutRegistry(
        backends={KeyboardImplementation.TAURI: backend},
        handler=lambda b, h, p: fired.append((b, h, p)),
    )
    assert reg.register_binding("transcribe", "ctrl+space")
    assert reg.suspend_binding("transcribe") is True
    assert reg.is_suspended("transcribe")
    assert "ctrl+space" not in backend.registered  # OS hook removed
    backend.fire("ctrl+space", True)
    assert fired == []
    # double-suspend is a no-op
    assert reg.suspend_binding("transcribe") is False
    assert reg.resume_binding("transcribe") is True
    assert not reg.is_suspended("transcribe")
    backend.fire("ctrl+space", True)
    assert fired == [("transcribe", "ctrl+space", True)]
    # resume without suspend is a no-op
    assert reg.resume_binding("transcribe") is False


def test_register_clears_suspension():
    from spittle_tpu.config.settings import KeyboardImplementation

    backend = InMemoryBackend()
    reg = ShortcutRegistry(
        backends={KeyboardImplementation.TAURI: backend},
        handler=lambda *a: None,
    )
    reg.register_binding("transcribe", "ctrl+space")
    reg.suspend_binding("transcribe")
    reg.register_binding("transcribe", "alt+space")  # user picked a new key
    assert not reg.is_suspended("transcribe")
    assert "alt+space" in backend.registered


class RejectingBackend(InMemoryBackend):
    """Backend that rejects specific hotkeys (an implementation that
    can't express them), accepting everything else."""

    def __init__(self, reject):
        super().__init__()
        self.reject = set(reject)

    def register(self, hotkey, callback):
        if hotkey in self.reject:
            return False
        return super().register(hotkey, callback)


def test_switch_implementation_moves_and_resets():
    """shortcut/mod.rs:255-314: switching implementations unregisters
    from the old backend, registers with the new one, and resets
    bindings the new backend rejects to their defaults."""
    events = []
    backends = {
        KeyboardImplementation.HANDY_KEYS: InMemoryBackend(),
        KeyboardImplementation.TAURI: RejectingBackend({"f13"}),
    }
    reg = ShortcutRegistry(
        backends,
        handler=lambda b, hk, p: events.append((b, hk, p)),
        implementation=KeyboardImplementation.HANDY_KEYS,
    )
    reg.register_binding("transcribe", "ctrl+space")
    reg.register_binding("post", "f13")
    result = reg.switch_implementation(
        KeyboardImplementation.TAURI,
        defaults={"transcribe": "ctrl+space", "post": "ctrl+shift+space"},
    )
    assert result.reset == ["post"]
    assert result.dropped == []
    hk = backends[KeyboardImplementation.HANDY_KEYS]
    tauri = backends[KeyboardImplementation.TAURI]
    assert hk.registered == {}
    assert "ctrl+space" in tauri.registered
    assert "ctrl+shift+space" in tauri.registered  # reset to default
    assert "f13" not in tauri.registered
    # events now fire through the new backend under the default hotkey
    tauri.fire("ctrl+shift+space", True)
    assert events == [("post", "ctrl+shift+space", True)]


def test_switch_implementation_same_impl_noop():
    reg, backends, _, _ = make_registry()
    reg.register_binding("transcribe", "ctrl+space")
    result = reg.switch_implementation(KeyboardImplementation.HANDY_KEYS)
    assert result.reset == [] and result.dropped == []
    assert "ctrl+space" in backends[KeyboardImplementation.HANDY_KEYS].registered


def test_switch_implementation_reports_dropped():
    """A binding whose hotkey AND default are both rejected by the new
    backend is removed from the registry and reported as dropped (not
    reset) so callers don't persist a registration that doesn't exist."""
    backends = {
        KeyboardImplementation.HANDY_KEYS: InMemoryBackend(),
        KeyboardImplementation.TAURI: RejectingBackend({"f13", "f14"}),
    }
    reg = ShortcutRegistry(
        backends,
        handler=lambda b, hk, p: None,
        implementation=KeyboardImplementation.HANDY_KEYS,
    )
    reg.register_binding("transcribe", "f13")
    result = reg.switch_implementation(
        KeyboardImplementation.TAURI, defaults={"transcribe": "f14"})
    assert result.reset == []
    assert result.dropped == ["transcribe"]
    assert "transcribe" not in reg._bindings
    assert backends[KeyboardImplementation.TAURI].registered == {}


def test_switch_implementation_skips_suspended_bindings():
    """A binding suspended for UI key-capture must NOT be re-activated by
    an implementation switch — it stays suspended, and resume registers
    it on the NEW backend."""
    backends = {
        KeyboardImplementation.HANDY_KEYS: InMemoryBackend(),
        KeyboardImplementation.TAURI: InMemoryBackend(),
    }
    reg = ShortcutRegistry(
        backends,
        handler=lambda b, hk, p: None,
        implementation=KeyboardImplementation.HANDY_KEYS,
    )
    reg.register_binding("transcribe", "ctrl+space")
    reg.register_binding("post", "ctrl+shift+space")
    assert reg.suspend_binding("transcribe")
    result = reg.switch_implementation(KeyboardImplementation.TAURI)
    tauri = backends[KeyboardImplementation.TAURI]
    # the suspended hotkey did not silently come back on the new backend
    assert "ctrl+space" not in tauri.registered
    assert "ctrl+shift+space" in tauri.registered
    assert reg.is_suspended("transcribe")
    assert result.reset == [] and result.dropped == []
    # resume lands on the new backend
    assert reg.resume_binding("transcribe")
    assert "ctrl+space" in tauri.registered
