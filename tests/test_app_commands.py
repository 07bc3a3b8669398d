"""Application layer: services wiring, shortcut handling, command surface."""

import threading
import time

import numpy as np
import pytest

from spittle_tpu.app.actions import ActionContext
from spittle_tpu.app.commands import Commands
from spittle_tpu.app.services import AppServices
from spittle_tpu.audio.recorder import QueueSource
from spittle_tpu.config.settings import KeyboardImplementation, LogLevel
from spittle_tpu.pipeline import BufferTextOutput


@pytest.fixture()
def app(tmp_path):
    src = QueueSource(16000)
    services = AppServices(
        str(tmp_path), source_factory=lambda: src, use_mock_engine=True
    )
    out = BufferTextOutput()
    actions = ActionContext(services, out)
    cmds = Commands(services, actions)
    yield services, actions, cmds, src, out
    services.shutdown()


class TestShortcutFlow:
    def test_push_to_talk_records_and_pastes(self, app):
        services, actions, cmds, src, out = app
        # Install a canned engine result by loading the mock engine.
        services.transcription.load_model("m", "/fake", "whisper")
        services.transcription._engine.canned_text = "dictated words"

        actions.handle_shortcut_event("transcribe", "ctrl+space", True)
        assert services.audio.is_recording()
        src.push(np.ones(32000, np.float32) * 0.1)
        time.sleep(0.3)
        actions.handle_shortcut_event("transcribe", "ctrl+space", False)
        deadline = time.time() + 5
        while not out.buffer and time.time() < deadline:
            time.sleep(0.02)
        assert out.buffer == "dictated words "

    def test_toggle_mode(self, app):
        services, actions, cmds, src, out = app
        services.update_settings(push_to_talk=False)
        services.transcription.load_model("m", "/fake", "whisper")
        actions.handle_shortcut_event("transcribe", "x", True)  # start
        assert services.audio.is_recording()
        actions.handle_shortcut_event("transcribe", "x", False)  # release: noop
        assert services.audio.is_recording()
        src.push(np.ones(16000, np.float32) * 0.1)
        time.sleep(0.3)
        actions.handle_shortcut_event("transcribe", "x", True)  # toggle off
        deadline = time.time() + 5
        while services.audio.is_recording() and time.time() < deadline:
            time.sleep(0.02)
        assert not services.audio.is_recording()

    def test_cancel_only_fires_when_recording(self, app):
        services, actions, cmds, src, out = app
        actions.handle_shortcut_event("cancel", "escape", True)  # no-op
        assert not services.audio.is_recording()
        actions.handle_shortcut_event("transcribe", "x", True)
        assert services.audio.is_recording()
        actions.handle_shortcut_event("cancel", "escape", True)
        assert not services.audio.is_recording()

    def test_unknown_binding_ignored(self, app):
        _, actions, *_ = app
        actions.handle_shortcut_event("nope", "x", True)  # must not raise


class TestCommands:
    def test_settings_mutations(self, app):
        services, actions, cmds, *_ = app
        cmds.change_ptt_setting(False)
        assert services.get_settings().push_to_talk is False
        cmds.change_selected_language_setting("de")
        assert services.get_settings().selected_language == "de"
        cmds.update_custom_words(["Kubernetes"])
        assert services.get_settings().custom_words == ["Kubernetes"]
        cmds.set_log_level(LogLevel.INFO)
        assert services.get_settings().log_level is LogLevel.INFO

    def test_binding_change_and_reset(self, app):
        services, actions, cmds, *_ = app
        cmds.change_binding("transcribe", "f13")
        assert services.get_settings().bindings["transcribe"].current_binding == "f13"
        cmds.reset_binding("transcribe")
        b = services.get_settings().bindings["transcribe"]
        assert b.current_binding == b.default_binding

    def test_settings_persisted_across_reload(self, app, tmp_path):
        services, actions, cmds, *_ = app
        cmds.change_word_correction_threshold_setting(0.42)
        reloaded = services.settings_store.load()
        assert reloaded.word_correction_threshold == 0.42

    def test_prompt_crud(self, app):
        services, actions, cmds, *_ = app
        n0 = len(services.get_settings().post_process_prompts)
        cmds.add_post_process_prompt("my_prompt", "Mine", "Do ${output}")
        assert len(services.get_settings().post_process_prompts) == n0 + 1
        cmds.update_post_process_prompt("my_prompt", "Mine2", "Do it: ${output}")
        p = next(p for p in services.get_settings().post_process_prompts
                 if p.id == "my_prompt")
        assert p.name == "Mine2"
        cmds.set_post_process_selected_prompt("my_prompt")
        cmds.delete_post_process_prompt("my_prompt")
        s = services.get_settings()
        assert all(p.id != "my_prompt" for p in s.post_process_prompts)
        assert s.post_process_selected_prompt_id is None

    def test_jargon_pack_import_export(self, app):
        services, actions, cmds, *_ = app
        payload = (
            '[{"id": "p1", "label": "Pack", "terms": ["X"], '
            '"corrections": [{"from": "ex", "to": "X"}]}]'
        )
        assert cmds.import_jargon_packs_json(payload) == 1
        assert cmds.import_jargon_packs_json(payload) == 0  # dedup by id
        out = cmds.export_jargon_packs_json()
        assert '"p1"' in out
        assert cmds.get_jargon_builtin_profiles()["web_dev"]["terms"]

    def test_model_surface(self, app):
        services, actions, cmds, *_ = app
        models = cmds.get_available_models()
        assert any(m.id == "small" for m in models)
        assert cmds.get_model_info("small").engine_type == "whisper"
        assert not cmds.has_any_models_available()
        assert cmds.get_transcription_model_status()["loaded"] is False

    def test_history_surface(self, app):
        services, actions, cmds, *_ = app
        services.history.save_transcription(
            np.zeros(1600, np.float32), "t", "text"
        )
        entries = cmds.get_history_entries()
        assert len(entries) == 1
        assert cmds.get_audio_file_path(entries[0].id)
        assert cmds.toggle_history_entry_saved(entries[0].id) is True
        cmds.delete_history_entry(entries[0].id)
        assert cmds.get_history_entries() == []

    def test_microphone_mode(self, app):
        services, actions, cmds, *_ = app
        cmds.update_microphone_mode(True)
        assert cmds.get_microphone_mode() is True
        cmds.update_microphone_mode(False)

    def test_misc_surface(self, app):
        services, actions, cmds, *_ = app
        assert cmds.get_keyboard_implementation() in KeyboardImplementation
        assert isinstance(cmds.is_recording(), bool)
        assert cmds.get_app_dir_path()
        assert cmds.check_apple_intelligence_available() is False
        cmds.initialize_enigo()
        cmds.initialize_shortcuts()
        cmds.cancel_operation()


class TestBindingSurfaceCompleteness:
    def test_all_reference_commands_present(self):
        """Every command exported in the reference's bindings.ts must have a
        snake_case counterpart on Commands."""
        import re

        with open("/root/reference/src/bindings.ts") as f:
            names = re.findall(r"async ([a-zA-Z]+)", f.read())
        skip = set()  # all commands must exist
        missing = []
        for name in names:
            snake = re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()
            if not hasattr(Commands, snake):
                missing.append(snake)
        assert not missing, missing


class TestSegmentStreaming:
    def test_segment_on_silence_streams_and_finalizes(self, tmp_path):
        import numpy as np
        from spittle_tpu.app.actions import ActionContext
        from spittle_tpu.app.services import AppServices
        from spittle_tpu.audio.recorder import QueueSource
        from spittle_tpu.pipeline import BufferTextOutput

        src = QueueSource(16000)
        services = AppServices(
            str(tmp_path), source_factory=lambda: src, use_mock_engine=True
        )
        services.update_settings(audio_segment_size_seconds=0.5)
        services.transcription.load_model("m", "/fake", "whisper")
        services.transcription._engine.canned_text = "seg"
        out = BufferTextOutput()
        actions = ActionContext(services, out)

        actions.handle_shortcut_event("transcribe", "x", True)
        # 2 s of audio -> at least two 0.5 s segments stream out live
        src.push(np.ones(32000, np.float32) * 0.1)
        deadline = time.time() + 5
        while out.buffer.count("seg") < 2 and time.time() < deadline:
            time.sleep(0.05)
        assert out.buffer.count("seg") >= 2  # live segment pastes
        actions.handle_shortcut_event("transcribe", "x", False)
        deadline = time.time() + 5
        while services.audio.is_recording() and time.time() < deadline:
            time.sleep(0.05)
        time.sleep(0.3)
        # final remainder also pasted; buffer ends with pastes only
        assert out.buffer.count("seg") >= 2
        services.shutdown()


class TestBindingsExport:
    def test_export_shapes(self):
        import json as _json
        from spittle_tpu.app.bindings_export import (
            describe_commands, export_dts, export_json,
        )

        cmds = describe_commands()
        names = {c["name"] for c in cmds}
        assert "download_model" in names and "get_app_settings" in names
        dm = next(c for c in cmds if c["name"] == "download_model")
        assert dm["camelName"] == "downloadModel"
        assert dm["params"][0]["name"] == "model_id"
        assert dm["params"][0]["type"] == "string"
        parsed = _json.loads(export_json())
        assert len(parsed) >= 100  # the full surface
        dts = export_dts()
        assert "export interface SpittleCommands" in dts
        assert "downloadModel(model_id: string)" in dts


def test_empty_recording_resets_tray_to_idle(tmp_path):
    """Regression (round-2 review): tapping the hotkey with no speech set
    the tray to TRANSCRIBING and the early return skipped the pipeline
    thread whose finally normally resets it — stuck icon forever."""
    from spittle_tpu.app.ui_state import AppUi, TrayIconState

    src = QueueSource(16000)
    services = AppServices(
        str(tmp_path), source_factory=lambda: src, use_mock_engine=True
    )
    try:
        services.transcription.load_model("m", "/fake", "whisper")
        ui = AppUi(services, player=lambda path, vol: None)
        actions = ActionContext(services, BufferTextOutput(), ui=ui)
        actions.handle_shortcut_event("transcribe", "ctrl+space", True)
        # release immediately: no audio pushed -> empty recording
        actions.handle_shortcut_event("transcribe", "ctrl+space", False)
        deadline = time.time() + 5
        while (
            ui.tray.state is not TrayIconState.IDLE
            and time.time() < deadline
        ):
            time.sleep(0.05)
        assert ui.tray.state is TrayIconState.IDLE
    finally:
        services.shutdown()


class TestHandyKeysRecordingCommands:
    """start/stop_handy_keys_recording really drive the registry's
    key-capture mode (spittle-keys.rs:524-549: error unless handy-keys
    is the active implementation)."""

    def _with_registry(self, app):
        from spittle_tpu.app.shortcuts import InMemoryBackend, ShortcutRegistry

        services, actions, cmds, src, out = app
        reg = ShortcutRegistry(
            {KeyboardImplementation.HANDY_KEYS: InMemoryBackend()},
            handler=lambda b, hk, p: None,
            events=services.events,
            implementation=KeyboardImplementation.HANDY_KEYS,
        )
        actions.registry = reg
        return services, cmds, reg

    def test_start_stop_toggle_capture(self, app):
        services, cmds, reg = self._with_registry(app)
        services.update_settings(
            keyboard_implementation=KeyboardImplementation.HANDY_KEYS)
        assert not reg._capture_active
        cmds.start_handy_keys_recording(binding_id="transcribe")
        assert reg._capture_active
        # captured keys now stream to the UI event bus
        got = []
        services.events.listen("handy-keys-event", got.append)
        reg.feed_captured_key("space", True, ["ctrl"])
        assert got and got[0].key == "space"
        cmds.stop_handy_keys_recording()
        assert not reg._capture_active

    def test_errors_when_not_handy_keys(self, app):
        services, cmds, reg = self._with_registry(app)
        services.update_settings(
            keyboard_implementation=KeyboardImplementation.TAURI)
        with pytest.raises(ValueError):
            cmds.start_handy_keys_recording(binding_id="transcribe")
        with pytest.raises(ValueError):
            cmds.stop_handy_keys_recording()


class TestKeyboardImplementationSwitch:
    """change_keyboard_implementation_setting returns the reference's
    ImplementationChangeResult {success, reset_bindings}
    (shortcut/mod.rs:243-314) and resets incompatible bindings to
    defaults in settings + emits the reference-shaped settings-changed
    event (:297-306)."""

    def _with_two_backends(self, app, reject=()):
        from spittle_tpu.app.shortcuts import InMemoryBackend, ShortcutRegistry

        services, actions, cmds, src, out = app

        class Rejecting(InMemoryBackend):
            def register(self, hotkey, callback):
                if hotkey in reject:
                    return False
                return InMemoryBackend.register(self, hotkey, callback)

        backends = {
            KeyboardImplementation.HANDY_KEYS: InMemoryBackend(),
            KeyboardImplementation.TAURI: Rejecting(),
        }
        reg = ShortcutRegistry(
            backends,
            handler=lambda b, hk, p: None,
            events=services.events,
            implementation=KeyboardImplementation.HANDY_KEYS,
        )
        actions.registry = reg
        return services, cmds, reg, backends

    def test_switch_returns_result_and_resets_settings(self, app):
        services, cmds, reg, backends = self._with_two_backends(
            app, reject={"f13"})
        services.update_settings(
            keyboard_implementation=KeyboardImplementation.HANDY_KEYS)
        # custom hotkey the tauri backend can't express
        s = services.get_settings()
        s.bindings["transcribe"].current_binding = "f13"
        services.write_settings(s)
        reg.register_binding("transcribe", "f13")

        got = []
        services.events.listen("settings-changed", got.append)
        result = cmds.change_keyboard_implementation_setting("tauri")
        assert result == {"success": True, "reset_bindings": ["transcribe"],
                          "dropped_bindings": []}
        s2 = services.get_settings()
        assert s2.keyboard_implementation == KeyboardImplementation.TAURI
        b = s2.bindings["transcribe"]
        assert b.current_binding == b.default_binding
        assert b.default_binding in backends[KeyboardImplementation.TAURI].registered
        assert {
            "setting": "keyboard_implementation",
            "value": "tauri",
            "reset_bindings": ["transcribe"],
            "dropped_bindings": [],
        } in got

    def test_switch_same_impl_is_noop(self, app):
        services, cmds, reg, backends = self._with_two_backends(app)
        services.update_settings(
            keyboard_implementation=KeyboardImplementation.HANDY_KEYS)
        result = cmds.change_keyboard_implementation_setting("handy_keys")
        assert result == {"success": True, "reset_bindings": []}

    def test_switch_dropped_binding_keeps_stored_hotkey(self, app):
        """When the new backend also rejects the default, the binding is
        dropped from the registry and settings keep the stored hotkey —
        settings must not claim a default_binding registration that has
        no OS hook; the dropped id is surfaced instead."""
        services, cmds, reg, backends = self._with_two_backends(
            app, reject={"f13", "ctrl+space"})  # ctrl+space = default
        services.update_settings(
            keyboard_implementation=KeyboardImplementation.HANDY_KEYS)
        s = services.get_settings()
        s.bindings["transcribe"].current_binding = "f13"
        services.write_settings(s)
        reg.register_binding("transcribe", "f13")

        result = cmds.change_keyboard_implementation_setting("tauri")
        assert result["success"] is True
        assert result["reset_bindings"] == []
        assert result["dropped_bindings"] == ["transcribe"]
        s2 = services.get_settings()
        # stored binding untouched (still f13) — NOT rewritten to default
        assert s2.bindings["transcribe"].current_binding == "f13"
        assert backends[KeyboardImplementation.TAURI].registered == {}

    def test_switch_invalid_impl_fails_without_unregistering(self, app):
        """A bad implementation string fails structurally (reference
        returns Result) and must not tear down the existing hotkeys."""
        services, cmds, reg, backends = self._with_two_backends(app)
        services.update_settings(
            keyboard_implementation=KeyboardImplementation.HANDY_KEYS)
        reg.register_binding("transcribe", "ctrl+space")
        result = cmds.change_keyboard_implementation_setting("bogus")
        assert result == {"success": False, "reset_bindings": []}
        assert "ctrl+space" in backends[KeyboardImplementation.HANDY_KEYS].registered
        s2 = services.get_settings()
        assert s2.keyboard_implementation == KeyboardImplementation.HANDY_KEYS


class TestOverlayLifecycle:
    """Overlay follows the reference lifecycle (overlay.rs:291-323,
    actions.rs:39,131, pipeline.rs:259,501): recording on start,
    transcribing on stop (NOT hidden), hidden only when the pipeline
    finishes; payloads are bare state strings."""

    def test_overlay_states_through_ptt_cycle(self, app):
        import numpy as np
        from spittle_tpu.events import HIDE_OVERLAY, SHOW_OVERLAY

        services, actions, cmds, src, out = app
        services.transcription.load_model("m", "/fake", "whisper")
        services.transcription._engine.canned_text = "words"
        seen = []
        services.events.listen(SHOW_OVERLAY, lambda p: seen.append(("show", p)))
        services.events.listen(HIDE_OVERLAY, lambda p: seen.append(("hide", p)))

        actions.handle_shortcut_event("transcribe", "ctrl+space", True)
        src.push(np.ones(32000, np.float32) * 0.1)
        time.sleep(0.3)
        assert ("show", "recording") in seen
        assert not any(k == "hide" for k, _ in seen)

        actions.handle_shortcut_event("transcribe", "ctrl+space", False)
        deadline = time.time() + 5
        while out.buffer == "" and time.time() < deadline:
            time.sleep(0.02)
        time.sleep(0.2)  # let the pipeline thread finish its hooks
        assert out.buffer
        kinds = [(k, p) for k, p in seen]
        assert ("show", "transcribing") in kinds
        assert kinds[-1] == ("hide", None)
        # transcribing shown before the hide
        assert kinds.index(("show", "transcribing")) < kinds.index(("hide", None))
