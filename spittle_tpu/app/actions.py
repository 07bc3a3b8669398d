"""Shortcut actions + shared event handler.

Behavior-parity rebuild of `/root/reference/src-tauri/src/actions.rs`
(ShortcutAction trait + ACTION_MAP) and `shortcut/handler.rs`
(handle_shortcut_event): cancel fires only while recording; push-to-talk
starts on press / stops on release; toggle mode flips per-binding state
under a lock that is released before invoking the action (deadlock
discipline, handler.rs:63-90). TranscribeAction kicks a background model
load, starts/stops the recorder, and runs the pipeline.
"""

from __future__ import annotations

import threading
from typing import Callable, Dict, Optional

import numpy as np

from spittle_tpu.events import HIDE_OVERLAY, SHOW_OVERLAY
from spittle_tpu.pipeline import PipelineHooks, TranscriptionPipeline, TextOutput
from .services import AppServices


class TranscribeAction:
    def __init__(self, post_process: bool):
        self.post_process = post_process

    def start(self, app: "ActionContext", binding_id: str) -> None:
        services = app.services
        settings = services.get_settings()
        # Background model load (actions.rs:33-35)
        model_id = settings.selected_model
        if model_id:
            path = services.models.get_model_path(model_id)
            entry = services.models.catalog.by_id(model_id)
            if path:
                services.transcription.initiate_model_load(
                    model_id, path,
                    entry.engine_type if entry else "whisper",
                )
        services.events.emit(SHOW_OVERLAY, {"state": "recording"})
        started = services.audio.try_start_recording(binding_id)
        if not started:
            # Roll stale toggle state back (actions.rs:87-94)
            with services.toggle_lock:
                services.toggle_state[binding_id] = False

    def stop(self, app: "ActionContext", binding_id: str) -> None:
        services = app.services
        samples = services.audio.stop_recording(binding_id)
        services.events.emit(HIDE_OVERLAY, None)
        if samples is None or not len(samples):
            self._clear_toggle(services, binding_id)
            return

        def run():
            settings = services.get_settings()
            pipeline = TranscriptionPipeline(
                samples=samples,
                pasted_segments=[],
                settings=settings,
                post_process=self.post_process,
                binding_id=binding_id,
                transcribe=services.transcription.transcribe,
                output=app.output,
                hooks=app.pipeline_hooks(samples),
                domain_selector=services.domain_selector,
            )
            try:
                pipeline.run()
            finally:
                self._clear_toggle(services, binding_id)

        threading.Thread(target=run, daemon=True).start()

    @staticmethod
    def _clear_toggle(services: AppServices, binding_id: str) -> None:
        with services.toggle_lock:
            services.toggle_state[binding_id] = False


class CancelAction:
    def start(self, app: "ActionContext", binding_id: str) -> None:
        app.cancel_current_operation()

    def stop(self, app: "ActionContext", binding_id: str) -> None:
        pass


class TestAction:
    """Debug binding: records invocations (reference "test" slot)."""

    def __init__(self):
        self.events = []

    def start(self, app, binding_id):
        self.events.append(("start", binding_id))

    def stop(self, app, binding_id):
        self.events.append(("stop", binding_id))


class ActionContext:
    """Everything actions need: services, text output, UI hooks.

    The desktop shell supplies a real TextOutput; tests a buffer.
    """

    def __init__(
        self,
        services: AppServices,
        output: TextOutput,
        hooks_factory: Optional[Callable[[np.ndarray], PipelineHooks]] = None,
    ):
        self.services = services
        self.output = output
        self._hooks_factory = hooks_factory
        self.action_map: Dict[str, object] = {
            "transcribe": TranscribeAction(post_process=False),
            "transcribe_with_post_process": TranscribeAction(post_process=True),
            "cancel": CancelAction(),
            "test": TestAction(),
        }

    def pipeline_hooks(self, samples: np.ndarray) -> PipelineHooks:
        if self._hooks_factory is not None:
            return self._hooks_factory(samples)
        services = self.services

        def save_history(samples_, raw, post, prompt):
            title = raw[:64] if raw else "Transcription"
            services.history.save_transcription(samples_, title, raw, post, prompt)

        return PipelineHooks(save_history=save_history)

    def cancel_current_operation(self) -> None:
        """Centralized cancel (utils.rs:17-46): reset toggles, recording,
        overlay; optionally unload the model immediately."""
        with self.services.toggle_lock:
            for k in self.services.toggle_state:
                self.services.toggle_state[k] = False
        self.services.audio.cancel_recording()
        self.services.events.emit(HIDE_OVERLAY, None)
        self.services.transcription.maybe_unload_immediately()

    # -- the shared shortcut event entry point ---------------------------

    def handle_shortcut_event(
        self, binding_id: str, hotkey: str, is_pressed: bool
    ) -> None:
        settings = self.services.get_settings()
        action = self.action_map.get(binding_id)
        if action is None:
            return

        if binding_id == "cancel":
            if self.services.audio.is_recording() and is_pressed:
                action.start(self, binding_id)
            return

        if settings.push_to_talk:
            if is_pressed:
                action.start(self, binding_id)
            else:
                action.stop(self, binding_id)
            return

        if is_pressed:
            with self.services.toggle_lock:
                active = self.services.toggle_state.get(binding_id, False)
                should_start = not active
                self.services.toggle_state[binding_id] = should_start
            # Lock released before invoking the action (handler.rs:63-90).
            if should_start:
                action.start(self, binding_id)
            else:
                action.stop(self, binding_id)
