"""Thread exception barriers (VERDICT r2 weak #3).

The reference resets tray/overlay state when a pipeline task dies
(pipeline.rs:888-899, utils.rs:17-46). Here every spawned thread goes
through spittle_tpu.utils.threads; pyproject promotes
PytestUnhandledThreadExceptionWarning to an error, so any of these
tests leaking a thread exception fails the suite by construction.
"""

import time

import numpy as np
import pytest

from spittle_tpu.app.actions import ActionContext, StreamingSession
from spittle_tpu.app.services import AppServices
from spittle_tpu.audio.recorder import QueueSource
from spittle_tpu.events import HIDE_OVERLAY
from spittle_tpu.pipeline import BufferTextOutput
from spittle_tpu.utils import threads


class TestGuarded:
    def test_exception_is_swallowed_and_routed(self):
        failures = []

        def boom():
            raise RuntimeError("dead")

        t = threads.spawn(boom, name="t", on_failure=failures.append)
        t.join(timeout=5)
        assert not t.is_alive()
        assert len(failures) == 1 and isinstance(failures[0], RuntimeError)

    def test_on_failure_crash_is_contained(self):
        def boom():
            raise ValueError("x")

        def bad_handler(_exc):
            raise RuntimeError("handler broken too")

        t = threads.spawn(boom, name="t2", on_failure=bad_handler)
        t.join(timeout=5)
        assert not t.is_alive()

    def test_return_value_passthrough(self):
        fn = threads.guarded(lambda x: x + 1, name="inc")
        assert fn(41) == 42


def _boot(tmp_path, transcribe_error=None):
    src = QueueSource(16000)
    services = AppServices(
        str(tmp_path), source_factory=lambda: src, use_mock_engine=True
    )
    return src, services


class TestPipelineDeath:
    def test_pipeline_crash_resets_ui_state(self, tmp_path):
        """Kill the pipeline mid-run (transcribe raises); the tray must
        return to IDLE, the overlay must be hidden, and the toggle
        cleared — with the exception logged, not escaping the thread."""
        from spittle_tpu.app.ui_state import AppUi, TrayIconState

        src, services = _boot(tmp_path)
        try:
            services.transcription.load_model("m", "/fake", "whisper")
            # Sabotage the engine: transcription dies mid-pipeline.
            def die(*_a, **_k):
                raise RuntimeError("engine exploded")

            services.transcription._engine.transcribe_samples = die
            services.transcription._engine.transcribe = die

            hidden = []
            services.events.listen(HIDE_OVERLAY, hidden.append)

            ui = AppUi(services, player=lambda path, vol: None)
            actions = ActionContext(services, BufferTextOutput(), ui=ui)
            actions.handle_shortcut_event("transcribe", "ctrl+space", True)
            src.push(np.zeros(16000, np.float32))
            time.sleep(0.3)
            actions.handle_shortcut_event("transcribe", "ctrl+space", False)

            deadline = time.time() + 10
            while time.time() < deadline:
                with services.toggle_lock:
                    toggled = services.toggle_state.get("transcribe", False)
                if (
                    not toggled
                    and ui.tray.state is TrayIconState.IDLE
                    and hidden
                ):
                    break
                time.sleep(0.05)

            with services.toggle_lock:
                assert not services.toggle_state.get("transcribe", False)
            assert ui.tray.state is TrayIconState.IDLE
            assert hidden, "HIDE_OVERLAY not emitted on pipeline death"
        finally:
            services.shutdown()


class TestStreamingSessionBarrier:
    def test_failing_paste_does_not_deadlock_finish(self, tmp_path):
        src, services = _boot(tmp_path)
        try:
            services.transcription.load_model("m", "/fake", "whisper")
            services.transcription._engine.canned_text = "hello"

            class ExplodingOutput:
                def paste(self, text):
                    raise RuntimeError("paste target gone")

            session = StreamingSession(services, ExplodingOutput())
            session.submit(np.zeros(8000, np.float32))
            # finish() joins the queue: before the barrier a failed paste
            # skipped task_done and this hung forever.
            t0 = time.time()
            texts = session.finish()
            assert time.time() - t0 < 5
            assert texts == []
        finally:
            services.shutdown()


class TestSidecarBarrier:
    def test_domain_sidecar_fails_open_fast(self):
        from spittle_tpu.managers.domain_selector import _run_with_timeout

        def boom():
            raise RuntimeError("scorer died")

        t0 = time.time()
        assert _run_with_timeout(boom, timeout_s=5.0) is None
        # Failure is immediate (queue sentinel), not a 5 s timeout wait.
        assert time.time() - t0 < 2.0


class TestWatchdogBarrier:
    def test_health_tick_crash_does_not_kill_watchdog(self, tmp_path):
        src, services = _boot(tmp_path)
        try:
            am = services.audio
            calls = []
            original = am._health_tick

            def flaky():
                calls.append(1)
                if len(calls) == 1:
                    raise RuntimeError("tick exploded")
                return original()

            am._health_tick = flaky
            deadline = time.time() + 10
            while len(calls) < 2 and time.time() < deadline:
                time.sleep(0.1)
            assert len(calls) >= 2, "watchdog died after a failing tick"
        finally:
            services.shutdown()
