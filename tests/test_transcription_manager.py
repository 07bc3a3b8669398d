"""TranscriptionManager lifecycle + hot-path chain tests (mock engine)."""

import time

import numpy as np
import pytest

from spittle_tpu.config.settings import AppSettings, ModelUnloadTimeout
from spittle_tpu.engine.mock import MockEngine
from spittle_tpu.events import EventBus, MODEL_STATE_CHANGED
from spittle_tpu.managers.domain_selector import DomainSelectorManager
from spittle_tpu.managers.transcription import TranscriptionManager


def make_manager(text="hello world", settings=None, **kw):
    settings = settings or AppSettings()
    engine = MockEngine(canned_text=text)
    bus = EventBus()
    mgr = TranscriptionManager(
        engine_factory=lambda et: engine,
        settings_provider=lambda: settings,
        events=bus,
        **kw,
    )
    return mgr, engine, bus, settings


def test_load_transcribe_unload_cycle():
    mgr, engine, bus, _ = make_manager("the quick brown fox")
    states = []
    bus.listen(MODEL_STATE_CHANGED, states.append)
    mgr.load_model("m1", "/fake", "whisper")
    assert mgr.is_model_loaded
    assert mgr.get_current_model() == "m1"
    out = mgr.transcribe(np.zeros(16000, np.float32))
    assert out == "the quick brown fox"
    mgr.unload_model()
    assert not mgr.is_model_loaded
    # ModelStateEvent wire shape (domain/events.rs:23-44): event_type
    # kinds + model_id/model_name/error fields on every emission.
    kinds = [s["event_type"] for s in states]
    assert kinds == ["loading_started", "loaded", "unloaded"]
    for s in states:
        assert set(s) == {"event_type", "model_id", "model_name", "error"}
        assert s["model_id"] == "m1"
        assert s["error"] is None
    mgr.shutdown()


def test_loading_failed_event_carries_error():
    def bad_factory(engine_type):
        raise RuntimeError("engine exploded")

    mgr, engine, bus, _ = make_manager()
    mgr._engine_factory = bad_factory
    states = []
    bus.listen(MODEL_STATE_CHANGED, states.append)
    with pytest.raises(RuntimeError):
        mgr.load_model("m1", "/fake", "whisper")
    kinds = [s["event_type"] for s in states]
    assert kinds == ["loading_started", "loading_failed"]
    assert states[-1]["error"] == "engine exploded"
    mgr.shutdown()


def test_transcribe_without_model_raises():
    mgr, *_ = make_manager()
    with pytest.raises(RuntimeError):
        mgr.transcribe(np.zeros(100, np.float32))
    mgr.shutdown()


def test_custom_words_and_filters_applied():
    s = AppSettings()
    s.custom_words = ["Kubernetes"]
    mgr, *_ = make_manager("um so the kubernetis cluster is uh great", settings=s)
    mgr.load_model("m", "/fake", "whisper")
    assert mgr.transcribe(np.zeros(10)) == "so the Kubernetes cluster is great"
    mgr.shutdown()


def test_hallucination_discarded():
    mgr, *_ = make_manager("Thank you for watching")
    mgr.load_model("m", "/fake", "whisper")
    assert mgr.transcribe(np.zeros(10)) == ""
    mgr.shutdown()


def test_jargon_corrections_applied():
    s = AppSettings()
    s.jargon_enabled_profiles = ["web_dev"]
    mgr, *_ = make_manager("deploy the type script app", settings=s)
    mgr.load_model("m", "/fake", "whisper")
    assert "TypeScript" in mgr.transcribe(np.zeros(10))
    mgr.shutdown()


def test_domain_selector_routes_profiles():
    s = AppSettings()
    s.domain_selector_enabled = True
    s.domain_selector_min_score = 0.01
    s.domain_selector_timeout_ms = 300
    mgr, *_ = make_manager(
        "the kubernetes terraform graph QL pipeline with type script",
        settings=s,
        domain_selector=DomainSelectorManager(),
    )
    mgr.load_model("m", "/fake", "whisper")
    out = mgr.transcribe(np.zeros(10))
    assert "GraphQL" in out  # web_dev correction routed automatically
    mgr.shutdown()


def test_initial_prompt_built_from_jargon():
    s = AppSettings()
    s.jargon_enabled_profiles = ["web_dev"]
    captured = {}

    class CapturingEngine(MockEngine):
        def transcribe_samples(self, samples, params=None):
            captured["params"] = params
            return super().transcribe_samples(samples, params)

    engine = CapturingEngine()
    mgr = TranscriptionManager(
        engine_factory=lambda et: engine,
        settings_provider=lambda: s,
    )
    mgr.load_model("m", "/fake", "whisper")
    mgr.transcribe(np.zeros(10))
    p = captured["params"]
    assert p.initial_prompt and p.initial_prompt.startswith(
        "Technical dictation. Common terms: "
    )
    mgr.shutdown()


def test_language_param_mapping():
    s = AppSettings()
    s.selected_language = "de"
    s.translate_to_english = True
    captured = {}

    class CapturingEngine(MockEngine):
        def transcribe_samples(self, samples, params=None):
            captured["params"] = params
            return super().transcribe_samples(samples, params)

    mgr = TranscriptionManager(
        engine_factory=lambda et: CapturingEngine(),
        settings_provider=lambda: s,
    )
    mgr.load_model("m", "/fake", "whisper")
    mgr.transcribe(np.zeros(10))
    assert captured["params"].language == "de"
    assert captured["params"].translate is True
    mgr.shutdown()


def test_idle_unload():
    s = AppSettings()
    s.model_unload_timeout = ModelUnloadTimeout.SEC5
    # shrink: poll every 0.2 s; pretend 5 s timeout via Sec5 -> patch activity
    mgr, engine, bus, _ = make_manager(settings=s, idle_poll_seconds=0.2)
    mgr.load_model("m", "/fake", "whisper")
    mgr._last_activity -= 10  # simulate 10 s idle
    time.sleep(1.5)
    assert not mgr.is_model_loaded
    mgr.shutdown()


def test_immediate_unload_after_transcribe():
    s = AppSettings()
    s.model_unload_timeout = ModelUnloadTimeout.IMMEDIATELY
    mgr, *_ = make_manager("hi there friend", settings=s)
    mgr.load_model("m", "/fake", "whisper")
    assert mgr.transcribe(np.zeros(10)) == "hi there friend"
    assert not mgr.is_model_loaded
    mgr.shutdown()
