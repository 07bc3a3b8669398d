"""Settings schema/store tests (reference: settings.rs defaults + merge)."""

import json

from spittle_tpu.config.settings import (
    AppSettings,
    AutoSubmitKey,
    LogLevel,
    ModelUnloadTimeout,
    SettingsStore,
    get_default_settings,
)
from spittle_tpu.config.catalog import load_model_catalog


def test_defaults():
    s = get_default_settings()
    assert s.push_to_talk is True
    assert s.selected_language == "auto"
    assert s.word_correction_threshold == 0.18
    assert s.history_limit == 5
    assert s.paste_delay_ms == 60
    assert s.domain_selector_timeout_ms == 120
    assert s.domain_selector_top_k == 2
    assert abs(s.domain_selector_min_score - 0.1) < 1e-9
    assert abs(s.domain_selector_hysteresis - 0.08) < 1e-9
    assert s.model_unload_timeout is ModelUnloadTimeout.NEVER
    assert "transcribe" in s.bindings
    assert s.bindings["cancel"].current_binding == "escape"
    assert len(s.post_process_prompts) == 14
    provider_ids = [p.id for p in s.post_process_providers]
    for pid in ("openai", "openrouter", "anthropic", "groq", "cerebras", "custom"):
        assert pid in provider_ids
    assert provider_ids[-1] == "custom"


def test_unload_timeout_seconds():
    assert ModelUnloadTimeout.NEVER.to_seconds() is None
    assert ModelUnloadTimeout.IMMEDIATELY.to_seconds() == 0
    assert ModelUnloadTimeout.SEC5.to_seconds() == 5
    assert ModelUnloadTimeout.MIN10.to_seconds() == 600
    assert ModelUnloadTimeout.HOUR1.to_seconds() == 3600


def test_log_level_legacy_numeric():
    assert LogLevel.parse(1) is LogLevel.TRACE
    assert LogLevel.parse(5) is LogLevel.ERROR
    assert LogLevel.parse("WARN") is LogLevel.WARN


def test_from_dict_merges_defaults():
    s = AppSettings.from_dict({
        "history_limit": 25,
        "auto_submit_key": "ctrl_enter",
        "unknown_future_field": {"x": 1},
        "log_level": 3,
    })
    assert s.history_limit == 25
    assert s.auto_submit_key is AutoSubmitKey.CTRL_ENTER
    assert s.log_level is LogLevel.INFO
    assert s.word_correction_threshold == 0.18  # untouched default


def test_from_dict_bad_value_keeps_default():
    s = AppSettings.from_dict({"paste_method": "teleport"})
    assert s.paste_method is AppSettings().paste_method


def test_roundtrip_through_store(tmp_path):
    store = SettingsStore(str(tmp_path / "settings_store.json"))
    s = store.load()
    s.custom_words = ["Kubernetes", "ChargeBee"]
    s.history_limit = 42
    store.save(s)
    s2 = store.load()
    assert s2.custom_words == ["Kubernetes", "ChargeBee"]
    assert s2.history_limit == 42
    # JSON uses "from" (not from_) for corrections
    raw = json.loads((tmp_path / "settings_store.json").read_text())
    assert raw["history_limit"] == 42


def test_ensure_post_process_defaults_restores_missing():
    s = AppSettings.from_dict({"post_process_providers": [
        {"id": "custom", "label": "Custom", "base_url": "http://x",
         "allow_base_url_edit": True, "models_endpoint": None},
    ]})
    ids = {p.id for p in s.post_process_providers}
    assert "openai" in ids and "anthropic" in ids


def test_store_update(tmp_path):
    store = SettingsStore(str(tmp_path / "s.json"))
    s = store.update(history_limit=9)
    assert s.history_limit == 9
    assert store.load().history_limit == 9


class TestCatalog:
    def test_load(self):
        cat = load_model_catalog()
        assert len(cat.models) == 9
        ids = [m.id for m in cat.models]
        for mid in ("small", "medium", "turbo", "large", "breeze-asr",
                    "parakeet-tdt-0.6b-v2", "parakeet-tdt-0.6b-v3",
                    "moonshine-base", "sense-voice-int8"):
            assert mid in ids
        rec = [m for m in cat.models if m.is_recommended]
        assert [m.id for m in rec] == ["parakeet-tdt-0.6b-v3"]

    def test_language_groups(self):
        cat = load_model_catalog()
        pk = cat.by_id("parakeet-tdt-0.6b-v3")
        langs = cat.languages_for(pk)
        assert "en" in langs and len(langs) >= 20
        assert cat.by_id("nope") is None
