"""Tray/overlay/audio-feedback headless state tests."""

import numpy as np
import pytest

from spittle_tpu.config.settings import AppSettings, OverlayPosition, SoundTheme
from spittle_tpu.events import EventBus, HIDE_OVERLAY, SHOW_OVERLAY
from spittle_tpu.app.ui_state import (
    AudioFeedback,
    OverlayController,
    SoundType,
    TrayController,
    TrayIconState,
    check_apple_intelligence_availability,
    get_tray_translations,
)


def test_tray_translations_locales():
    en = get_tray_translations("en")
    assert en["quit"] == "Quit"
    de = get_tray_translations("de-DE")
    assert de != en
    zh_tw = get_tray_translations("zh-TW")
    zh = get_tray_translations("zh")
    assert zh_tw != zh  # zh-TW preserved as its own locale
    assert get_tray_translations("xx")["quit"] == "Quit"  # fallback


def test_tray_controller():
    bus = EventBus()
    tray = TrayController(bus)
    states = []
    bus.listen("tray-state-changed", states.append)
    tray.set_state(TrayIconState.RECORDING)
    tray.set_state(TrayIconState.IDLE)
    assert states == ["recording", "idle"]
    ids = [i for i, _ in tray.menu_items()]
    assert ids == ["settings", "check_updates", "copy_last_transcript",
                   "unload_model", "cancel", "quit"]


def test_overlay_controller():
    bus = EventBus()
    s = AppSettings()
    s.overlay_position = OverlayPosition.BOTTOM
    ov = OverlayController(bus, lambda: s)
    bus.emit(SHOW_OVERLAY, "transcribing")
    assert ov.visible and ov.state == "transcribing"
    bus.emit(HIDE_OVERLAY, None)
    assert not ov.visible
    s.overlay_position = OverlayPosition.NONE
    bus.emit(SHOW_OVERLAY, "recording")
    assert not ov.visible  # position None suppresses the overlay


def test_audio_feedback_paths(tmp_path):
    s = AppSettings()
    s.audio_feedback = True
    fb = AudioFeedback(lambda: s, str(tmp_path))
    p = fb.sound_path(SoundType.START)
    assert p.endswith("marimba_start.wav")
    s.sound_theme = SoundTheme.POP
    assert fb.sound_path(SoundType.STOP).endswith("pop_stop.wav")
    s.sound_theme = SoundTheme.CUSTOM
    assert "custom_sounds" in fb.sound_path(SoundType.START)

    played = []
    fb2 = AudioFeedback(lambda: s, str(tmp_path),
                        player=lambda p, v: played.append((p, v)))
    fb2.play(SoundType.START)
    assert played and played[0][1] == 1.0
    s.audio_feedback = False
    fb2.play(SoundType.STOP)
    assert len(played) == 1  # disabled -> no play


def test_apple_intelligence_stub():
    assert check_apple_intelligence_availability() is False
