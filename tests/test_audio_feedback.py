"""Audio feedback playback: synthesized themes, system player, and the
tray/feedback wiring through the dictation loop (actions.rs:42-77,
130-137 parity)."""

import threading

import numpy as np
import pytest

from spittle_tpu.audio.wav import load_wav_file
from spittle_tpu.shell.audio_out import (
    THEME_SYNTH,
    build_player_cmd,
    probe_player,
    synthesize_theme_sounds,
    system_player,
)


def test_synthesized_themes_are_valid_wavs(tmp_path):
    paths = synthesize_theme_sounds(str(tmp_path))
    assert sorted(p.split("/")[-1] for p in paths) == sorted(THEME_SYNTH)
    for p in paths:
        samples, sr = load_wav_file(p)
        assert sr == 16000
        assert 0.05 < len(samples) / sr < 0.5  # short feedback blips
        assert 0.1 < np.abs(samples).max() <= 1.0
    # idempotent: second call rewrites nothing (same mtimes)
    import os

    mtimes = {p: os.path.getmtime(p) for p in paths}
    synthesize_theme_sounds(str(tmp_path))
    assert {p: os.path.getmtime(p) for p in paths} == mtimes


def test_probe_order():
    assert probe_player(lambda t: t == "aplay") == "aplay"
    assert probe_player(lambda t: t in ("aplay", "paplay")) == "paplay"
    assert probe_player(lambda t: None) is None


def test_player_cmds(tmp_path):
    synthesize_theme_sounds(str(tmp_path))
    wav = str(tmp_path / "pop_start.wav")
    argv, tmp = build_player_cmd("paplay", wav, 0.5)
    assert argv == ["paplay", "--volume=32768", wav] and tmp is None
    argv, tmp = build_player_cmd("afplay", wav, 0.25)
    assert argv == ["afplay", "-v", "0.250", wav] and tmp is None
    # aplay has no volume flag: full volume plays the file directly...
    argv, tmp = build_player_cmd("aplay", wav, 1.0)
    assert argv == ["aplay", wav] and tmp is None
    # ...but reduced volume goes through a pre-scaled temp copy
    argv, tmp = build_player_cmd("aplay", wav, 0.5)
    assert argv[0] == "aplay" and tmp is not None
    scaled, _ = load_wav_file(tmp)
    orig, _ = load_wav_file(wav)
    assert np.abs(scaled).max() == pytest.approx(
        np.abs(orig).max() * 0.5, abs=0.01
    )
    import os

    os.unlink(tmp)


def test_system_player_blocking_invokes_tool(tmp_path):
    synthesize_theme_sounds(str(tmp_path))
    calls = []

    def fake_run(argv, **kw):
        calls.append(argv)

    play = system_player(
        run=fake_run, which=lambda t: t == "paplay", blocking=True
    )
    play(str(tmp_path / "marimba_start.wav"), 0.8)
    assert calls and calls[0][0] == "paplay"
    assert system_player(which=lambda t: None) is None


def test_dictation_loop_plays_sounds_and_walks_tray(tmp_path):
    """Full press->release through ActionContext with an AppUi attached:
    start sound before the stream opens (OnDemand), tray
    Recording -> Transcribing -> Idle, stop sound at release."""
    from spittle_tpu.app.actions import ActionContext
    from spittle_tpu.app.services import AppServices
    from spittle_tpu.app.ui_state import AppUi, TrayIconState
    from spittle_tpu.audio.recorder import QueueSource
    from spittle_tpu.pipeline import BufferTextOutput

    src = QueueSource(16000)
    services = AppServices(
        str(tmp_path), source_factory=lambda: src, use_mock_engine=True
    )
    services.transcription.load_model("mock", "/fake", "whisper")
    services.transcription._engine.canned_text = "hello"
    services.update_settings(audio_feedback=True)  # defaults off

    played = []
    ui = AppUi(services, player=lambda path, vol: played.append((path, vol)))
    tray_states = []
    services.events.listen(
        "tray-state-changed", lambda s: tray_states.append(s)
    )
    ctx = ActionContext(services, BufferTextOutput(), ui=ui)

    ctx.handle_shortcut_event("transcribe", "ctrl+space", True)
    assert ui.tray.state is TrayIconState.RECORDING
    assert len(played) == 1 and "marimba_start" in played[0][0]
    src.push(np.random.default_rng(0).standard_normal(16000).astype(
        np.float32) * 0.3)
    import time

    time.sleep(0.3)  # let the consumer drain the queued audio
    ctx.handle_shortcut_event("transcribe", "ctrl+space", False)
    assert len(played) == 2 and "marimba_stop" in played[1][0]

    deadline = time.time() + 5
    while ui.tray.state is not TrayIconState.IDLE and time.time() < deadline:
        time.sleep(0.02)
    assert ui.tray.state is TrayIconState.IDLE
    assert tray_states[:2] == ["recording", "transcribing"]
    assert tray_states[-1] == "idle"


def test_feedback_respects_disabled_setting(tmp_path):
    from spittle_tpu.app.services import AppServices
    from spittle_tpu.app.ui_state import AppUi, SoundType

    services = AppServices(str(tmp_path), use_mock_engine=True)
    services.update_settings(audio_feedback=False)
    played = []
    ui = AppUi(services, player=lambda p, v: played.append(p))
    ui.feedback.play(SoundType.START)
    assert played == []
