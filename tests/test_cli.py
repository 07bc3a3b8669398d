"""CLI surface (spittle_tpu/cli.py): the audio-toolkit binary analog."""

import glob
import os
import wave

import numpy as np
import pytest

from spittle_tpu.cli import build_parser, main
from spittle_tpu.models.whisper.config import CONFIGS, WhisperConfig

CONFIGS.setdefault(
    "cli-test",
    WhisperConfig(
        name="cli-test", n_mels=80, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=1, n_vocab=51865, n_text_ctx=32,
        n_text_state=64, n_text_head=4, n_text_layer=1,
    ),
)


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    path = str(d / "a.wav")
    t = np.arange(32000) / 16000.0
    pcm = (0.3 * np.sin(2 * np.pi * 330 * t) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return path


def test_parser_covers_all_subcommands():
    p = build_parser()
    subs = next(
        a for a in p._actions if a.__class__.__name__ == "_SubParsersAction"
    )
    assert set(subs.choices) == {
        "transcribe", "record", "vad", "rolling", "catalog", "serve", "app"
    }


def test_catalog_lists_models(capsys):
    assert main(["catalog"]) == 0
    out = capsys.readouterr().out
    assert "whisper" in out
    assert "parakeet" in out.lower() or "moonshine" in out.lower()


def test_rolling_scenarios(capsys):
    scen = sorted(glob.glob(os.path.join(
        os.path.dirname(__file__), "data", "rolling_scenarios", "*.json")))
    assert main(["rolling", scen[0]]) == 0
    out = capsys.readouterr().out
    assert "PASS" in out


def test_transcribe_smoke(wav_file, capsys):
    rc = main(["transcribe", wav_file, "--model", "random:cli-test",
               "--language", "en", "--timestamps"])
    assert rc == 0


def test_transcribe_parallel_windows(wav_file, capsys):
    rc = main(["transcribe", wav_file, "--model", "random:cli-test",
               "--language", "en", "--parallel-windows"])
    assert rc == 0


def test_vad_smoke(wav_file, capsys):
    assert main(["vad", wav_file]) == 0


def test_transcribe_audio_ctx(wav_file, capsys):
    rc = main(["transcribe", wav_file, "--model", "random:cli-test",
               "--language", "en", "--parallel-windows",
               "--audio-ctx", "128"])
    assert rc == 0
