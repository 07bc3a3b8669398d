"""Live rolling dictation session (app/rolling_session.py)."""

import numpy as np

from spittle_tpu.app.rolling_session import (
    RollingTranscriber,
    compute_rolling_rewrite,
)
from spittle_tpu.engine.base import TranscriptionResult
from spittle_tpu.text.rolling import Perfect, replay_hypotheses


class ScriptedEngine:
    """Returns the next scripted hypothesis per transcribe call."""

    def __init__(self, texts):
        self.texts = list(texts)
        self.i = 0
        self.windows = []

    def transcribe_samples(self, samples, params=None):
        self.windows.append(len(samples))
        text = self.texts[min(self.i, len(self.texts) - 1)]
        self.i += 1
        return TranscriptionResult(text=text)


class Buffer:
    def __init__(self):
        self.text = ""
        self.ops = []

    def __call__(self, update):
        self.ops.append((update.delete_chars, update.insert))
        keep = len(self.text) - update.delete_chars
        self.text = self.text[:keep] + update.insert


def test_compute_rolling_rewrite():
    assert compute_rolling_rewrite("", "Hello") == (0, "Hello")
    assert compute_rolling_rewrite("Hello wor", "Hello world.") == (0, "ld.")
    assert compute_rolling_rewrite("All right.", "Alright, ok") == (
        len("All right.") - len("Al"), "right, ok"
    )
    assert compute_rolling_rewrite("same", "same") == (0, "")


def test_rolling_session_converges_to_final_hypothesis():
    hyps = [
        "All right.",
        "Alright, let's see if that's doing any better.",
        "Alright, let's see if that's doing any better. Nope.",
    ]
    engine = ScriptedEngine(hyps)
    buf = Buffer()
    t = {"now": 0.0}
    roll = RollingTranscriber(
        engine, buf, min_new_audio_s=0.5, min_interval_s=0.0,
        clock=lambda: t["now"],
    )
    chunk = np.zeros(8000, np.float32) + 0.01  # 0.5 s
    for _ in range(3):
        t["now"] += 1.0
        roll.push_audio(chunk)
    final = roll.finalize()
    assert final == hyps[-1]
    assert buf.text == hyps[-1]
    # The emitted hypothesis sequence replays drift-free in the harness.
    report = replay_hypotheses(roll.hypotheses, Perfect())
    assert report.matches_expected


def test_rolling_session_respects_cadence():
    engine = ScriptedEngine(["a", "b", "c"])
    buf = Buffer()
    t = {"now": 0.0}
    roll = RollingTranscriber(
        engine, buf, min_new_audio_s=1.0, min_interval_s=10.0,
        clock=lambda: t["now"],
    )
    # Lots of audio but the interval gate holds after the first run.
    for _ in range(10):
        t["now"] += 0.1
        roll.push_audio(np.zeros(16000, np.float32))
    assert len(engine.windows) <= 2


def test_rolling_session_window_cap():
    engine = ScriptedEngine(["x"])
    roll = RollingTranscriber(
        engine, lambda u: None, min_new_audio_s=0.0, min_interval_s=0.0,
        max_window_s=2.0, clock=lambda: 1e9,
    )
    roll.push_audio(np.zeros(16000 * 5, np.float32))
    assert engine.windows[-1] == 16000 * 2  # capped to the last 2 s


def test_rolling_session_identical_hypothesis_no_emit():
    engine = ScriptedEngine(["same text", "same text", "same text"])
    buf = Buffer()
    t = {"now": 0.0}
    roll = RollingTranscriber(
        engine, buf, min_new_audio_s=0.1, min_interval_s=0.0,
        clock=lambda: t["now"],
    )
    for _ in range(3):
        t["now"] += 1
        roll.push_audio(np.zeros(4000, np.float32))
    assert len(buf.ops) == 1  # first emission only
    assert buf.text == "same text"
