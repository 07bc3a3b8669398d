"""Committed trained checkpoints for Parakeet-TDT, Moonshine and
SenseVoice (tests/data/trained_families/*.npz): each engine family's
FULL decode path runs non-random weights in CI and must reproduce the
blessed goldens exactly.

This is the trained-tiny pattern (tests/test_trained_checkpoint.py)
extended to the remaining families (VERDICT r4 #2): real checkpoints
cannot reach this environment, so MB-scale checkpoints trained to 100%
on the synthetic tone-naming task stand in — proving the TDT
duration-advance loop, the Moonshine KV-cache generate loop, and the
SenseVoice CTC + prompt-frame path end-to-end on weights with real
structure. Reference: src-tauri/src/managers/transcription.rs:444-534.

The audio is reconstructed deterministically here from the golden
word-id lists (same generator as the training script), so the test
asserts the whole chain: PCM -> features -> encoder -> decode ->
tokens -> text -> detected language.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from spittle_tpu.engine.base import TranscribeParams

DATA = os.path.join(os.path.dirname(__file__), "data", "trained_families")


@pytest.fixture(scope="module")
def goldens():
    with open(os.path.join(DATA, "goldens.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def tone_task():
    import train_family_checkpoints as T

    return T


def _audios(goldens, tone_task):
    return [tone_task.utterance(c["word_ids"]) for c in goldens["cases"]]


@pytest.fixture(scope="module")
def parakeet(goldens):
    from spittle_tpu.engine.parakeet_engine import ParakeetEngine

    eng = ParakeetEngine()
    eng.load_model(os.path.join(DATA, "parakeet.npz"))
    return eng


def test_parakeet_tdt_decode_matches_goldens(goldens, tone_task, parakeet):
    results = parakeet.transcribe_batch(
        _audios(goldens, tone_task), TranscribeParams(language=None)
    )
    for case, res in zip(goldens["cases"], results):
        assert res.text == case["parakeet"]["text"]
        assert case["parakeet"]["exact"], case
        assert res.text.strip() == case["expected_text"]


def test_parakeet_duration_advance_is_exercised(goldens, tone_task,
                                                parakeet):
    """The trained trajectory advances by duration 2 at every step: the
    decode visits every other frame (a degenerate advance-by-1 decode
    would not prove the TDT duration machinery)."""
    import jax.numpy as jnp

    from spittle_tpu.models.parakeet.decode import tdt_greedy_decode
    from spittle_tpu.models.parakeet.features import (
        HOP, parakeet_features,
    )
    from spittle_tpu.models.parakeet.model import encode

    audio = tone_task.utterance(goldens["cases"][0]["word_ids"])
    feats = parakeet_features(jnp.asarray(audio[None]), n_mels=80)
    enc = encode(parakeet.params, feats, parakeet.cfg)
    lens = jnp.asarray([min(len(audio) // HOP // 8 + 1, enc.shape[1])])
    tokens, counts, frames = tdt_greedy_decode(
        parakeet.params, enc, lens, parakeet.cfg
    )
    n_words = len(goldens["cases"][0]["word_ids"])
    assert int(counts[0]) == n_words
    # Emission frames sit on the 10-frame tone grid (starts at frame 2)
    # — reached through uniform duration-2 hops, so the decode visited
    # only every OTHER frame (the TDT advance at work).
    emitted = [int(f) for f in np.asarray(frames)[0, : n_words]]
    assert emitted == [2 + 10 * k for k in range(n_words)], emitted


def test_parakeet_detected_language_on_trained_weights(goldens, tone_task,
                                                       parakeet):
    """VERDICT r4 #8 'done' criterion: the result's language comes from
    the decoded tokens (en and ru word sets), not the request."""
    results = parakeet.transcribe_batch(
        _audios(goldens, tone_task),
        TranscribeParams(language="en"),  # request says en for ALL
    )
    for case, res in zip(goldens["cases"], results):
        assert res.language == case["language"], (res.text, case)


def test_moonshine_generate_matches_goldens(goldens, tone_task):
    from spittle_tpu.engine.moonshine_engine import MoonshineEngine

    eng = MoonshineEngine()
    eng.load_model(os.path.join(DATA, "moonshine.npz"))
    results = eng.transcribe_batch(_audios(goldens, tone_task))
    for case, res in zip(goldens["cases"], results):
        assert res.text == case["moonshine"]["text"]
        assert case["moonshine"]["exact"], case
        assert res.text.strip() == case["expected_text"]


def test_sensevoice_ctc_matches_goldens(goldens, tone_task):
    from spittle_tpu.engine.sensevoice_engine import SenseVoiceEngine

    eng = SenseVoiceEngine()
    eng.load_model(os.path.join(DATA, "sensevoice.npz"))
    results = eng.transcribe_batch(
        _audios(goldens, tone_task), TranscribeParams(language=None)
    )
    for case, res in zip(goldens["cases"], results):
        assert res.text == case["sensevoice"]["text"]
        assert case["sensevoice"]["exact"], case
        assert res.text.strip() == case["expected_text"]


def test_goldens_are_fully_accurate(goldens):
    """The committed checkpoints must be trained to 100% on the held-out
    eval set — anything less and the goldens bless wrong transcripts."""
    for fam in ("parakeet", "moonshine", "sensevoice"):
        assert goldens[f"{fam}_accuracy"] == 1.0, fam
