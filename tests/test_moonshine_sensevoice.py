"""Moonshine and SenseVoice model/engine tests on tiny random configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.engine.base import TranscribeParams
from spittle_tpu.engine.moonshine_engine import MoonshineEngine
from spittle_tpu.engine.sensevoice_engine import SenseVoiceEngine
from spittle_tpu.models.moonshine.model import (
    CONFIGS as MS_CONFIGS,
    encode as ms_encode,
    greedy_decode as ms_decode,
    init_params as ms_init,
)
from spittle_tpu.models.sensevoice.model import (
    CONFIGS as SV_CONFIGS,
    ctc_greedy_decode,
    encode as sv_encode,
    init_params as sv_init,
    lfr_stack,
    prompt_ids_for,
)


class TestMoonshine:
    @pytest.fixture(scope="class")
    def tiny(self):
        cfg = MS_CONFIGS["moonshine-test"]
        return cfg, ms_init(cfg, jax.random.PRNGKey(5))

    def test_encoder_reduction(self, tiny):
        cfg, params = tiny
        audio = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 16000)), jnp.float32
        )
        xa = ms_encode(params, audio, cfg)
        assert xa.shape[0] == 2 and xa.shape[2] == cfg.dim
        # ~384x time reduction from the conv stem
        assert 16000 // 500 <= xa.shape[1] <= 16000 // 300
        assert np.isfinite(np.asarray(xa)).all()

    def test_greedy_decode_terminates(self, tiny):
        cfg, params = tiny
        audio = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 8000)), jnp.float32
        )
        xa = ms_encode(params, audio, cfg)
        tokens, lengths = ms_decode(params, xa, cfg, 12)
        tokens, lengths = np.asarray(tokens), np.asarray(lengths)
        assert tokens.shape == (2, 12)
        assert (lengths <= 12).all()

    def test_variable_length_no_fixed_window(self, tiny):
        cfg, params = tiny
        short = ms_encode(params, jnp.zeros((1, 4000), jnp.float32), cfg)
        long = ms_encode(params, jnp.zeros((1, 32000), jnp.float32), cfg)
        assert long.shape[1] > short.shape[1] * 4

    def test_engine(self):
        eng = MoonshineEngine()
        eng.load_model("random:moonshine-test")
        res = eng.transcribe_samples(
            (0.1 * np.random.default_rng(2).standard_normal(8000)).astype(np.float32)
        )
        assert isinstance(res.text, str)
        assert res.language == "en"
        eng.unload_model()


class TestSenseVoice:
    @pytest.fixture(scope="class")
    def tiny(self):
        cfg = SV_CONFIGS["sense-voice-test"]
        return cfg, sv_init(cfg, jax.random.PRNGKey(6))

    def test_lfr_stacking(self):
        mel = jnp.asarray(np.random.default_rng(0).standard_normal((1, 80, 60)))
        out = lfr_stack(mel, 7, 6)
        assert out.shape == (1, 10, 560)

    def test_encoder_logits_shape(self, tiny):
        cfg, params = tiny
        feats = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 20, cfg.input_dim)),
            jnp.float32,
        )
        pids = jnp.asarray(
            np.tile(prompt_ids_for(cfg, "en", True), (2, 1))
        )
        logits = sv_encode(params, feats, pids, cfg)
        assert logits.shape == (2, 24, cfg.vocab_size)  # +4 prompt frames

    def test_ctc_collapse(self):
        # [blank, a, a, blank, b, b, b, c] -> [a, b, c]
        v = 5
        frames = [0, 2, 2, 0, 3, 3, 3, 4]
        logits = np.full((1, 4 + len(frames), v), -10.0, np.float32)
        for i, t in enumerate(frames):
            logits[0, 4 + i, t] = 10.0
        for i in range(4):
            logits[0, i, 0] = 10.0
        assert ctc_greedy_decode(logits, 0, 4) == [[2, 3, 4]]

    def test_prompt_ids(self):
        cfg = SV_CONFIGS["sense-voice-test"]
        auto = prompt_ids_for(cfg, "auto", True)
        zh = prompt_ids_for(cfg, "zh", False)
        # FunASR lid_dict ids: auto=0, zh=3; withitn=14 / woitn=15
        assert auto[0] == 0 and zh[0] == 3
        assert auto[3] == 14 and zh[3] == 15

    def test_engine(self):
        eng = SenseVoiceEngine()
        eng.load_model("random:sense-voice-test")
        res = eng.transcribe_samples(
            (0.1 * np.random.default_rng(3).standard_normal(16000)).astype(np.float32),
            TranscribeParams(language="zh"),
        )
        assert isinstance(res.text, str)
        assert res.language == "zh"
        batch = eng.transcribe_batch(
            [np.zeros(8000, np.float32), np.zeros(16000, np.float32)]
        )
        assert len(batch) == 2
        eng.unload_model()
