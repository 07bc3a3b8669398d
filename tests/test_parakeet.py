"""Parakeet FastConformer-TDT tests on a tiny random config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.engine.base import TranscribeParams
from spittle_tpu.engine.parakeet_engine import ParakeetEngine, SentencePieceTable
from spittle_tpu.models.parakeet.config import CONFIGS
from spittle_tpu.models.parakeet.decode import tdt_greedy_decode
from spittle_tpu.models.parakeet.features import parakeet_features
from spittle_tpu.models.parakeet.model import (
    encode,
    init_params,
    joint,
    pred_init_state,
    pred_step,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = CONFIGS["parakeet-test"]
    params = init_params(cfg, jax.random.PRNGKey(3))
    return cfg, params


def test_features_shape_and_normalization():
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 16000)), jnp.float32)
    feats = np.asarray(parakeet_features(audio))
    assert feats.shape == (2, 80, 100)
    # Per-feature normalization: ~zero mean, ~unit std over time.
    np.testing.assert_allclose(feats.mean(axis=2), 0.0, atol=1e-3)
    np.testing.assert_allclose(feats.std(axis=2), 1.0, atol=2e-2)


def test_encoder_shapes_and_subsampling(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((2, cfg.n_mels, 160)), jnp.float32)
    enc = encode(params, mel, cfg)
    assert enc.shape[0] == 2
    assert enc.shape[1] == 160 // 8  # 8x time reduction
    assert enc.shape[2] == cfg.d_model
    assert np.isfinite(np.asarray(enc)).all()


def test_pred_and_joint_shapes(tiny):
    cfg, params = tiny
    state = pred_init_state(cfg, 3)
    tok = jnp.asarray([1, 2, cfg.blank_id], jnp.int32)
    pred, state = pred_step(params, tok, state, cfg)
    assert pred.shape == (3, cfg.pred_hidden)
    enc_t = jnp.zeros((3, cfg.d_model))
    logits, durs = joint(params, enc_t, pred)
    assert logits.shape == (3, cfg.vocab_size + 1)
    assert durs.shape == (3, cfg.durations)


def test_tdt_decode_terminates_and_respects_lengths(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(2)
    enc = jnp.asarray(rng.standard_normal((2, 12, cfg.d_model)), jnp.float32)
    lens = jnp.asarray([12, 5], jnp.int32)
    tokens, counts, frames = tdt_greedy_decode(params, enc, lens, cfg)
    tokens, counts, frames = map(np.asarray, (tokens, counts, frames))
    assert counts[0] <= tokens.shape[1]
    # Emissions only at frames within the valid range.
    for b in range(2):
        if counts[b]:
            assert frames[b, : counts[b]].max() < int(lens[b])
    # Blank padding after count.
    assert (tokens[0, counts[0]:] == cfg.blank_id).all()


def test_tdt_decode_batch_matches_single(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(4)
    enc = jnp.asarray(rng.standard_normal((2, 10, cfg.d_model)), jnp.float32)
    lens = jnp.asarray([10, 10], jnp.int32)
    tb, cb, _ = tdt_greedy_decode(params, enc, lens, cfg)
    t0, c0, _ = tdt_greedy_decode(params, enc[:1], lens[:1], cfg)
    assert int(cb[0]) == int(c0[0])
    np.testing.assert_array_equal(
        np.asarray(tb)[0, : int(cb[0])], np.asarray(t0)[0, : int(c0[0])]
    )


def test_engine_end_to_end():
    eng = ParakeetEngine()
    eng.load_model("random:parakeet-test")
    rng = np.random.default_rng(5)
    audio = (0.3 * rng.standard_normal(16000)).astype(np.float32)
    res = eng.transcribe_samples(audio, TranscribeParams(language="en"))
    assert isinstance(res.text, str)
    for seg in res.segments:
        assert seg.end >= seg.start >= 0
    batch = eng.transcribe_batch([audio, audio[:8000]])
    assert len(batch) == 2
    eng.unload_model()
    assert not eng.is_loaded


def test_sentencepiece_table():
    t = SentencePieceTable(["▁hello", "▁world", "ly"])
    assert t.decode([0, 1, 2]) == "hello worldly"
