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


# -- independent full-loop oracle (VERDICT r3 next-round #5) ---------------
#
# The batched lax.while_loop decode was previously only checked against
# itself (batch-vs-single). This is an end-to-end oracle: a sequential,
# per-sample numpy TDT greedy decoder implementing NeMo's published
# semantics (nemo rnnt_greedy_decoding.py GreedyTDTInfer._greedy_decode:
# advance by durations[argmax(dur_logits)] after EVERY joint evaluation,
# blank with duration 0 forces +1, inner same-frame loop while skip==0,
# max_symbols emissions per frame visit then a forced +1), with the
# prediction LSTM and joint re-implemented in numpy so no jax code is on
# the oracle path. Matches the engine the reference dispatches to
# (transcribe-rs ParakeetEngine, transcription.rs:278-296,505-513).


def _np_pred_step(params, token, h, c):
    dec = params["decoder"]
    x = np.asarray(dec["embed"])[token]
    gates = x @ np.asarray(dec["lstm_w"]) + h @ np.asarray(dec["lstm_r"]) \
        + np.asarray(dec["lstm_b"])
    i, f, g, o = np.split(gates, 4, axis=-1)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    c2 = sig(f) * c + sig(i) * np.tanh(g)
    h2 = sig(o) * np.tanh(c2)
    return h2.astype(np.float32), c2.astype(np.float32)


def _np_joint(params, enc_t, pred):
    j = params["joint"]
    h = np.maximum(
        enc_t @ np.asarray(j["enc_w"]) + np.asarray(j["enc_b"])
        + pred @ np.asarray(j["pred_w"]) + np.asarray(j["pred_b"]), 0.0)
    return h @ np.asarray(j["out_w"]) + np.asarray(j["out_b"]), \
        h @ np.asarray(j["dur_w"]) + np.asarray(j["dur_b"])


def _nemo_tdt_greedy(params, enc_row, length, cfg):
    """Sequential single-sample TDT greedy decode, NeMo semantics.

    durations bins are [0, 1, ..., cfg.durations-1] (the published
    parakeet-tdt-0.6b duration set [0,1,2,3,4])."""
    blank = cfg.blank_id
    h = np.zeros((1, cfg.pred_hidden), np.float32)
    c = np.zeros((1, cfg.pred_hidden), np.float32)
    # start symbol: one pred step on blank (mirrors _initial_pred)
    pred, (h, c) = None, _np_pred_step(params, np.asarray([blank]), h, c)
    pred = h
    tokens, frames = [], []
    t = 0
    while t < int(length):
        f = enc_row[t: t + 1]
        symbols_added = 0
        need_loop = True
        while need_loop and symbols_added < cfg.max_symbols_per_step:
            logits, dur_logits = _np_joint(params, f, pred)
            k = int(np.argmax(logits[0]))
            skip = int(np.argmax(dur_logits[0]))  # durations = bin index
            if k == blank:
                if skip == 0:
                    skip = 1
            else:
                tokens.append(k)
                frames.append(t)
                h2, c2 = _np_pred_step(params, np.asarray([k]), h, c)
                h, c = h2, c2
                pred = h
                symbols_added += 1
            t += skip
            need_loop = skip == 0
        if need_loop and symbols_added >= cfg.max_symbols_per_step:
            t += 1  # forced advance after max same-frame emissions
    return tokens, frames


def _assert_loop_matches_oracle(cfg, params, enc, lens):
    tokens, counts, frames = map(
        np.asarray, tdt_greedy_decode(params, enc, lens, cfg, max_tokens=256))
    enc_np = np.asarray(enc, np.float32)
    for b in range(enc_np.shape[0]):
        want_tokens, want_frames = _nemo_tdt_greedy(
            params, enc_np[b], int(lens[b]), cfg)
        got_tokens = tokens[b, : counts[b]].tolist()
        got_frames = frames[b, : counts[b]].tolist()
        assert got_tokens == want_tokens, (b, got_tokens, want_tokens)
        assert got_frames == want_frames, (b, got_frames, want_frames)


def test_tdt_loop_matches_sequential_nemo_oracle(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(7)
    enc = jnp.asarray(rng.standard_normal((4, 24, cfg.d_model)), jnp.float32)
    lens = jnp.asarray([24, 13, 7, 1], jnp.int32)
    _assert_loop_matches_oracle(cfg, params, enc, lens)


def test_tdt_loop_oracle_zero_duration_guard(tiny):
    """Adversarial arm: bias the duration head toward bin 0 and suppress
    blank so decoding loops on the same frame and the max-symbols guard
    (forced +1 after max_symbols_per_step emissions) must fire — the
    exact code path the batch-vs-single test could never distinguish."""
    cfg, params = tiny
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    joint_p = dict(params["joint"])
    dur_b = np.asarray(joint_p["dur_b"]).copy()
    dur_b[0] += 8.0  # duration bin 0 dominates
    out_b = np.asarray(joint_p["out_b"]).copy()
    out_b[cfg.blank_id] -= 8.0  # blank suppressed -> emission chains
    joint_p["dur_b"] = jnp.asarray(dur_b)
    joint_p["out_b"] = jnp.asarray(out_b)
    params = {**params, "joint": joint_p}

    rng = np.random.default_rng(11)
    enc = jnp.asarray(rng.standard_normal((3, 8, cfg.d_model)), jnp.float32)
    lens = jnp.asarray([8, 5, 2], jnp.int32)
    _assert_loop_matches_oracle(cfg, params, enc, lens)
