"""Beam search decode tests on the tiny random model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.models.whisper.beam import beam_decode
from spittle_tpu.models.whisper.config import WhisperConfig
from spittle_tpu.models.whisper.decode import DecodeOptions, greedy_decode
from spittle_tpu.models.whisper.model import encode, init_params


@pytest.fixture(scope="module")
def tiny():
    cfg = WhisperConfig(
        name="test", n_mels=80, n_audio_ctx=60, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_vocab=51865, n_text_ctx=28,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(11))
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 80, 120)), jnp.float32
    )
    xa = encode(params, mel, cfg)
    return cfg, params, xa


def test_beam_decode_runs_and_obeys_rules(tiny):
    cfg, params, xa = tiny
    opts = DecodeOptions(language="en", timestamps=True, max_tokens=20)
    out = beam_decode(params, xa, cfg, opts, beam_size=3)
    toks = np.asarray(out["tokens"])
    # max_tokens is the DECODE BUDGET: buffer = prefix + budget
    assert toks.shape == (2, out["sample_begin"] + 20)
    assert toks[0, 0] == cfg.sot
    gen = toks[:, out["sample_begin"]:]
    for bad in (cfg.sot, cfg.sot_prev, cfg.no_timestamps):
        assert not (gen == bad).any()
    for row in gen:
        ts = [t for t in row if t >= cfg.timestamp_begin]
        assert ts == sorted(ts)
    assert np.isfinite(np.asarray(out["avg_logprob"])).all()
    assert out["no_speech_prob"].shape == (2,)


def test_beam_score_not_worse_than_greedy(tiny):
    cfg, params, xa = tiny
    opts = DecodeOptions(language="en", timestamps=False, max_tokens=20)
    g = greedy_decode(params, xa, cfg, opts)
    b = beam_decode(params, xa, cfg, opts, beam_size=4)
    # Beam search sum-logprob should be >= greedy's (same scoring, larger
    # search space). Compare avg logprob with some tolerance for the
    # length normalization differences.
    g_avg = np.asarray(g["avg_logprob"])
    b_avg = np.asarray(b["avg_logprob"])
    assert (b_avg >= g_avg - 0.2).all()


def test_beam_size_one_close_to_greedy(tiny):
    cfg, params, xa = tiny
    opts = DecodeOptions(language="en", timestamps=False, max_tokens=16)
    g = np.asarray(greedy_decode(params, xa, cfg, opts)["tokens"])
    b = np.asarray(beam_decode(params, xa, cfg, opts, beam_size=1)["tokens"])
    np.testing.assert_array_equal(g, b)
