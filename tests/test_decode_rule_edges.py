"""Decode-rule edge cases from the round-2 whole-file review.

References: OpenAI ApplyTimestampRules (penultimate_was_timestamp is
True when fewer than two tokens have been sampled) and whisper.cpp's
n_max_text_ctx prompt/decode split.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.engine.base import TranscribeParams
from spittle_tpu.engine.whisper_engine import WhisperEngine
from spittle_tpu.models.whisper.config import CONFIGS
from spittle_tpu.models.whisper.decode import (
    DecodeOptions,
    NEG_INF,
    _process_logits,
    _static_suppress_mask,
)


def test_penultimate_rule_at_second_sampled_position():
    """After the INITIAL timestamp, text must be FORCED (timestamps
    banned): fewer than two sampled tokens means penultimate_was_
    timestamp=True regardless of what sits in the buffer (the prompt's
    task token previously inverted this, banning text instead)."""
    cfg = CONFIGS["tiny"]
    opts = DecodeOptions(timestamps=True)
    mask = jnp.asarray(_static_suppress_mask(cfg, opts))
    logits = jnp.zeros((1, cfg.n_vocab), jnp.float32)
    sample_begin = 3
    out = _process_logits(
        logits, cfg=cfg, opts=opts, static_mask=mask,
        pos=jnp.asarray(sample_begin + 1, jnp.int32),
        sample_begin=sample_begin,
        last_tok=jnp.asarray([cfg.timestamp_begin], jnp.int32),  # <|0.00|>
        penult_tok=jnp.asarray([cfg.transcribe], jnp.int32),  # prompt tok
        ts_floor=jnp.asarray([cfg.timestamp_begin + 1], jnp.int32),
    )
    out = np.asarray(out)
    some_text = 100  # ordinary text token id
    assert out[0, some_text] > NEG_INF / 2  # text allowed
    assert out[0, cfg.timestamp_begin + 50] < NEG_INF / 2  # ts banned


def test_pair_rule_with_two_sampled_tokens_unchanged():
    """With >=2 sampled tokens the buffer's penultimate token governs:
    ts after text -> text banned (must close the pair or EOT)."""
    cfg = CONFIGS["tiny"]
    opts = DecodeOptions(timestamps=True)
    mask = jnp.asarray(_static_suppress_mask(cfg, opts))
    # Strong EOT logit keeps the separate sum-probability rule (which
    # legitimately bans EOT when timestamps dominate) from triggering.
    logits = (
        jnp.zeros((1, cfg.n_vocab), jnp.float32).at[0, 100].set(5.0)
    )
    cfg_eot = CONFIGS["tiny"].eot
    logits = logits.at[0, cfg_eot].set(10.0)
    sample_begin = 3
    out = _process_logits(
        logits, cfg=cfg, opts=opts, static_mask=mask,
        pos=jnp.asarray(sample_begin + 5, jnp.int32),
        sample_begin=sample_begin,
        last_tok=jnp.asarray([cfg.timestamp_begin + 40], jnp.int32),
        penult_tok=jnp.asarray([100], jnp.int32),  # sampled text
        ts_floor=jnp.asarray([cfg.timestamp_begin + 40], jnp.int32),
    )
    out = np.asarray(out)
    assert out[0, 100] < NEG_INF / 2  # text banned (pair must close)
    assert out[0, cfg.timestamp_begin + 40] > NEG_INF / 2  # equal close ok
    assert out[0, cfg.eot] > NEG_INF / 2  # EOT allowed by the pair rule


@pytest.fixture(scope="module")
def engine():
    e = WhisperEngine()
    e.load_model("random:tiny")
    return e


def test_long_initial_prompt_does_not_crash(engine):
    """Regression: max_tokens was treated as the TOTAL buffer, so a
    prompt near n_text_ctx//2 made (max_len - prefix_len) negative
    (jnp.full crash) or starved generation to ~0 tokens."""
    words = " ".join(f"word{i}" for i in range(400))
    p = TranscribeParams(
        language="en", initial_prompt=words,
        max_tokens=16, temperatures=(0.0,),
    )
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    result = engine.transcribe_samples(audio, p)
    assert isinstance(result.text, str)


def test_prompt_carry_generation_budget_survives(engine):
    """With condition_on_previous_text, later windows must still have a
    real generation budget (not total-minus-prompt ~ 0)."""
    rng = np.random.default_rng(6)
    audio = (rng.standard_normal(16000 * 65) * 0.1).astype(np.float32)
    p = TranscribeParams(
        language="en", max_tokens=24, temperatures=(0.0,),
        condition_on_previous_text=True,
    )
    result = engine.transcribe_samples(audio, p)
    assert isinstance(result.text, str)
