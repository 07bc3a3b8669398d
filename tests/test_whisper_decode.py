"""Greedy decode loop invariants on a tiny random-weight model, plus
tokenizer round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.models.whisper.config import WhisperConfig
from spittle_tpu.models.whisper.decode import (
    DecodeOptions,
    detect_language,
    greedy_decode,
    sot_sequence,
)
from spittle_tpu.models.whisper.model import encode, init_params
from spittle_tpu.models.whisper.tokenizer import (
    WhisperTokenizer,
    make_test_vocab,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = WhisperConfig(
        name="test",
        n_mels=80,
        n_audio_ctx=60,
        n_audio_state=64,
        n_audio_head=4,
        n_audio_layer=2,
        n_vocab=51865,
        n_text_ctx=32,
        n_text_state=64,
        n_text_head=4,
        n_text_layer=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(7))
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 80, 120)), jnp.float32
    )
    xa = encode(params, mel, cfg)
    return cfg, params, xa


def test_greedy_decode_runs_and_respects_rules(tiny):
    cfg, params, xa = tiny
    opts = DecodeOptions(language="en", timestamps=True, max_tokens=24)
    out = greedy_decode(params, xa, cfg, opts)
    toks = np.asarray(out["tokens"])
    sb = out["sample_begin"]
    # max_tokens is the DECODE BUDGET: buffer = prefix + budget
    assert toks.shape == (2, sb + 24)
    # prefix is [sot, lang, transcribe]
    assert toks[0, 0] == cfg.sot
    assert toks[0, 1] == cfg.lang_begin  # "en"
    assert toks[0, 2] == cfg.transcribe
    gen = toks[:, sb:]
    # Suppressed tokens never sampled.
    for bad in (cfg.sot, cfg.sot_prev, cfg.sot_lm, cfg.no_speech,
                cfg.no_timestamps, cfg.translate, cfg.transcribe):
        assert not (gen == bad).any()
    # Timestamps (if any) are non-decreasing per row before EOT.
    for row in gen:
        ts = [t for t in row if t >= cfg.timestamp_begin]
        assert ts == sorted(ts)
    assert np.isfinite(np.asarray(out["avg_logprob"])).all()
    assert (np.asarray(out["no_speech_prob"]) >= 0).all()


def test_greedy_no_timestamps_mode(tiny):
    cfg, params, xa = tiny
    opts = DecodeOptions(language="en", timestamps=False, max_tokens=20)
    out = greedy_decode(params, xa, cfg, opts)
    toks = np.asarray(out["tokens"])
    assert toks[0, 3] == cfg.no_timestamps  # part of the forced prefix
    gen = toks[:, out["sample_begin"]:]
    assert not (gen >= cfg.timestamp_begin).any()


def test_initial_prompt_prefix(tiny):
    cfg, params, xa = tiny
    opts = DecodeOptions(language="en", timestamps=False, max_tokens=28)
    out = greedy_decode(params, xa, cfg, opts, prompt_tokens=(101, 102, 103))
    toks = np.asarray(out["tokens"])
    assert toks[0, 0] == cfg.sot_prev
    assert list(toks[0, 1:4]) == [101, 102, 103]
    assert toks[0, 4] == cfg.sot


def test_detect_language_distribution(tiny):
    cfg, params, xa = tiny
    probs = np.asarray(detect_language(params, xa, cfg))
    assert probs.shape == (2, cfg.n_langs)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)


def test_sot_sequence_en_only():
    from spittle_tpu.models.whisper.config import CONFIGS

    cfg = CONFIGS["tiny.en"]
    assert sot_sequence(cfg, timestamps=True) == (cfg.sot,)
    assert sot_sequence(cfg, timestamps=False) == (cfg.sot, cfg.no_timestamps)


class TestTokenizer:
    def setup_method(self):
        cfg = WhisperConfig(
            name="t", n_mels=80, n_audio_ctx=60, n_audio_state=64,
            n_audio_head=4, n_audio_layer=2, n_vocab=51865, n_text_ctx=32,
            n_text_state=64, n_text_head=4, n_text_layer=2,
        )
        self.tok = WhisperTokenizer(cfg, make_test_vocab())
        self.cfg = cfg

    def test_roundtrip(self):
        for text in ["hello world", " the theory", "a b c!", "Testing, 1 2 3."]:
            ids = self.tok.encode(text)
            assert self.tok.decode(ids) == text

    def test_merges_apply(self):
        # " the" exists as a merged token in the test vocab
        ids = self.tok.encode(" the")
        assert len(ids) == 1

    def test_unicode_roundtrip(self):
        text = "héllo wörld — ünïcode ☃"
        assert self.tok.decode(self.tok.encode(text)) == text

    def test_special_rendering(self):
        c = self.cfg
        s = self.tok.decode_with_timestamps(
            [c.sot, c.lang_begin, c.transcribe, c.timestamp_begin,
             c.timestamp_begin + 50, c.eot]
        )
        assert "<|startoftranscript|>" in s
        assert "<|en|>" in s
        assert "<|0.00|>" in s
        assert "<|1.00|>" in s

    def test_lang_tokens(self):
        assert self.tok.lang_token("en") == self.cfg.lang_begin
        assert self.tok.lang_token("zh") == self.cfg.lang_begin + 1
        assert self.tok.lang_code(self.cfg.lang_begin + 2) == "de"


def test_non_speech_token_list():
    from spittle_tpu.models.whisper.tokenizer import non_speech_tokens

    cfg = WhisperConfig(
        name="t", n_mels=80, n_audio_ctx=60, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_vocab=51865, n_text_ctx=32,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    tok = WhisperTokenizer(cfg, make_test_vocab())
    ids = non_speech_tokens(tok)
    assert ids == tuple(sorted(ids))
    # single-byte symbols resolve to their byte tokens in the test vocab
    assert tok.vocab[b"#"] in ids
    assert tok.vocab[b"("] in ids


def test_bpe_matches_tiktoken_engine():
    """Our from-scratch BPE must agree with tiktoken's reference
    byte-pair-merge over the same rank table (offline parity check)."""
    import tiktoken

    vocab = make_test_vocab()
    enc = tiktoken.Encoding(
        name="t",
        pat_str=(r"""'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+"""
                 r"""| ?[^\s\w]+|\s+(?!\S)|\s+"""),
        mergeable_ranks=vocab,
        special_tokens={},
    )
    cfg = WhisperConfig(
        name="t", n_mels=80, n_audio_ctx=60, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_vocab=51865, n_text_ctx=32,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    tok = WhisperTokenizer(cfg, vocab)
    for text in [
        "hello world", " the theory of things", "Testing, 1 2 3!",
        "the quick brown fox jumps over this and that",
        "it is what it is for you and for them", "né unicode ☃ test",
    ]:
        assert tok.encode(text) == enc.encode(text), text
