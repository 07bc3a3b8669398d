"""Speculative decoding (models/whisper/speculative.py).

The load-bearing invariant: whatever the draft model proposes, the output
tokens are EXACTLY greedy_decode of the main model — tested with the
main model as its own draft (full acceptance) and with an unrelated
random draft (arbitrary mixed acceptance/rejection, exercising rollback,
uniform-advance, and stale-cache-slot handling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.models.whisper.config import WhisperConfig
from spittle_tpu.models.whisper.decode import DecodeOptions, greedy_decode
from spittle_tpu.models.whisper.model import encode, init_params
from spittle_tpu.models.whisper.speculative import speculative_greedy_decode


def _cfg(name, layers=2, state=64):
    return WhisperConfig(
        name=name, n_mels=80, n_audio_ctx=60, n_audio_state=state,
        n_audio_head=4, n_audio_layer=layers, n_vocab=51865, n_text_ctx=48,
        n_text_state=state, n_text_head=4, n_text_layer=layers,
    )


@pytest.fixture(scope="module")
def models():
    cfg = _cfg("main", layers=2, state=64)
    draft_cfg = _cfg("draft", layers=1, state=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    draft_params = init_params(draft_cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(
            np.float32
        )
    )
    xa = encode(params, mel, cfg)
    draft_xa = encode(draft_params, mel, draft_cfg)
    return cfg, draft_cfg, params, draft_params, xa, draft_xa


@pytest.mark.parametrize("timestamps", [False, True])
def test_self_draft_matches_greedy(models, timestamps):
    cfg, _, params, _, xa, _ = models
    opts = DecodeOptions(timestamps=timestamps, max_tokens=24)
    ref = greedy_decode(params, xa, cfg, opts)
    out = speculative_greedy_decode(
        params, params, xa, xa, cfg, cfg, opts, draft_k=4
    )
    np.testing.assert_array_equal(
        np.asarray(ref["tokens"]), np.asarray(out["tokens"])
    )
    np.testing.assert_array_equal(
        np.asarray(ref["length"]), np.asarray(out["length"])
    )
    # Self-draft means every proposal verifies: few rounds, K tokens each.
    emitted = int(np.asarray(out["accepted_total"]))
    rounds = int(np.asarray(out["rounds"]))
    assert rounds <= -(-emitted // 2)  # strictly better than 1 token/round
    np.testing.assert_allclose(
        np.asarray(ref["avg_logprob"]), np.asarray(out["avg_logprob"]),
        atol=1e-4,
    )


@pytest.mark.parametrize("timestamps", [False, True])
@pytest.mark.parametrize("draft_k", [2, 4])
def test_unrelated_draft_still_matches_greedy(models, timestamps, draft_k):
    cfg, draft_cfg, params, draft_params, xa, draft_xa = models
    opts = DecodeOptions(timestamps=timestamps, max_tokens=24)
    ref = greedy_decode(params, xa, cfg, opts)
    out = speculative_greedy_decode(
        params, draft_params, xa, draft_xa, cfg, draft_cfg, opts,
        draft_k=draft_k,
    )
    np.testing.assert_array_equal(
        np.asarray(ref["tokens"]), np.asarray(out["tokens"])
    )
    np.testing.assert_array_equal(
        np.asarray(ref["length"]), np.asarray(out["length"])
    )
    np.testing.assert_allclose(
        np.asarray(ref["avg_logprob"]), np.asarray(out["avg_logprob"]),
        atol=1e-4,
    )


def test_temperature_rejected(models):
    cfg, draft_cfg, params, draft_params, xa, draft_xa = models
    with pytest.raises(ValueError, match="temperature-0"):
        speculative_greedy_decode(
            params, draft_params, xa, draft_xa, cfg, draft_cfg,
            DecodeOptions(temperature=0.5),
        )


def test_vocab_mismatch_rejected(models):
    cfg, _, params, draft_params, xa, draft_xa = models
    bad_cfg = _cfg("bad", layers=1)
    object.__setattr__(bad_cfg, "n_vocab", 51864)
    with pytest.raises(ValueError, match="token layout"):
        speculative_greedy_decode(
            params, draft_params, xa, draft_xa, cfg, bad_cfg,
            DecodeOptions(),
        )


class TestLayerDroppedSelfDraft:
    """engine.load_self_draft: the draft is the main decoder's layer
    subset sharing the encoder — exact-output invariant plus the
    plumbing (shared xa, no second encode, stride/layer selection)."""

    def _engine(self):
        from spittle_tpu.engine.whisper_engine import WhisperEngine
        from spittle_tpu.models.whisper.config import CONFIGS

        CONFIGS.setdefault(
            "selfdraft-test",
            WhisperConfig(
                name="selfdraft-test", n_mels=80, n_audio_ctx=60,
                n_audio_state=64, n_audio_head=4, n_audio_layer=2,
                n_vocab=51865, n_text_ctx=48, n_text_state=64,
                n_text_head=4, n_text_layer=4,
            ),
        )
        eng = WhisperEngine()
        eng.load_model("random:selfdraft-test")
        return eng

    def test_layer_selection(self):
        eng = self._engine()
        eng.load_self_draft(stride=2)
        # layers {0, 2} + last {3}
        assert eng.draft_cfg.n_text_layer == 3
        assert eng.draft_params["decoder"]["blocks"]["wq"].shape[0] == 3
        # shared encoder + embeddings by reference, not copies
        assert eng.draft_params["encoder"] is eng.params["encoder"]
        assert (
            eng.draft_params["decoder"]["tok_emb"]
            is eng.params["decoder"]["tok_emb"]
        )
        assert eng._self_draft

    def test_exact_output_vs_greedy(self):
        eng = self._engine()
        cfg = eng.cfg
        rng = np.random.default_rng(3)
        mel = jnp.asarray(
            rng.standard_normal(
                (2, cfg.n_mels, cfg.n_audio_ctx * 2)
            ).astype(np.float32)
        )
        xa = encode(eng.params, mel, cfg)
        opts = DecodeOptions(timestamps=True, max_tokens=24)
        ref = greedy_decode(eng.params, xa, cfg, opts)

        eng.load_self_draft(stride=2)
        out = speculative_greedy_decode(
            eng.params, eng.draft_params, xa, xa, cfg, eng.draft_cfg,
            opts, draft_k=4,
        )
        np.testing.assert_array_equal(
            np.asarray(out["tokens"]), np.asarray(ref["tokens"])
        )
        assert int(out["accepted_total"]) >= 0  # reported for benches

    def test_unload_clears_self_draft(self):
        eng = self._engine()
        eng.load_self_draft()
        eng.unload_model()
        assert eng.draft_params is None and not eng._self_draft


@pytest.mark.parametrize("qkv_bits,qcache", [(8, False), (4, True)])
def test_self_draft_matches_greedy_quantized(models, qkv_bits, qcache):
    """The exact-output invariant must survive the serving quantizations:
    greedy and speculative read the SAME int8/int4 cross-KV and int8
    self-cache tensors (per-column quantization is write-path-independent,
    so decode_step and decode_block caches are bit-identical)."""
    cfg, _, params, _, xa, _ = models
    opts = DecodeOptions(
        timestamps=False, max_tokens=24,
        quant_kv=True, quant_kv_bits=qkv_bits, quant_cache=qcache,
    )
    ref = greedy_decode(params, xa, cfg, opts)
    out = speculative_greedy_decode(
        params, params, xa, xa, cfg, cfg, opts, draft_k=4
    )
    np.testing.assert_array_equal(
        np.asarray(ref["tokens"]), np.asarray(out["tokens"])
    )
