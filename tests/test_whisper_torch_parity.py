"""Cross-implementation parity: our JAX Whisper vs HuggingFace's torch
implementation with IDENTICAL weights.

A randomly-initialized torch WhisperForConditionalGeneration's state_dict
maps through our HF-name loader into the stacked JAX tree; encoder outputs
and teacher-forced decoder logits must then agree to float tolerance. This
validates the architecture (conv stem, pre-LN blocks, attention scaling,
GELU flavor, tied logits) against an independent reference implementation
— the strongest parity evidence available without real checkpoints."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from spittle_tpu.models.whisper.config import WhisperConfig
from spittle_tpu.models.whisper.model import decoder_forward, encode
from spittle_tpu.models.whisper.weights import (
    hf_to_openai_names,
    params_from_openai_tensors,
)


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=51865,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        encoder_ffn_dim=256,
        decoder_ffn_dim=256,
        max_source_positions=60,
        max_target_positions=32,
    )
    torch.manual_seed(0)
    hf_model = transformers.WhisperForConditionalGeneration(hf_cfg).eval()

    cfg = WhisperConfig(
        name="parity", n_mels=80, n_audio_ctx=60, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_vocab=51865, n_text_ctx=32,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    tensors = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    mapped = hf_to_openai_names(tensors)
    params = jax.tree.map(jnp.asarray, params_from_openai_tensors(mapped, cfg))
    return cfg, params, hf_model


def test_encoder_matches_torch(pair):
    cfg, params, hf_model = pair
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 120)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model.model.encoder(
            torch.from_numpy(mel)
        ).last_hidden_state.numpy()

    ours = np.asarray(encode(params, jnp.asarray(mel), cfg))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_decoder_logits_match_torch(pair):
    cfg, params, hf_model = pair
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 80, 120)).astype(np.float32)
    tokens = rng.integers(0, 1000, (2, 8)).astype(np.int64)

    with torch.no_grad():
        out = hf_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        )
        ref_logits = out.logits.numpy()

    xa = encode(params, jnp.asarray(mel), cfg)
    ours = np.asarray(
        decoder_forward(params, jnp.asarray(tokens, jnp.int32), xa, cfg)
    )
    assert ours.shape == ref_logits.shape
    np.testing.assert_allclose(ours, ref_logits, atol=5e-4)
