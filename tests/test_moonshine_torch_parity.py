"""Cross-implementation parity: our JAX Moonshine vs HuggingFace's torch
implementation with IDENTICAL weights.

Mirrors tests/test_whisper_torch_parity.py: a randomly-initialized torch
MoonshineForConditionalGeneration's state_dict maps through our HF loader
into the stacked JAX tree; encoder outputs and teacher-forced decoder
logits must agree to float tolerance. This pins down the architecture's
tricky parts — raw-audio conv stem with GroupNorm(1), partial interleaved
rotary (factor 0.9), bias-free projections, SwiGLU decoder MLP, tied
logits — against an independent implementation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from spittle_tpu.models.moonshine.model import (
    MoonshineConfig,
    decoder_forward,
    encode,
    greedy_decode,
)
from spittle_tpu.models.moonshine.weights import (
    config_from_hf_tensors,
    params_from_hf_tensors,
)


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.MoonshineConfig(
        hidden_size=64,
        intermediate_size=128,
        encoder_num_hidden_layers=2,
        decoder_num_hidden_layers=2,
        encoder_num_attention_heads=4,
        decoder_num_attention_heads=4,
        encoder_num_key_value_heads=4,
        decoder_num_key_value_heads=4,
        vocab_size=128,
    )
    torch.manual_seed(0)
    hf_model = transformers.MoonshineForConditionalGeneration(hf_cfg).eval()

    tensors = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    cfg = config_from_hf_tensors(tensors, n_heads=4)
    params = jax.tree.map(jnp.asarray, params_from_hf_tensors(tensors, cfg))
    return cfg, params, hf_model


def test_config_inference(pair):
    cfg, _, _ = pair
    assert cfg.dim == 64
    assert cfg.intermediate == 128
    assert cfg.enc_layers == cfg.dec_layers == 2
    assert cfg.vocab_size == 128
    assert cfg.head_dim == 16
    assert cfg.rotary_dim == 14  # int(16 * 0.9) = 14 (even)


def test_encoder_matches_torch(pair):
    cfg, params, hf_model = pair
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        ref = hf_model.model.encoder(
            torch.from_numpy(audio)
        ).last_hidden_state.numpy()

    ours = np.asarray(encode(params, jnp.asarray(audio), cfg))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_decoder_logits_match_torch(pair):
    cfg, params, hf_model = pair
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    tokens = rng.integers(0, cfg.vocab_size, (2, 7)).astype(np.int64)

    with torch.no_grad():
        out = hf_model(
            input_values=torch.from_numpy(audio),
            decoder_input_ids=torch.from_numpy(tokens),
        )
        ref_logits = out.logits.numpy()

    xa = encode(params, jnp.asarray(audio), cfg)
    ours = np.asarray(
        decoder_forward(params, jnp.asarray(tokens, jnp.int32), xa, cfg)
    )
    assert ours.shape == ref_logits.shape
    np.testing.assert_allclose(ours, ref_logits, atol=5e-4)


def test_greedy_decode_matches_torch_generate(pair):
    cfg, params, hf_model = pair
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    max_new = 10

    with torch.no_grad():
        ref_ids = hf_model.generate(
            input_values=torch.from_numpy(audio),
            max_new_tokens=max_new,
            num_beams=1,
            do_sample=False,
        ).numpy()[0]
    # HF output includes the BOS/decoder_start token at position 0.
    ref_ids = ref_ids[1:]

    xa = encode(params, jnp.asarray(audio), cfg)
    tokens, lengths = greedy_decode(params, xa, cfg, max_tokens=max_new)
    n = int(lengths[0])
    ours = np.asarray(tokens[0])
    # Compare the generated ids up to the shorter of the two (HF stops at
    # eos and includes it; ours pads with eot past `lengths`).
    ref_trim = [int(t) for t in ref_ids if t != cfg.eot][:n]
    assert ours[: len(ref_trim)].tolist() == ref_trim
