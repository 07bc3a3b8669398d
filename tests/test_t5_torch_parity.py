"""JAX T5 vs HuggingFace torch with identical random weights.

Same playbook as tests/test_whisper_torch_parity.py: instantiate a
randomly-initialized torch T5ForConditionalGeneration (flan/v1.1 flavor:
gated-gelu, untied lm_head), map its state_dict through our HF-name
loader, and require encoder states / teacher-forced logits / greedy
generations to agree. Validates RMSNorm, the unscaled-attention
convention, relative-position bucketing (bidirectional + causal), the
gated FF, and the incremental KV-cache decode path the cleanup provider
uses (cleanup.rs:243-295 analog).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from spittle_tpu.models.t5 import (
    T5Config,
    greedy_generate,
    params_from_hf_tensors,
    t5_decoder_forward,
    t5_encode,
)

CFG = T5Config(
    vocab_size=512, d_model=64, d_kv=16, d_ff=128, num_layers=3,
    num_heads=4,
)


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.T5Config(
        vocab_size=CFG.vocab_size, d_model=CFG.d_model, d_kv=CFG.d_kv,
        d_ff=CFG.d_ff, num_layers=CFG.num_layers, num_heads=CFG.num_heads,
        relative_attention_num_buckets=CFG.rel_buckets,
        relative_attention_max_distance=CFG.rel_max_distance,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()
    tensors = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_tensors(tensors, CFG)
    return params, hf


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    tokens = rng.integers(2, CFG.vocab_size, (2, 11)).astype(np.int64)
    tokens[1, 8:] = CFG.pad_id  # ragged batch exercises the mask
    mask = (tokens != CFG.pad_id).astype(np.int64)
    return tokens, mask


def test_encoder_matches_torch(pair, inputs):
    params, hf = pair
    tokens, mask = inputs
    with torch.no_grad():
        ref = hf.encoder(
            input_ids=torch.from_numpy(tokens),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    ours = np.asarray(
        t5_encode(params, jnp.asarray(tokens, jnp.int32),
                  jnp.asarray(mask, bool), CFG)
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_decoder_logits_match_torch(pair, inputs):
    params, hf = pair
    tokens, mask = inputs
    rng = np.random.default_rng(1)
    dec_tokens = rng.integers(2, CFG.vocab_size, (2, 7)).astype(np.int64)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(tokens),
            attention_mask=torch.from_numpy(mask),
            decoder_input_ids=torch.from_numpy(dec_tokens),
        ).logits.numpy()
    enc = t5_encode(params, jnp.asarray(tokens, jnp.int32),
                    jnp.asarray(mask, bool), CFG)
    ours = np.asarray(
        t5_decoder_forward(params, jnp.asarray(dec_tokens, jnp.int32), enc,
                           jnp.asarray(mask, bool), CFG)
    )
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_greedy_generate_matches_hf(pair, inputs):
    """Incremental KV-cache decode vs hf.generate, token for token."""
    params, hf = pair
    tokens, mask = inputs
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.from_numpy(tokens),
            attention_mask=torch.from_numpy(mask),
            max_new_tokens=16, do_sample=False, num_beams=1,
        ).numpy()
    ours = greedy_generate(params, tokens, CFG, max_tokens=16)
    # hf.generate prepends decoder_start (pad); rows pad after EOS
    for b in range(tokens.shape[0]):
        want = list(ref[b][1:])
        got = list(ours[b])
        # trim both at first EOS (inclusive)
        def upto_eos(seq):
            out = []
            for x in seq:
                out.append(int(x))
                if x == CFG.eos_id:
                    break
            return out

        assert upto_eos(got) == upto_eos(want)
