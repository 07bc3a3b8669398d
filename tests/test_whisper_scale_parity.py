"""Realistic-scale bf16 parity vs torch (VERDICT round-1 item 10).

The toy parity tests (tests/test_whisper_torch_parity.py) run fp32 at
d_model=64; real inference runs the engine's bf16 production cast
(engine/whisper_engine.py:_cast_params_bf16) at d_model 512+ with the
128-mel large-v3 conv stem and the 51866-entry v3 vocab table. bf16
rounding error compounds with depth and width, so this test checks the
realistic regime with relaxed, scale-aware tolerances:

- fp32 at this scale must still match torch tightly (architecture check
  at real width — catches accumulation-order / stem bugs toy dims hide)
- bf16-cast params (layernorms kept fp32, exactly the production rule)
  must track the fp32 torch reference within bf16's expected drift, and
  the decoder's per-position argmax must agree (what greedy decode
  actually consumes).

Reference semantics: whisper.cpp runs GGML q5/f16 weights with f32
accumulation; our analog is bf16 params with f32 layernorms and XLA's
f32 matmul accumulation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from spittle_tpu.engine.whisper_engine import _cast_params_bf16
from spittle_tpu.models.whisper.config import WhisperConfig
from spittle_tpu.models.whisper.model import decoder_forward, encode
from spittle_tpu.models.whisper.weights import (
    hf_to_openai_names,
    params_from_openai_tensors,
)

D_MODEL = 512
HEADS = 8
LAYERS = 4
MELS = 128          # large-v3 frontend width
VOCAB = 51866       # v3 table (v2's 51865 + <|yue|>)
AUDIO_CTX = 192     # 384 mel frames after the stride-2 stem
TEXT_CTX = 48


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=VOCAB,
        num_mel_bins=MELS,
        d_model=D_MODEL,
        encoder_layers=LAYERS,
        encoder_attention_heads=HEADS,
        decoder_layers=LAYERS,
        decoder_attention_heads=HEADS,
        encoder_ffn_dim=4 * D_MODEL,
        decoder_ffn_dim=4 * D_MODEL,
        max_source_positions=AUDIO_CTX,
        max_target_positions=TEXT_CTX,
    )
    torch.manual_seed(7)
    hf_model = transformers.WhisperForConditionalGeneration(hf_cfg).eval()

    cfg = WhisperConfig(
        name="scale-parity", n_mels=MELS, n_audio_ctx=AUDIO_CTX,
        n_audio_state=D_MODEL, n_audio_head=HEADS, n_audio_layer=LAYERS,
        n_vocab=VOCAB, n_text_ctx=TEXT_CTX, n_text_state=D_MODEL,
        n_text_head=HEADS, n_text_layer=LAYERS,
    )
    tensors = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    mapped = hf_to_openai_names(tensors)
    params = jax.tree.map(jnp.asarray, params_from_openai_tensors(mapped, cfg))

    rng = np.random.default_rng(3)
    mel = rng.standard_normal((2, MELS, 2 * AUDIO_CTX)).astype(np.float32)
    tokens = rng.integers(0, 50000, (2, 12)).astype(np.int64)

    with torch.no_grad():
        ref_enc = hf_model.model.encoder(
            torch.from_numpy(mel)
        ).last_hidden_state.numpy()
        ref_logits = hf_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()

    return cfg, params, mel, tokens, ref_enc, ref_logits


def test_fp32_encoder_at_scale(pair):
    cfg, params, mel, _, ref_enc, _ = pair
    ours = np.asarray(encode(params, jnp.asarray(mel), cfg))
    assert ours.shape == ref_enc.shape
    np.testing.assert_allclose(ours, ref_enc, atol=2e-3)


def test_fp32_decoder_logits_at_scale(pair):
    cfg, params, mel, tokens, _, ref_logits = pair
    xa = encode(params, jnp.asarray(mel), cfg)
    ours = np.asarray(
        decoder_forward(params, jnp.asarray(tokens, jnp.int32), xa, cfg)
    )
    np.testing.assert_allclose(ours, ref_logits, atol=5e-3)
    assert (ours.argmax(-1) == ref_logits.argmax(-1)).all()


def test_bf16_production_cast_tracks_torch(pair):
    """The engine's exact bf16 cast at realistic width vs fp32 torch."""
    cfg, params, mel, tokens, ref_enc, ref_logits = pair
    bf16 = _cast_params_bf16(params)

    # Layernorm gains/biases must have survived the cast in fp32 — the
    # production rule the toy tests never exercise at depth.
    flat = jax.tree_util.tree_flatten_with_path(bf16)[0]
    ln_leaves = [l for p, l in flat if "ln" in jax.tree_util.keystr(p)]
    assert ln_leaves and all(l.dtype == jnp.float32 for l in ln_leaves)

    enc = np.asarray(encode(bf16, jnp.asarray(mel), cfg), np.float32)
    # bf16 has ~8 mantissa bits: expect relative drift around 1e-2 after
    # 4 blocks. Gate on normalized mean error, not elementwise atol —
    # individual outliers of O(scale * 2^-8) are expected and harmless.
    scale = np.abs(ref_enc).mean()
    assert np.abs(enc - ref_enc).mean() / scale < 2e-2

    xa = encode(bf16, jnp.asarray(mel), cfg)
    logits = np.asarray(
        decoder_forward(bf16, jnp.asarray(tokens, jnp.int32), xa, cfg),
        np.float32,
    )
    lscale = np.abs(ref_logits).mean()
    assert np.abs(logits - ref_logits).mean() / lscale < 2e-2
    # What greedy decode consumes: per-position argmax agreement.
    agree = (logits.argmax(-1) == ref_logits.argmax(-1)).mean()
    assert agree >= 0.95
