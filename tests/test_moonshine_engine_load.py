"""MoonshineEngine real-checkpoint load path: a randomly-initialized HF
MoonshineForConditionalGeneration written to model.safetensors + vocab is
loaded through the engine and transcribes end-to-end, with its decoder
logits matching the torch model (the full file->config->params->decode
chain, not just the tensor mapper)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
safetensors_numpy = pytest.importorskip("safetensors.numpy")

import jax.numpy as jnp

from spittle_tpu.engine.moonshine_engine import MoonshineEngine
from spittle_tpu.models.moonshine.model import decoder_forward, encode


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("moonshine_ckpt")
    hf_cfg = transformers.MoonshineConfig(
        hidden_size=64,
        intermediate_size=128,
        encoder_num_hidden_layers=2,
        decoder_num_hidden_layers=2,
        encoder_num_attention_heads=8,
        decoder_num_attention_heads=8,
        encoder_num_key_value_heads=8,
        decoder_num_key_value_heads=8,
        vocab_size=128,
    )
    torch.manual_seed(1)
    hf_model = transformers.MoonshineForConditionalGeneration(hf_cfg).eval()
    tensors = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    safetensors_numpy.save_file(tensors, str(d / "model.safetensors"))
    with open(d / "vocab.txt", "w", encoding="utf-8") as f:
        for i in range(128):
            f.write(f"▁piece{i}\n")
    return str(d), hf_model


def test_engine_loads_and_matches_torch(checkpoint):
    path, hf_model = checkpoint
    engine = MoonshineEngine()
    engine.load_model(path)
    assert engine.is_loaded
    assert engine.cfg.dim == 64 and engine.cfg.vocab_size == 128

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    tokens = rng.integers(0, 128, (1, 5)).astype(np.int64)

    with torch.no_grad():
        ref = hf_model(
            input_values=torch.from_numpy(audio),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()

    xa = encode(engine.params, jnp.asarray(audio), engine.cfg)
    ours = np.asarray(
        decoder_forward(engine.params, jnp.asarray(tokens, jnp.int32), xa,
                        engine.cfg)
    )
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_engine_transcribes_from_checkpoint(checkpoint):
    path, _ = checkpoint
    engine = MoonshineEngine()
    engine.load_model(path)
    rng = np.random.default_rng(1)
    res = engine.transcribe_samples(
        (rng.standard_normal(16000) * 0.1).astype(np.float32)
    )
    assert res.language == "en"
    assert isinstance(res.text, str)
