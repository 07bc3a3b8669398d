"""ParakeetForCTC checkpoint support: load a random torch ParakeetForCTC
through the engine (safetensors -> shape-inferred config -> mapped tree)
and match its CTC logits; greedy collapse behavior unit-tested."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
safetensors_numpy = pytest.importorskip("safetensors.numpy")

import jax.numpy as jnp

from spittle_tpu.engine.parakeet_engine import ParakeetEngine
from spittle_tpu.models.parakeet.decode import ctc_greedy_decode, ctc_logits
from spittle_tpu.models.parakeet.model import encode


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("parakeet_ctc")
    enc_cfg = transformers.ParakeetEncoderConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        num_mel_bins=80,
        subsampling_conv_channels=32,
        conv_kernel_size=9,
    )
    cfg = transformers.ParakeetCTCConfig(encoder_config=enc_cfg.to_dict(),
                                         vocab_size=65)
    torch.manual_seed(2)
    hf_model = transformers.ParakeetForCTC(cfg).eval()
    with torch.no_grad():
        for layer in hf_model.encoder.layers:
            layer.conv.norm.running_mean.uniform_(-0.5, 0.5)
            layer.conv.norm.running_var.uniform_(0.5, 2.0)
    tensors = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    safetensors_numpy.save_file(tensors, str(d / "model.safetensors"))
    with open(d / "vocab.txt", "w", encoding="utf-8") as f:
        for i in range(65):
            f.write(f"▁p{i}\n")
    return str(d), hf_model


def test_engine_infers_config_and_matches_logits(checkpoint):
    path, hf_model = checkpoint
    engine = ParakeetEngine()
    engine.load_model(path)
    assert engine.mode == "ctc"
    assert engine.cfg.d_model == 64
    assert engine.cfg.n_heads == 4
    assert engine.cfg.n_mels == 80
    assert engine.cfg.vocab_size == 64  # 65 including blank

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 96, 80)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(torch.from_numpy(feats)).logits.numpy()

    enc = encode(engine.params, jnp.asarray(feats.transpose(0, 2, 1)),
                 engine.cfg)
    ours = np.asarray(ctc_logits(engine.params, enc))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4)

    # Greedy ids agree frame-for-frame with torch generate.
    with torch.no_grad():
        ref_ids = hf_model.generate(
            input_features=torch.from_numpy(feats)
        ).numpy()
    np.testing.assert_array_equal(np.argmax(ours, -1), ref_ids)


def test_ctc_collapse_semantics(checkpoint):
    path, _ = checkpoint
    engine = ParakeetEngine()
    engine.load_model(path)
    # Synthetic logits: sequence b,b,1,1,blank,1,2,2 -> [1, 1, 2]
    blank = engine.cfg.vocab_size
    t = 8
    logits = np.full((1, t, blank + 1), -10.0, np.float32)
    seq = [blank, blank, 1, 1, blank, 1, 2, 2]
    for i, tok in enumerate(seq):
        logits[0, i, tok] = 10.0
    # Route through the same collapse the engine uses.
    enc_fake = {"ctc_w": jnp.eye(blank + 1, dtype=jnp.float32),
                "ctc_b": jnp.zeros(blank + 1, jnp.float32)}
    ids = ctc_greedy_decode(enc_fake, jnp.asarray(logits),
                            np.asarray([t]), blank=blank)
    assert ids == [[1, 1, 2]]


def test_engine_transcribes_ctc(checkpoint):
    path, _ = checkpoint
    engine = ParakeetEngine()
    engine.load_model(path)
    rng = np.random.default_rng(3)
    res = engine.transcribe_samples(
        (rng.standard_normal(16000) * 0.1).astype(np.float32)
    )
    assert isinstance(res.text, str)
