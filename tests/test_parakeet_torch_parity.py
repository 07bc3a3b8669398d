"""Cross-implementation parity: our JAX FastConformer encoder vs the torch
Parakeet encoder in transformers with IDENTICAL weights.

Pins down the conformer block's tricky parts — depthwise-separable 8x
subsampling, sqrt(d) input scaling, Transformer-XL relative-position
attention (interleaved sin/cos encoding, shared rel-k projection,
bias_u/bias_v, rel-shift), GLU conv module with eval-mode BatchNorm,
half-scaled feed-forwards — against an independent implementation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from spittle_tpu.models.parakeet.config import ParakeetConfig
from spittle_tpu.models.parakeet.model import encode, init_params
from spittle_tpu.models.parakeet.weights import encoder_params_from_hf_tensors


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.ParakeetEncoderConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        num_mel_bins=80,
        subsampling_conv_channels=32,
        conv_kernel_size=9,
    )
    torch.manual_seed(0)
    hf_model = transformers.ParakeetEncoder(hf_cfg).eval()
    # Randomize BatchNorm running stats so eval-mode normalization is
    # actually exercised (fresh init is mean=0/var=1, a near no-op).
    with torch.no_grad():
        for layer in hf_model.layers:
            layer.conv.norm.running_mean.uniform_(-0.5, 0.5)
            layer.conv.norm.running_var.uniform_(0.5, 2.0)

    cfg = ParakeetConfig(
        name="parity", n_mels=80, d_model=64, n_layers=2, n_heads=4,
        ff_mult=2, conv_kernel=9, subsampling_channels=32,
        pred_hidden=32, joint_hidden=32, vocab_size=64,
    )
    tensors = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    enc_tree = encoder_params_from_hf_tensors(tensors, cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    params["subsampling"] = jax.tree.map(jnp.asarray, enc_tree["subsampling"])
    params["blocks"] = jax.tree.map(jnp.asarray, enc_tree["blocks"])
    return cfg, params, hf_model


def test_encoder_matches_torch(pair):
    cfg, params, hf_model = pair
    rng = np.random.default_rng(0)
    # [B, T, mel] for torch; ours takes [B, mel, T].
    feats = rng.standard_normal((2, 64, 80)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(torch.from_numpy(feats)).last_hidden_state.numpy()

    ours = np.asarray(encode(params, jnp.asarray(feats.transpose(0, 2, 1)), cfg))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_encoder_matches_torch_longer(pair):
    """Different length exercises the rel-shift at another T."""
    cfg, params, hf_model = pair
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((1, 200, 80)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(torch.from_numpy(feats)).last_hidden_state.numpy()

    ours = np.asarray(encode(params, jnp.asarray(feats.transpose(0, 2, 1)), cfg))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4)
