"""NeMo .nemo importer: synthetic archive round-trip + torch numerics.

Builds a real .nemo tar (model_config.yaml + torch model_weights.ckpt with
NeMo tensor names + a hand-encoded SentencePiece ModelProto), loads it
through ParakeetEngine, and checks the prediction-network/joint mapping
against torch's own LSTM/Linear numerics (gate order, bias folding, TDT
joint split). Matches the artifact the reference serves via its int8 ONNX
export (`transcription.rs:278-296`).
"""

import io
import os
import tarfile

import numpy as np
import pytest
import torch

from spittle_tpu.models.parakeet.config import ParakeetConfig
from spittle_tpu.models.parakeet.nemo import (
    config_from_nemo,
    load_nemo,
    params_from_nemo_tensors,
    sentencepiece_pieces,
)

TINY = ParakeetConfig(
    name="tiny-nemo", n_mels=80, d_model=64, n_layers=2, n_heads=4,
    ff_mult=2, conv_kernel=9, subsampling_channels=32, pred_hidden=48,
    joint_hidden=40, vocab_size=64, durations=5,
)


def encode_varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            out += bytes([b7])
            return out


def encode_spm(pieces) -> bytes:
    """Minimal SentencePiece ModelProto: repeated field 1, each with a
    field-1 string piece."""
    blob = b""
    for p in pieces:
        data = p.encode("utf-8")
        inner = bytes([0x0A]) + encode_varint(len(data)) + data
        blob += bytes([0x0A]) + encode_varint(len(inner)) + inner
    return blob


def make_nemo_state(cfg: ParakeetConfig, seed=0):
    """Random torch state_dict with NeMo EncDecRNNT(TDT) names."""
    g = torch.Generator().manual_seed(seed)
    d, ff = cfg.d_model, cfg.d_model * cfg.ff_mult
    ch, k = cfg.subsampling_channels, cfg.conv_kernel
    ph, jh = cfg.pred_hidden, cfg.joint_hidden
    vb = cfg.vocab_size + 1

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    t = {
        "encoder.pre_encode.conv.0.weight": r(ch, 1, 3, 3),
        "encoder.pre_encode.conv.0.bias": r(ch),
        "encoder.pre_encode.conv.2.weight": r(ch, 1, 3, 3),
        "encoder.pre_encode.conv.2.bias": r(ch),
        "encoder.pre_encode.conv.3.weight": r(ch, ch, 1, 1),
        "encoder.pre_encode.conv.3.bias": r(ch),
        "encoder.pre_encode.conv.5.weight": r(ch, 1, 3, 3),
        "encoder.pre_encode.conv.5.bias": r(ch),
        "encoder.pre_encode.conv.6.weight": r(ch, ch, 1, 1),
        "encoder.pre_encode.conv.6.bias": r(ch),
        "encoder.pre_encode.out.weight": r(d, ch * (cfg.n_mels // 8)),
        "encoder.pre_encode.out.bias": r(d),
        "decoder.prediction.embed.weight": r(vb, ph),
        "decoder.prediction.dec_rnn.lstm.weight_ih_l0": r(4 * ph, ph),
        "decoder.prediction.dec_rnn.lstm.weight_hh_l0": r(4 * ph, ph),
        "decoder.prediction.dec_rnn.lstm.bias_ih_l0": r(4 * ph),
        "decoder.prediction.dec_rnn.lstm.bias_hh_l0": r(4 * ph),
        "joint.enc.weight": r(jh, d),
        "joint.enc.bias": r(jh),
        "joint.pred.weight": r(jh, ph),
        "joint.pred.bias": r(jh),
        "joint.joint_net.2.weight": r(vb + cfg.durations, jh),
        "joint.joint_net.2.bias": r(vb + cfg.durations),
    }
    for i in range(cfg.n_layers):
        p = f"encoder.layers.{i}."
        t.update({
            p + "norm_feed_forward1.weight": r(d),
            p + "norm_feed_forward1.bias": r(d),
            p + "feed_forward1.linear1.weight": r(ff, d),
            p + "feed_forward1.linear1.bias": r(ff),
            p + "feed_forward1.linear2.weight": r(d, ff),
            p + "feed_forward1.linear2.bias": r(d),
            p + "norm_self_att.weight": r(d),
            p + "norm_self_att.bias": r(d),
            p + "self_attn.linear_q.weight": r(d, d),
            p + "self_attn.linear_q.bias": r(d),
            p + "self_attn.linear_k.weight": r(d, d),
            p + "self_attn.linear_k.bias": r(d),
            p + "self_attn.linear_v.weight": r(d, d),
            p + "self_attn.linear_v.bias": r(d),
            p + "self_attn.linear_out.weight": r(d, d),
            p + "self_attn.linear_out.bias": r(d),
            p + "self_attn.linear_pos.weight": r(d, d),
            p + "self_attn.pos_bias_u": r(cfg.n_heads, d // cfg.n_heads),
            p + "self_attn.pos_bias_v": r(cfg.n_heads, d // cfg.n_heads),
            p + "norm_conv.weight": r(d),
            p + "norm_conv.bias": r(d),
            p + "conv.pointwise_conv1.weight": r(2 * d, d, 1),
            p + "conv.pointwise_conv1.bias": r(2 * d),
            p + "conv.depthwise_conv.weight": r(d, 1, k),
            p + "conv.depthwise_conv.bias": r(d),
            p + "conv.batch_norm.weight": r(d),
            p + "conv.batch_norm.bias": r(d),
            p + "conv.batch_norm.running_mean": r(d),
            p + "conv.batch_norm.running_var": torch.rand(
                d, generator=g) + 0.5,
            p + "conv.pointwise_conv2.weight": r(d, d, 1),
            p + "conv.pointwise_conv2.bias": r(d),
            p + "norm_feed_forward2.weight": r(d),
            p + "norm_feed_forward2.bias": r(d),
            p + "feed_forward2.linear1.weight": r(ff, d),
            p + "feed_forward2.linear1.bias": r(ff),
            p + "feed_forward2.linear2.weight": r(d, ff),
            p + "feed_forward2.linear2.bias": r(d),
            p + "norm_out.weight": r(d),
            p + "norm_out.bias": r(d),
        })
    return t


def write_nemo(path, state, cfg, pieces):
    import yaml

    buf = io.BytesIO()
    torch.save(state, buf)
    config_yaml = yaml.safe_dump({
        "name": cfg.name,
        "joint": {"durations": list(range(cfg.durations))},
    }).encode()
    spm = encode_spm(pieces)
    with tarfile.open(path, "w:gz") as tar:
        for name, data in (
            ("model_config.yaml", config_yaml),
            ("model_weights.ckpt", buf.getvalue()),
            ("tokenizer.model", spm),
        ):
            info = tarfile.TarInfo("./" + name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))


@pytest.fixture(scope="module")
def nemo_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nemo") / "tiny.nemo")
    state = make_nemo_state(TINY)
    pieces = [f"▁w{i}" for i in range(TINY.vocab_size)]
    write_nemo(path, state, TINY, pieces)
    return path, state


def test_spm_roundtrip():
    pieces = ["▁hello", "wor", "ld", "▁x"]
    assert sentencepiece_pieces(encode_spm(pieces)) == pieces


def test_config_inferred_from_shapes(nemo_file):
    path, state = nemo_file
    cfg, params, pieces = load_nemo(path)
    assert cfg.d_model == TINY.d_model
    assert cfg.n_layers == TINY.n_layers
    assert cfg.n_heads == TINY.n_heads
    assert cfg.n_mels == TINY.n_mels
    assert cfg.pred_hidden == TINY.pred_hidden
    assert cfg.vocab_size == TINY.vocab_size
    assert cfg.durations == TINY.durations
    assert len(pieces) == TINY.vocab_size
    assert params["blocks"]["wq"].shape == (2, 64, 64)


def test_pred_network_matches_torch_lstm(nemo_file):
    """The mapped prediction network reproduces torch's own LSTM:
    gate order i,f,g,o and bias_ih+bias_hh folding."""
    import jax.numpy as jnp

    from spittle_tpu.models.parakeet.model import pred_init_state, pred_step

    path, state = nemo_file
    cfg, params, _ = load_nemo(path)
    params = {k: v for k, v in params.items()}

    lstm = torch.nn.LSTM(cfg.pred_hidden, cfg.pred_hidden, batch_first=True)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(
            state["decoder.prediction.dec_rnn.lstm.weight_ih_l0"])
        lstm.weight_hh_l0.copy_(
            state["decoder.prediction.dec_rnn.lstm.weight_hh_l0"])
        lstm.bias_ih_l0.copy_(
            state["decoder.prediction.dec_rnn.lstm.bias_ih_l0"])
        lstm.bias_hh_l0.copy_(
            state["decoder.prediction.dec_rnn.lstm.bias_hh_l0"])
    emb = state["decoder.prediction.embed.weight"]

    tokens = [3, 17, cfg.vocab_size - 1, 5]
    x = emb[torch.tensor(tokens)][None]  # [1, T, ph]
    with torch.no_grad():
        torch_out, _ = lstm(x)

    jp = {"decoder": {k: jnp.asarray(v) for k, v in params["decoder"].items()}}
    st = pred_init_state(cfg, 1)
    ours = []
    for tok in tokens:
        h, st = pred_step(jp, jnp.asarray([tok]), st, cfg)
        ours.append(np.asarray(h)[0])
    np.testing.assert_allclose(
        np.stack(ours), torch_out[0].numpy(), rtol=1e-5, atol=1e-5
    )


def test_joint_matches_torch(nemo_file):
    """TDT joint split: token logits = first vocab+1 rows, duration logits
    = trailing rows, after the shared ReLU hidden."""
    import jax.numpy as jnp

    from spittle_tpu.models.parakeet.model import joint

    path, state = nemo_file
    cfg, params, _ = load_nemo(path)
    enc_t = np.random.default_rng(1).standard_normal(
        (2, cfg.d_model)).astype(np.float32)
    pred = np.random.default_rng(2).standard_normal(
        (2, cfg.pred_hidden)).astype(np.float32)

    with torch.no_grad():
        h = torch.relu(
            torch.tensor(enc_t) @ state["joint.enc.weight"].T
            + state["joint.enc.bias"]
            + torch.tensor(pred) @ state["joint.pred.weight"].T
            + state["joint.pred.bias"]
        )
        full = h @ state["joint.joint_net.2.weight"].T \
            + state["joint.joint_net.2.bias"]
    jp = {"joint": {k: jnp.asarray(v) for k, v in params["joint"].items()}}
    tok_logits, dur_logits = joint(jp, jnp.asarray(enc_t), jnp.asarray(pred))
    vb = cfg.vocab_size + 1
    np.testing.assert_allclose(
        np.asarray(tok_logits), full[:, :vb].numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dur_logits), full[:, vb:].numpy(), rtol=1e-5, atol=1e-5)


def test_engine_loads_nemo_and_transcribes(nemo_file):
    from spittle_tpu.engine.parakeet_engine import ParakeetEngine

    path, _ = nemo_file
    eng = ParakeetEngine()
    eng.load_model(path)
    assert eng.mode == "tdt"
    assert eng.cfg.vocab_size == TINY.vocab_size
    audio = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    res = eng.transcribe_samples(audio)
    assert isinstance(res.text, str)


def test_multi_layer_lstm_rejected(tmp_path):
    state = make_nemo_state(TINY)
    state["decoder.prediction.dec_rnn.lstm.weight_ih_l1"] = torch.zeros(
        4 * TINY.pred_hidden, TINY.pred_hidden)
    path = str(tmp_path / "bad.nemo")
    write_nemo(path, state, TINY, ["▁a"])
    with pytest.raises(ValueError, match="pred_rnn_layers"):
        load_nemo(path)


def test_non_tdt_checkpoint_rejected(tmp_path):
    state = make_nemo_state(TINY)
    vb = TINY.vocab_size + 1
    state["joint.joint_net.2.weight"] = torch.zeros(vb, TINY.joint_hidden)
    state["joint.joint_net.2.bias"] = torch.zeros(vb)
    path = str(tmp_path / "rnnt.nemo")
    write_nemo(path, state, TINY, ["▁a"])
    with pytest.raises(ValueError, match="not a TDT"):
        load_nemo(path)
