"""SenseVoice FunASR-structure verification.

Builds a FunASR-named SenseVoiceSmall state_dict (tiny dims), runs an
INDEPENDENT torch implementation of the published FunASR equations
(fused q/k/v, FSMN memory with residual added after linear_out, layer-0
560->512 without attention residual, sqrt(d) input scale + 1-based
sinusoidal positions, after_norm -> tp blocks -> tp_norm -> CTC), and
checks our JAX encode reproduces its logits with the mapped weights.
Matches `transcription.rs:321-339` (transcribe-rs SenseVoice int8 ONNX of
the same graph).
"""

import math
import os

import numpy as np
import pytest
import torch

from spittle_tpu.models.sensevoice.model import (
    SenseVoiceConfig,
    encode,
    lfr_stack,
    parse_kaldi_cmvn,
    prompt_ids_for,
    sinusoidal_positions,
)
from spittle_tpu.models.sensevoice.weights import (
    config_from_funasr_tensors,
    params_from_funasr_tensors,
)

TINY = SenseVoiceConfig(
    name="tiny-funasr", n_mels=8, lfr_m=7, lfr_n=6, d_model=32, n_heads=4,
    ff_dim=48, n_blocks=3, tp_blocks=2, fsmn_kernel=11, vocab_size=40,
)


def make_funasr_state(cfg: SenseVoiceConfig, seed=0):
    g = torch.Generator().manual_seed(seed)
    d, ff, k, in_dim = cfg.d_model, cfg.ff_dim, cfg.fsmn_kernel, cfg.input_dim

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    def layer(prefix, in_size):
        return {
            prefix + "norm1.weight": r(in_size),
            prefix + "norm1.bias": r(in_size),
            prefix + "self_attn.linear_q_k_v.weight": r(3 * d, in_size),
            prefix + "self_attn.linear_q_k_v.bias": r(3 * d),
            prefix + "self_attn.fsmn_block.weight": r(d, 1, k),
            prefix + "self_attn.linear_out.weight": r(d, d),
            prefix + "self_attn.linear_out.bias": r(d),
            prefix + "norm2.weight": r(d),
            prefix + "norm2.bias": r(d),
            prefix + "feed_forward.w_1.weight": r(ff, d),
            prefix + "feed_forward.w_1.bias": r(ff),
            prefix + "feed_forward.w_2.weight": r(d, ff),
            prefix + "feed_forward.w_2.bias": r(d),
        }

    t = {"embed.weight": r(16, in_dim)}
    t.update(layer("encoder.encoders0.0.", in_dim))
    for i in range(cfg.n_blocks - 1):
        t.update(layer(f"encoder.encoders.{i}.", d))
    for i in range(cfg.tp_blocks):
        t.update(layer(f"encoder.tp_encoders.{i}.", d))
    t.update({
        "encoder.after_norm.weight": r(d),
        "encoder.after_norm.bias": r(d),
        "encoder.tp_norm.weight": r(d),
        "encoder.tp_norm.bias": r(d),
        "ctc.ctc_lo.weight": r(cfg.vocab_size, d),
        "ctc.ctc_lo.bias": r(cfg.vocab_size),
    })
    return t


def torch_sanm_layer(x, t, prefix, cfg, residual_attn):
    """Independent FunASR EncoderLayerSANM mirror (public equations)."""
    d, h = cfg.d_model, cfg.n_heads
    dh = d // h
    k = cfg.fsmn_kernel
    res = x
    xn = torch.nn.functional.layer_norm(
        x, (x.shape[-1],), t[prefix + "norm1.weight"],
        t[prefix + "norm1.bias"])
    qkv = xn @ t[prefix + "self_attn.linear_q_k_v.weight"].T \
        + t[prefix + "self_attn.linear_q_k_v.bias"]
    q, kk, v = torch.split(qkv, d, dim=-1)
    b, tt, _ = q.shape
    qh = q.view(b, tt, h, dh).transpose(1, 2) * dh ** -0.5
    kh = kk.view(b, tt, h, dh).transpose(1, 2)
    vh = v.view(b, tt, h, dh).transpose(1, 2)
    att = torch.softmax(qh @ kh.transpose(-2, -1), dim=-1) @ vh
    att = att.transpose(1, 2).reshape(b, tt, d)
    att = att @ t[prefix + "self_attn.linear_out.weight"].T \
        + t[prefix + "self_attn.linear_out.bias"]
    pad_l = (k - 1) // 2
    vp = torch.nn.functional.pad(
        v.transpose(1, 2), (pad_l, k - 1 - pad_l))
    mem = torch.nn.functional.conv1d(
        vp, t[prefix + "self_attn.fsmn_block.weight"], groups=d
    ).transpose(1, 2) + v
    x = att + mem
    if residual_attn:
        x = x + res
    res = x
    xn = torch.nn.functional.layer_norm(
        x, (d,), t[prefix + "norm2.weight"], t[prefix + "norm2.bias"])
    ff = torch.relu(
        xn @ t[prefix + "feed_forward.w_1.weight"].T
        + t[prefix + "feed_forward.w_1.bias"]
    ) @ t[prefix + "feed_forward.w_2.weight"].T \
        + t[prefix + "feed_forward.w_2.bias"]
    return ff + res


def torch_forward(feats, prompt_ids, t, cfg):
    x = torch.cat(
        [t["embed.weight"][torch.tensor(prompt_ids)][None].repeat(
            feats.shape[0], 1, 1), feats], dim=1)
    x = x * math.sqrt(cfg.d_model)
    pe = torch.tensor(
        sinusoidal_positions(x.shape[1], cfg.input_dim), dtype=x.dtype)
    x = x + pe[None]
    x = torch_sanm_layer(x, t, "encoder.encoders0.0.", cfg, False)
    for i in range(cfg.n_blocks - 1):
        x = torch_sanm_layer(x, t, f"encoder.encoders.{i}.", cfg, True)
    x = torch.nn.functional.layer_norm(
        x, (cfg.d_model,), t["encoder.after_norm.weight"],
        t["encoder.after_norm.bias"])
    for i in range(cfg.tp_blocks):
        x = torch_sanm_layer(x, t, f"encoder.tp_encoders.{i}.", cfg, True)
    x = torch.nn.functional.layer_norm(
        x, (cfg.d_model,), t["encoder.tp_norm.weight"],
        t["encoder.tp_norm.bias"])
    return x @ t["ctc.ctc_lo.weight"].T + t["ctc.ctc_lo.bias"]


@pytest.fixture(scope="module")
def state():
    return make_funasr_state(TINY)


def test_config_inferred(state):
    np_state = {k: v.numpy() for k, v in state.items()}
    cfg = config_from_funasr_tensors(np_state)
    assert cfg.d_model == TINY.d_model
    assert cfg.n_blocks == TINY.n_blocks
    assert cfg.tp_blocks == TINY.tp_blocks
    assert cfg.ff_dim == TINY.ff_dim
    assert cfg.vocab_size == TINY.vocab_size
    assert cfg.n_mels == TINY.n_mels


def test_logits_match_torch_mirror(state):
    import jax

    np_state = {k: v.numpy() for k, v in state.items()}
    cfg = config_from_funasr_tensors(np_state)
    params = jax.tree.map(
        lambda a: a, params_from_funasr_tensors(np_state, cfg)
    )
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 9, cfg.input_dim)).astype(np.float32)
    pids = prompt_ids_for(cfg, "en", use_itn=True)

    with torch.no_grad():
        ref = torch_forward(
            torch.tensor(feats), pids.tolist(), state, cfg
        ).numpy()
    ours = np.asarray(
        encode(params, feats, np.tile(pids, (2, 1)), cfg)
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_cmvn_parse_and_apply(tmp_path, state):
    import jax

    mvn = tmp_path / "am.mvn"
    dim = TINY.input_dim
    shift = np.linspace(-1, 1, dim)
    scale = np.linspace(0.5, 1.5, dim)
    mvn.write_text(
        "<Nnet>\n<Splice> {d} {d}\n[ 0 ]\n<AddShift> {d} {d}\n"
        "<LearnRateCoef> 0 [ {s} ]\n<Rescale> {d} {d}\n"
        "<LearnRateCoef> 0 [ {r} ]\n</Nnet>\n".format(
            d=dim,
            s=" ".join(f"{v:.6f}" for v in shift),
            r=" ".join(f"{v:.6f}" for v in scale),
        )
    )
    cmvn = parse_kaldi_cmvn(str(mvn))
    # first bracketed vector is the splice [ 0 ]; AddShift/Rescale follow
    assert cmvn is not None
    np_state = {k: v.numpy() for k, v in state.items()}
    cfg = config_from_funasr_tensors(np_state)
    params = params_from_funasr_tensors(np_state, cfg)
    params.update(
        {"cmvn_shift": shift.astype(np.float32),
         "cmvn_scale": scale.astype(np.float32)}
    )
    feats = np.random.default_rng(1).standard_normal(
        (1, 6, dim)).astype(np.float32)
    pids = np.tile(prompt_ids_for(cfg), (1, 1))
    with_cmvn = np.asarray(encode(params, feats, pids, cfg))
    manual = (feats + shift[None, None]) * scale[None, None]
    params2 = {k: v for k, v in params.items()
               if not k.startswith("cmvn")}
    direct = np.asarray(
        encode(params2, manual.astype(np.float32), pids, cfg)
    )
    np.testing.assert_allclose(with_cmvn, direct, rtol=1e-4, atol=1e-4)


def test_engine_loads_funasr_dir(tmp_path, state):
    from spittle_tpu.engine.sensevoice_engine import SenseVoiceEngine

    d = tmp_path / "sv"
    d.mkdir()
    torch.save(state, str(d / "model.pt"))
    with open(d / "vocab.txt", "w") as f:
        for i in range(TINY.vocab_size):
            f.write(f"▁w{i}\n")
    eng = SenseVoiceEngine()
    eng.load_model(str(d))
    assert eng.cfg.d_model == TINY.d_model
    audio = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    res = eng.transcribe_samples(audio)
    assert isinstance(res.text, str)
