"""Weight-only int8 quantization (ops/quant.py): numerics, tree surgery,
and end-to-end decode agreement through the Whisper stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.models.whisper.config import WhisperConfig
from spittle_tpu.models.whisper.decode import DecodeOptions, greedy_decode
from spittle_tpu.models.whisper.model import (
    decoder_forward,
    encode,
    init_params,
)
from spittle_tpu.ops.quant import (
    dequantize_weight,
    is_quant,
    mm,
    quantize_tree,
    quantize_weight,
    quantize_whisper_decoder,
)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32))
    q = quantize_weight(w)
    assert q["qw"].dtype == jnp.int8
    assert q["scale"].shape == (64,)
    deq = dequantize_weight(q, jnp.float32)
    # Symmetric 8-bit: max error is scale/2 = amax/254 per channel.
    err = np.max(np.abs(np.asarray(deq - w)), axis=0)
    amax = np.max(np.abs(np.asarray(w)), axis=0)
    assert np.all(err <= amax / 254 + 1e-7)


def test_mm_matches_plain_within_quant_error():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32))
    exact = x @ w
    approx = mm(x, quantize_weight(w))
    rel = np.linalg.norm(np.asarray(approx - exact)) / np.linalg.norm(
        np.asarray(exact)
    )
    assert rel < 1.5e-2
    # plain path is a passthrough
    np.testing.assert_array_equal(np.asarray(mm(x, w)), np.asarray(exact))


def test_quantize_tree_stacked_layers():
    rng = np.random.default_rng(2)
    tree = {
        "wq": jnp.asarray(rng.standard_normal((3, 16, 8)).astype(np.float32)),
        "bq": jnp.zeros((3, 8)),
        "other": jnp.ones((3, 4)),
    }
    out = quantize_tree(tree, ("wq",))
    assert is_quant(out["wq"])
    assert out["wq"]["qw"].shape == (3, 16, 8)
    assert out["wq"]["scale"].shape == (3, 8)  # per-layer, per-channel
    assert not is_quant(out["bq"]) and not is_quant(out["other"])


@pytest.fixture(scope="module")
def tiny():
    cfg = WhisperConfig(
        name="test", n_mels=80, n_audio_ctx=60, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_vocab=51865, n_text_ctx=24,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_whisper_decoder_quant_logits_close(tiny):
    cfg, params = tiny
    qparams = quantize_whisper_decoder(params)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(
        rng.standard_normal((1, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(
            np.float32
        )
    )
    xa = encode(params, mel, cfg)
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, 6)), jnp.int32)
    ref = np.asarray(decoder_forward(params, tokens, xa, cfg))
    got = np.asarray(decoder_forward(qparams, tokens, xa, cfg))
    # int8 weights perturb logits slightly; ranking of the top tokens
    # must be stable on this random model.
    assert np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9) < 0.05
    assert np.argmax(got[0, -1]) == np.argmax(ref[0, -1])


def test_quantize_kv_roundtrip():
    from spittle_tpu.ops.quant import dequantize_kv, quantize_kv

    rng = np.random.default_rng(5)
    # decode layout [..., Dh, T]: one scale per (..., T) key/value vector
    kv = jnp.asarray(rng.standard_normal((2, 1, 4, 16, 10)).astype(np.float32))
    q = quantize_kv(kv)
    assert q["qw"].shape == kv.shape
    assert q["scale"].shape == kv.shape[:-2] + kv.shape[-1:]
    deq = np.asarray(dequantize_kv(q, jnp.float32))
    assert np.max(np.abs(deq - np.asarray(kv))) < np.max(np.abs(np.asarray(kv))) / 100


def test_whisper_greedy_quant_kv_matches_plain(tiny):
    """int8 cross-KV decode must produce the same tokens as bf16 on a
    random model (the perturbation is far below argmax margins here)."""
    import dataclasses

    cfg, params = tiny
    rng = np.random.default_rng(6)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(
            np.float32
        )
    )
    xa = encode(params, mel, cfg)
    opts = DecodeOptions(timestamps=False, max_tokens=8)
    ref = greedy_decode(params, xa, cfg, opts)
    got = greedy_decode(
        params, xa, cfg, dataclasses.replace(opts, quant_kv=True)
    )
    np.testing.assert_array_equal(
        np.asarray(ref["tokens"]), np.asarray(got["tokens"])
    )


def test_whisper_beam_quant_kv_matches_plain(tiny):
    import dataclasses

    from spittle_tpu.models.whisper.beam import beam_decode

    cfg, params = tiny
    rng = np.random.default_rng(8)
    mel = jnp.asarray(
        rng.standard_normal((1, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(
            np.float32
        )
    )
    xa = encode(params, mel, cfg)
    opts = DecodeOptions(timestamps=False, max_tokens=8)
    ref = beam_decode(params, xa, cfg, opts, beam_size=2)
    got = beam_decode(
        params, xa, cfg, dataclasses.replace(opts, quant_kv=True), beam_size=2
    )
    np.testing.assert_array_equal(
        np.asarray(ref["tokens"]), np.asarray(got["tokens"])
    )


def test_whisper_greedy_decode_runs_quantized(tiny):
    cfg, params = tiny
    qparams = quantize_whisper_decoder(params)
    rng = np.random.default_rng(4)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(
            np.float32
        )
    )
    xa = encode(qparams, mel, cfg)
    opts = DecodeOptions(timestamps=False, max_tokens=8)
    out = greedy_decode(qparams, xa, cfg, opts)
    toks = np.asarray(out["tokens"])
    assert toks.shape[0] == 2
    # encoder untouched by decoder quantization
    np.testing.assert_array_equal(
        np.asarray(encode(params, mel, cfg)), np.asarray(xa)
    )


def test_whisper_greedy_quant_kv_padded_matches_unpadded(tiny, monkeypatch):
    """With the decode-cross kernel flag on, quantized cross-KV is
    tile-padded (pad_cross_kv on quant dicts) and the XLA fallback masks
    the pad with kv_len — tokens must not change. (On CPU the Pallas
    kernel never dispatches; this exercises the padded-quant XLA path.)"""
    import dataclasses

    cfg, params = tiny
    rng = np.random.default_rng(7)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(
            np.float32
        )
    )
    xa = encode(params, mel, cfg)
    opts = DecodeOptions(timestamps=False, max_tokens=8, quant_kv=True)
    ref = greedy_decode(params, xa, cfg, opts)
    monkeypatch.setenv("SPITTLE_DECODE_CROSS_KERNEL", "1")
    got = greedy_decode(params, xa, cfg, opts)
    np.testing.assert_array_equal(
        np.asarray(ref["tokens"]), np.asarray(got["tokens"])
    )


# ---------------------------------------------------------------------------
# W8A8 (int8 MXU compute path) — encoder quantization
# ---------------------------------------------------------------------------


def test_mm_w8a8_matches_plain_within_quant_error():
    from spittle_tpu.ops.quant import is_quant_w8a8, quantize_weight_w8a8

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((6, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32))
    q = quantize_weight_w8a8(w)
    assert is_quant_w8a8(q) and not is_quant(q)
    assert q["qw8"].dtype == jnp.int8
    exact = np.asarray(x @ w)
    approx = np.asarray(mm(x, q))
    rel = np.linalg.norm(approx - exact) / np.linalg.norm(exact)
    # both operands carry int8 rounding; budget ~2x the weight-only error
    assert rel < 3e-2


def test_mm_w8a8_batched_3d_activations():
    from spittle_tpu.ops.quant import quantize_weight_w8a8

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 5, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))
    got = np.asarray(mm(x, quantize_weight_w8a8(w)))
    ref = np.asarray(x @ w)
    assert got.shape == ref.shape
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 3e-2


def test_mm_w8a8_zero_rows_finite():
    """All-zero activation rows must not divide by zero."""
    from spittle_tpu.ops.quant import quantize_weight_w8a8

    x = jnp.zeros((3, 16), jnp.float32)
    w = jnp.asarray(
        np.random.default_rng(9).standard_normal((16, 8)).astype(np.float32)
    )
    out = np.asarray(mm(x, quantize_weight_w8a8(w)))
    assert np.all(out == 0)


def test_quantize_tree_w8a8_stacked_layers():
    from spittle_tpu.ops.quant import is_quant_w8a8

    rng = np.random.default_rng(10)
    tree = {
        "fc1_w": jnp.asarray(
            rng.standard_normal((3, 16, 8)).astype(np.float32)
        ),
        "bq": jnp.zeros((3, 8)),
    }
    out = quantize_tree(tree, ("fc1_w",), mode="w8a8")
    assert is_quant_w8a8(out["fc1_w"])
    assert out["fc1_w"]["qw8"].shape == (3, 16, 8)
    assert out["fc1_w"]["scale"].shape == (3, 8)


def test_whisper_encoder_w8a8_output_close(tiny):
    from spittle_tpu.ops.quant import quantize_whisper_encoder_w8a8

    cfg, params = tiny
    qparams = quantize_whisper_encoder_w8a8(params)
    rng = np.random.default_rng(11)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(
            np.float32
        )
    )
    ref = np.asarray(encode(params, mel, cfg))
    got = np.asarray(encode(qparams, mel, cfg))
    assert got.shape == ref.shape
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 5e-2


def test_whisper_greedy_encoder_w8a8_runs(tiny):
    """End-to-end: greedy decode over a W8A8 encoder produces valid tokens
    (sequence content may legitimately differ from bf16 on a random model;
    the decode itself must run and terminate)."""
    from spittle_tpu.ops.quant import quantize_whisper_encoder_w8a8

    cfg, params = tiny
    qparams = quantize_whisper_encoder_w8a8(params)
    rng = np.random.default_rng(12)
    mel = jnp.asarray(
        rng.standard_normal((1, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(
            np.float32
        )
    )
    xa = encode(qparams, mel, cfg)
    out = greedy_decode(
        qparams, xa, cfg, DecodeOptions(max_tokens=8, language="en")
    )
    toks = np.asarray(out["tokens"])
    assert toks.shape[0] == 1
    assert np.all((toks >= 0) & (toks < cfg.n_vocab))


def test_fused_cross_kv_q8_byte_identical(tiny):
    """precompute_cross_kv_q8 (per-layer fused projection+quantization,
    the batch-frontier memory fix) must emit byte-equal int8 tensors vs
    the two-step quantize_kv(precompute_cross_kv(...)) path it replaces
    in the greedy/beam decode. Scales agree to float ULP (XLA fuses the
    per-layer amax/divide differently inside the scan — measured
    last-bit-only differences, same class as any program-structure
    rewrite)."""
    from spittle_tpu.models.whisper.model import (
        precompute_cross_kv,
        precompute_cross_kv_q8,
    )
    from spittle_tpu.ops.quant import quantize_kv

    cfg, params = tiny
    rng = np.random.default_rng(7)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(
            np.float32
        )
    )
    xa = encode(params, mel, cfg)
    k2, v2 = precompute_cross_kv(params, xa, cfg)
    ref = (quantize_kv(k2), quantize_kv(v2))
    got = precompute_cross_kv_q8(params, xa, cfg)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r["qw"]), np.asarray(g["qw"]))
        np.testing.assert_allclose(
            np.asarray(r["scale"]), np.asarray(g["scale"]), rtol=1e-6
        )
