"""int4 cross-attention K/V: packing, dequant error, attention parity,
decode integration.

The reference ships q4 GGML Whisper models (whisper.cpp k-quants;
SURVEY.md §2.2 model_catalog q5_0/q4_1 entries); here int4 is a serving
option on the decode hot path — cross-attention K/V packed two values
per byte so large-v3's dominant per-step HBM stream shrinks to a
quarter of bf16 (docs/PERFORMANCE.md bandwidth-wall analysis).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spittle_tpu.ops.quant import (
    dequantize_kv,
    dequantize_kv_int4,
    is_quant_kv4,
    quantize_kv,
    quantize_kv_int4,
    unpack_kv_int4,
)


def test_pack_unpack_roundtrip_exact():
    """The quantized integers survive packing exactly (both nibble
    signs, all 15 levels)."""
    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.standard_normal((3, 2, 64, 10)), jnp.float32)
    q = quantize_kv_int4(kv)
    assert is_quant_kv4(q)
    assert q["qw4"].shape == (3, 2, 32, 10) and q["qw4"].dtype == jnp.int8
    un = np.asarray(unpack_kv_int4(q["qw4"]))
    assert un.shape == (3, 2, 64, 10)

    kv64 = np.asarray(kv, np.float64)
    amax = np.abs(kv64).max(axis=-2)
    scale = np.where(amax > 0, amax / 7.0, 1.0)
    ref = np.clip(np.round(kv64 / scale[..., None, :]), -7, 7)
    np.testing.assert_array_equal(un, ref.astype(np.int8))


def test_every_nibble_value_roundtrips():
    """All 15 levels through both nibble positions, including the
    negative-low/positive-high and sign-bit-of-the-byte combinations."""
    vals = np.arange(-7, 8, dtype=np.float32)  # exact at scale 1.0
    # column t carries value vals[t] in every row; amax 7 -> scale 1
    kv = jnp.asarray(
        np.broadcast_to(vals, (64, 15)).copy() * (7.0 / 7.0)
    )
    kv = kv.at[0, :].set(7.0)  # pin amax so scale == 1 exactly
    q = quantize_kv_int4(kv)
    un = np.asarray(unpack_kv_int4(q["qw4"]), np.int32)
    expect = np.broadcast_to(np.arange(-7, 8), (64, 15)).copy()
    expect[0, :] = 7
    np.testing.assert_array_equal(un, expect)


def test_dequant_error_bounded_by_half_step():
    rng = np.random.default_rng(1)
    kv = jnp.asarray(rng.standard_normal((2, 4, 64, 33)), jnp.float32)
    q = quantize_kv_int4(kv)
    dq = np.asarray(dequantize_kv_int4(q, jnp.float32), np.float64)
    kv64 = np.asarray(kv, np.float64)
    scale = np.abs(kv64).max(axis=-2) / 7.0
    assert (np.abs(dq - kv64) <= scale[..., None, :] / 2 + 1e-6).all()


def test_cross_attention_int4_matches_dequantized_reference():
    """_cross_attention fed int4 dicts must equal the plain path fed the
    dequantized tensors (the quantization error is the ONLY difference)."""
    from spittle_tpu.models.whisper.model import _cross_attention

    rng = np.random.default_rng(2)
    b, h, t, dh = 2, 4, 96, 64
    cq = jnp.asarray(rng.standard_normal((b, h, 1, dh)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((b, h, dh, t)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((b, h, dh, t)), jnp.float32)

    qk, qv = quantize_kv_int4(ck), quantize_kv_int4(cv)
    got = _cross_attention(cq, qk, qv, dh)
    ref = _cross_attention(
        cq,
        dequantize_kv_int4(qk, jnp.float32),
        dequantize_kv_int4(qv, jnp.float32),
        dh,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_cross_attention_int4_beam_fold():
    """Beams fold into the query axis over shared int4 K/V (one K/V per
    item, bq = bc * beams)."""
    from spittle_tpu.models.whisper.model import _cross_attention

    rng = np.random.default_rng(3)
    bc, beams, h, t, dh = 2, 3, 2, 64, 64
    cq = jnp.asarray(rng.standard_normal((bc * beams, h, 1, dh)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((bc, h, dh, t)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((bc, h, dh, t)), jnp.float32)
    qk, qv = quantize_kv_int4(ck), quantize_kv_int4(cv)

    got = _cross_attention(cq, qk, qv, dh)
    ref = _cross_attention(
        cq,
        dequantize_kv_int4(qk, jnp.float32),
        dequantize_kv_int4(qv, jnp.float32),
        dh,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_pad_cross_kv_handles_int4_dicts(monkeypatch):
    from spittle_tpu.ops.attention import pad_cross_kv

    monkeypatch.setenv("SPITTLE_DECODE_CROSS_KERNEL", "1")
    rng = np.random.default_rng(4)
    k = quantize_kv_int4(
        jnp.asarray(rng.standard_normal((2, 1, 2, 64, 100)), jnp.float32)
    )
    v = quantize_kv_int4(
        jnp.asarray(rng.standard_normal((2, 1, 2, 64, 100)), jnp.float32)
    )
    pk, pv = pad_cross_kv((k, v))
    assert pk["qw4"].shape[-1] == 128 and pk["scale"].shape[-1] == 128
    # pad scales are 1.0 (not 0) so downstream masking is the only guard
    assert float(pk["scale"][..., -1].min()) == 1.0
    np.testing.assert_array_equal(
        np.asarray(pv["qw4"][..., :100]), np.asarray(v["qw4"])
    )


def test_q4_kernel_interpret_matches_xla_path():
    """decode_cross_attention_q4 (in-kernel unpack+dequant, interpret
    mode) vs the XLA unpack path on the same int4 dicts."""
    from spittle_tpu.ops.attention import decode_cross_attention_q4

    rng = np.random.default_rng(5)
    b, h, r, dh, t = 2, 3, 2, 64, 128
    q = jnp.asarray(rng.standard_normal((b, h, r, dh)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((b, h, dh, t)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((b, h, dh, t)), jnp.float32)
    qk, qv = quantize_kv_int4(ck), quantize_kv_int4(cv)

    got = decode_cross_attention_q4(
        q, qk["qw4"], qk["scale"], qv["qw4"], qv["scale"],
        kv_len=100, interpret=True,
    )

    # XLA reference: unpacked int8 math with kv_len masking
    k8 = {"qw": unpack_kv_int4(qk["qw4"]), "scale": qk["scale"]}
    v8 = {"qw": unpack_kv_int4(qv["qw4"]), "scale": qv["scale"]}
    s = jnp.einsum(
        "bhqd,bhdk->bhqk", q, k8["qw"].astype(jnp.float32)
    ) * k8["scale"][:, :, None, :]
    s = jnp.where(jnp.arange(t)[None, None, None, :] < 100, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum(
        "bhqk,bhdk->bhqd",
        p * v8["scale"][:, :, None, :],
        v8["qw"].astype(jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-3, rtol=2e-2
    )


@pytest.mark.parametrize("bits", [8, 4])
def test_greedy_decode_quant_kv_bits_runs(bits):
    """End-to-end greedy decode with quantized cross-KV: well-formed
    tokens, and the int8/int4 paths both produce output close to the
    unquantized decode on a tiny model (same argmax on most steps is NOT
    guaranteed with random weights, so assert structure, not equality)."""
    from spittle_tpu.models.whisper.config import CONFIGS
    from spittle_tpu.models.whisper.decode import DecodeOptions, greedy_decode
    from spittle_tpu.models.whisper.model import init_params

    cfg = CONFIGS["tiny"]
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    xa = jax.random.normal(
        jax.random.PRNGKey(1), (1, cfg.n_audio_ctx, cfg.n_audio_state),
        jnp.float32,
    )
    opts = DecodeOptions(
        language="en", timestamps=False, max_tokens=8,
        quant_kv=True, quant_kv_bits=bits,
    )
    out = greedy_decode(params, xa, cfg, opts)
    toks = np.asarray(out["tokens"])
    assert toks.ndim == 2 and toks.shape[0] == 1
    assert (toks >= 0).all() and (toks < cfg.n_vocab).all()


def test_engine_accepts_int4_and_env(monkeypatch):
    from spittle_tpu.engine.whisper_engine import WhisperEngine

    eng = WhisperEngine(quantize_decoder="int4")
    assert eng.quantize_decoder == "int4"
    eng = WhisperEngine(quantize_decoder=True)
    assert eng.quantize_decoder == "int8"
    with pytest.raises(ValueError, match="quantize_decoder"):
        WhisperEngine(quantize_decoder="int2")

    monkeypatch.setenv("SPITTLE_QUANTIZE_DECODER", "int4")
    assert WhisperEngine.from_env().quantize_decoder == "int4"
    monkeypatch.setenv("SPITTLE_QUANTIZE_DECODER", "nope")
    with pytest.raises(ValueError, match="SPITTLE_QUANTIZE_DECODER"):
        WhisperEngine.from_env()
