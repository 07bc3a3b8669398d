"""W8A8 cross-attention: true-int8 MXU dots on the decode hot path.

The weight-only int8 cross-KV path measured speed-NEUTRAL on the
benchmark chip because XLA materializes the int8->bf16 convert of the
whole K/V tensor (BENCHMARKS.md, large-v3 table). The w8a8 path removes
the convert from the graph entirely: queries and the prob*V-scale rows
are dynamically quantized per (b, h, q) and BOTH attention dots run
int8xint8->int32 on the MXU, so the K/V HBM stream stays int8
end-to-end. Mirrors the reference's reliance on whisper.cpp's quantized
GGML kernels (SURVEY.md §2.2), rebuilt as a TPU-serving option.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spittle_tpu.ops.quant import (
    dequantize_kv,
    is_quant_w8a8,
    quantize_kv_w8a8,
)


def _dequant(q):
    return dequantize_kv(q, jnp.float32)


def test_quantize_kv_w8a8_shape_and_tag():
    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.standard_normal((3, 2, 64, 10)), jnp.float32)
    q = quantize_kv_w8a8(kv)
    assert is_quant_w8a8(q)
    assert q["qw8"].shape == kv.shape and q["qw8"].dtype == jnp.int8
    assert q["scale"].shape == (3, 2, 10)
    # Same numbers as the weight-only int8 form, different tag.
    dq = np.asarray(_dequant(q))
    err = np.abs(dq - np.asarray(kv))
    halfstep = np.asarray(q["scale"])[..., None, :] / 2 + 1e-6
    assert (err <= halfstep).all()


def test_cross_attention_w8a8_close_to_dequantized_reference():
    """The w8a8 path's extra error over the dequantized-int8 reference is
    only the 8-bit rounding of query and probability rows — bounded well
    below the decode's logit margins."""
    from spittle_tpu.models.whisper.model import _cross_attention

    rng = np.random.default_rng(2)
    b, h, t, dh = 2, 4, 96, 64
    cq = jnp.asarray(rng.standard_normal((b, h, 1, dh)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((b, h, dh, t)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((b, h, dh, t)), jnp.float32)

    qk, qv = quantize_kv_w8a8(ck), quantize_kv_w8a8(cv)
    got = _cross_attention(cq, qk, qv, dh)
    ref = _cross_attention(cq, _dequant(qk), _dequant(qv), dh)
    # Output rows are O(1); 8-bit row quantization contributes ~1/254
    # relative per dot, twice.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-2, rtol=5e-2
    )


def test_cross_attention_w8a8_kv_len_masking():
    """Tile-padded K/V with kv_len must ignore the pad positions."""
    from spittle_tpu.models.whisper.model import _cross_attention

    rng = np.random.default_rng(3)
    b, h, t, dh, pad_t = 1, 2, 100, 64, 128
    cq = jnp.asarray(rng.standard_normal((b, h, 1, dh)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((b, h, dh, t)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((b, h, dh, t)), jnp.float32)
    qk, qv = quantize_kv_w8a8(ck), quantize_kv_w8a8(cv)

    def padq(q):
        qw = jnp.pad(q["qw8"], [(0, 0)] * 3 + [(0, pad_t - t)],
                     constant_values=77)  # junk the pad to prove masking
        sc = jnp.pad(q["scale"], [(0, 0)] * 2 + [(0, pad_t - t)],
                     constant_values=1.0)
        return {"qw8": qw, "scale": sc}

    got = _cross_attention(cq, padq(qk), padq(qv), dh, kv_len=t)
    ref = _cross_attention(cq, qk, qv, dh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_cross_attention_w8a8_beam_fold():
    from spittle_tpu.models.whisper.model import _cross_attention

    rng = np.random.default_rng(4)
    bc, beams, h, t, dh = 2, 3, 2, 64, 64
    cq = jnp.asarray(
        rng.standard_normal((bc * beams, h, 1, dh)), jnp.float32
    )
    ck = jnp.asarray(rng.standard_normal((bc, h, dh, t)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((bc, h, dh, t)), jnp.float32)
    qk, qv = quantize_kv_w8a8(ck), quantize_kv_w8a8(cv)

    got = _cross_attention(cq, qk, qv, dh)
    ref = _cross_attention(cq, _dequant(qk), _dequant(qv), dh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-2, rtol=5e-2
    )


def test_pad_cross_kv_handles_w8a8_dicts(monkeypatch):
    from spittle_tpu.ops.attention import pad_cross_kv

    monkeypatch.setenv("SPITTLE_DECODE_CROSS_KERNEL", "1")
    rng = np.random.default_rng(5)
    k = quantize_kv_w8a8(
        jnp.asarray(rng.standard_normal((2, 1, 2, 64, 100)), jnp.float32)
    )
    v = quantize_kv_w8a8(
        jnp.asarray(rng.standard_normal((2, 1, 2, 64, 100)), jnp.float32)
    )
    pk, pv = pad_cross_kv((k, v))
    assert pk["qw8"].shape[-1] == 128 and pk["scale"].shape[-1] == 128
    assert float(pk["scale"][..., -1].min()) == 1.0
    np.testing.assert_array_equal(
        np.asarray(pv["qw8"][..., :100]), np.asarray(v["qw8"])
    )


def test_greedy_decode_w8a8_runs():
    from spittle_tpu.models.whisper.config import CONFIGS
    from spittle_tpu.models.whisper.decode import (
        DecodeOptions, greedy_decode,
    )
    from spittle_tpu.models.whisper.model import init_params

    cfg = CONFIGS["tiny"]
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    xa = jax.random.normal(
        jax.random.PRNGKey(1), (1, cfg.n_audio_ctx, cfg.n_audio_state),
        jnp.float32,
    )
    opts = DecodeOptions(
        language="en", timestamps=False, max_tokens=8,
        quant_kv=True, quant_kv_w8a8=True,
    )
    out = greedy_decode(params, xa, cfg, opts)
    toks = np.asarray(out["tokens"])
    assert toks.ndim == 2 and toks.shape[0] == 1
    assert (toks >= 0).all() and (toks < cfg.n_vocab).all()


def test_engine_accepts_w8a8_and_env(monkeypatch):
    from spittle_tpu.engine.whisper_engine import WhisperEngine

    eng = WhisperEngine(quantize_decoder="w8a8")
    assert eng.quantize_decoder == "w8a8"
    monkeypatch.setenv("SPITTLE_QUANTIZE_DECODER", "w8a8")
    assert WhisperEngine.from_env().quantize_decoder == "w8a8"


def test_engine_w8a8_transcribes(tmp_path):
    """Engine end-to-end with quantize_decoder='w8a8' on a tiny random
    model: loads, transcribes, produces a string."""
    from spittle_tpu.engine.base import TranscribeParams
    from spittle_tpu.engine.whisper_engine import WhisperEngine

    eng = WhisperEngine(dtype=jnp.float32, quantize_decoder="w8a8")
    eng.load_model("random:tiny")
    audio = np.zeros(16000, np.float32)
    audio[4000:8000] = 0.1 * np.sin(np.arange(4000) * 0.3)
    res = eng.transcribe_samples(audio, TranscribeParams(language="en"))
    assert isinstance(res.text, str)
    eng.unload_model()
