"""Pallas attention kernel numerics (interpret mode — no TPU in CI).

The decode-time cross-attention kernels must match the XLA reference
attention bit-for-bit in structure (same softmax algebra) and closely in
value. The int8 variant additionally checks the in-kernel dequant scale
algebra against the XLA quant path (ops/quant.py: scores = (q@qK)*ks,
out = (p*vs)@qV^T)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.ops.attention import (
    attention_reference,
    decode_cross_attention_q8,
)
from spittle_tpu.ops.quant import dequantize_kv, quantize_kv


def _mk(b=2, h=3, r=1, d=64, t=256, seed=0):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(kq, (b, h, r, d), jnp.float32)
    # decode layout [B, H, Dh, T]
    k = jax.random.normal(kk, (b, h, d, t), jnp.float32)
    v = jax.random.normal(kv, (b, h, d, t), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("r", [1, 5, 8])
@pytest.mark.parametrize("kv_len", [256, 200])
def test_q8_kernel_matches_xla_quant_path(r, kv_len):
    q, k, v = _mk(r=r)
    dh = q.shape[-1]
    qk, qv = quantize_kv(k), quantize_kv(v)

    out = decode_cross_attention_q8(
        q * (dh**-0.5), qk["qw"], qk["scale"], qv["qw"], qv["scale"],
        kv_len=kv_len, interpret=True,
    )

    # Oracle: dequantize, run plain attention in time-major layout.
    kd = dequantize_kv(qk, jnp.float32).transpose(0, 1, 3, 2)
    vd = dequantize_kv(qv, jnp.float32).transpose(0, 1, 3, 2)
    # attention_reference computes q@k directly with no internal scaling;
    # the kernel input was pre-scaled by dh**-0.5, so scale identically.
    want = attention_reference(q * (dh**-0.5), kd, vd, kv_len=kv_len)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_q8_kernel_padded_tail_is_masked():
    q, k, v = _mk(t=200)  # will pad 200 -> 256
    dh = q.shape[-1]
    qk, qv = quantize_kv(k), quantize_kv(v)
    pad = 56
    qkp = {
        "qw": jnp.pad(qk["qw"], ((0, 0), (0, 0), (0, 0), (0, pad)),
                      constant_values=127),  # garbage in the pad region
        "scale": jnp.pad(qk["scale"], ((0, 0), (0, 0), (0, pad)),
                         constant_values=9.0),
    }
    qvp = {
        "qw": jnp.pad(qv["qw"], ((0, 0), (0, 0), (0, 0), (0, pad)),
                      constant_values=-127),
        "scale": jnp.pad(qv["scale"], ((0, 0), (0, 0), (0, pad)),
                         constant_values=9.0),
    }
    out_pad = decode_cross_attention_q8(
        q * (dh**-0.5), qkp["qw"], qkp["scale"], qvp["qw"], qvp["scale"],
        kv_len=200, interpret=True,
    )
    kd = dequantize_kv(qk, jnp.float32).transpose(0, 1, 3, 2)
    vd = dequantize_kv(qv, jnp.float32).transpose(0, 1, 3, 2)
    want = attention_reference(q * (dh**-0.5), kd, vd)
    np.testing.assert_allclose(
        np.asarray(out_pad), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_pad_cross_kv_handles_quant_dicts(monkeypatch):
    monkeypatch.setenv("SPITTLE_DECODE_CROSS_KERNEL", "1")
    from spittle_tpu.ops.attention import pad_cross_kv

    k = jnp.ones((2, 3, 4, 64, 200), jnp.float32)  # [L,B,H,Dh,T]
    qk, qv = quantize_kv(k), quantize_kv(k * 2)
    pk, pv = pad_cross_kv((qk, qv))
    assert pk["qw"].shape[-1] == 256 and pk["scale"].shape[-1] == 256
    assert pv["qw"].shape[-1] == 256
    # pad region: zero qw, scale 1.0 (no zero-divide anywhere downstream)
    assert np.all(np.asarray(pk["qw"][..., 200:]) == 0)
    assert np.all(np.asarray(pk["scale"][..., 200:]) == 1.0)
    # plain tensors still pad
    pk2, pv2 = pad_cross_kv((k, k))
    assert pk2.shape[-1] == 256


@pytest.mark.parametrize("causal", [False, True])
def test_packed_fullkv_kernel_matches_reference(causal):
    """flash_attention_fullkv_packed (heads sliced via BlockSpec index
    maps, no HBM transposes) must match plain split-head attention."""
    from spittle_tpu.ops.attention import (
        attention_reference,
        flash_attention_fullkv_packed,
    )

    rng = np.random.default_rng(3)
    b, t, h, d = 2, 256, 4, 64
    q = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)

    got = flash_attention_fullkv_packed(
        q, k, v, h, causal=causal, block_q=128, interpret=True
    )

    def split(x):
        return x.reshape(b, t, h, d).transpose(0, 2, 1, 3)

    ref = attention_reference(split(q), split(k), split(v), causal=causal)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_packed_fullkv_kernel_kv_len_mask():
    from spittle_tpu.ops.attention import (
        attention_reference,
        flash_attention_fullkv_packed,
    )

    rng = np.random.default_rng(4)
    b, t, h, d = 1, 128, 2, 64
    q = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    got = flash_attention_fullkv_packed(
        q, k, v, h, kv_len=77, block_q=128, interpret=True
    )

    def split(x):
        return x.reshape(b, t, h, d).transpose(0, 2, 1, 3)

    ref = attention_reference(split(q), split(k), split(v), kv_len=77)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_packed_pair_kernel_matches_reference(causal):
    """flash_attention_fullkv_packed_pair (128-lane-aligned head-pair
    blocks, in-kernel lane split) must match split-head attention."""
    from spittle_tpu.ops.attention import (
        attention_reference,
        flash_attention_fullkv_packed_pair,
    )

    rng = np.random.default_rng(6)
    b, t, h, d = 2, 256, 4, 64
    q = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)

    got = flash_attention_fullkv_packed_pair(
        q, k, v, h, causal=causal, block_q=128, interpret=True
    )

    def split(x):
        return x.reshape(b, t, h, d).transpose(0, 2, 1, 3)

    ref = attention_reference(split(q), split(k), split(v), causal=causal)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_packed_pair_kernel_kv_len_mask():
    from spittle_tpu.ops.attention import (
        attention_reference,
        flash_attention_fullkv_packed_pair,
    )

    rng = np.random.default_rng(7)
    b, t, h, d = 1, 128, 2, 64
    q = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    got = flash_attention_fullkv_packed_pair(
        q, k, v, h, kv_len=77, block_q=128, interpret=True
    )

    def split(x):
        return x.reshape(b, t, h, d).transpose(0, 2, 1, 3)

    ref = attention_reference(split(q), split(k), split(v), kv_len=77)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_packed_dispatch_cpu_fallback_matches_split():
    """multihead_attention_packed off-TPU must equal the split-head path
    bit-for-bit (same ops, different tensor plumbing)."""
    from spittle_tpu.ops.attention import (
        multihead_attention,
        multihead_attention_packed,
    )

    rng = np.random.default_rng(5)
    b, t, h, d = 2, 160, 4, 64
    q = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    got = multihead_attention_packed(q, k, v, h, causal=True)

    def split(x):
        return x.reshape(b, t, h, d).transpose(0, 2, 1, 3)

    ref = multihead_attention(split(q), split(k), split(v), causal=True)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


# ---- int8-dot full-KV encoder kernel (flash_attention_fullkv_q8) ----


def _mk_enc(b=1, h=2, t=256, d=64, seed=7, scale=0.3):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(kq, (b, h, t, d), jnp.float32) * scale
    k = jax.random.normal(kk, (b, h, t, d), jnp.float32) * scale
    v = jax.random.normal(kv, (b, h, t, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("kv_len", [256, 200])
def test_fullkv_q8_matches_reference(kv_len):
    """int8-dot kernel vs the f32 reference: only 8-bit per-row rounding
    of q/k/v and the probability rows separates them."""
    from spittle_tpu.ops.attention import flash_attention_fullkv_q8

    q, k, v = _mk_enc()
    got = flash_attention_fullkv_q8(
        q, k, v, kv_len=kv_len, block_q=128, interpret=True
    )
    want = attention_reference(q, k, v, kv_len=kv_len)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=4e-2, rtol=5e-2
    )


def test_fullkv_q8_pad_tail_masked():
    """V junk beyond kv_len must not leak into the output. (Contract
    matches the bf16 kernel: K's tail is ZERO-padded by the dispatcher —
    the unmasked max policy relies on it — while V's tail is arbitrary;
    the post-exp multiply mask is what keeps it out.)"""
    from spittle_tpu.ops.attention import flash_attention_fullkv_q8

    q, k, v = _mk_enc(seed=9)
    k = k.at[:, :, 200:, :].set(0.0)  # dispatcher zero-pad
    v = v.at[:, :, 200:, :].set(-50.0)  # poisoned V tail
    got = flash_attention_fullkv_q8(
        q, k, v, kv_len=200, block_q=128, interpret=True
    )
    want = attention_reference(
        q[:, :, :, :], k[:, :, :200, :], v[:, :, :200, :]
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=4e-2, rtol=5e-2
    )


def test_attn_q8_env_dispatch_cpu_fallback(monkeypatch):
    """With SPITTLE_ATTN_Q8=1 off-TPU, multihead_attention still takes
    the reference path (the env knob only engages on hardware)."""
    from spittle_tpu.ops.attention import multihead_attention

    monkeypatch.setenv("SPITTLE_ATTN_Q8", "1")
    q, k, v = _mk_enc()
    got = multihead_attention(q, k, v)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


# ---- software-pipelined full-KV kernel (flash_attention_fullkv_pipe) ----


@pytest.mark.parametrize("kv_len", [256, 200])
@pytest.mark.parametrize("block_q", [128, 256])
def test_pipe_fullkv_kernel_matches_reference(kv_len, block_q):
    """flash_attention_fullkv_pipe (stage-A QK / stage-B softmax+PV on a
    double scratch across a flattened bh*nq+1 grid) must match plain
    attention, including across bh boundaries and with a ragged kv_len
    mask."""
    from spittle_tpu.ops.attention import flash_attention_fullkv_pipe

    q, k, v = _mk_enc(b=2, h=3)
    got = flash_attention_fullkv_pipe(
        q, k, v, kv_len=kv_len, block_q=block_q, interpret=True
    )
    want = attention_reference(
        q, k[:, :, :kv_len, :], v[:, :, :kv_len, :]
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_pipe_single_block_grid():
    """nq == 1 (one q block per bh): the pipeline is pure
    prologue/epilogue interleave across bh."""
    from spittle_tpu.ops.attention import flash_attention_fullkv_pipe

    q, k, v = _mk_enc(b=2, h=2)
    got = flash_attention_fullkv_pipe(
        q, k, v, block_q=256, interpret=True
    )
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_attn_pipe_env_dispatch_cpu_fallback(monkeypatch):
    """SPITTLE_ATTN_PIPE=1 off-TPU: multihead_attention still takes the
    reference path (the knob only engages on hardware)."""
    from spittle_tpu.ops.attention import multihead_attention

    monkeypatch.setenv("SPITTLE_ATTN_PIPE", "1")
    q, k, v = _mk_enc()
    got = multihead_attention(q, k, v)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )
