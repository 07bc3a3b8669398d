"""On-chip encoder breakdown at the headline shape (turbo, batch 48).

Times the conv stem, the block scan, and single-block sublayers
(attention vs MLP) to locate where the 1.4 s encode goes. Honest
barrier = host fetch of a reduction.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SPITTLE_JAX_CACHE", "/tmp/spittle_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(os.environ.get("BE_BATCH", "48"))
REPS = 3


def fetch(x):
    return np.asarray(jnp.sum(x))


def timed(fn, reps=REPS):
    fetch(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from spittle_tpu.models.whisper.config import CONFIGS
    from spittle_tpu.models.whisper.model import (
        _encoder_blocks, encode, encoder_block_body, init_params,
    )

    cfg = CONFIGS["large-v3-turbo"]
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    enc = params["encoder"]
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((B, cfg.n_mels, 3000)), jnp.float32
    )

    t = timed(lambda: encode(params, mel, cfg))
    print(f"encode total        {t*1e3:8.1f} ms", flush=True)

    @jax.jit
    def stem(mel):
        x = jax.lax.conv_general_dilated(
            mel.astype(enc["conv1_w"].dtype), enc["conv1_w"],
            window_strides=(1,), padding=[(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        ) + enc["conv1_b"][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        x = jax.lax.conv_general_dilated(
            x, enc["conv2_w"], window_strides=(2,), padding=[(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        ) + enc["conv2_b"][None, :, None]
        return jax.nn.gelu(x, approximate=False)

    t = timed(lambda: stem(mel))
    print(f"conv stem           {t*1e3:8.1f} ms", flush=True)

    # GEMM-form stem (SPITTLE_STEM_GEMM=1): im2col slices + two matmuls
    # — the conv lowering measures ~5x its FLOP floor (see _stem_gemm).
    from spittle_tpu.models.whisper.model import _stem_gemm

    stem_g = jax.jit(lambda m: _stem_gemm(enc, m))
    try:
        t = timed(lambda: stem_g(mel))
        print(f"stem GEMM-form      {t*1e3:8.1f} ms", flush=True)
    except Exception as e:
        print(f"stem GEMM-form      FAILED: {str(e)[:120]}", flush=True)

    x = jnp.asarray(
        rng.standard_normal((B, 1500, cfg.n_audio_state)), jnp.bfloat16
    )
    t = timed(lambda: _encoder_blocks(enc["blocks"], x, cfg.n_audio_head))
    n_layer = cfg.n_audio_layer
    print(f"blocks scan ({n_layer}L)   {t*1e3:8.1f} ms   "
          f"{t/n_layer*1e3:6.2f} ms/layer", flush=True)

    blk0 = jax.tree.map(lambda a: a[0], enc["blocks"])

    @jax.jit
    def one_block(x):
        return encoder_block_body(x, blk0, cfg.n_audio_head)

    t = timed(lambda: one_block(x))
    print(f"one block (jit)     {t*1e3:8.1f} ms", flush=True)

    from spittle_tpu.models.whisper.model import (
        _attn_full, _mlp, layer_norm,
    )

    @jax.jit
    def attn_only(x):
        return x + _attn_full(
            layer_norm(x, blk0["attn_ln_g"], blk0["attn_ln_b"]),
            blk0, cfg.n_audio_head, causal=False,
        )

    @jax.jit
    def mlp_only(x):
        return x + _mlp(
            layer_norm(x, blk0["mlp_ln_g"], blk0["mlp_ln_b"]), blk0
        )

    t = timed(lambda: attn_only(x))
    print(f"attn sublayer       {t*1e3:8.1f} ms", flush=True)
    t = timed(lambda: mlp_only(x))
    print(f"mlp sublayer        {t*1e3:8.1f} ms", flush=True)

    # MXU ceiling reference: one big bf16 matmul of the MLP's fc1 shape
    w = jnp.asarray(
        rng.standard_normal((cfg.n_audio_state, 4 * cfg.n_audio_state)),
        jnp.bfloat16,
    )
    xx = x.reshape(-1, cfg.n_audio_state)

    @jax.jit
    def gemm(xx):
        return xx @ w

    t = timed(lambda: gemm(xx))
    flops = 2 * xx.shape[0] * w.shape[0] * w.shape[1]
    print(f"ref gemm fc1-shape  {t*1e3:8.1f} ms   "
          f"{flops/t/1e12:6.1f} TF/s", flush=True)

    # int8 ceiling at the same shape (the W8A8 path's MXU mode)
    xi = jnp.asarray(rng.integers(-127, 128, xx.shape), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 128, w.shape), jnp.int8)

    @jax.jit
    def gemm_i8(xi):
        return jax.lax.dot(xi, wi, preferred_element_type=jnp.int32)

    t = timed(lambda: gemm_i8(xi))
    print(f"ref gemm int8       {t*1e3:8.1f} ms   "
          f"{flops/t/1e12:6.1f} TOP/s", flush=True)

    # W8A8-quantized block stack (mm dispatches to the int8 dot)
    from spittle_tpu.ops.quant import (
        WHISPER_ENCODER_QUANT_KEYS, quantize_tree,
    )

    qblocks = quantize_tree(
        enc["blocks"], WHISPER_ENCODER_QUANT_KEYS, mode="w8a8"
    )
    t = timed(lambda: _encoder_blocks(qblocks, x, cfg.n_audio_head))
    print(f"blocks scan W8A8    {t*1e3:8.1f} ms   "
          f"{t/n_layer*1e3:6.2f} ms/layer", flush=True)

    # Fused W8A8 Pallas kernel path (SPITTLE_W8A8_KERNEL=1): the whole
    # quantize->int8 dot->dequant(+bias+gelu+scale) pipeline in one
    # kernel per GEMM — no int8 activation round trip, no separate
    # bias/gelu passes. Env read at trace time -> fresh jit wrapper;
    # BM block sweep via SPITTLE_W8A8_BM.
    for bm in ("128", "256", "512"):
        os.environ["SPITTLE_W8A8_KERNEL"] = "1"
        os.environ["SPITTLE_W8A8_BM"] = bm
        fker = jax.jit(
            lambda blocks, xx: _encoder_blocks(blocks, xx, cfg.n_audio_head)
        )
        try:
            t = timed(lambda: fker(qblocks, x))
            print(f"blocks W8A8-ker bm={bm:<4}{t*1e3:8.1f} ms   "
                  f"{t/n_layer*1e3:6.2f} ms/layer", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"blocks W8A8-ker bm={bm:<4}FAILED: {msg}", flush=True)
        finally:
            os.environ.pop("SPITTLE_W8A8_KERNEL", None)
            os.environ.pop("SPITTLE_W8A8_BM", None)

    # In-loop sublayer split: scan the SAME 32 layers but with only one
    # sublayer active per variant. Single-call sublayer timings above are
    # per-program-overhead-dominated on this tunnel (bench_chip.py showed
    # the fc1-shape GEMM at 26 TF/s single-call vs 169 TF/s chained); the
    # scan variants are the honest split of the 37.5 ms/layer.
    from spittle_tpu.models.whisper.model import (
        _attn_full, _mlp, layer_norm, mm,
    )

    def scan_variant(name, body_fn):
        @jax.jit
        def run(blocks, xx):
            def body(h, blk):
                return body_fn(h, blk), None
            h, _ = jax.lax.scan(body, xx, blocks)
            return h
        t = timed(lambda: run(enc["blocks"], x))
        print(f"{name:<20}{t*1e3:8.1f} ms   {t/n_layer*1e3:6.2f} ms/layer",
              flush=True)

    scan_variant("scan attn-only", lambda h, blk: h + _attn_full(
        layer_norm(h, blk["attn_ln_g"], blk["attn_ln_b"]),
        blk, cfg.n_audio_head, causal=False))
    scan_variant("scan mlp-only", lambda h, blk: h + _mlp(
        layer_norm(h, blk["mlp_ln_g"], blk["mlp_ln_b"]), blk))

    def qkvo_only(h, blk):
        # Projections without the attention kernel: isolates the four
        # d x d GEMMs (kernel cost = attn-only minus this).
        xn = layer_norm(h, blk["attn_ln_g"], blk["attn_ln_b"])
        q = mm(xn, blk["wq"]) + blk["bq"]
        k = mm(xn, blk["wk"])
        v = mm(xn, blk["wv"]) + blk["bv"]
        o = q + k + v  # keep all three live without the kernel
        return h + mm(o, blk["wo"]) + blk["bo"]

    scan_variant("scan qkvo-only", qkvo_only)

    # int8-dot attention (SPITTLE_ATTN_Q8): both attention dots on the
    # MXU's int8 mode — the kernel measured 16.7 ms/layer bf16-bound at
    # ~33 TF/s (2026-08-18 split above); int8 halves the dot time if
    # Mosaic lowers it. Env read at trace time -> fresh jit wrapper.
    os.environ["SPITTLE_ATTN_Q8"] = "1"
    fq8 = jax.jit(
        lambda blocks, xx: _encoder_blocks(blocks, xx, cfg.n_audio_head)
    )
    try:
        t = timed(lambda: fq8(enc["blocks"], x))
        print(f"blocks scan attn-q8 {t*1e3:8.1f} ms   "
              f"{t/n_layer*1e3:6.2f} ms/layer", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"blocks scan attn-q8 FAILED: {msg}", flush=True)
    finally:
        os.environ.pop("SPITTLE_ATTN_Q8", None)

    # Software-pipelined attention (SPITTLE_ATTN_PIPE): stage-A QK on a
    # double scratch overlapping stage-B softmax+PV of the previous
    # block — targets the serial dot->softmax->dot critical path that
    # pins the kernel at ~33 TF/s. Env read at trace time.
    os.environ["SPITTLE_ATTN_PIPE"] = "1"
    fpipe = jax.jit(
        lambda blocks, xx: _encoder_blocks(blocks, xx, cfg.n_audio_head)
    )
    try:
        t = timed(lambda: fpipe(enc["blocks"], x))
        print(f"blocks scan attn-pipe {t*1e3:8.1f} ms   "
              f"{t/n_layer*1e3:6.2f} ms/layer", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"blocks scan attn-pipe FAILED: {msg}", flush=True)
    finally:
        os.environ.pop("SPITTLE_ATTN_PIPE", None)

    # Packed-heads attention sweep (SPITTLE_PACKED_ATTENTION): '0' is
    # the split-head fullkv baseline, '1' the one-head 64-wide-block
    # variant (UNVALIDATED Mosaic lane alignment — may fail to lower),
    # 'pair' the 128-lane-aligned head-pair variant. The dispatch env is
    # read at trace time, so each mode gets a FRESH jit wrapper. A
    # lowering failure prints instead of killing the sweep.
    for mode in ("0", "1", "pair"):
        os.environ["SPITTLE_PACKED_ATTENTION"] = mode
        f = jax.jit(
            lambda blocks, xx: _encoder_blocks(blocks, xx, cfg.n_audio_head)
        )
        try:
            t = timed(lambda: f(enc["blocks"], x))
            print(f"blocks scan packed={mode:<4} {t*1e3:8.1f} ms   "
                  f"{t/n_layer*1e3:6.2f} ms/layer", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"blocks scan packed={mode:<4} FAILED: {msg}", flush=True)
    os.environ.pop("SPITTLE_PACKED_ATTENTION", None)


if __name__ == "__main__":
    main()
