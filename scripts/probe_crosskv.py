"""On-chip A/B of the cross-KV precompute forms (large-v3 shapes).

The fullc stage breakdown (bench_breakdown.py BB_FULLC=1, 2026-08-21)
measured the bf16 cross-KV precompute at 296.8 ms for b45 against a
~95 ms floor for its GEMMs ([B*1500, 1280] x [1280, 1280] x 64 at the
measured 169 TF/s encoder-GEMM rate): XLA fuses the [B, T, D] ->
[B, H, Dh, T] decode-layout transpose into the projection epilogue and
the GEMM runs ~3x off. Arms:

  bf16-transposed   precompute_cross_kv (production bf16 layout)
  q8-fused          precompute_cross_kv_q8, SPITTLE_CROSSKV_FORM=fused
  q8-natural        same fn, SPITTLE_CROSSKV_FORM=natural — natural-
                    layout GEMM behind an optimization_barrier, int8
                    transpose after quantization

Run on TPU: `python scripts/probe_crosskv.py` (PB_BATCH=48 default).
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

B = int(os.environ.get("PB_BATCH", "48"))
REPS = 3


def fetch(tree):
    return jax.tree.map(lambda a: np.asarray(jnp.sum(a)), tree)


def timed(fn):
    fetch(fn())
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from spittle_tpu.models.whisper import model as M
    from spittle_tpu.models.whisper.config import CONFIGS

    cfg = CONFIGS["large-v3"]
    params = M.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    rng = np.random.default_rng(0)
    xa = jnp.asarray(
        rng.standard_normal((B, cfg.n_audio_ctx, cfg.n_audio_state)),
        jnp.bfloat16,
    )

    bf = jax.jit(lambda x: M.precompute_cross_kv(params, x, cfg))
    t = timed(lambda: bf(xa))
    print(f"bf16-transposed   {t*1e3:8.1f} ms", flush=True)

    for form in ("fused", "natural"):
        os.environ["SPITTLE_CROSSKV_FORM"] = form
        # fresh jit per form: the env knob is read at trace time
        fn = jax.jit(lambda x: M.precompute_cross_kv_q8(params, x, cfg))
        t = timed(lambda: fn(xa))
        print(f"q8-{form:12s}  {t*1e3:8.1f} ms", flush=True)
    os.environ["SPITTLE_CROSSKV_FORM"] = "fused"

    # Production-params arm: quantize_whisper_decoder EXCLUDES
    # cross_wk/cross_wv (quant.py:341), so this should measure the same
    # as q8-fused — it pins down that the engine's precompute runs on
    # bf16 projection weights and that the fullc stage-breakdown's
    # 296.8 ms was eager-dispatch overhead (bench_breakdown timed the
    # un-jitted call), not a production cost.
    from spittle_tpu.ops.quant import quantize_whisper_decoder

    qparams = quantize_whisper_decoder(params)
    fnq = jax.jit(lambda x: M.precompute_cross_kv_q8(qparams, x, cfg))
    t = timed(lambda: fnq(xa))
    print(f"q8-fused-int8w    {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
