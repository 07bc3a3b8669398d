"""Probe: does this chip's MXU actually run int8 dots at 2x bf16?

v5e spec: 197 TFLOP/s bf16, 394 TOPS int8. The encoder's GEMMs measure
~half of bf16 peak (docs/PERFORMANCE.md), so a W8A8 path is only worth
building if an int8 dot at the fc1 shape beats the bf16 one in practice
(XLA must lower it to the int8 MXU mode, not convert-and-dot).

Shapes: the turbo encoder's hot GEMMs at batch 48 —
  proj  [72000, 1280] @ [1280, 1280]
  fc1   [72000, 1280] @ [1280, 5120]
  fc2   [72000, 5120] @ [5120, 1280]

Also times the dynamic-quantization overhead (per-row amax + scale +
round/clip of the activation) to see whether W8A8 wins end-to-end.
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

REPS = 5


def fetch(x):
    return np.asarray(jnp.sum(x.astype(jnp.float32)))


def timed(fn, reps=REPS):
    fetch(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def main():
    rng = np.random.default_rng(0)
    rows = 72_000
    for name, (m, k, n) in {
        "proj": (rows, 1280, 1280),
        "fc1": (rows, 1280, 5120),
        "fc2": (rows, 5120, 1280),
    }.items():
        xb = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        flops = 2 * m * k * n

        bf = jax.jit(lambda a, b: a @ b)
        t = timed(lambda: bf(xb, wb))
        print(f"{name}  bf16          {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s",
              flush=True)

        i8 = jax.jit(
            lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32)
        )
        t = timed(lambda: i8(xi, wi))
        print(f"{name}  int8->int32   {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TOP/s",
              flush=True)

        # W8A8 with dynamic per-row activation quant + f32 rescale epilogue
        sw = jnp.asarray(rng.standard_normal((n,)), jnp.float32) * 0.01

        @jax.jit
        def w8a8(a, qb, sb):
            amax = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=1,
                           keepdims=True)
            sa = jnp.where(amax > 0, amax / 127.0, 1.0)
            qa = jnp.clip(
                jnp.round(a.astype(jnp.float32) / sa), -127, 127
            ).astype(jnp.int8)
            y = jax.lax.dot(qa, qb, preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * sa * sb[None, :]).astype(
                jnp.bfloat16
            )

        t = timed(lambda: w8a8(xb, wi, sw))
        print(f"{name}  w8a8 dyn      {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TOP/s",
              flush=True)


if __name__ == "__main__":
    main()
