"""Probe host->device transfer behavior on the tunneled axon backend.

Questions: (1) effective h2d bandwidth by dtype/size, (2) whether h2d
transfer overlaps device compute (async dispatch), (3) whether chunked
transfers pipeline with per-chunk compute. Decides the shape of the
engine's ingest path (i16 vs f32, chunked-overlap vs single batch).
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


def med(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((48, 480000)).astype(np.float32)
    w16 = (np.clip(w, -1, 1) * 32767).astype(np.int16)

    # (1) bandwidth by size: one big vs chunks
    t = med(lambda: jax.block_until_ready(jax.device_put(w16)))
    print(f"i16 46MB single device_put   {t*1e3:8.1f} ms  "
          f"{46/t:.1f} MB/s", flush=True)
    chunks16 = [w16[i::8] for i in range(8)]

    def chunked():
        bufs = [jax.device_put(c) for c in chunks16]
        for b in bufs:
            b.block_until_ready()
    t = med(chunked)
    print(f"i16 46MB 8 async device_put  {t*1e3:8.1f} ms  "
          f"{46/t:.1f} MB/s", flush=True)

    # (2) overlap with compute: a ~500 ms matmul loop while transferring
    a = jax.device_put(rng.standard_normal((4096, 4096)).astype(np.float32))

    @jax.jit
    def burn(x):
        def body(i, y):
            return y @ y * 1e-3 + x * 1e-6
        return jax.lax.fori_loop(0, 40, body, x)

    jax.block_until_ready(burn(a))
    t_burn = med(lambda: jax.block_until_ready(burn(a)))
    print(f"burn alone                   {t_burn*1e3:8.1f} ms", flush=True)

    def serial():
        jax.block_until_ready(jax.device_put(w16))
        jax.block_until_ready(burn(a))
    t_serial = med(serial)

    def overlapped():
        buf = jax.device_put(w16)
        out = burn(a)
        buf.block_until_ready()
        out.block_until_ready()
    t_olap = med(overlapped)
    print(f"transfer then burn (serial)  {t_serial*1e3:8.1f} ms", flush=True)
    print(f"transfer + burn (async)      {t_olap*1e3:8.1f} ms  "
          f"(overlap saves {(t_serial-t_olap)*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
