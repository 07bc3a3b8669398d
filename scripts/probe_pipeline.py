"""Probe: does a worker-thread device_put overlap device compute on the
tunneled axon backend? Decides whether prefetch-to-device double
buffering (tf.data-style) can hide the h2d audio transfer behind the
previous batch's encode/decode.

Honest barrier = host fetch of a reduction (block_until_ready lies here).
"""

import os
import sys
import threading
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


def fetch(x):
    return np.asarray(jnp.sum(x))


def main():
    rng = np.random.default_rng(0)
    batches = [
        (rng.standard_normal((48, 480000)) * 3000).astype(np.int16)
        for _ in range(4)
    ]

    @jax.jit
    def burn(x):
        y = x[:, :4096].astype(jnp.float32)

        def body(i, y):
            return y @ y.T[:4096, :4096] * 1e-3 + 1e-6

        z = jax.lax.fori_loop(0, 60, body, y[:, :4096] @ y[:4096].T)
        return jnp.sum(z)

    # warm
    d0 = jax.device_put(batches[0])
    fetch(burn(d0))

    t0 = time.perf_counter()
    fetch(jnp.sum(jax.device_put(batches[1]).astype(jnp.float32)))
    t_put = time.perf_counter() - t0
    print(f"transfer 46MB i16 (honest)    {t_put*1e3:8.1f} ms", flush=True)

    t0 = time.perf_counter()
    fetch(burn(d0))
    t_burn = time.perf_counter() - t0
    print(f"burn (honest)                 {t_burn*1e3:8.1f} ms", flush=True)

    # serial: transfer then burn
    t0 = time.perf_counter()
    d2 = jax.device_put(batches[2])
    fetch(burn(d0))
    fetch(jnp.sum(d2.astype(jnp.float32)))
    t_serial = time.perf_counter() - t0
    print(f"main-thread put + burn        {t_serial*1e3:8.1f} ms", flush=True)

    # threaded: worker does device_put while main thread burns
    result = {}

    def worker():
        t0 = time.perf_counter()
        result["buf"] = jax.device_put(batches[3])
        result["t"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    th = threading.Thread(target=worker)
    th.start()
    fetch(burn(d0))
    th.join()
    fetch(jnp.sum(result["buf"].astype(jnp.float32)))
    t_olap = time.perf_counter() - t0
    print(f"thread put || burn            {t_olap*1e3:8.1f} ms  "
          f"(ideal {max(t_put, t_burn)*1e3:.0f})", flush=True)


if __name__ == "__main__":
    main()
