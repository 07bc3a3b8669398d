"""Chip-ceiling probe: what this TPU can actually do, measured honestly.

Answers the round-3 open question (ROUND_NOTES: encoder at ~17% of MXU
"peak"): is the encoder slow, or is the *achievable* ceiling on this
tunneled chip far below the v5e spec sheet (197 bf16 TF/s, 394 int8
TOP/s, 819 GB/s HBM)?

Methodology: every measurement chains K dependent iterations of the op
inside ONE lax.scan program, so per-program dispatch/tunnel overhead
(the ~2 ms floor that dominates single-call micro-benches on this
platform, see ROUND_NOTES) amortizes to noise, and XLA cannot hoist the
op out of the loop (each iteration consumes the previous result). The
completion barrier is a host fetch of a scalar reduction (BENCHMARKS.md:
block_until_ready is not a barrier on this platform).

Probes:
  - chained square bf16 matmul, N = 1024..8192 -> TF/s ladder
  - chained square int8 matmul (MXU int8 mode) -> TOP/s ladder
  - encoder-MLP-shaped chained GEMM pair (92160x1280x5120 fc1/fc2,
    the exact hot shape of the turbo headline) -> TF/s
  - HBM streaming bandwidth: x = x + 1 over a 1 GiB f32 array -> GB/s
    (read+write), plus a read-dominated reduction variant

Output: one JSON line per probe (same convention as bench_suite.py).
"""

import json
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

REPS = int(os.environ.get("BC_REPS", "3"))


def fetch(x):
    return np.asarray(x)


def timed(fn, reps=REPS):
    fetch(fn())  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def chained_matmul_bf16(n: int, iters: int):
    rng = np.random.default_rng(0)
    # Scale so the chained product neither explodes nor denorms: rescale
    # each iterate by 1/sqrt(n) (fused scalar epilogue, negligible cost).
    a0 = jnp.asarray(rng.standard_normal((n, n)) / np.sqrt(n), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)) / np.sqrt(n), jnp.bfloat16)

    @jax.jit
    def run(a):
        def body(a, _):
            a = (a @ b) * jnp.bfloat16(1.0 / np.sqrt(n))
            return a, ()
        a, _ = jax.lax.scan(body, a, None, length=iters)
        return jnp.sum(a.astype(jnp.float32))

    t = timed(lambda: run(a0))
    flops = 2.0 * n * n * n * iters
    emit(probe=f"matmul bf16 {n}x{n}x{n} chained x{iters}",
         ms_per_op=round(t / iters * 1e3, 3),
         tflops=round(flops / t / 1e12, 1))


def chained_matmul_int8(n: int, iters: int):
    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)

    @jax.jit
    def run(a):
        def body(a, _):
            c = jax.lax.dot(a, b, preferred_element_type=jnp.int32)
            # Cheap elementwise requantize keeps the chain int8 and
            # dependent (XLA cannot hoist the dot).
            a = (c & 127).astype(jnp.int8)
            return a, ()
        a, _ = jax.lax.scan(body, a0, None, length=iters)
        return jnp.sum(a.astype(jnp.int32))

    t = timed(lambda: run(a0))
    ops = 2.0 * n * n * n * iters
    emit(probe=f"matmul int8 {n}x{n}x{n} chained x{iters}",
         ms_per_op=round(t / iters * 1e3, 3),
         tops=round(ops / t / 1e12, 1))


def chained_mlp_shape(iters: int):
    """The turbo encoder's exact MLP GEMM pair at the headline shape:
    [48*1920, 1280] @ [1280, 5120] @ [5120, 1280] (B=48, T=1920 padded).
    Round-trip shape lets the chain feed itself."""
    rng = np.random.default_rng(0)
    m, d, h = 48 * 1920, 1280, 5120
    x0 = jnp.asarray(rng.standard_normal((m, d)) / np.sqrt(d), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((d, h)) / np.sqrt(d), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((h, d)) / np.sqrt(h), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(x, _):
            y = x @ w1
            x = (y @ w2) * jnp.bfloat16(0.25)
            return x, ()
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(x.astype(jnp.float32))

    t = timed(lambda: run(x0))
    flops = 2.0 * m * d * h * 2 * iters
    emit(probe=f"encoder-MLP pair [{m},{d}]x[{d},{h}]x2 chained x{iters}",
         ms_per_pair=round(t / iters * 1e3, 3),
         tflops=round(flops / t / 1e12, 1))


def hbm_stream(gib: float, iters: int):
    n = int(gib * (1 << 30) / 4)
    x0 = jnp.ones((n,), jnp.float32)

    @jax.jit
    def run(x):
        def body(x, _):
            return x + 1.0, ()
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x[0]

    t = timed(lambda: run(x0))
    bytes_moved = 2.0 * n * 4 * iters  # read + write per iter
    emit(probe=f"HBM stream x=x+1 over {gib} GiB f32 x{iters}",
         gbps=round(bytes_moved / t / 1e9, 1))


def hbm_read(gib: float, iters: int):
    n = int(gib * (1 << 30) / 4)
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def run(s0):
        def body(s, _):
            # s-dependent scale defeats hoisting; the array read dominates.
            return s + jnp.sum(x * (1.0 + s * 0.0)), ()
        s, _ = jax.lax.scan(body, s0, None, length=iters)
        return s

    t = timed(lambda: run(jnp.float32(0.0)))
    bytes_moved = float(n) * 4 * iters
    emit(probe=f"HBM read sum over {gib} GiB f32 x{iters}",
         gbps=round(bytes_moved / t / 1e9, 1))


def main():
    emit(probe="device", value=str(jax.devices()))
    for n, iters in ((1024, 256), (2048, 128), (4096, 32), (8192, 16)):
        chained_matmul_bf16(n, iters)
    for n, iters in ((2048, 128), (4096, 32), (8192, 16)):
        chained_matmul_int8(n, iters)
    chained_mlp_shape(16)
    hbm_stream(1.0, 16)
    hbm_read(1.0, 16)


if __name__ == "__main__":
    main()
