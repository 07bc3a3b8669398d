#!/usr/bin/env python
"""On-chip kernel verification: run on the real TPU before trusting perf.

CPU tests can't execute Pallas kernels (the dispatch falls back to XLA
there), so this script validates every kernel against the XLA reference
on the actual device: full-KV attention (ragged kv, causal), the tiled
flash fallback, and the decode cross-attention kernel. Exits non-zero on
any tolerance failure. Usage: python scripts/tpu_checks.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SPITTLE_JAX_CACHE", "/tmp/spittle_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> int:
    from spittle_tpu.ops.attention import (
        attention_reference,
        decode_cross_attention,
        flash_attention,
        flash_attention_fullkv,
        multihead_attention,
    )

    if jax.devices()[0].platform != "tpu":
        print(json.dumps({"skip": "not on tpu"}))
        return 0

    rng = np.random.default_rng(0)
    failures = []

    def check(name, got, want, atol):
        diff = float(np.max(np.abs(np.asarray(got, np.float32)
                                   - np.asarray(want, np.float32))))
        ok = diff <= atol
        print(json.dumps({"check": name, "max_diff": diff, "atol": atol,
                          "ok": ok}), flush=True)
        if not ok:
            failures.append(name)

    def mk(b, h, t, d, scale=0.3):
        return jnp.asarray(rng.standard_normal((b, h, t, d)),
                           jnp.bfloat16) * scale

    # full-KV kernel: encoder shape, ragged kv
    q, k, v = mk(4, 8, 1536, 64), mk(4, 8, 1536, 64), mk(4, 8, 1536, 64, 1.0)
    check("fullkv_ragged",
          flash_attention_fullkv(q, k, v, kv_len=1500, block_q=768),
          attention_reference(q, k, v, kv_len=1500), 4e-3)

    # causal (decoder teacher-forced shape)
    q2, k2, v2 = mk(2, 4, 512, 64), mk(2, 4, 512, 64), mk(2, 4, 512, 64, 1.0)
    check("fullkv_causal",
          multihead_attention(q2, k2, v2, causal=True, kv_len=500),
          attention_reference(q2, k2, v2, causal=True, kv_len=500), 2e-2)

    # tiled flash (kv > VMEM threshold path)
    q3, k3, v3 = mk(1, 2, 512, 64), mk(1, 2, 5120, 64), mk(1, 2, 5120, 64, 1.0)
    check("tiled_flash",
          flash_attention(q3, k3, v3, kv_len=5000),
          attention_reference(q3, k3, v3, kv_len=5000), 4e-3)

    # decode cross-attention kernel (q rows 1 and 4)
    k4, v4 = mk(4, 8, 1536, 64), mk(4, 8, 1536, 64, 1.0)
    for r in (1, 4):
        q4 = mk(4, 8, r, 64, 0.12)
        check(f"decode_cross_q{r}",
              decode_cross_attention(q4, k4, v4, kv_len=1500),
              attention_reference(q4, k4, v4, kv_len=1500), 4e-3)

    print(json.dumps({"result": "FAIL" if failures else "PASS",
                      "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
