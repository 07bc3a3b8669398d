"""Host->device link-speed probe: the bench covariate.

Transfer-bound benchmark configs swing ±30-40% with the tunneled axon
backend's "weather" (ROUND_NOTES r3 session-8); stamping the measured h2d
MB/s into every bench record makes rounds comparable — a lower headline
with a slower link is weather, not regression. Probe shape mirrors
scripts/probe_transfer.py: a batch-48 x 30 s int16 window batch (~46 MB),
the exact tensor the serving path ships per group.
"""

from __future__ import annotations

import time

import numpy as np


def measure_link_mbps(size_mb: float = 46.0, reps: int = 3) -> float:
    """Median h2d bandwidth (MB/s) for one serving-group-sized transfer."""
    import jax

    n = int(size_mb * 1e6 / 2)  # int16 elements
    rng = np.random.default_rng(0)
    buf = (rng.standard_normal(n) * 3000).astype(np.int16)
    mb = buf.nbytes / 1e6

    jax.block_until_ready(jax.device_put(buf))  # warm path / page-in
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(buf))
        ts.append(time.perf_counter() - t0)
    return round(mb / float(np.median(ts)), 1)
