"""Where does the headline group's non-compute time go?

The sustained engine path measures ~1.83 s/group (48 x 30 s) while the
device programs account for ~1.64 s (mel 42 + W8A8 encoder ~1157 +
decode ~441 ms). This probe runs the REAL transcribe_stream loop with
the winning stack and splits each group's wall into:

  frontend   _frontend dispatch + block_until_ready
  decode     _decode_with_fallback + token fetch to host
  parse      the remaining host time inside _transcribe_parallel_windows
             (token scan, segment/stitch bookkeeping, result assembly)
  gap        group wall minus all of the above (queue handoff, dispatch
             RTT not covered by the blocks)

Times are sums over the sustained groups (first group discarded as
warmup). Usage: [PSG_BATCH=48] [PSG_GROUPS=4] python scripts/probe_stream_gap.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SPITTLE_JAX_CACHE", "/tmp/spittle_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = int(os.environ.get("PSG_BATCH", "48"))
GROUPS = int(os.environ.get("PSG_GROUPS", "4"))


def main():
    from spittle_tpu.engine.base import TranscribeParams
    from spittle_tpu.engine.whisper_engine import WhisperEngine

    eng = WhisperEngine(
        dtype=jax.numpy.bfloat16, wire="mulaw", quantize_encoder=True
    )
    eng.load_model("random:large-v3-turbo")
    params = TranscribeParams(
        language="en", condition_on_previous_text=False,
        parallel_windows=True, max_tokens=96, temperatures=(0.0,),
    )
    rng = np.random.default_rng(0)

    def make_batch():
        return [
            (rng.standard_normal(16000 * 30) * 3000).astype(np.int16)
            for _ in range(BATCH)
        ]

    times = {"frontend": 0.0, "decode": 0.0, "group": 0.0}
    active = {"on": False}

    orig_frontend = WhisperEngine._frontend
    orig_decode = WhisperEngine._decode_with_fallback
    orig_tpw = WhisperEngine._transcribe_parallel_windows

    def timed_frontend(self, w):
        t0 = time.perf_counter()
        r = orig_frontend(self, w)
        r.block_until_ready()
        if active["on"]:
            times["frontend"] += time.perf_counter() - t0
        return r

    def timed_decode(self, *a, **k):
        t0 = time.perf_counter()
        out = orig_decode(self, *a, **k)
        jax.block_until_ready(out["tokens"])
        if active["on"]:
            times["decode"] += time.perf_counter() - t0
        return out

    def timed_tpw(self, *a, **k):
        t0 = time.perf_counter()
        r = orig_tpw(self, *a, **k)
        if active["on"]:
            times["group"] += time.perf_counter() - t0
        return r

    WhisperEngine._frontend = timed_frontend
    WhisperEngine._decode_with_fallback = timed_decode
    WhisperEngine._transcribe_parallel_windows = timed_tpw

    # Warmup (compile) group
    for _ in eng.transcribe_stream([make_batch()], params):
        pass

    active["on"] = True
    batches = [make_batch() for _ in range(GROUPS)]
    t0 = time.perf_counter()
    n_done = 0
    for results in eng.transcribe_stream(batches, params):
        n_done += len(results)
    wall = time.perf_counter() - t0
    assert n_done == BATCH * GROUPS

    per = {k: v / GROUPS * 1e3 for k, v in times.items()}
    parse = per["group"] - per["frontend"] - per["decode"]
    stream_gap = wall / GROUPS * 1e3 - per["group"]
    print(json.dumps({
        "batch": BATCH, "groups": GROUPS,
        "wall_ms_per_group": round(wall / GROUPS * 1e3, 1),
        "frontend_ms": round(per["frontend"], 1),
        "decode_ms": round(per["decode"], 1),
        "parse_ms": round(parse, 1),
        "stream_gap_ms": round(stream_gap, 1),
        "rtfx": round(BATCH * GROUPS * 30.0 / wall, 1),
    }))


if __name__ == "__main__":
    main()
