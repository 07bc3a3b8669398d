"""On-chip breakdown of the honest engine path (bench.py shape).

Times each stage of WhisperEngine.transcribe_batch using the ENGINE'S OWN
jitted programs (cache-hot after the first full call) — host window
assembly, mel, encoder, rule-applying greedy decode — to locate where the
batch-48 x 30 s wall time goes. Stages selectable via BB_STAGES
(comma list of: total,host,mel,encode,loop,noves,raw).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SPITTLE_JAX_CACHE", "/tmp/spittle_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = int(os.environ.get("BB_BATCH", "48"))
TOKENS = int(os.environ.get("BB_TOKENS", "96"))
MODEL = os.environ.get("BB_MODEL", "large-v3-turbo")
# BB_FULLC=1 loads the engine with the production large-v3 stack
# (int8 weights+cross-KV, int8 self-cache, W8A8 encoder) so the stage
# split matches what bench.py's lv3 line actually runs.
FULLC = os.environ.get("BB_FULLC", "0") == "1"
STAGES = set(
    os.environ.get("BB_STAGES", "total,host,mel,encode,loop").split(",")
)
REPS = 3


def _barrier(out):
    """Completion barrier that fetches only scalars: host-fetching big
    arrays over the tunnel costs seconds and poisons the timing (a full
    np.asarray of the [48,1500,1280] encoder output measures the
    transfer, not the compute)."""
    def one(a):
        if hasattr(a, "dtype") and hasattr(a, "ndim"):
            np.asarray(jnp.sum(a))
        return a

    jax.tree.map(one, out)


def timed(fn, reps=REPS):
    _barrier(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _barrier(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from spittle_tpu.engine.base import TranscribeParams
    from spittle_tpu.engine.whisper_engine import WhisperEngine
    from spittle_tpu.models.whisper.decode import greedy_decode
    from spittle_tpu.models.whisper.model import encode

    if FULLC:
        engine = WhisperEngine(
            dtype=jnp.bfloat16, wire="mulaw", quantize_encoder=True,
            quantize_decoder="int8", quantize_cache=True,
        )
    else:
        engine = WhisperEngine(dtype=jnp.bfloat16)
    engine.load_model(f"random:{MODEL}")
    cfg = engine.cfg
    params = engine.params

    rng = np.random.default_rng(0)
    batch = [
        rng.standard_normal(16000 * 30).astype(np.float32)
        for _ in range(BATCH)
    ]
    tparams = TranscribeParams(
        language="en", condition_on_previous_text=False,
        max_tokens=TOKENS, temperatures=(0.0,),
    )

    # one full engine call warms every program
    t0 = time.perf_counter()
    engine.transcribe_batch(batch, tparams)
    print(f"first full call (compile)   "
          f"{(time.perf_counter()-t0)*1e3:8.1f} ms", flush=True)

    if "total" in STAGES:
        t = timed(lambda: engine.transcribe_batch(batch, tparams), reps=3)
        print(f"total transcribe_batch      {t*1e3:8.1f} ms   "
              f"RTFx={BATCH*30/t:.0f}", flush=True)

    windows = np.zeros((BATCH, engine.window_samples), np.float32)
    for i, a in enumerate(batch):
        windows[i, : len(a)] = a
    if "host" in STAGES:
        t0 = time.perf_counter()
        w2 = np.zeros((BATCH, engine.window_samples), np.float32)
        for i, a in enumerate(batch):
            w2[i, : len(a)] = a
        print(f"host window assembly        "
              f"{(time.perf_counter()-t0)*1e3:8.1f} ms", flush=True)

    if "transfer" in STAGES:
        t = timed(lambda: jax.block_until_ready(jnp.asarray(windows)))
        print(f"h2d transfer f32 (92 MB)    {t*1e3:8.1f} ms", flush=True)
        w16 = (np.clip(windows, -1, 1) * 32767).astype(np.int16)
        t = timed(lambda: jax.block_until_ready(
            jnp.asarray(w16).astype(jnp.float32) / 32768.0))
        print(f"h2d transfer i16+convert    {t*1e3:8.1f} ms", flush=True)

    wj = jnp.asarray(windows)
    mel = engine._mel(windows)
    if "mel" in STAGES:
        from spittle_tpu.audio.mel import log_mel_spectrogram

        t = timed(lambda: engine._mel(wj))
        print(f"mel (CT-DFT path)           {t*1e3:8.1f} ms", flush=True)
        t = timed(lambda: log_mel_spectrogram(
            wj, n_mels=cfg.n_mels, use_fft=True))
        print(f"mel (rfft path)             {t*1e3:8.1f} ms", flush=True)

    xa = encode(params, mel, cfg)
    if "encode" in STAGES:
        enc_fn = jax.jit(lambda m: encode(params, m, cfg))
        t = timed(lambda: enc_fn(mel))
        print(f"encode                      {t*1e3:8.1f} ms", flush=True)

    if "crosskv" in STAGES:
        # The decoder's cross-attention K/V precompute (+ the fused
        # int8 form when BB_FULLC): 32 layers x 2 projections over
        # [B, 1500, 1280] — a non-layer stage invisible in both the
        # encoder and loop breakdowns. Stages are JITTED: timing the
        # eager call chain reads ~2x high from per-op dispatch over the
        # tunnel (2026-08-21: eager 296.8 ms vs jitted 148.2 at these
        # shapes — the bogus number launched a whole dead-end probe,
        # scripts/probe_crosskv.py).
        from spittle_tpu.models.whisper.model import (
            precompute_cross_kv, precompute_cross_kv_q8,
        )

        ck_fn = jax.jit(lambda x: precompute_cross_kv(params, x, cfg))
        t = timed(lambda: ck_fn(xa))
        print(f"cross-KV precompute         {t*1e3:8.1f} ms", flush=True)
        if FULLC:
            q_fn = jax.jit(
                lambda x: precompute_cross_kv_q8(params, x, cfg)
            )
            t = timed(lambda: q_fn(xa))
            print(f"cross-KV fused q8           {t*1e3:8.1f} ms",
                  flush=True)

    if "loop" in STAGES:
        opts = engine._decode_options(tparams)

        def run():
            return greedy_decode(
                params, xa, cfg, opts,
                lang_tokens=jnp.full((BATCH,), cfg.lang_begin, jnp.int32),
            )["tokens"]

        t = timed(run)
        print(f"greedy decode (rules on)    {t*1e3:8.1f} ms   "
              f"{t/TOKENS*1e3:6.2f} ms/tok", flush=True)


if __name__ == "__main__":
    main()
