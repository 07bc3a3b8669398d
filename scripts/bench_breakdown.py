"""On-chip breakdown of the honest engine path (bench.py shape).

Times each stage of WhisperEngine.transcribe_batch separately —
host window assembly, mel, encoder, cross-KV precompute, prefill,
rule-applying decode loop, rules-light decode, raw decode_step scan —
to locate where the batch-48 x 30 s wall time goes.
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
REPS = 3


def timed(fn, *args, reps=REPS):
    out = fn(*args)
    jax.tree.map(
        lambda a: np.asarray(a) if hasattr(a, "dtype") else a, out
    )  # host fetch = completion barrier
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(
            lambda a: np.asarray(a) if hasattr(a, "dtype") else a, out
        )
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    import dataclasses

    from spittle_tpu.audio.mel import log_mel_spectrogram
    from spittle_tpu.engine.base import TranscribeParams
    from spittle_tpu.engine.whisper_engine import WhisperEngine
    from spittle_tpu.models.whisper.decode import DecodeOptions, _greedy_loop
    from spittle_tpu.models.whisper.model import (
        decode_step,
        encode,
        init_kv_cache,
        precompute_cross_kv,
    )

    engine = WhisperEngine(dtype=jnp.bfloat16)
    engine.load_model("random:large-v3-turbo")
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

    # full engine call
    engine.transcribe_batch(batch, tparams)  # warm
    t0 = time.perf_counter()
    engine.transcribe_batch(batch, tparams)
    total = time.perf_counter() - t0
    print(f"total transcribe_batch      {total*1e3:8.1f} ms   "
          f"RTFx={BATCH*30/total:.0f}")

    # host window assembly
    t0 = time.perf_counter()
    windows = np.zeros((BATCH, engine.window_samples), np.float32)
    for i, a in enumerate(batch):
        windows[i, : len(a)] = a
    t_host = time.perf_counter() - t0
    print(f"host window assembly        {t_host*1e3:8.1f} ms")

    wj = jnp.asarray(windows)

    t_mel, mel = timed(
        jax.jit(lambda w: log_mel_spectrogram(w, n_mels=cfg.n_mels)), wj
    )
    print(f"mel                         {t_mel*1e3:8.1f} ms")

    t_enc, xa = timed(
        jax.jit(lambda m: encode(params, m, cfg), static_argnums=()), mel
    )
    print(f"encode                      {t_enc*1e3:8.1f} ms")

    t_kv, cross_kv = timed(
        jax.jit(lambda x: precompute_cross_kv(params, x, cfg)), xa
    )
    print(f"precompute_cross_kv         {t_kv*1e3:8.1f} ms")

    # full rule-applying loop (what the engine runs)
    opts = DecodeOptions(
        task="transcribe", language="en", timestamps=True,
        space_token=engine._space_token, max_tokens=TOKENS,
    )
    prefix = jnp.asarray(
        [[cfg.sot, cfg.lang_begin, cfg.sot + 2, cfg.no_timestamps - 0]]
        , jnp.int32
    ).repeat(BATCH, 0)  # approximate sot sequence shape (4 tokens)

    def run_loop(o):
        final, pre = _greedy_loop(
            params, xa, prefix, cfg, o, prefix_len=prefix.shape[1],
            temperature=jnp.asarray(0.0, jnp.float32), sample=False,
        )
        return final["tokens"]

    t_loop, _ = timed(run_loop, opts)
    print(f"greedy loop (rules on)      {t_loop*1e3:8.1f} ms   "
          f"{t_loop/TOKENS*1e3:6.2f} ms/tok")

    opts_nots = dataclasses.replace(opts, timestamps=False)
    t_loop2, _ = timed(run_loop, opts_nots)
    print(f"greedy loop (no ts rules)   {t_loop2*1e3:8.1f} ms   "
          f"{t_loop2/TOKENS*1e3:6.2f} ms/tok")

    # raw scan (round-1 style): no rules, fori over decode_step
    from spittle_tpu.ops.attention import pad_cross_kv

    ckv = pad_cross_kv(cross_kv)

    @jax.jit
    def raw_scan(xa_):
        cache = init_kv_cache(cfg, BATCH, dtype=xa_.dtype, ctx=TOKENS)

        def body(carry, pos):
            tok, cache = carry
            logits, cache = decode_step(params, tok, pos, cache, ckv, cfg)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, cache), nxt

        init = jnp.full((BATCH,), cfg.sot, jnp.int32)
        (_, _), toks = jax.lax.scan(body, (init, cache), jnp.arange(TOKENS))
        return toks

    t_raw, _ = timed(raw_scan, xa)
    print(f"raw decode_step scan        {t_raw*1e3:8.1f} ms   "
          f"{t_raw/TOKENS*1e3:6.2f} ms/tok")

    acc = t_mel + t_enc + t_loop + t_host
    print(f"sum of stages               {acc*1e3:8.1f} ms "
          f"(vs total {total*1e3:.1f} -> "
          f"unaccounted {max(0.0, total-acc)*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
