"""In-loop decode-step breakdown for whisper-large-v3 (knockout ablation).

bench_chip.py measured this chip at ~637 GB/s streaming reads, yet the
large-v3 bf16 decode runs ~21-31 ms/step — 2-3x above the pure
cross-KV+weights byte count. This script finds where the time goes by
knocking out one component at a time and timing the SAME 96-step greedy
scan in-loop (the only honest measurement on this tunnel — single-call
timings are per-program-overhead-dominated, see ROUND_NOTES).

Components are removed by monkeypatching the model module's sublayer
functions before tracing a fresh program — production code carries no
bench hooks. Token feedback is a FIXED sequence for every variant (the
carry accumulates logits so nothing dead-codes away), so all variants
run identical control flow and differ only in the knocked-out compute.

Variants:
  full       — the real step (baseline)
  no-cross   — cross-attention returns q (drops cross-KV reads + dots)
  no-self    — cache attend returns q, cache writes skipped
  no-mlp     — MLP returns x (drops fc1/fc2 weight reads + GEMMs)
  no-logits  — logits head returns zeros (drops the 133 MB tok_emb read)

Usage: [BDB_BATCH=32] [BDB_STEPS=96] python scripts/bench_decode_breakdown.py
"""

import contextlib
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

B = int(os.environ.get("BDB_BATCH", "32"))
STEPS = int(os.environ.get("BDB_STEPS", "96"))
MODEL = os.environ.get("BDB_MODEL", "large-v3")
REPS = 3


def fetch(x):
    return np.asarray(x)


def timed(fn, reps=REPS):
    fetch(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@contextlib.contextmanager
def patched(mod, **repl):
    old = {k: getattr(mod, k) for k in repl}
    for k, v in repl.items():
        setattr(mod, k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            setattr(mod, k, v)


def main():
    from spittle_tpu.models.whisper import model as M
    from spittle_tpu.models.whisper.config import CONFIGS
    from spittle_tpu.models.whisper.model import (
        init_kv_cache, init_params, precompute_cross_kv,
    )

    cfg = CONFIGS[MODEL]
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    rng = np.random.default_rng(0)
    xa = jnp.asarray(
        rng.standard_normal((B, cfg.n_audio_ctx, cfg.n_audio_state)),
        jnp.bfloat16,
    )
    cross_kv = precompute_cross_kv(params, xa, cfg)
    ctx = -(-(STEPS + 8) // 32) * 32
    # BDB_STACK=fullc ablates the PRODUCTION winning stack instead of the
    # plain bf16 scan form: int8 decoder weights + int8 cross-KV + int8
    # self-cache, stepped through decode_step_tmajor (the default form
    # since 2026-08-19). The bf16 default keeps the historical ablation
    # comparable across rounds.
    STACK = os.environ.get("BDB_STACK", "bf16")
    if STACK == "fullc":
        from spittle_tpu.ops.attention import pad_cross_kv
        from spittle_tpu.ops.quant import quantize_kv, quantize_whisper_decoder

        # HBM discipline: unlike the engine (whose encoder/params are
        # already int8 at this point), this harness holds a full bf16
        # init — drop the encoder tree and free each bf16 cross-KV half
        # as soon as its int8 copy exists, or large-v3 b32 OOMs.
        params = quantize_whisper_decoder(params)
        params = {"decoder": params["decoder"]}
        # Quantize per LAYER: kv_bf itself stays fully live until after
        # the loop — what the per-layer jitted call bounds to 1/32 is
        # the fp32 quantization intermediate inside quantize_kv (plus
        # the int8 temporaries), which at ~7.9 GB for the whole tensor
        # at b32 was the OOM driver.
        lq = jax.jit(quantize_kv)

        def _quant_free(kv_bf):
            qs = [jax.block_until_ready(lq(kv_bf[i]))
                  for i in range(kv_bf.shape[0])]
            kv_bf.delete()
            return {
                "qw": jnp.stack([q["qw"] for q in qs]),
                "scale": jnp.stack([q["scale"] for q in qs]),
            }

        ck_bf, cv_bf = cross_kv
        qk = _quant_free(ck_bf)
        qv = _quant_free(cv_bf)
        xa.delete()
        cross_kv = pad_cross_kv((qk, qv))
        cache0 = M.transpose_cache_tmajor(
            init_kv_cache(cfg, B, jnp.bfloat16, ctx=ctx, quant=True)
        )
    else:
        cache0 = init_kv_cache(cfg, B, jnp.bfloat16, ctx=ctx)
    # Fixed token path: every variant feeds the same ids, so programs
    # differ only in the knocked-out compute.
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (STEPS, B)), jnp.int32)

    def build():
        if STACK == "fullc":
            step = M.decode_step_tmajor  # plain function (caller jits)
        else:
            step = M.decode_step.__wrapped__  # unjitted body

        @jax.jit
        def run(params, cache0, cross_kv, toks):
            def body(carry, tok):
                cache, acc, pos = carry
                logits, cache = step(
                    params, tok, pos, cache, cross_kv, cfg
                )
                return (cache, acc + jnp.sum(logits), pos + 1), ()

            (cache, acc, _), _ = jax.lax.scan(
                body, (cache0, jnp.float32(0.0), jnp.int32(4)), toks
            )
            # Consume the final cache too: without this, a variant whose
            # logits don't depend on the decoder (no-logits) dead-codes
            # the entire layer stack including the cache writes. One
            # full-cache read at program end, amortized over STEPS.
            leaves = jax.tree_util.tree_leaves(cache)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        return lambda: run(params, cache0, cross_kv, toks)

    results = {}

    def measure(name):
        t = timed(build())
        results[name] = t
        print(json.dumps({
            "variant": name,
            "ms_total": round(t * 1e3, 1),
            "ms_per_step": round(t / STEPS * 1e3, 3),
        }), flush=True)

    print(json.dumps({"model": MODEL, "batch": B, "steps": STEPS,
                      "ctx": ctx}), flush=True)
    measure("full")

    with patched(M, _cross_attention=lambda cq, ck, cv, dh, kv_len=0: cq):
        measure("no-cross")
    # The self knockouts patch BOTH decode forms: the scan/fori path
    # (_cache_attend/_cache_write) and the default hybrid path
    # (_attend_fresh_column + _write_columns_bulk). The hybrid attend
    # knockout still emits a correctly-shaped ys column (nearly free)
    # so the bulk write stays traceable.
    def _fresh_noattend(q, cache_l, k_new, v_new, pos, col):
        dtype = cache_l.dtype if not isinstance(cache_l, dict) else q.dtype
        ys = jnp.stack(
            [k_new.astype(dtype), v_new.astype(dtype)]
        ).swapaxes(-1, -2)
        return q, ys

    def _fresh_noattend_t(q, cache_l, k_new, v_new, pos, col):
        # tmajor emits [2, B, H, 1, Dh] columns; the int8 dict cache
        # wants (qw int8, scale f32 [2, B, H, 1]) so the bulk write
        # stays traceable with the attend knocked out.
        new = jnp.stack([k_new, v_new])
        if isinstance(cache_l, dict):
            return q, (
                new.astype(jnp.int8),
                jnp.ones(new.shape[:-1], jnp.float32),
            )
        return q, new.astype(cache_l.dtype)

    with patched(
        M,
        _cache_attend=lambda q, cache_l, mask: q,
        _cache_write=lambda cache_l, k, v, pos: cache_l,
        _attend_fresh_column=_fresh_noattend,
        _write_columns_bulk=lambda cache, cols, pos: cache,
        _attend_fresh_column_t=_fresh_noattend_t,
        _write_columns_bulk_t=lambda cache, cols, pos: cache,
    ):
        measure("no-self")
    # Split the self-attention cost: the column WRITE into the time-minor
    # cache layout vs the attend READ of the whole cache.
    with patched(
        M,
        _cache_write=lambda cache_l, k, v, pos: cache_l,
        _write_columns_bulk=lambda cache, cols, pos: cache,
        _write_columns_bulk_t=lambda cache, cols, pos: cache,
    ):
        measure("no-self-write")
    with patched(
        M,
        _cache_attend=lambda q, cache_l, mask: q,
        _attend_fresh_column=_fresh_noattend,
        _attend_fresh_column_t=_fresh_noattend_t,
    ):
        measure("no-self-attend")
    with patched(M, _mlp=lambda x, blk: x):
        measure("no-mlp")
    # Keep h alive through a cheap consumer (otherwise the whole layer
    # stack except cache writes dead-codes away): broadcast a reduction
    # of h to logits shape — no tok_emb read, no [D, V] matmul.
    with patched(
        M,
        logits_from_hidden=lambda params, h: jnp.broadcast_to(
            jnp.sum(h, axis=-1, keepdims=True).astype(jnp.float32),
            h.shape[:-1] + (cfg.n_vocab,),
        ),
    ):
        measure("no-logits")

    if STACK == "fullc":
        _report_marginals(results, STEPS)
        return  # deferred/ring are scan-form experiments (bf16 cache)

    # The production greedy-loop form: deferred cache writes (pending
    # columns land at the top of the next iteration — in-place DUS; see
    # model.decode_form docstring). Mirrors the _greedy_loop carry.
    def build_deferred():
        @jax.jit
        def run(params, cache0, cross_kv, toks):
            pending0 = M.init_pending(cache0, 4)

            def body(carry, tok):
                cache, pending, acc, pos = carry
                logits, cache, pending = M.decode_step_deferred(
                    params, tok, pos, cache, pending, cross_kv, cfg
                )
                return (cache, pending, acc + jnp.sum(logits), pos + 1), ()

            (cache, pending, acc, pos), _ = jax.lax.scan(
                body, (cache0, pending0, jnp.float32(0.0), jnp.int32(4)),
                toks,
            )
            cache = M._write_columns_bulk(cache, pending, pos - 1)
            leaves = jax.tree_util.tree_leaves(cache)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        return lambda: run(params, cache0, cross_kv, toks)

    try:
        t = timed(build_deferred())
        results["full-deferred"] = t
        print(json.dumps({
            "variant": "full-deferred",
            "ms_total": round(t * 1e3, 1),
            "ms_per_step": round(t / STEPS * 1e3, 3),
        }), flush=True)
    except Exception as e:
        print(json.dumps({
            "variant": "full-deferred",
            "error": str(e).replace("\n", " ")[:200],
        }), flush=True)

    # Pending-ring form (decode_step_ring): big cache read-only, last R
    # columns staged in a small ring flushed every R steps.
    def build_ring(ring):
        cache_r = init_kv_cache(cfg, B, jnp.bfloat16, ctx=ctx + ring)

        @jax.jit
        def run(params, cache0, cross_kv, toks):
            pend0 = M.init_ring(cache0, ring)

            def body(carry, tok):
                cache, pend, fl, acc, pos = carry
                logits, cache, pend, fl = M.decode_step_ring(
                    params, tok, pos, cache, pend, fl, cross_kv, cfg
                )
                return (cache, pend, fl, acc + jnp.sum(logits), pos + 1), ()

            (cache, pend, fl, acc, _), _ = jax.lax.scan(
                body,
                (cache0, pend0, jnp.int32(4), jnp.float32(0.0),
                 jnp.int32(4)),
                toks,
            )
            cache = M._ring_flush(cache, pend, fl)
            leaves = jax.tree_util.tree_leaves(cache)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        return lambda: run(params, cache_r, cross_kv, toks)

    for ring in (8, 16, 32):
        try:
            t = timed(build_ring(ring))
            results[f"full-ring{ring}"] = t
            print(json.dumps({
                "variant": f"full-ring{ring}",
                "ms_total": round(t * 1e3, 1),
                "ms_per_step": round(t / STEPS * 1e3, 3),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "variant": f"full-ring{ring}",
                "error": str(e).replace("\n", " ")[:200],
            }), flush=True)

    _report_marginals(results, STEPS)


def _report_marginals(results, steps):
    full = results["full"]
    for name in ("no-cross", "no-self", "no-self-write",
                 "no-self-attend", "no-mlp", "no-logits"):
        if name in results:
            print(json.dumps({
                "component": name[3:],
                "marginal_ms_per_step": round(
                    (full - results[name]) / steps * 1e3, 3),
                "share_of_full": round(1 - results[name] / full, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
