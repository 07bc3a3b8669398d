"""Isolate the KV-cache bulk-write cost inside a while_loop (in-loop probe).

The hybrid decode (models/whisper/model.py:_decoder_step_blocks) reads the
stacked cache as a layer-scan xs, then lands all layers' fresh columns with
ONE dynamic_update_slice. On-chip it measured ~= the fori form (26.3 vs the
scan form's 23.5 ms/step, large-v3 b32), suggesting XLA copy-on-writes the
whole 671 MB cache at the DUS because the scan read keeps the buffer live
within the same loop iteration.

This probe times, per while_loop iteration over the SAME [L,2,B,H,Dh,ctx]
bf16 cache shape (large-v3 b32, ctx 128):

  read-only       lax.scan xs reduction over the cache (the attend analog)
  read+dus        scan read, then one bulk column DUS (the hybrid write)
  read+dus+bar    same with an optimization_barrier between read and write
  dus-only        bulk column DUS with no scan read (aliasing best case)
  scan-rewrite    cache as scan xs AND ys (the original write-per-layer form)
  ctx-major-dus   cache transposed to [ctx,L,2,B,H,Dh]; DUS on the leading
                  axis (contiguous slab) after the scan read

If read+dus ~= scan-rewrite, the DUS is copying; if dus-only is cheap, the
copy comes from the read liveness, not the DUS itself.

Usage: [CD_CTX=128] [CD_STEPS=96] python scripts/bench_cache_dus.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SPITTLE_JAX_CACHE", "/tmp/spittle_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

L, B, H, DH = 32, 32, 20, 64
CTX = int(os.environ.get("CD_CTX", "128"))
STEPS = int(os.environ.get("CD_STEPS", "96"))
REPS = 3


def timed(fn):
    np.asarray(fn())
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run(step_fn, cache):
    """96 dependent iterations; carry = (acc, cache, pos)."""

    def body(state):
        acc, c, pos = state
        acc, c = step_fn(acc, c, pos)
        return acc, c, pos + 1

    def cond(state):
        return state[2] < STEPS

    @jax.jit
    def go(cache):
        acc = jnp.zeros((B, H, 1, DH), jnp.bfloat16)
        final = jax.lax.while_loop(cond, body, (acc, cache, jnp.int32(0)))
        return final[0].sum()

    return timed(lambda: go(cache))


def scan_read(acc, cache):
    def rd(carry, cache_l):
        # k-slice reduction: touches every byte like the attend does
        return carry + cache_l[0].sum(axis=-1)[:, :, None, :], None

    out, _ = jax.lax.scan(rd, acc, cache)
    return out


def fresh_cols(acc):
    return jnp.broadcast_to(
        acc[None, None, :, :, 0, :, None], (L, 2, B, H, DH, 1)
    ).astype(jnp.bfloat16)


# -- Pallas aliased column write (the eighth direction) ----------------------
#
# input_output_aliasing is an explicit buffer-assignment constraint: the
# cache operand and the result share one HBM buffer, and the output
# BlockSpec touches ONLY the 128-lane block containing pos (Mosaic
# requires lane-dim blocks 128-divisible, so the single column lands via
# an in-kernel lane mask). If XLA honors the alias through the
# while_loop carry even with a scan read in the same iteration, the
# whole-cache copy-on-write disappears; if it inserts a copy anyway,
# that is the eighth measured direction on the law.
#
# Mosaic lowering notes (bisected on-chip, 2026-08-19): rank>3 blocks
# and mixed-rank refs (a rank-2 cols block next to rank-3 cache blocks)
# crash tpu_compile_helper with no front-end error; the working form is
# everything rank-3 via a free collapse-reshape, cols carried as
# [rows, HD, 1]. Dynamic lane-block index maps from a prefetched scalar
# DO lower.

_RB = 8  # row block (Mosaic: second-to-last block dim must be 8k)


def _alias_write_kernel(pos_ref, cols_ref, cache_ref, out_ref):
    # refs: cols [RB, HD, 1], cache/out [RB, HD, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 2)
    mask = lane == (pos_ref[0] % 128)
    out_ref[...] = jnp.where(mask, cols_ref[...], cache_ref[...])


def _alias_write_kernel_sub(pos_ref, cols_ref, cache_ref, out_ref):
    # refs: cols [RB, 1, HD], cache/out [RB, 8, HD]; ctx on sublanes
    sub = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    mask = sub == (pos_ref[0] % 8)
    out_ref[...] = jnp.where(mask, cols_ref[...], cache_ref[...])


def alias_col_write_sub(cache_t, cols, pos):
    """Aliased column write, ctx-on-sublanes layout.

    cache_t [rows, ctx, HD]; cols [rows, HD]. The written 8-sublane
    block is 1/16 of the cache at ctx=128 (vs the whole cache for the
    lane-dim form, where the minimum 128-lane block == ctx).
    """
    rows, ctx, hd = cache_t.shape
    cols3 = cols.reshape(rows, 1, hd)
    spec = pl.BlockSpec((_RB, 8, hd), lambda r, p: (r, p[0] // 8, 0))
    return pl.pallas_call(
        _alias_write_kernel_sub,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rows // _RB,),
            in_specs=[
                pl.BlockSpec((_RB, 1, hd), lambda r, p: (r, 0, 0)),
                spec,
            ],
            out_specs=spec,
        ),
        out_shape=jax.ShapeDtypeStruct(cache_t.shape, cache_t.dtype),
        input_output_aliases={2: 0},
        interpret=jax.default_backend() == "cpu",
    )(jnp.reshape(pos, (1,)).astype(jnp.int32), cols3, cache_t)


def alias_col_write(cache, cols, pos):
    """Write cols[...] into cache[..., pos] via the aliased kernel.

    cache [L, 2, B, H, DH, ctx]; cols [L, 2, B, H, DH].
    """
    L_, two, B_, H_, DH_, ctx = cache.shape
    rows, hd = L_ * two * B_, H_ * DH_
    flat = cache.reshape(rows, hd, ctx)
    cols3 = cols.reshape(rows, hd, 1)
    lane_spec = pl.BlockSpec(
        (_RB, hd, 128), lambda r, p: (r, 0, p[0] // 128)
    )
    out = pl.pallas_call(
        _alias_write_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rows // _RB,),
            in_specs=[
                pl.BlockSpec((_RB, hd, 1), lambda r, p: (r, 0, 0)),
                lane_spec,
            ],
            out_specs=lane_spec,
        ),
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
        input_output_aliases={2: 0},  # cache -> out (scalars count: gmm.py:507)
        interpret=jax.default_backend() == "cpu",
    )(jnp.reshape(pos, (1,)).astype(jnp.int32), cols3, flat)
    return out.reshape(cache.shape)


def main():
    key = jax.random.PRNGKey(0)
    cache = jax.random.normal(key, (L, 2, B, H, DH, CTX), jnp.bfloat16)
    cache_t = jnp.moveaxis(cache, -1, 0)  # [ctx, L, 2, B, H, Dh]
    gb = cache.size * 2 / 1e9
    print(json.dumps({"cache_gb": round(gb, 3), "ctx": CTX, "steps": STEPS}))

    def v_read(acc, c, pos):
        return scan_read(acc, c), c

    def v_read_dus(acc, c, pos):
        acc = scan_read(acc, c)
        c = jax.lax.dynamic_update_slice(
            c, fresh_cols(acc), (0, 0, 0, 0, 0, pos)
        )
        return acc, c

    def v_read_dus_bar(acc, c, pos):
        acc = scan_read(acc, c)
        acc, c = jax.lax.optimization_barrier((acc, c))
        c = jax.lax.dynamic_update_slice(
            c, fresh_cols(acc), (0, 0, 0, 0, 0, pos)
        )
        return acc, c

    def v_dus_only(acc, c, pos):
        c = jax.lax.dynamic_update_slice(
            c, fresh_cols(acc), (0, 0, 0, 0, 0, pos)
        )
        return acc + c[0, 0, :, :, :, 0][:, :, None, :], c

    def v_scan_rewrite(acc, c, pos):
        def rd(carry, cache_l):
            cache_l = jax.lax.dynamic_update_slice(
                cache_l,
                fresh_cols(carry)[0],
                (0, 0, 0, 0, pos),
            )
            return carry + cache_l[0].sum(axis=-1)[:, :, None, :], cache_l

        out, c = jax.lax.scan(rd, acc, c)
        return out, c

    def v_ctx_major(acc, c, pos):
        def rd(carry, cache_l):
            # cache_l: [ctx, 2, B, H, Dh] per layer? scan over layer axis=1
            return carry + cache_l[:, 0].sum(axis=0)[:, :, None, :], None

        out, _ = jax.lax.scan(rd, acc, jnp.moveaxis(c, 1, 0))
        slab = jnp.moveaxis(fresh_cols(out), -1, 0)  # [1,L,2,B,H,Dh]
        c = jax.lax.dynamic_update_slice(c, slab, (pos, 0, 0, 0, 0, 0))
        return out, c

    def v_read_aliaswrite(acc, c, pos):
        acc = scan_read(acc, c)
        c = alias_col_write(c, fresh_cols(acc)[..., 0], pos)
        return acc, c

    def v_aliaswrite_only(acc, c, pos):
        c = alias_col_write(c, fresh_cols(acc)[..., 0], pos)
        return acc + c[0, 0, :, :, :, 0][:, :, None, :], c

    for name, fn, arr in (
        ("read-only", v_read, cache),
        ("read+dus", v_read_dus, cache),
        ("read+dus+bar", v_read_dus_bar, cache),
        ("dus-only", v_dus_only, cache),
        ("scan-rewrite", v_scan_rewrite, cache),
        ("ctx-major-dus", v_ctx_major, cache_t),
        ("read+aliaswrite", v_read_aliaswrite, cache),
        ("aliaswrite-only", v_aliaswrite_only, cache),
    ):
        only = os.environ.get("CD_VARIANTS")
        if only and name not in only.split(","):
            continue
        try:
            t = run(fn, arr)
            print(
                json.dumps(
                    {
                        "variant": name,
                        "ms_per_step": round(t / STEPS * 1e3, 3),
                        "eff_read_gbps": round(gb * STEPS / t, 1),
                    }
                )
            )
        except Exception as e:  # noqa: BLE001 - report and continue
            print(json.dumps({"variant": name, "error": str(e)[:200]}))

    # -- PRODUCTION tmajor layout arms ([L, 2, B, H, ctx, Dh]) ----------
    # decode_step_tmajor carries the cache with ctx second-minor and
    # Dh=64 minor — a layout the original probe matrix never measured
    # directly (the "sub" arms below merge H into a 1280-wide minor).
    # These arms time the attend-shaped read (einsum contracting the
    # minor Dh) and the production ctx-axis bulk DUS at the exact carry
    # layout, so the 528-vs-866 GB/s question is answered for the form
    # the engine actually runs.
    only = os.environ.get("CD_VARIANTS")
    tmaj_names = ("read-only-tmaj", "read+dus-tmaj")
    if not only or any(n in only.split(",") for n in tmaj_names):
        c_tmaj = jnp.swapaxes(cache, -1, -2)  # [L, 2, B, H, CTX, DH]
        q_t = jax.random.normal(
            jax.random.PRNGKey(1), (B, H, 1, DH), jnp.bfloat16
        )

        def tmaj_read(acc, c):
            def rd(carry, cache_l):
                # attend-shaped: scores contract minor Dh, V-dot
                # contracts ctx — touches K and V like the real step
                s = jnp.einsum(
                    "bhqd,bhkd->bhqk", q_t, cache_l[0],
                    preferred_element_type=jnp.float32,
                )
                o = jnp.einsum(
                    "bhqk,bhkd->bhqd", s.astype(jnp.bfloat16), cache_l[1]
                )
                return carry + o, None

            out, _ = jax.lax.scan(rd, acc, c)
            return out

        def tv_read(acc, c, pos):
            return tmaj_read(acc, c), c

        def tv_read_dus(acc, c, pos):
            acc = tmaj_read(acc, c)
            cols = jnp.broadcast_to(
                acc[None, None, :, :, 0, None, :], (L, 2, B, H, 1, DH)
            ).astype(jnp.bfloat16)
            c = jax.lax.dynamic_update_slice(
                c, cols, (0, 0, 0, 0, pos, 0)
            )
            return acc, c

        for name, fn in (
            ("read-only-tmaj", tv_read),
            ("read+dus-tmaj", tv_read_dus),
        ):
            if only and name not in only.split(","):
                continue
            try:
                t = run(fn, c_tmaj)
                print(json.dumps({
                    "variant": name,
                    "ms_per_step": round(t / STEPS * 1e3, 3),
                    "eff_read_gbps": round(gb * STEPS / t, 1),
                }))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": name, "error": str(e)[:200]}))

    # -- hdmaj layout arms ([L, 2, B, ctx, H*Dh]) -----------------------
    # Candidate production layout: heads merged into a 1280-wide minor,
    # ctx second-minor. The sub arms below measured this family's RAW
    # REDUCTION at 866 GB/s vs production tmajor's 528 — these arms ask
    # whether the ATTEND-shaped read (per-head einsum through a free
    # reshape [B, ctx, H, Dh]) keeps that rate, and what read+DUS /
    # read+aliased-write cost here. If read wins and the write stays
    # in-place, the production form should migrate.
    hd_names = ("read-only-hdmaj", "read+dus-hdmaj", "read+alias-hdmaj")
    if not only or any(n in only.split(",") for n in hd_names):
        c_hd = jnp.reshape(
            jnp.moveaxis(cache, -1, -3),  # [L, 2, B, CTX, H, DH]
            (L, 2, B, CTX, H * DH),
        )
        q_h = jax.random.normal(
            jax.random.PRNGKey(2), (B, H, 1, DH), jnp.bfloat16
        )

        def hd_read(acc, c):
            def rd(carry, cache_l):
                k = cache_l[0].reshape(B, CTX, H, DH)
                v = cache_l[1].reshape(B, CTX, H, DH)
                s = jnp.einsum(
                    "bhqd,bkhd->bhqk", q_h, k,
                    preferred_element_type=jnp.float32,
                )
                o = jnp.einsum("bhqk,bkhd->bhqd", s.astype(jnp.bfloat16), v)
                return carry + o, None

            out, _ = jax.lax.scan(rd, acc, c)
            return out

        def hv_read(acc, c, pos):
            return hd_read(acc, c), c

        def hv_read_dus(acc, c, pos):
            acc = hd_read(acc, c)
            cols = jnp.broadcast_to(
                acc[None, None, :, None, :, 0, :], (L, 2, B, 1, H, DH)
            ).reshape(L, 2, B, 1, H * DH).astype(jnp.bfloat16)
            c = jax.lax.dynamic_update_slice(c, cols, (0, 0, 0, pos, 0))
            return acc, c

        def hv_read_alias(acc, c, pos):
            acc = hd_read(acc, c)
            cols = jnp.broadcast_to(
                acc[None, None, :, None, :, 0, :], (L, 2, B, 1, H, DH)
            ).reshape(L * 2 * B, H * DH).astype(jnp.bfloat16)
            flat = c.reshape(L * 2 * B, CTX, H * DH)
            flat = alias_col_write_sub(flat, cols, pos)
            return acc, flat.reshape(c.shape)

        for name, fn in (
            ("read-only-hdmaj", hv_read),
            ("read+dus-hdmaj", hv_read_dus),
            ("read+alias-hdmaj", hv_read_alias),
        ):
            if only and name not in only.split(","):
                continue
            try:
                t = run(fn, c_hd)
                print(json.dumps({
                    "variant": name,
                    "ms_per_step": round(t / STEPS * 1e3, 3),
                    "eff_read_gbps": round(gb * STEPS / t, 1),
                }))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": name, "error": str(e)[:200]}))

    # -- ctx-on-sublanes layout arms (for the aliased write) ------------
    # [L, 2B, ctx, HD]: the aliased kernel's minimum write block is 8
    # sublanes (1/16 of the cache at ctx=128) instead of 128 lanes (all
    # of it). read+dus-sub is the same-layout control for the law.
    sub_names = ("read-only-sub", "read+dus-sub", "read+aliaswrite-sub",
                 "aliaswrite-sub-only", "scan-rewrite-sub")
    if not only or any(n in only.split(",") for n in sub_names):
        rows, hd = L * 2 * B, H * DH
        c_sub = jnp.transpose(cache, (0, 1, 2, 5, 3, 4)).reshape(
            L, 2 * B, CTX, hd
        )

        def sub_read(acc, c):
            def rd(carry, cache_l):
                return carry + cache_l.sum((0, 1)), None

            out, _ = jax.lax.scan(rd, acc, c)
            return out

        def sub_fresh(acc):
            return jnp.broadcast_to(acc[None, :], (rows, hd)).astype(
                jnp.bfloat16
            )

        def sv_read(acc, c, pos):
            return sub_read(acc, c), c

        def sv_read_dus(acc, c, pos):
            acc = sub_read(acc, c)
            cols = sub_fresh(acc).reshape(L, 2 * B, 1, hd)
            c = jax.lax.dynamic_update_slice(c, cols, (0, 0, pos, 0))
            return acc, c

        def sv_read_alias(acc, c, pos):
            acc = sub_read(acc, c)
            c = alias_col_write_sub(
                c.reshape(rows, CTX, hd), sub_fresh(acc), pos
            ).reshape(L, 2 * B, CTX, hd)
            return acc, c

        def sv_alias_only(acc, c, pos):
            c = alias_col_write_sub(
                c.reshape(rows, CTX, hd), sub_fresh(acc), pos
            ).reshape(L, 2 * B, CTX, hd)
            return acc + c[0, 0, 0], c

        def sv_scan_rewrite(acc, c, pos):
            cols = sub_fresh(acc).reshape(L, 2 * B, 1, hd)

            def rd(carry, xs):
                cache_l, col_l = xs
                cache_l = jax.lax.dynamic_update_slice(
                    cache_l, col_l, (0, pos, 0)
                )
                return carry + cache_l.sum((0, 1)), cache_l

            out, c = jax.lax.scan(rd, acc, (c, cols))
            return out, c

        def run_sub(step_fn):
            def body(state):
                acc, c, pos = state
                acc, c = step_fn(acc, c, pos)
                return acc, c, pos + 1

            @jax.jit
            def go(c):
                acc = jnp.zeros((hd,), jnp.bfloat16)
                final = jax.lax.while_loop(
                    lambda s: s[2] < STEPS, body, (acc, c, jnp.int32(0))
                )
                return final[0].sum()

            return timed(lambda: go(c_sub))

        for name, fn in (
            ("read-only-sub", sv_read),
            ("read+dus-sub", sv_read_dus),
            ("read+aliaswrite-sub", sv_read_alias),
            ("aliaswrite-sub-only", sv_alias_only),
            ("scan-rewrite-sub", sv_scan_rewrite),
        ):
            if only and name not in only.split(","):
                continue
            try:
                t = run_sub(fn)
                print(json.dumps({
                    "variant": name,
                    "ms_per_step": round(t / STEPS * 1e3, 3),
                    "eff_read_gbps": round(gb * STEPS / t, 1),
                }))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": name, "error": str(e)[:200]}))

    # Pending-ring: big cache stays a READ-ONLY scan xs; the last R
    # columns live in a small [L, 2, B, H, Dh, R] ring rewritten as
    # scan ys each step; every R-th step a flush scan merges ring ->
    # cache (the expensive whole-slice rewrite, amortized by R).
    for ring in (8, 16, 32):
        if ring > CTX:
            continue
        if only and f"pending-ring-{ring}" not in only.split(","):
            continue

        def ring_step(acc, c, pend, pos):
            def flush(operands):
                c_, p_ = operands

                def fl(carry, xs):
                    cache_l, pend_l = xs
                    base = jnp.maximum(pos - ring, 0)
                    cache_l = jax.lax.dynamic_update_slice(
                        cache_l, pend_l, (0, 0, 0, 0, base)
                    )
                    return carry, cache_l

                _, c2 = jax.lax.scan(fl, 0, (c_, p_))
                return c2

            c = jax.lax.cond(
                (pos % ring == 0) & (pos > 0),
                flush,
                lambda operands: operands[0],
                (c, pend),
            )

            def rd(carry, xs):
                cache_l, pend_l = xs
                r = (
                    cache_l[0].sum(axis=-1) + pend_l[0].sum(axis=-1)
                )[:, :, None, :]
                pend_l = jax.lax.dynamic_update_slice(
                    pend_l,
                    fresh_cols(carry)[0],
                    (0, 0, 0, 0, pos % ring),
                )
                return carry + r, pend_l

            acc, pend = jax.lax.scan(rd, acc, (c, pend))
            return acc, c, pend

        def run_ring(cache):
            pend0 = jnp.zeros((L, 2, B, H, DH, ring), jnp.bfloat16)

            def body(state):
                acc, c, pend, pos = state
                acc, c, pend = ring_step(acc, c, pend, pos)
                return acc, c, pend, pos + 1

            def cond_(state):
                return state[3] < STEPS

            @jax.jit
            def go(cache):
                acc = jnp.zeros((B, H, 1, DH), jnp.bfloat16)
                final = jax.lax.while_loop(
                    cond_, body, (acc, cache, pend0, jnp.int32(0))
                )
                return final[0].sum()

            return timed(lambda: go(cache))

        try:
            t = run_ring(cache)
            print(
                json.dumps(
                    {
                        "variant": f"pending-ring-{ring}",
                        "ms_per_step": round(t / STEPS * 1e3, 3),
                        "eff_read_gbps": round(gb * STEPS / t, 1),
                    }
                )
            )
        except Exception as e:  # noqa: BLE001
            print(
                json.dumps(
                    {"variant": f"pending-ring-{ring}", "error": str(e)[:200]}
                )
            )


if __name__ == "__main__":
    main()
