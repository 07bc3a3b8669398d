"""Speculative greedy decoding: draft model proposes, main model verifies.

Serving accelerator for the memory-bound decode loop: a small draft
Whisper (e.g. tiny/distil, SAME token table as the main model) proposes K
tokens with cheap steps; the main model scores all K in ONE decode_block
pass (bandwidth ~= a single step, since decode reads weights + cross-KV
regardless of K). Accepted prefixes advance multiple positions per main-
model pass; output is EXACTLY the main model's greedy transcript — the
invariant tests decode with a completely different random draft and
require token equality with greedy_decode.

Batched semantics: acceptance is per-row, but cache positions are global,
so each round advances by the minimum acceptance over unfinished rows
(+1 for the free token from the previous round's logits). Rows that
accepted more re-derive those tokens deterministically in later rounds.
Cache slots above the advance point hold stale draft K/V but are never
read (causal mask) and are overwritten by the next block's write-before-
attend.

whisper.cpp has no counterpart (the reference decodes serially); this is
a north-star serving feature. Temperature-0 only: sampling breaks the
verify-equality argument.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from .config import WhisperConfig
from .decode import DecodeOptions, _process_logits, _static_suppress_mask, sot_sequence
from .model import (
    decode_block,
    decode_step,
    decoder_prefill,
    precompute_cross_kv,
)

NEG_INF = -1e30


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "draft_cfg", "opts", "prefix_len", "draft_k"),
)
def _speculative_loop(
    params,
    draft_params,
    xa: jnp.ndarray,
    draft_xa: jnp.ndarray,
    prefix: jnp.ndarray,  # [B, P]
    cfg: WhisperConfig,
    draft_cfg: WhisperConfig,
    opts: DecodeOptions,
    prefix_len: int,
    draft_k: int,
):
    b = xa.shape[0]
    kk = draft_k
    # opts.max_tokens is the DECODE BUDGET (whisper.cpp n_max_text_ctx
    # analog): the buffer holds prefix + budget, clamped to the model's
    # text context. Treating it as the total length crashed on long
    # carried prompts (negative buffer) or silently truncated later
    # windows to a near-zero generation budget.
    max_len = min(
        cfg.n_text_ctx,
        prefix_len + (opts.max_tokens or cfg.n_text_ctx),
    )
    # Blocks may write up to pos+K-1 < max_len+K; budget the caches for it.
    ctx = min(cfg.n_text_ctx, -(-(max_len + kk) // 32) * 32)
    buf_len = max_len + kk

    static_mask = jnp.asarray(
        _static_suppress_mask(cfg, opts, audio_ctx=xa.shape[1])
    )
    if opts.quant_kv and opts.quant_kv_bits == 8 and not opts.quant_kv_w8a8:
        # Plain int8: the fused per-layer path (precompute_cross_kv_q8)
        # that never materializes the full bf16 K/V pair. Draft shares
        # the target's quantization so an accept/reject decision never
        # compares mixed precisions.
        from spittle_tpu.models.whisper.model import precompute_cross_kv_q8

        cross_kv = precompute_cross_kv_q8(params, xa, cfg)
        d_cross_kv = precompute_cross_kv_q8(draft_params, draft_xa, draft_cfg)
    else:
        cross_kv = precompute_cross_kv(params, xa, cfg)
        d_cross_kv = precompute_cross_kv(draft_params, draft_xa, draft_cfg)
        if opts.quant_kv:
            from spittle_tpu.ops.quant import (
                quantize_kv, quantize_kv_int4, quantize_kv_w8a8,
            )

            qf = (
                quantize_kv_int4 if opts.quant_kv_bits == 4
                else quantize_kv_w8a8 if opts.quant_kv_w8a8
                else quantize_kv
            )
            cross_kv = (qf(cross_kv[0]), qf(cross_kv[1]))
            d_cross_kv = (qf(d_cross_kv[0]), qf(d_cross_kv[1]))

    pre_logits, cache = decoder_prefill(
        params, prefix, cross_kv, cfg, ctx, quant_cache=opts.quant_cache
    )
    _, d_cache = decoder_prefill(draft_params, prefix, d_cross_kv,
                                 draft_cfg, ctx, quant_cache=opts.quant_cache)
    from spittle_tpu.ops.attention import pad_cross_kv

    cross_kv = pad_cross_kv(cross_kv)
    d_cross_kv = pad_cross_kv(d_cross_kv)

    tokens = jnp.concatenate(
        [prefix, jnp.full((b, buf_len - prefix_len), cfg.eot, jnp.int32)],
        axis=1,
    )

    state = dict(
        tokens=tokens,
        pos=jnp.asarray(prefix_len, jnp.int32),
        cache=cache,
        d_cache=d_cache,
        cur_logits=pre_logits[:, -1].astype(jnp.float32),
        finished=jnp.zeros(b, bool),
        # timestamp_begin - 1 = "no timestamp yet" sentinel (decode.py)
        ts_floor=jnp.full(b, cfg.timestamp_begin - 1, jnp.int32),
        sum_logprob=jnp.zeros(b, jnp.float32),
        length=jnp.zeros(b, jnp.int32),
        rounds=jnp.asarray(0, jnp.int32),
        accepted_total=jnp.asarray(0, jnp.int32),
    )

    def last_two(toks, pos):
        last = jnp.take_along_axis(
            toks, jnp.maximum(pos - 1, 0)[None, None].repeat(b, 0), 1
        )[:, 0]
        penult = jnp.take_along_axis(
            toks, jnp.maximum(pos - 2, 0)[None, None].repeat(b, 0), 1
        )[:, 0]
        return last, penult

    def proc(logits, pos, last, penult, ts_floor):
        return _process_logits(
            logits, cfg=cfg, opts=opts, static_mask=static_mask, pos=pos,
            sample_begin=prefix_len, last_tok=last, penult_tok=penult,
            ts_floor=ts_floor,
        )

    def cond(s):
        return (s["pos"] < max_len) & jnp.any(~s["finished"])

    def body(s):
        pos = s["pos"]
        last0, penult0 = last_two(s["tokens"], pos)

        # Token 0 is free: the main model's logits for `pos` are in hand.
        logits0 = proc(s["cur_logits"], pos, last0, penult0, s["ts_floor"])
        lsm0 = jax.nn.log_softmax(logits0, axis=-1)
        t0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
        t0 = jnp.where(s["finished"], cfg.eot, t0)

        # Draft chain: feed [t0, d1..d_{K-1}] at positions pos..pos+K-1 so
        # the draft cache stays valid even under full acceptance. The
        # draft applies the SAME logits rules as verification (with its
        # own rolling last/penult/ts_floor), so acceptance only hinges on
        # the models' raw distributions, not on rule mismatches.
        def draft_step(carry, j):
            tok, penult, ts_d, d_cache = carry
            d_logits, d_cache = decode_step(
                draft_params, tok, pos + j, d_cache, d_cross_kv, draft_cfg,
                audio_ctx=draft_xa.shape[1],
            )
            is_ts = tok >= cfg.timestamp_begin
            # Pair-close -> strictly-greater floor (mirrors decode.py).
            new_floor = jnp.where(
                (penult >= cfg.timestamp_begin)
                | (ts_d < cfg.timestamp_begin),  # initial opener
                tok + 1, tok,
            )
            ts_d = jnp.where(is_ts & ~s["finished"], new_floor, ts_d)
            pl = proc(d_logits.astype(jnp.float32), pos + j + 1, tok,
                      penult, ts_d)
            nxt = jnp.argmax(pl, axis=-1).astype(jnp.int32)
            nxt = jnp.where(s["finished"], cfg.eot, nxt)
            return (nxt, tok, ts_d, d_cache), nxt

        (_, _, _, d_cache), drafts = jax.lax.scan(
            draft_step, (t0, last0, s["ts_floor"], s["d_cache"]),
            jnp.arange(kk),
        )
        # block[:, 0] = t0, block[:, j] = draft proposal for pos+j.
        block = jnp.concatenate([t0[:, None], drafts[:-1].T], axis=1)  # [B,K]

        # Main model verifies the whole block in one pass.
        logits_blk, cache = decode_block(
            params, block, pos, s["cache"], cross_kv, cfg,
            audio_ctx=xa.shape[1],
        )
        logits_blk = logits_blk.astype(jnp.float32)

        # Rules-processed argmax at each block position, assuming the
        # prefix was accepted (valid wherever acceptance reaches).
        def rules_scan(carry, j):
            last, penult, ts_floor = carry
            tok_j = block[:, j]
            is_ts = tok_j >= cfg.timestamp_begin
            new_floor = jnp.where(
                (last >= cfg.timestamp_begin)
                | (ts_floor < cfg.timestamp_begin),  # initial opener
                tok_j + 1, tok_j,
            )
            ts_floor = jnp.where(is_ts & ~s["finished"], new_floor, ts_floor)
            pl = proc(logits_blk[:, j], pos + j + 1, tok_j, last, ts_floor)
            m = jnp.argmax(pl, axis=-1).astype(jnp.int32)
            lp = jax.nn.log_softmax(pl, axis=-1)
            return (tok_j, last, ts_floor), (m, lp)

        (_, _, _), (m_all, lsm_all) = jax.lax.scan(
            rules_scan, (last0, penult0, s["ts_floor"]), jnp.arange(kk)
        )
        # m_all[j]: greedy token for position pos+j+1 given block[:, :j+1].

        # Per-row acceptance: drafts block[:, j] (j>=1) match m_all[j-1]?
        acc = jnp.zeros((b,), jnp.int32)
        if kk > 1:
            match = (block[:, 1:].T == m_all[: kk - 1]).astype(jnp.int32)
            acc = jnp.sum(jnp.cumprod(match, axis=0), axis=0)  # [B] 0..K-1
        acc = jnp.where(s["finished"], kk - 1, acc)
        advance = 1 + jnp.min(acc)  # uniform advance, 1..K
        if opts.rig_advance:
            # Timing rig (see DecodeOptions.rig_advance): identical
            # compute path — draft chain, block verify, emit scan all
            # run — only the advance decision is pinned, publishing
            # wall-clock(acceptance) so real weights land on a known
            # curve.
            advance = jnp.asarray(
                min(opts.rig_advance, kk), jnp.int32
            )

        # Emit block[:, :advance]; bookkeeping over a static-K masked scan.
        def emit_scan(carry, j):
            finished, ts_floor, length, sum_lp = carry
            emitted = (j < advance) & (pos + j < max_len)
            tok_j = block[:, j]
            lp_j = jnp.where(
                j == 0,
                jnp.take_along_axis(lsm0, tok_j[:, None], 1)[:, 0],
                jnp.take_along_axis(
                    lsm_all[jnp.maximum(j - 1, 0)], tok_j[:, None], 1
                )[:, 0],
            )
            newly = ~finished & emitted
            sum_lp = sum_lp + jnp.where(newly, lp_j, 0.0)
            length = length + newly.astype(jnp.int32)
            is_ts = tok_j >= cfg.timestamp_begin
            prev_j = jnp.where(j == 0, last0, block[:, jnp.maximum(j - 1, 0)])
            new_floor = jnp.where(
                (prev_j >= cfg.timestamp_begin)
                | (ts_floor < cfg.timestamp_begin),  # initial opener
                tok_j + 1, tok_j,
            )
            ts_floor = jnp.where(is_ts & newly, new_floor, ts_floor)
            finished = finished | (emitted & (tok_j == cfg.eot))
            return (finished, ts_floor, length, sum_lp), None

        (finished, ts_floor, length, sum_logprob), _ = jax.lax.scan(
            emit_scan,
            (s["finished"], s["ts_floor"], s["length"], s["sum_logprob"]),
            jnp.arange(kk),
        )

        tokens = jax.lax.dynamic_update_slice(s["tokens"], block, (0, pos))
        # cur_logits for the new position: the RAW main-model logits from
        # the last accepted slot — the next round applies the rules once,
        # exactly like the plain greedy loop (re-processing processed
        # logits is not idempotent for the sum-probability rule).
        cur_logits = jnp.take_along_axis(
            logits_blk,  # [B, K, V] raw
            jnp.full((b, 1, 1), advance - 1),
            axis=1,
        )[:, 0]

        return dict(
            tokens=tokens,
            pos=pos + advance,
            cache=cache,
            d_cache=d_cache,
            cur_logits=cur_logits,
            finished=finished,
            ts_floor=ts_floor,
            sum_logprob=sum_logprob,
            length=length,
            rounds=s["rounds"] + 1,
            accepted_total=s["accepted_total"] + advance,
        )

    final = jax.lax.while_loop(cond, body, state)

    # Discard overshoot and stale draft garbage beyond the final position.
    valid = jnp.arange(buf_len)[None, :] < jnp.minimum(final["pos"], max_len)
    toks = jnp.where(valid, final["tokens"], cfg.eot)[:, :max_len]
    return dict(
        tokens=toks,
        pre_logits=pre_logits,
        sum_logprob=final["sum_logprob"],
        length=final["length"],
        rounds=final["rounds"],
        accepted_total=final["accepted_total"],
    )


def speculative_greedy_decode(
    params,
    draft_params,
    xa: jnp.ndarray,
    draft_xa: jnp.ndarray,
    cfg: WhisperConfig,
    draft_cfg: WhisperConfig,
    opts: DecodeOptions = DecodeOptions(),
    draft_k: int = 4,
    lang_tokens: Optional[jnp.ndarray] = None,
    prompt_tokens: Sequence[int] = (),
) -> Dict[str, Any]:
    """greedy_decode surface, accelerated by a draft model.

    Requires the draft to share the main model's token table (cfg token
    ids equal); output tokens are exactly greedy_decode(params, ...).
    """
    if opts.temperature != 0.0:
        raise ValueError("speculative decoding is temperature-0 only")
    for attr in ("n_vocab", "sot", "eot", "timestamp_begin", "lang_begin"):
        if getattr(cfg, attr) != getattr(draft_cfg, attr):
            raise ValueError(
                f"draft/main token layout mismatch on {attr}: "
                f"{getattr(draft_cfg, attr)} vs {getattr(cfg, attr)}"
            )
    b = xa.shape[0]
    if opts.language is not None and lang_tokens is None and cfg.multilingual:
        from .tokenizer import LANGUAGES, LANGUAGES_V3

        langs = LANGUAGES_V3 if cfg.n_langs == 100 else LANGUAGES
        lang_tokens = jnp.full(
            (b,), cfg.lang_begin + langs.index(opts.language), jnp.int32
        )
    sot_seq = list(
        sot_sequence(cfg, lang_token=0, task=opts.task,
                     timestamps=opts.timestamps)
    )
    prompt_prefix = [cfg.sot_prev, *prompt_tokens] if prompt_tokens else []
    sot_pos = len(prompt_prefix)
    prefix_list = prompt_prefix + sot_seq
    prefix = jnp.asarray(prefix_list, jnp.int32)[None].repeat(b, 0)
    if cfg.multilingual:
        if lang_tokens is None:
            lang_tokens = jnp.full((b,), cfg.lang_begin, jnp.int32)
        prefix = prefix.at[:, sot_pos + 1].set(lang_tokens)

    out = _speculative_loop(
        params, draft_params, xa, draft_xa, prefix, cfg, draft_cfg, opts,
        prefix_len=len(prefix_list), draft_k=draft_k,
    )
    pre_logits = out["pre_logits"]
    no_speech_prob = jax.nn.softmax(
        pre_logits[:, min(sot_pos, pre_logits.shape[1] - 1)], axis=-1
    )[:, cfg.no_speech]
    avg_logprob = out["sum_logprob"] / jnp.maximum(out["length"], 1)
    return {
        "tokens": out["tokens"],
        "sample_begin": len(prefix_list),
        "avg_logprob": avg_logprob,
        "no_speech_prob": no_speech_prob,
        "length": out["length"],
        "rounds": out["rounds"],
        "accepted_total": out["accepted_total"],
    }
