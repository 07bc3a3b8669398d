"""Batched beam-search decoding for Whisper.

whisper.cpp's BeamSearch strategy (the reference's whisper engines expose
beam decoding through transcribe-rs; SURVEY §2.2 row 1) re-implemented as a
fully batched JAX loop: every batch item carries `beam_size` hypotheses,
one `lax.while_loop` steps all B*K beams through the shared KV cache, the
logits pass through the same suppression/timestamp rules as greedy, and
beam reselection gathers the cache along the beam axis. Finished beams are
frozen (score kept, EOT re-emitted) and the search stops when every beam of
every item has finished or the context fills.

Scoring is sum-logprob (whisper.cpp default, patience 1.0); the best beam
per item is returned along with its avg logprob.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .decode import DecodeOptions, NEG_INF, _process_logits, _static_suppress_mask, sot_sequence
from .model import decode_step, decoder_prefill, precompute_cross_kv


def _expand_beams(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """[B, ...] -> [B*K, ...] by repeating each item K times."""
    return jnp.repeat(x, k, axis=0)


@functools.partial(
    jax.jit, static_argnames=("cfg", "opts", "prefix_len", "beam_size")
)
def _beam_loop(
    params,
    xa: jnp.ndarray,
    prefix: jnp.ndarray,  # [B, P]
    cfg: WhisperConfig,
    opts: DecodeOptions,
    prefix_len: int,
    beam_size: int,
):
    b = xa.shape[0]
    k = beam_size
    bk = b * k
    # opts.max_tokens is the DECODE BUDGET (whisper.cpp n_max_text_ctx
    # analog): the buffer holds prefix + budget, clamped to the model's
    # text context. Treating it as the total length crashed on long
    # carried prompts (negative buffer) or silently truncated later
    # windows to a near-zero generation budget.
    max_len = min(
        cfg.n_text_ctx,
        prefix_len + (opts.max_tokens or cfg.n_text_ctx),
    )
    static_mask = jnp.asarray(
        _static_suppress_mask(cfg, opts, audio_ctx=xa.shape[1])
    )

    # Cross K/V computed ONCE per item and shared by its beams: the
    # cross-attention core folds beams into the query axis, so K/V stream
    # from HBM once per item per step instead of once per beam
    # (model.py:_cross_attention).
    if opts.quant_kv and opts.quant_kv_bits == 8:
        from spittle_tpu.models.whisper.model import precompute_cross_kv_q8

        cross_kv = precompute_cross_kv_q8(params, xa, cfg)
    else:
        cross_kv = precompute_cross_kv(params, xa, cfg)
        if opts.quant_kv:
            from spittle_tpu.ops.quant import quantize_kv_int4

            cross_kv = (quantize_kv_int4(cross_kv[0]),
                        quantize_kv_int4(cross_kv[1]))
    ctx = min(cfg.n_text_ctx, -(-max_len // 32) * 32)
    prefix_k = _expand_beams(prefix, k)

    # Single teacher-forced pass prefills all beams' caches (see
    # decoder_prefill: token-by-token prefill re-reads weights per token).
    all_logits, cache = decoder_prefill(
        params, prefix_k, cross_kv, cfg, ctx, quant_cache=opts.quant_cache
    )
    pre_logits = all_logits.transpose(1, 0, 2)  # [P, B*K, V]
    from spittle_tpu.ops.attention import pad_cross_kv

    cross_kv = pad_cross_kv(cross_kv)

    tokens = jnp.concatenate(
        [prefix_k, jnp.full((bk, max_len - prefix_len), cfg.eot, jnp.int32)],
        axis=1,
    )
    # Beam 0 starts live; beams 1..k-1 start with -inf so the first expansion
    # seeds distinct hypotheses from beam 0's top-k.
    init_scores = jnp.tile(
        jnp.asarray([0.0] + [NEG_INF] * (k - 1), jnp.float32), (b,)
    )

    state = dict(
        tokens=tokens,
        pos=jnp.asarray(prefix_len, jnp.int32),
        cache=cache,
        cur_logits=pre_logits[-1].astype(jnp.float32),
        scores=init_scores,  # [B*K] sum logprob
        finished=jnp.zeros(bk, bool),
        # timestamp_begin - 1 = "no timestamp yet" sentinel (decode.py)
        ts_floor=jnp.full(bk, cfg.timestamp_begin - 1, jnp.int32),
        length=jnp.zeros(bk, jnp.int32),
    )

    def cond(s):
        return (s["pos"] < max_len) & jnp.any(~s["finished"])

    def body(s):
        pos = s["pos"]
        last = jnp.take_along_axis(
            s["tokens"], (pos - 1)[None, None].repeat(bk, 0), 1
        )[:, 0]
        penult = jnp.take_along_axis(
            s["tokens"], jnp.maximum(pos - 2, 0)[None, None].repeat(bk, 0), 1
        )[:, 0]
        logits = _process_logits(
            s["cur_logits"], cfg=cfg, opts=opts, static_mask=static_mask,
            pos=pos, sample_begin=prefix_len, last_tok=last,
            penult_tok=penult, ts_floor=s["ts_floor"],
        )
        logprobs = jax.nn.log_softmax(logits, axis=-1)  # [B*K, V]

        # Candidate scores: live beams expand over top-k tokens; finished
        # beams contribute one frozen EOT candidate.
        top_lp, top_tok = jax.lax.top_k(logprobs, k)  # [B*K, K]
        cand_scores = s["scores"][:, None] + jnp.where(
            s["finished"][:, None], 0.0, top_lp
        )
        cand_scores = jnp.where(
            s["finished"][:, None] & (jnp.arange(k)[None, :] > 0),
            NEG_INF,
            cand_scores,
        )
        cand_tok = jnp.where(
            s["finished"][:, None], cfg.eot, top_tok
        )  # [B*K, K]

        # Reshape per batch item: [B, K*K] and pick top K.
        cand_scores_b = cand_scores.reshape(b, k * k)
        cand_tok_b = cand_tok.reshape(b, k * k)
        sel_scores, sel_idx = jax.lax.top_k(cand_scores_b, k)  # [B, K]
        src_beam = sel_idx // k  # originating beam within the item
        sel_tok = jnp.take_along_axis(cand_tok_b, sel_idx, axis=1)  # [B, K]

        # Flat gather indices into the B*K axis.
        flat_src = (jnp.arange(b)[:, None] * k + src_beam).reshape(bk)
        new_tok = sel_tok.reshape(bk)

        tokens = s["tokens"][flat_src]
        tokens = jax.lax.dynamic_update_slice(tokens, new_tok[:, None], (0, pos))
        # beam-axis gather; tree_map covers the int8 cache dict too (B is
        # axis 2 of both qw [L,2,B,H,Dh,ctx] and scale [L,2,B,H,ctx])
        cache = jax.tree.map(
            lambda c: jnp.take(c, flat_src, axis=2), s["cache"]
        )
        finished = s["finished"][flat_src]
        ts_floor = s["ts_floor"][flat_src]
        length = s["length"][flat_src]

        newly = ~finished
        length = length + newly.astype(jnp.int32)
        is_ts = new_tok >= cfg.timestamp_begin
        # Closing timestamp of a pair -> floor strictly greater (ts + 1);
        # opening timestamp -> equal allowed (see decode.py rationale).
        last_sel = last[flat_src]
        last_is_ts = last_sel >= cfg.timestamp_begin
        first_ts = ts_floor < cfg.timestamp_begin  # initial opener
        new_floor = jnp.where(
            last_is_ts | first_ts, new_tok + 1, new_tok
        )
        ts_floor = jnp.where(is_ts & newly, new_floor, ts_floor)
        finished = finished | (new_tok == cfg.eot)

        cur_logits, cache = decode_step(
            params, new_tok, pos, cache, cross_kv, cfg,
            audio_ctx=xa.shape[1],
        )
        return dict(
            tokens=tokens, pos=pos + 1, cache=cache,
            cur_logits=cur_logits.astype(jnp.float32),
            scores=sel_scores.reshape(bk), finished=finished,
            ts_floor=ts_floor, length=length,
        )

    final = jax.lax.while_loop(cond, body, state)

    scores = final["scores"].reshape(b, k)
    lengths = jnp.maximum(final["length"].reshape(b, k), 1)
    avg = scores / lengths
    best = jnp.argmax(avg, axis=1)  # length-normalized pick of final beams
    flat_best = jnp.arange(b) * k + best
    return (
        final["tokens"][flat_best],
        avg[jnp.arange(b), best],
        pre_logits,
    )


def beam_decode(
    params,
    xa: jnp.ndarray,
    cfg: WhisperConfig,
    opts: DecodeOptions = DecodeOptions(),
    beam_size: int = 5,
    lang_tokens: Optional[jnp.ndarray] = None,
    prompt_tokens: Sequence[int] = (),
) -> Dict[str, Any]:
    """Beam-search decode; same surface as greedy_decode plus beam_size."""
    b = xa.shape[0]
    if opts.language is not None and lang_tokens is None and cfg.multilingual:
        from .tokenizer import LANGUAGES, LANGUAGES_V3

        langs = LANGUAGES_V3 if cfg.n_langs == 100 else LANGUAGES
        lang_tokens = jnp.full(
            (b,), cfg.lang_begin + langs.index(opts.language), jnp.int32
        )
    sot_seq = list(
        sot_sequence(cfg, lang_token=0, task=opts.task, timestamps=opts.timestamps)
    )
    prompt_prefix = [cfg.sot_prev, *prompt_tokens] if prompt_tokens else []
    sot_pos = len(prompt_prefix)
    prefix_list = prompt_prefix + sot_seq
    prefix = jnp.asarray(prefix_list, jnp.int32)[None].repeat(b, 0)
    if cfg.multilingual:
        if lang_tokens is None:
            lang_tokens = jnp.full((b,), cfg.lang_begin, jnp.int32)
        prefix = prefix.at[:, sot_pos + 1].set(lang_tokens)

    tokens, avg_logprob, pre_logits = _beam_loop(
        params, xa, prefix, cfg, opts,
        prefix_len=len(prefix_list), beam_size=beam_size,
    )
    no_speech_prob = jax.nn.softmax(
        pre_logits[sot_pos].astype(jnp.float32), axis=-1
    )[::beam_size, cfg.no_speech]
    return {
        "tokens": tokens,
        "sample_begin": len(prefix_list),
        "avg_logprob": avg_logprob,
        "no_speech_prob": no_speech_prob,
    }
