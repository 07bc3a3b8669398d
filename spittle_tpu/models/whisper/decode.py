"""Whisper decoding: batched greedy loop with whisper.cpp-compatible rules.

Replicates the logits filtering whisper.cpp applies per step (the engine the
reference drives at `managers/transcription.rs:461-504`): blank suppression
at sample start, special-token suppression, optional non-speech list,
timestamp pairing rules, non-decreasing timestamps, max-initial-timestamp,
and the timestamp-vs-text sum-probability rule. Everything is vectorized
over the batch and runs inside one `lax.while_loop` with a static-shape
token buffer and KV cache, so a whole batch of push-to-talk sessions
decodes in a single compiled program.

Language auto-detect (`language=None` in the reference settings,
transcription.rs:448-459) runs as a single prefill step over the lang-token
slice of the logits.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .model import (
    _ring_flush,
    _write_columns_bulk,
    decode_step,
    decode_form,
    decode_step_deferred,
    decode_step_tmajor,
    transpose_cache_tmajor,
    decode_step_ring,
    decoder_prefill,
    init_kv_cache,
    init_pending,
    init_ring,
    precompute_cross_kv,
)

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class DecodeOptions:
    task: str = "transcribe"  # or "translate"
    language: Optional[str] = None  # None -> auto-detect
    timestamps: bool = True
    max_initial_timestamp: float = 1.0  # seconds
    suppress_blank: bool = True
    # ids of tokens to always suppress (non-speech list etc.); static tuple
    suppress_tokens: Tuple[int, ...] = ()
    space_token: Optional[int] = None  # id of " " for blank suppression
    max_tokens: int = 0  # 0 -> n_text_ctx
    temperature: float = 0.0  # 0 = argmax; >0 = categorical sampling
    seed: int = 0  # PRNG seed for temperature sampling
    # Quantized cross-attention K/V (per-position scales): cuts the
    # dominant HBM traffic of batched decode steps to 1/2 (int8) or 1/4
    # (int4) of bf16. See ops/quant.py.
    quant_kv: bool = False
    quant_kv_bits: int = 8  # 8 or 4; only read when quant_kv is True
    # int8 MXU compute for cross-attention (both dots int8xint8->int32,
    # queries/probabilities dynamically quantized): the K/V HBM stream
    # stays int8 with no convert for XLA to materialize. Only read when
    # quant_kv is True and quant_kv_bits == 8.
    quant_kv_w8a8: bool = False
    # int8 self-attention KV cache (per-position scales, quantized as
    # columns are written): halves the OTHER stream every decode step
    # re-reads. Independent of quant_kv so the two can be A/B'd apart.
    quant_cache: bool = False
    # MEASUREMENT RIG (bench-only, SPITTLE_SPEC_RIG): forces every
    # speculative round's uniform advance to min(rig_advance, K)
    # regardless of draft/main agreement, so the wall-clock of the
    # speculative loop can be measured as a function of acceptance on
    # random weights (real acceptance needs real checkpoints, which
    # can't reach this environment). When non-zero the emitted tokens
    # are NOT the main model's greedy transcript — never production.
    rig_advance: int = 0


def sot_sequence(
    cfg: WhisperConfig,
    lang_token: Optional[int] = None,
    task: str = "transcribe",
    timestamps: bool = True,
) -> Tuple[int, ...]:
    """[sot, language, task, (notimestamps)] for multilingual models,
    [sot, (notimestamps)] for English-only."""
    seq = [cfg.sot]
    if cfg.multilingual:
        seq.append(lang_token if lang_token is not None else cfg.lang_begin)
        seq.append(cfg.translate if task == "translate" else cfg.transcribe)
    if not timestamps:
        seq.append(cfg.no_timestamps)
    return tuple(seq)


def _static_suppress_mask(
    cfg: WhisperConfig, opts: DecodeOptions, audio_ctx: int = 0
) -> np.ndarray:
    """audio_ctx: encoder positions actually present (reduced-window
    decode). A full window's vocabulary naturally tops out at <|30.00|>
    = timestamp_begin + 1500; a reduced window generalizes that bound —
    timestamps past the encoded audio are suppressed so the decode can't
    emit segments (or seek advances) beyond what any window saw."""
    mask = np.zeros(cfg.n_vocab, np.float32)
    always = [cfg.sot, cfg.sot_prev, cfg.sot_lm, cfg.no_speech,
              cfg.translate, cfg.transcribe]
    always.extend(range(cfg.lang_begin, cfg.lang_begin + cfg.n_langs))
    for t in always:
        mask[t] = NEG_INF
    for t in opts.suppress_tokens:
        mask[t] = NEG_INF
    if opts.timestamps:
        mask[cfg.no_timestamps] = NEG_INF
        if audio_ctx:
            mask[cfg.timestamp_begin + audio_ctx + 1 :] = NEG_INF
    else:
        mask[cfg.timestamp_begin :] = NEG_INF
    return mask


def _process_logits(
    logits: jnp.ndarray,  # [B, V] float32
    *,
    cfg: WhisperConfig,
    opts: DecodeOptions,
    static_mask: jnp.ndarray,  # [V]
    pos: jnp.ndarray,  # scalar: index being sampled
    sample_begin: int,
    last_tok: jnp.ndarray,  # [B]
    penult_tok: jnp.ndarray,  # [B]
    ts_floor: jnp.ndarray,  # [B] minimum allowed timestamp token
) -> jnp.ndarray:
    v = cfg.n_vocab
    ts_begin = cfg.timestamp_begin
    vocab_idx = jnp.arange(v)
    is_ts = vocab_idx >= ts_begin

    logits = logits + static_mask[None]

    at_begin = pos == sample_begin
    if opts.suppress_blank and opts.space_token is not None:
        blank = (vocab_idx == opts.space_token) | (vocab_idx == cfg.eot)
        logits = jnp.where(at_begin & blank[None], NEG_INF, logits)

    if opts.timestamps:
        last_is_ts = last_tok >= ts_begin
        # OpenAI ApplyTimestampRules: penultimate_was_timestamp is True
        # when FEWER THAN TWO tokens have been sampled — reading the
        # prompt's task token out of the buffer instead inverted the
        # rule at the second sampled position (banning text right after
        # the initial timestamp instead of forcing it).
        penult_is_ts = (pos - sample_begin < 2) | (penult_tok >= ts_begin)
        # Timestamps come in pairs (except directly before EOT):
        # last ts + penult ts -> no more ts now; last ts + penult text ->
        # only ts or EOT.
        no_ts_now = last_is_ts & penult_is_ts & (pos > sample_begin)
        force_ts = last_is_ts & ~penult_is_ts & (pos > sample_begin)
        logits = jnp.where(no_ts_now[:, None] & is_ts[None], NEG_INF, logits)
        text_not_eot = (~is_ts) & (vocab_idx != cfg.eot)
        logits = jnp.where(force_ts[:, None] & text_not_eot[None], NEG_INF, logits)

        # Non-decreasing timestamps.
        below_floor = is_ts[None] & (vocab_idx[None] < ts_floor[:, None])
        logits = jnp.where(below_floor, NEG_INF, logits)

        # The FIRST sampled token must be a timestamp (OpenAI
        # ApplyTimestampRules "suppress generating non-timestamp tokens
        # at the beginning"; HF WhisperTimeStampLogitsProcessor masks
        # [:timestamp_begin] at begin_index). Found by the token-level
        # HF-generate parity harness.
        logits = jnp.where(at_begin & ~is_ts[None], NEG_INF, logits)

        # Initial timestamp bound.
        if opts.max_initial_timestamp is not None:
            max_init = ts_begin + int(round(opts.max_initial_timestamp / 0.02))
            logits = jnp.where(
                at_begin & (vocab_idx > max_init)[None] & is_ts[None],
                NEG_INF,
                logits,
            )

        # If total timestamp probability beats the best text token, sample a
        # timestamp (sum-prob rule; mirrors whisper.cpp/openai).
        lsm = jax.nn.log_softmax(logits, axis=-1)
        ts_logprob = jax.nn.logsumexp(
            jnp.where(is_ts[None], lsm, NEG_INF), axis=-1
        )
        max_text = jnp.max(jnp.where(is_ts[None], NEG_INF, lsm), axis=-1)
        force = ts_logprob > max_text
        logits = jnp.where(force[:, None] & ~is_ts[None], NEG_INF, logits)

    return logits


@functools.partial(
    jax.jit, static_argnames=("cfg", "opts", "prefix_len", "sample")
)
def _greedy_loop(
    params,
    xa: jnp.ndarray,
    prefix: jnp.ndarray,  # [B, P]
    cfg: WhisperConfig,
    opts: DecodeOptions,
    prefix_len: int,
    temperature: jnp.ndarray = None,  # traced scalar (sampling rungs only)
    sample: bool = False,  # static: keeps the PRNG out of the temp-0 program
):
    if temperature is None:
        temperature = jnp.asarray(opts.temperature, jnp.float32)
    b = xa.shape[0]
    # opts.max_tokens is the DECODE BUDGET (whisper.cpp n_max_text_ctx
    # analog): the buffer holds prefix + budget, clamped to the model's
    # text context. Treating it as the total length crashed on long
    # carried prompts (negative buffer) or silently truncated later
    # windows to a near-zero generation budget.
    max_len = min(
        cfg.n_text_ctx,
        prefix_len + (opts.max_tokens or cfg.n_text_ctx),
    )
    if opts.quant_kv and opts.quant_kv_bits == 8 and not opts.quant_kv_w8a8:
        # Plain int8: fused per-layer projection+quantization — never
        # materializes the full bf16 [L, B, H, Dh, 1500] pair (11 GB at
        # b45), which capped the batch frontier (model.py
        # precompute_cross_kv_q8 docstring).
        from spittle_tpu.models.whisper.model import precompute_cross_kv_q8

        cross_kv = precompute_cross_kv_q8(params, xa, cfg)
    else:
        cross_kv = precompute_cross_kv(params, xa, cfg)
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
    # Cache sized to the decode budget (sublane-aligned): a short decode
    # reads max_len-wide K/V per step instead of n_text_ctx-wide.
    ctx = min(cfg.n_text_ctx, -(-max_len // 32) * 32)
    static_mask = jnp.asarray(
        _static_suppress_mask(cfg, opts, audio_ctx=xa.shape[1])
    )

    # Cache-write form for the step loop (model.decode_form): "ring"
    # stages the last R columns in a small pending ring flushed every R
    # steps; "deferred" carries one pending column; "scan" (default)
    # rewrites per layer per step.
    form = decode_form()
    ring = int(os.environ.get("SPITTLE_DECODE_RING", "16")) if form == "ring" else 0
    # One teacher-forced pass prefills the cache and yields per-position
    # logits (token-by-token prefill would re-read all weights + cross-KV
    # once per prompt token). The ring form over-allocates R columns so
    # the final (partial) ring flush stays in bounds.
    all_logits, cache = decoder_prefill(
        params, prefix, cross_kv, cfg, ctx + ring,
        quant_cache=opts.quant_cache,
    )
    pre_logits = all_logits.transpose(1, 0, 2)  # [P, B, V]
    # Tile-align cross K/V so decode steps hit the Pallas kernel
    # (bf16 or int8 in-kernel-dequant variant); decode_step masks with
    # cfg.n_audio_ctx.
    from spittle_tpu.ops.attention import pad_cross_kv

    cross_kv = pad_cross_kv(cross_kv)

    tokens = jnp.concatenate(
        [prefix, jnp.full((b, max_len - prefix_len), cfg.eot, jnp.int32)], axis=1
    )

    deferred = form == "deferred"
    tmajor = form == "tmajor"
    if form == "ring":
        pending = init_ring(cache, ring)
    elif deferred:
        pending = init_pending(cache, prefix_len)
    else:
        pending = ()
    if tmajor:
        # ctx-major carry layout: the per-step bulk DUS updates in
        # place (decode_step_tmajor docstring); transposed back after
        # the loop so callers see the canonical layout.
        cache = transpose_cache_tmajor(cache)
    state = dict(
        tokens=tokens,
        pos=jnp.asarray(prefix_len, jnp.int32),
        cache=cache,
        pending=pending,
        flush_len=(
            jnp.asarray(prefix_len, jnp.int32) if form == "ring" else ()
        ),
        cur_logits=pre_logits[-1].astype(jnp.float32),
        finished=jnp.zeros(b, bool),
        # timestamp_begin - 1 is a sentinel meaning "no timestamp sampled
        # yet" (it bans nothing): the INITIAL timestamp's close must be
        # strictly greater, unlike a pair-closing timestamp whose
        # consecutive opener may be equal.
        ts_floor=jnp.full(b, cfg.timestamp_begin - 1, jnp.int32),
        sum_logprob=jnp.zeros(b, jnp.float32),
        length=jnp.zeros(b, jnp.int32),
        key=jax.random.PRNGKey(opts.seed),
    )

    def cond(s):
        return (s["pos"] < max_len) & jnp.any(~s["finished"])

    def body(s):
        pos = s["pos"]
        last = jnp.take_along_axis(s["tokens"], (pos - 1)[None, None].repeat(b, 0), 1)[:, 0]
        penult = jnp.take_along_axis(
            s["tokens"], jnp.maximum(pos - 2, 0)[None, None].repeat(b, 0), 1
        )[:, 0]
        logits = _process_logits(
            s["cur_logits"],
            cfg=cfg, opts=opts, static_mask=static_mask,
            pos=pos, sample_begin=prefix_len,
            last_tok=last, penult_tok=penult, ts_floor=s["ts_floor"],
        )
        # Static split: the temperature-0 program has no PRNG (threefry in
        # a while_loop is a compile-time hazard on TPU); the sampling
        # program covers every temperature > 0 with a traced scalar.
        if sample:
            key, sub = jax.random.split(s["key"])
            next_tok = jax.random.categorical(
                sub, logits / jnp.maximum(temperature, 1e-6), axis=-1
            ).astype(jnp.int32)
        else:
            key = s["key"]
            next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lsm = jax.nn.log_softmax(logits, axis=-1)
        step_lp = jnp.take_along_axis(lsm, next_tok[:, None], 1)[:, 0]

        next_tok = jnp.where(s["finished"], cfg.eot, next_tok)
        newly = ~s["finished"]
        sum_logprob = s["sum_logprob"] + jnp.where(newly, step_lp, 0.0)
        length = s["length"] + newly.astype(jnp.int32)

        tokens = jax.lax.dynamic_update_slice(
            s["tokens"], next_tok[:, None], (0, pos)
        )
        is_ts = next_tok >= cfg.timestamp_begin
        # OpenAI ApplyTimestampRules floor: a pair-CLOSING timestamp may
        # be equalled by the next pair's opener (floor = ts), while an
        # OPENING timestamp's close must be strictly greater
        # (floor = ts + 1) — the guard against zero-length segments. A
        # timestamp after text is a close EXCEPT the first one ever,
        # which is the initial opener (tracked via the floor sentinel).
        last_is_ts = last >= cfg.timestamp_begin
        first_ts = s["ts_floor"] < cfg.timestamp_begin
        new_floor = jnp.where(
            last_is_ts | first_ts, next_tok + 1, next_tok
        )
        ts_floor = jnp.where(is_ts & newly, new_floor, s["ts_floor"])
        finished = s["finished"] | (next_tok == cfg.eot)

        flush_len = s["flush_len"]
        if form == "ring":
            cur_logits, cache, pending, flush_len = decode_step_ring(
                params, next_tok, pos, s["cache"], s["pending"], flush_len,
                cross_kv, cfg, audio_ctx=xa.shape[1],
            )
        elif deferred:
            cur_logits, cache, pending = decode_step_deferred(
                params, next_tok, pos, s["cache"], s["pending"], cross_kv,
                cfg, audio_ctx=xa.shape[1],
            )
        elif tmajor:
            cur_logits, cache = decode_step_tmajor(
                params, next_tok, pos, s["cache"], cross_kv, cfg,
                audio_ctx=xa.shape[1],
            )
            pending = ()
        else:
            cur_logits, cache = decode_step(
                params, next_tok, pos, s["cache"], cross_kv, cfg,
                audio_ctx=xa.shape[1],
            )
            pending = ()
        return dict(
            tokens=tokens,
            pos=pos + 1,
            cache=cache,
            pending=pending,
            flush_len=flush_len,
            cur_logits=cur_logits.astype(jnp.float32),
            finished=finished,
            ts_floor=ts_floor,
            sum_logprob=sum_logprob,
            length=length,
            key=key,
        )

    final = jax.lax.while_loop(cond, body, state)
    if form == "ring":
        # Materialize the ring tail so the returned cache is complete
        # (stale slots land beyond the decoded range, where every
        # reader masks them off; the cache is allocated ctx + R wide).
        final["cache"] = _ring_flush(
            final["cache"], final["pending"], final["flush_len"]
        )
    elif deferred:
        # Flush the last step's columns so the returned cache is
        # complete (the loop always leaves one pending column).
        final["cache"] = _write_columns_bulk(
            final["cache"], final["pending"], final["pos"] - 1
        )
    elif tmajor:
        final["cache"] = transpose_cache_tmajor(final["cache"])
    return final, pre_logits


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "opts", "prefix_len", "sot_pos", "sample"),
)
def _greedy_program(
    params, xa, prefix, cfg, opts, prefix_len, sot_pos, temperature, sample
):
    """The whole greedy decode as ONE cached program.

    _greedy_loop builds its lax.while_loop from fresh closures, so calling
    it eagerly re-traces (and re-hashes against the compile cache) on
    EVERY transcribe call — seconds of host overhead per batch on a
    tunneled backend. Under jit with static (cfg, opts, prefix_len,
    sample) the trace is cached after the first call, and the no-speech /
    avg-logprob summaries fold into the same program so the [P, B, V]
    prefill logits never leave the device."""
    final, pre_logits = _greedy_loop(
        params, xa, prefix, cfg, opts, prefix_len,
        temperature=temperature, sample=sample,
    )
    no_speech_prob = jax.nn.softmax(
        pre_logits[sot_pos].astype(jnp.float32), axis=-1
    )[:, cfg.no_speech]
    avg_logprob = final["sum_logprob"] / jnp.maximum(final["length"], 1)
    return {
        "tokens": final["tokens"],
        "avg_logprob": avg_logprob,
        "no_speech_prob": no_speech_prob,
        "length": final["length"],
    }


def greedy_decode(
    params,
    xa: jnp.ndarray,
    cfg: WhisperConfig,
    opts: DecodeOptions = DecodeOptions(),
    lang_tokens: Optional[jnp.ndarray] = None,
    prompt_tokens: Sequence[int] = (),
) -> Dict[str, Any]:
    """Greedy-decode a batch of encoded windows.

    xa: [B, 1500, D] encoder output. lang_tokens: [B] per-item language
    token ids (from detect_language) or None for opts.language/default.
    prompt_tokens: shared initial-prompt conditioning, prepended as
    [sot_prev, *prompt] (reference initial_prompt semantics,
    transcription.rs:461-499).

    Returns dict with "tokens" [B, L] (prefix + generated, EOT-padded),
    "sample_begin", "avg_logprob" [B], "no_speech_prob" [B].
    """
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
        lang_col = sot_pos + 1
        if lang_tokens is None:
            lang_tokens = jnp.full((b,), cfg.lang_begin, jnp.int32)
        prefix = prefix.at[:, lang_col].set(lang_tokens)

    import dataclasses as _dc

    static_opts = _dc.replace(opts, temperature=0.0)
    out = _greedy_program(
        params, xa, prefix, cfg, static_opts,
        prefix_len=len(prefix_list),
        sot_pos=sot_pos,
        temperature=jnp.asarray(opts.temperature, jnp.float32),
        sample=opts.temperature > 0,
    )
    return {**out, "sample_begin": len(prefix_list)}


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_language(params, xa: jnp.ndarray, cfg: WhisperConfig) -> jnp.ndarray:
    """Language probabilities [B, n_langs] from one [sot] prefill step."""
    b = xa.shape[0]
    from spittle_tpu.ops.attention import pad_cross_kv

    cross_kv = pad_cross_kv(precompute_cross_kv(params, xa, cfg))
    cache = init_kv_cache(cfg, b, dtype=xa.dtype, ctx=32)  # one step
    logits, _ = decode_step(
        params,
        jnp.full((b,), cfg.sot, jnp.int32),
        jnp.asarray(0, jnp.int32),
        cache,
        cross_kv,
        cfg,
        audio_ctx=xa.shape[1],
    )
    lang_slice = logits[:, cfg.lang_begin : cfg.lang_begin + cfg.n_langs]
    return jax.nn.softmax(lang_slice.astype(jnp.float32), axis=-1)
