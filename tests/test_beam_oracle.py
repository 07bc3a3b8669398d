"""Sequential beam-search oracle (VERDICT r4 #9).

`models/whisper/beam.py` runs whisper.cpp BeamSearchDecoder semantics as
ONE batched lax.while_loop over B*K beams — frozen-EOT slots for
finished beams, top-k expansion per live beam, top-k reselection over
the k*k candidates, sum-logprob scores with a length-normalized final
pick. HF's beam bookkeeping diverges structurally (2k expansion, EOS
retirement, length_penalty finalize — documented in
test_decode_parity_hf.py), so the batched loop had no external
full-loop check.

This oracle is the TDT-oracle trick applied to beam search
(tests/test_parakeet.py pattern): a per-sample SEQUENTIAL decoder in
plain numpy host control flow — python while loop, numpy stable-sort
top-k, per-step cache gathers — that re-derives every search decision
independently of the batched loop's masked/gathered arithmetic. The
network math (decode_step, _process_logits) is shared: what's under
test is the SEARCH (expansion, freezing, reselection indices, score
accumulation, timestamp-floor propagation, stopping, final pick),
which is exactly where a batched rewrite can silently diverge.

Token equality is asserted per item across seeds on random weights,
with the oracle item decoded ALONE (B=1) against the batched decode of
a 3-item batch — so batch-position independence is covered too.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spittle_tpu.models.whisper.config import CONFIGS
from spittle_tpu.models.whisper.decode import (
    DecodeOptions,
    _process_logits,
    _static_suppress_mask,
    sot_sequence,
)
from spittle_tpu.models.whisper.beam import beam_decode
from spittle_tpu.models.whisper.model import (
    decode_step,
    decoder_prefill,
    encode,
    init_params,
    precompute_cross_kv,
)

CFG = CONFIGS["tiny"]
K = 5
MAX_TOKENS = 24


def _top_k_stable(row: np.ndarray, k: int):
    """lax.top_k semantics: descending, ties keep the lower index."""
    idx = np.argsort(-row, kind="stable")[:k]
    return row[idx], idx


def oracle_beam(params, xa1, cfg, opts, k):
    """Sequential per-sample whisper.cpp BeamSearchDecoder: returns the
    winning token row [max_len] and its avg logprob."""
    from spittle_tpu.ops.attention import pad_cross_kv

    sot_seq = list(sot_sequence(
        cfg, lang_token=0, task=opts.task, timestamps=opts.timestamps
    ))
    prefix_list = list(sot_seq)
    prefix = np.asarray(prefix_list, np.int32)
    if cfg.multilingual:
        prefix[1] = cfg.lang_begin  # beam_decode's default lang token
    prefix_len = len(prefix_list)
    max_len = min(cfg.n_text_ctx, prefix_len + (opts.max_tokens or 0))
    ctx = min(cfg.n_text_ctx, -(-max_len // 32) * 32)
    static_mask = jnp.asarray(
        _static_suppress_mask(cfg, opts, audio_ctx=xa1.shape[1])
    )

    cross_kv = precompute_cross_kv(params, xa1, cfg)
    prefix_k = jnp.asarray(np.tile(prefix, (k, 1)))
    all_logits, cache = decoder_prefill(
        params, prefix_k, cross_kv, cfg, ctx
    )
    cross_kv = pad_cross_kv(cross_kv)

    tokens = np.full((k, max_len), cfg.eot, np.int64)
    tokens[:, :prefix_len] = prefix
    scores = np.asarray([0.0] + [-np.inf] * (k - 1), np.float32)
    finished = np.zeros(k, bool)
    ts_floor = np.full(k, cfg.timestamp_begin - 1, np.int64)
    length = np.zeros(k, np.int64)
    cur_logits = np.asarray(
        all_logits.transpose(1, 0, 2)[-1], np.float32
    )

    pos = prefix_len
    while pos < max_len and not finished.all():
        last = tokens[:, pos - 1].astype(np.int64)
        penult = tokens[:, max(pos - 2, 0)].astype(np.int64)
        logits = _process_logits(
            jnp.asarray(cur_logits), cfg=cfg, opts=opts,
            static_mask=static_mask, pos=jnp.asarray(pos, jnp.int32),
            sample_begin=prefix_len, last_tok=jnp.asarray(last, jnp.int32),
            penult_tok=jnp.asarray(penult, jnp.int32),
            ts_floor=jnp.asarray(ts_floor, jnp.int32),
        )
        logprobs = np.asarray(jax.nn.log_softmax(logits, axis=-1))

        # Candidates: live beams expand over their top-k tokens;
        # finished beams contribute ONE frozen EOT slot (score kept).
        cand_scores = np.full((k, k), -np.inf, np.float32)
        cand_tok = np.full((k, k), cfg.eot, np.int64)
        for i in range(k):
            if finished[i]:
                cand_scores[i, 0] = scores[i]
            else:
                lp, idx = _top_k_stable(logprobs[i], k)
                cand_scores[i] = scores[i] + lp
                cand_tok[i] = idx

        flat_scores = cand_scores.reshape(k * k)
        flat_tok = cand_tok.reshape(k * k)
        sel_scores, sel = _top_k_stable(flat_scores, k)
        src = sel // k
        new_tok = flat_tok[sel]

        tokens = tokens[src].copy()
        tokens[:, pos] = new_tok
        cache = jax.tree.map(
            lambda c: jnp.take(c, jnp.asarray(src), axis=2), cache
        )
        finished = finished[src].copy()
        ts_floor = ts_floor[src].copy()
        length = length[src].copy()

        newly = ~finished
        length = length + newly.astype(np.int64)
        is_ts = new_tok >= cfg.timestamp_begin
        last_sel = last[src]
        last_is_ts = last_sel >= cfg.timestamp_begin
        first_ts = ts_floor < cfg.timestamp_begin
        new_floor = np.where(last_is_ts | first_ts, new_tok + 1, new_tok)
        ts_floor = np.where(is_ts & newly, new_floor, ts_floor)
        finished = finished | (new_tok == cfg.eot)
        scores = sel_scores.astype(np.float32)

        nl, cache = decode_step(
            params, jnp.asarray(new_tok, jnp.int32),
            jnp.asarray(pos, jnp.int32), cache, cross_kv, cfg,
            audio_ctx=xa1.shape[1],
        )
        cur_logits = np.asarray(nl, np.float32)
        pos += 1

    avg = scores / np.maximum(length, 1)
    best = int(np.argmax(avg))  # ties -> lower index (jnp.argmax too)
    return tokens[best], float(avg[best])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_batched_beam_matches_sequential_oracle(seed):
    params = init_params(CFG, jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(
        rng.standard_normal((3, CFG.n_mels, 3000)) * 0.3, jnp.float32
    )
    xa = encode(params, mel, CFG)
    opts = DecodeOptions(timestamps=True, max_tokens=MAX_TOKENS)

    out = beam_decode(params, xa, CFG, opts, beam_size=K)
    got_tokens = np.asarray(out["tokens"])
    got_avg = np.asarray(out["avg_logprob"])

    for i in range(xa.shape[0]):
        want_tokens, want_avg = oracle_beam(
            params, xa[i: i + 1], CFG, opts, K
        )
        np.testing.assert_array_equal(
            got_tokens[i], want_tokens,
            err_msg=f"seed {seed} item {i} beam tokens diverge",
        )
        assert abs(got_avg[i] - want_avg) < 1e-4, (i, got_avg[i], want_avg)


def test_oracle_covers_early_finish():
    """Random tiny weights never emit EOT inside the budget, so the
    frozen-EOT slot arm needs weights that DO finish: scaling the EOT
    embedding row (x10; a constant shift is invisible — LN outputs are
    zero-mean) makes beams finish mid-decode, and the batched loop must
    still match the oracle token-for-token through the frozen slots and
    the early stop."""
    params = init_params(CFG, jax.random.PRNGKey(0))
    dec = dict(params["decoder"])
    dec["tok_emb"] = dec["tok_emb"].at[CFG.eot].multiply(10.0)
    params = dict(params, decoder=dec)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((3, CFG.n_mels, 3000)) * 0.3, jnp.float32
    )
    xa = encode(params, mel, CFG)
    opts = DecodeOptions(timestamps=True, max_tokens=MAX_TOKENS)
    out = beam_decode(params, xa, CFG, opts, beam_size=K)
    toks = np.asarray(out["tokens"])
    sb = out["sample_begin"]
    gen_lens = (toks[:, sb:] != CFG.eot).sum(axis=1)
    assert (gen_lens < MAX_TOKENS).all(), "no early finish: arm not covered"
    assert (gen_lens > 0).any()
    for i in range(xa.shape[0]):
        want_tokens, want_avg = oracle_beam(
            params, xa[i: i + 1], CFG, opts, K
        )
        np.testing.assert_array_equal(
            toks[i], want_tokens,
            err_msg=f"early-finish item {i} beam tokens diverge",
        )
        assert abs(float(out["avg_logprob"][i]) - want_avg) < 1e-4
