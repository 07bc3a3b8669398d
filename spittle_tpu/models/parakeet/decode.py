"""TDT greedy decoding as one batched lax.while_loop.

Token-and-Duration Transducer decoding (the hard sequential part flagged in
SURVEY.md §7): at each step the joint emits a token (or blank) plus a
duration; the time cursor advances by the predicted duration (at least 1 on
a zero-duration blank), and the prediction network only consumes emitted
non-blank tokens. All items in the batch step together with masked updates;
a max-symbols-per-frame guard prevents stalls (NeMo semantics).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .config import ParakeetConfig
from .model import joint, pred_init_state, pred_step


@functools.partial(jax.jit, static_argnames=("cfg", "max_tokens"))
def tdt_greedy_decode(
    params: Dict,
    enc: jnp.ndarray,  # [B, T, D]
    enc_lens: jnp.ndarray,  # [B] valid encoder frames
    cfg: ParakeetConfig,
    max_tokens: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (tokens [B, max_tokens] blank-padded, counts [B],
    emission frame indices [B, max_tokens])."""
    b, t_max, _ = enc.shape
    max_tokens = max_tokens or min(2 * t_max, 600)
    blank = cfg.blank_id

    pred0, state0 = _initial_pred(params, b, cfg, enc.dtype)

    init = dict(
        t=jnp.zeros(b, jnp.int32),
        sym=jnp.zeros(b, jnp.int32),
        pred=pred0,
        state=state0,
        tokens=jnp.full((b, max_tokens), blank, jnp.int32),
        frames=jnp.zeros((b, max_tokens), jnp.int32),
        count=jnp.zeros(b, jnp.int32),
        steps=jnp.asarray(0, jnp.int32),
    )

    # Worst-case legal step count: every frame visit emits
    # max_symbols_per_step zero-duration tokens before the forced +1
    # (NeMo GreedyTDTInfer semantics), so the safety cap must be
    # t_max * (max_symbols + 1) — a smaller cap (the old t_max * 4)
    # truncated genuine decodes, caught by the sequential oracle in
    # tests/test_parakeet.py.
    step_cap = t_max * (cfg.max_symbols_per_step + 1)

    def cond(s):
        return jnp.any(s["t"] < enc_lens) & (s["steps"] < step_cap)

    def body(s):
        idx = jnp.clip(s["t"], 0, t_max - 1)
        enc_t = jnp.take_along_axis(enc, idx[:, None, None], axis=1)[:, 0]
        logits, dur_logits = joint(params, enc_t, s["pred"])
        k = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        d = jnp.argmax(dur_logits, axis=-1).astype(jnp.int32)

        active = s["t"] < enc_lens
        emit = active & (k != blank) & (s["count"] < max_tokens)

        def write(row, cnt, val, e):
            return jax.lax.cond(e, lambda: row.at[cnt].set(val), lambda: row)

        tokens = jax.vmap(write)(s["tokens"], s["count"], k, emit)
        frames = jax.vmap(write)(s["frames"], s["count"], s["t"], emit)
        count = s["count"] + emit.astype(jnp.int32)

        new_pred, (nh, nc) = pred_step(params, k, s["state"], cfg)
        pred = jnp.where(emit[:, None], new_pred, s["pred"])
        h = jnp.where(emit[:, None], nh, s["state"][0])
        c = jnp.where(emit[:, None], nc, s["state"][1])

        # Advance: duration head; zero-duration blank forces +1; the
        # max-symbols guard forces +1 after too many same-frame emissions.
        adv = jnp.where((k == blank) & (d == 0), 1, d)
        same_frame = emit & (adv == 0)
        sym = jnp.where(same_frame, s["sym"] + 1, 0)
        force = same_frame & (sym >= cfg.max_symbols_per_step)
        adv = jnp.where(force, 1, adv)
        sym = jnp.where(force, 0, sym)
        t = s["t"] + jnp.where(active, adv, 0)

        return dict(
            t=t, sym=sym, pred=pred, state=(h, c), tokens=tokens,
            frames=frames, count=count, steps=s["steps"] + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    return out["tokens"], out["count"], out["frames"]


def _initial_pred(params, batch, cfg, dtype):
    """Prediction-network output for the start symbol (blank)."""
    state = pred_init_state(cfg, batch, dtype)
    blank_tok = jnp.full((batch,), cfg.blank_id, jnp.int32)
    pred, state = pred_step(params, blank_tok, state, cfg)
    return pred, state


# ---------------------------------------------------------------------------
# CTC decoding (ParakeetForCTC checkpoints: encoder + Conv1d(d, vocab, 1))
# ---------------------------------------------------------------------------


@jax.jit
def ctc_logits(params, enc: jnp.ndarray) -> jnp.ndarray:
    """Encoder states [B, T, D] -> CTC logits [B, T, vocab+blank]."""
    return (enc @ params["ctc_w"] + params["ctc_b"]).astype(jnp.float32)


def ctc_greedy_decode(params, enc: jnp.ndarray, lens, blank: int):
    """Greedy CTC: per-frame argmax -> collapse repeats -> drop blanks.

    Returns a list of id lists (variable-length collapse stays on host;
    the argmax over [B, T, V] runs on device)."""
    import numpy as np

    ids = np.asarray(jnp.argmax(ctc_logits(params, enc), axis=-1))
    lens = np.asarray(lens)
    out = []
    for b in range(ids.shape[0]):
        seq = []
        prev = -1
        for t in range(int(lens[b])):
            tok = int(ids[b, t])
            if tok != prev and tok != blank:
                seq.append(tok)
            prev = tok
        out.append(seq)
    return out
