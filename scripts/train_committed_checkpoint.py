"""Train + bless the committed tiny Whisper checkpoint.

VERDICT r3 next-round #2: the environment has no egress, so real
checkpoints can't reach CI and every decode test ran random weights. This
script trains a tiny-dims Whisper (d=32, 2+2 layers, REAL 51865 token
layout, full 1500-frame windows) on a synthetic tone-naming task — each
of 8 vocabulary words is a pure tone; utterances are 2-6 tones — until it
transcribes held-out utterances exactly, then commits the f16 npz artifact
(models/whisper/weights.save_npz_checkpoint) plus golden transcripts so
the golden-token machinery, beam, word timestamps, language-detect path
and speculative acceptance all run NON-RANDOM weights in CI
(tests/test_trained_checkpoint.py).

Usage:
  python scripts/train_committed_checkpoint.py train    # any backend
  JAX_PLATFORMS=cpu python scripts/train_committed_checkpoint.py goldens
  # (goldens are recorded on CPU float32 — the CI configuration — against
  #  the SAVED artifact, so the f16 round-trip is inside the contract)

Artifacts: tests/data/trained_tiny/{params.npz, goldens.json}.
Matches: transcription.rs:445-504 (the engine whose transcripts the north
star says to bit-match; this checkpoint proves the machinery end-to-end
while real weights stay environment-blocked).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = os.path.join(REPO, "tests", "data", "trained_tiny")
NPZ = os.path.join(OUT_DIR, "params.npz")
GOLDENS = os.path.join(OUT_DIR, "goldens.json")

# The 8-word tone vocabulary: words that are single tokens in the test
# vocab (tokenizer.make_test_vocab merges) so the mapping is 1 tone = 1
# token; frequencies are spread log-ish across telephone band.
WORDS = [" hello", " world", " test", " the", " this", " that", " you",
         " for"]
FREQS = [220.0, 330.0, 440.0, 587.0, 784.0, 1047.0, 1397.0, 1865.0]
SR = 16000
TONE_S = 0.5
GAP_S = 0.2
WINDOW_SAMPLES = 30 * SR


def make_cfg():
    from spittle_tpu.models.whisper.config import WhisperConfig

    return WhisperConfig(
        name="trained-tiny", n_mels=80, n_audio_ctx=1500, n_audio_state=32,
        n_audio_head=4, n_audio_layer=2, n_vocab=51865, n_text_ctx=24,
        n_text_state=32, n_text_head=4, n_text_layer=2,
    )


def utterance(word_ids):
    """Tone sequence for a word-id list, padded to the 30 s window.
    Returns (audio, t_start, t_end) — speech span in seconds."""
    audio = np.zeros(WINDOW_SAMPLES, np.float32)
    pos = int(0.1 * SR)
    for w in word_ids:
        n = int(TONE_S * SR)
        t = np.arange(n) / SR
        tone = 0.4 * np.sin(2 * np.pi * FREQS[w] * t).astype(np.float32)
        # 10ms fade in/out so tone edges aren't clicks
        ramp = np.minimum(1.0, np.arange(n) / (0.01 * SR))
        tone *= (ramp * ramp[::-1]).astype(np.float32)
        audio[pos : pos + n] = tone
        pos += n + int(GAP_S * SR)
    t_end = (pos - int(GAP_S * SR)) / SR
    return audio, 0.1, t_end


def sample_word_ids(rng) -> list:
    return rng.integers(0, len(WORDS), rng.integers(2, 7)).tolist()


def eval_cases(n=8):
    """The FIXED held-out eval set goldens are recorded on."""
    rng = np.random.default_rng(777)
    return [sample_word_ids(rng) for _ in range(n)]


def _tok(cfg):
    from spittle_tpu.models.whisper.tokenizer import (
        WhisperTokenizer,
        make_test_vocab,
    )

    return WhisperTokenizer(cfg, make_test_vocab())


def _prefix(cfg, tok):
    """Timestamp-mode prefix [sot, lang, transcribe] — the engine always
    decodes with timestamps=True (whisper.cpp default), so training must
    supervise the same format: <|t0|> words <|t1|> <|eot|>."""
    from spittle_tpu.models.whisper.decode import sot_sequence

    return list(sot_sequence(cfg, lang_token=tok.lang_token("en"),
                             task="transcribe", timestamps=True))


def _ts(cfg, seconds: float) -> int:
    return cfg.timestamp_begin + int(round(seconds / 0.02))


def target_sequence(cfg, prefix, wtoks, word_ids, t0, t1):
    return (list(prefix) + [_ts(cfg, t0)]
            + [wtoks[w] for w in word_ids]
            + [_ts(cfg, t1), cfg.eot])


def _word_tokens(tok):
    toks = []
    for w in WORDS:
        ids = tok.encode(w)
        assert len(ids) == 1, (w, ids)
        toks.append(ids[0])
    return toks


def _apply_platform():
    """The axon TPU plugin ignores the JAX_PLATFORMS env var; apply it
    through the config API before backend init (conftest.py pattern)."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def train():
    _apply_platform()
    import jax
    import jax.numpy as jnp

    from spittle_tpu.audio.mel import log_mel_spectrogram
    from spittle_tpu.models.whisper.model import init_params
    from spittle_tpu.models.whisper.weights import save_npz_checkpoint
    from spittle_tpu.models.whisper.tokenizer import make_test_vocab
    from spittle_tpu.train.step import make_train_step

    cfg = make_cfg()
    tok = _tok(cfg)
    prefix = _prefix(cfg, tok)
    wtoks = _word_tokens(tok)

    params = init_params(cfg, jax.random.PRNGKey(0))
    init_opt, train_step = make_train_step(cfg, learning_rate=1e-3)
    opt_state = init_opt(params)

    mel_fn = jax.jit(lambda a: log_mel_spectrogram(a, n_mels=cfg.n_mels))

    rng = np.random.default_rng(12345)
    B, T = 16, cfg.n_text_ctx
    steps = int(os.environ.get("STEPS", "700"))
    t0 = time.time()
    for step in range(steps):
        word_lists = [sample_word_ids(rng) for _ in range(B)]
        made = [utterance(ws) for ws in word_lists]
        audio = np.stack([m[0] for m in made])
        mel = mel_fn(jnp.asarray(audio))
        tokens = np.full((B, T), cfg.eot, np.int32)
        targets = np.full((B, T), cfg.eot, np.int32)
        mask = np.zeros((B, T), np.float32)
        for b, (ws, (_, t0s, t1s)) in enumerate(zip(word_lists, made)):
            seq = target_sequence(cfg, prefix, wtoks, ws, t0s, t1s)
            tokens[b, : len(seq) - 1] = seq[:-1]
            targets[b, : len(seq) - 1] = seq[1:]
            # learn to predict <|t0|> words <|t1|> eot (prefix transitions
            # are fixed at decode time but supervising them is harmless
            # and keeps avg_logprob/no_speech stats sane)
            mask[b, : len(seq) - 1] = 1.0
        batch = {
            "mel": mel,
            "tokens": jnp.asarray(tokens),
            "targets": jnp.asarray(targets),
            "mask": jnp.asarray(mask),
        }
        params, opt_state, loss = train_step(params, opt_state, batch)
        if step % 50 == 0 or step == steps - 1:
            print(f"step {step:4d} loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    os.makedirs(OUT_DIR, exist_ok=True)
    save_npz_checkpoint(NPZ, cfg, params, vocab=make_test_vocab())
    print(f"saved {NPZ} ({os.path.getsize(NPZ)/1e6:.1f} MB)")


def goldens():
    """Record golden transcripts on CPU f32 against the saved artifact."""
    _apply_platform()
    import jax

    from spittle_tpu.engine.base import TranscribeParams
    from spittle_tpu.engine.whisper_engine import WhisperEngine

    assert jax.devices()[0].platform == "cpu", "goldens must be CPU f32"
    eng = WhisperEngine()
    eng.load_model(NPZ)
    tok = eng.tokenizer

    cases = eval_cases()
    audios = [utterance(ws)[0] for ws in cases]
    expected = ["".join(WORDS[w] for w in ws) for ws in cases]

    base = TranscribeParams(language="en",
                            condition_on_previous_text=False,
                            temperatures=(0.0,))
    out = {"cases": [], "accuracy": None}
    correct = 0
    for ws, audio, exp in zip(cases, audios, expected):
        res = eng.transcribe_samples(audio, base)
        toks = [int(t) for t in res.tokens]
        ok = res.text.strip() == exp.strip()
        correct += ok
        out["cases"].append({
            "word_ids": [int(w) for w in ws],
            "expected_text": exp,
            "greedy_text": res.text,
            "greedy_tokens": toks,
            "segments": [
                {"start": round(s.start, 4), "end": round(s.end, 4),
                 "text": s.text} for s in res.segments
            ],
            "exact": bool(ok),
        })
        print(f"greedy: {res.text!r} vs {exp!r} {'OK' if ok else 'MISS'}")
    out["accuracy"] = correct / len(cases)

    # beam-search golden (whisper.cpp BeamSearchDecoder semantics)
    beam_params = TranscribeParams(
        language="en", condition_on_previous_text=False,
        temperatures=(0.0,), beam_size=5,
    )
    for case, audio in zip(out["cases"][:3], audios[:3]):
        res = eng.transcribe_samples(audio, beam_params)
        case["beam_tokens"] = [int(t) for t in res.tokens]
        case["beam_text"] = res.text

    # word-timestamp golden (cross-attention DTW words)
    wt_params = TranscribeParams(
        language="en", condition_on_previous_text=False,
        temperatures=(0.0,), word_timestamps=True,
    )
    res = eng.transcribe_samples(audios[0], wt_params)
    out["cases"][0]["word_timestamps"] = [
        {"word": w.word, "start": round(w.start, 4), "end": round(w.end, 4)}
        for w in res.words
    ]

    # language-detect golden (deterministic forward pass on these weights)
    det_params = TranscribeParams(language=None,
                                  condition_on_previous_text=False,
                                  temperatures=(0.0,))
    res = eng.transcribe_samples(audios[1], det_params)
    out["language_detected"] = res.language

    with open(GOLDENS, "w") as f:
        json.dump(out, f, indent=1)
    print(f"accuracy {out['accuracy']:.2f}; wrote {GOLDENS}")


if __name__ == "__main__":
    {"train": train, "goldens": goldens}[sys.argv[1]]()
