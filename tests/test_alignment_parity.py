"""Word-timestamp cross-check vs an independent torch oracle.

VERDICT r3 next-round #6: run the OpenAI/HF word-timestamp extraction —
torch DTW over cross-attention with the same alignment-head fallback — on
shared random weights and compare boundaries against
models/whisper/alignment.py.

Two independent paths from the SAME weights:
  ours:   JAX decoder_cross_attention -> token_emission_times
  oracle: HuggingFace WhisperForConditionalGeneration(output_attentions)
          -> a verbatim numpy/torch translation of OpenAI whisper
          timing.py `find_alignment` (truncate+renormalize, std_mean
          z-norm, reflect-pad median filter, dtw_cpu with its exact
          tie-breaking, jump times at 50 tokens/sec)

Matches BASELINE config 3 ("beam search + language detection + word
timestamps") and the engine the reference dispatches to
(transcribe-rs WhisperEngine, transcription.rs:445-504).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from spittle_tpu.models.whisper.alignment import (
    TIME_PER_FRAME,
    alignment_heads,
    decoder_cross_attention,
    token_emission_times,
    word_timestamps,
)
from spittle_tpu.models.whisper.config import WhisperConfig
from spittle_tpu.models.whisper.model import encode
from spittle_tpu.models.whisper.weights import (
    hf_to_openai_names,
    params_from_openai_tensors,
)


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=51865,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=256,
        decoder_ffn_dim=256,
        max_source_positions=60,
        max_target_positions=64,
    )
    hf_cfg._attn_implementation = "eager"  # sdpa can't return attn weights
    torch.manual_seed(0)
    hf_model = transformers.WhisperForConditionalGeneration(hf_cfg).eval()

    cfg = WhisperConfig(
        name="parity", n_mels=80, n_audio_ctx=60, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_vocab=51865, n_text_ctx=64,
        n_text_state=64, n_text_head=4, n_text_layer=4,
    )
    tensors = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    mapped = hf_to_openai_names(tensors)
    params = jax.tree.map(jnp.asarray, params_from_openai_tensors(mapped, cfg))
    return cfg, params, hf_model


# -- verbatim OpenAI timing.py translations (the oracle) -------------------


def _oracle_median_filter(x: "torch.Tensor", width: int = 7):
    """timing.py median_filter: reflect pad, unfold, sorted middle."""
    pad = width // 2
    x = torch.nn.functional.pad(x, (pad, pad), mode="reflect")
    return x.unfold(-1, width, 1).sort()[0][..., width // 2]


def _oracle_dtw(x: np.ndarray):
    """timing.py dtw_cpu, verbatim: strict-< diagonal preference, ties
    fall to the left move; trace-driven backtrace."""
    N, M = x.shape
    cost = np.full((N + 1, M + 1), np.inf)
    trace = -np.ones((N + 1, M + 1))
    cost[0, 0] = 0.0
    for j in range(1, M + 1):
        for i in range(1, N + 1):
            c0 = cost[i - 1, j - 1]
            c1 = cost[i - 1, j]
            c2 = cost[i, j - 1]
            if c0 < c1 and c0 < c2:
                c, t = c0, 0
            elif c1 < c0 and c1 < c2:
                c, t = c1, 1
            else:
                c, t = c2, 2
            cost[i, j] = x[i - 1, j - 1] + c
            trace[i, j] = t
    i, j = N, M
    trace[0, :] = 2
    trace[:, 0] = 1
    ti, ai = [], []
    while i > 0 or j > 0:
        ti.append(i - 1)
        ai.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(ti[::-1]), np.asarray(ai[::-1])


def _oracle_jump_times(cross_attns, heads, n_prefix, n_frames):
    """timing.py find_alignment body over captured attention weights.

    cross_attns: list of per-layer torch tensors [B=1, H, T, enc]."""
    w = torch.stack([cross_attns[l][0, h] for l, h in heads])  # [NH, T, enc]
    w = w[:, :, :n_frames].double()
    w = w / w.sum(-1, keepdim=True)  # softmax over the truncated frames
    std, mean = torch.std_mean(w, dim=-2, keepdim=True, unbiased=False)
    w = (w - mean) / std
    w = _oracle_median_filter(w, 7)
    matrix = w.mean(0)
    matrix = matrix[n_prefix - 1 : -1]
    text_idx, time_idx = _oracle_dtw(-matrix.numpy())
    jumps = np.pad(np.diff(text_idx), (1, 0), constant_values=1).astype(bool)
    return time_idx[jumps] * TIME_PER_FRAME


# -- tests ------------------------------------------------------------------


def _shared_inputs(cfg, rng_seed=0, n_text=12):
    rng = np.random.default_rng(rng_seed)
    mel = rng.standard_normal((1, 80, 120)).astype(np.float32)
    prefix = [50258, 50259, 50359]  # sot-style 3-token prefix
    text = rng.integers(100, 40000, n_text).tolist()
    full = prefix + text + [cfg.eot]
    return mel, prefix, text, full


def test_token_emission_times_match_torch_oracle(pair):
    cfg, params, hf_model = pair
    mel, prefix, text, full = _shared_inputs(cfg)
    heads = alignment_heads(cfg)
    n_frames = 40  # < encoder length: exercises truncation+renormalize

    # oracle: HF decoder cross-attentions -> OpenAI timing pipeline
    with torch.no_grad():
        out = hf_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.tensor([full]),
            output_attentions=True,
        )
    want = _oracle_jump_times(out.cross_attentions, heads, len(prefix), n_frames)

    # ours: JAX teacher-forced pass -> token_emission_times
    xa = encode(params, jnp.asarray(mel), cfg)
    attn = np.asarray(
        decoder_cross_attention(params, jnp.asarray([full], jnp.int32), xa, cfg)
    )
    got = token_emission_times(attn, len(prefix), n_frames, cfg, heads=heads)

    assert got.shape == want.shape == (len(text) + 1,)
    # Boundary drift gate: identical recipes on float-equal attentions must
    # agree to within one frame (DTW near-tie flips); typically exact.
    np.testing.assert_allclose(got, want, atol=TIME_PER_FRAME + 1e-9)
    exact = float(np.mean(np.abs(got - want) < 1e-9))
    assert exact >= 0.75, (exact, got, want)


def test_token_emission_times_multiple_seeds(pair):
    cfg, params, hf_model = pair
    heads = alignment_heads(cfg)
    for seed in (1, 2, 3):
        mel, prefix, text, full = _shared_inputs(cfg, rng_seed=seed, n_text=8)
        with torch.no_grad():
            out = hf_model(
                input_features=torch.from_numpy(mel),
                decoder_input_ids=torch.tensor([full]),
                output_attentions=True,
            )
        want = _oracle_jump_times(out.cross_attentions, heads, len(prefix), 60)
        xa = encode(params, jnp.asarray(mel), cfg)
        attn = np.asarray(decoder_cross_attention(
            params, jnp.asarray([full], jnp.int32), xa, cfg))
        got = token_emission_times(attn, len(prefix), 60, cfg, heads=heads)
        np.testing.assert_allclose(
            got, want, atol=TIME_PER_FRAME + 1e-9, err_msg=f"seed={seed}")


class _WordPerTokenTokenizer:
    """Every id decodes to ' w<id>': each token forms one word."""

    def decode(self, ids):
        return "".join(f" w{i}" for i in ids)


def test_word_boundaries_match_oracle_jump_semantics(pair):
    """Word starts/ends follow OpenAI's contiguous-tiling semantics:
    word k starts at its first token's jump time and ends at the NEXT
    word's jump time (EOT's for the last word)."""
    cfg, params, hf_model = pair
    mel, prefix, text, full = _shared_inputs(cfg, rng_seed=5, n_text=6)
    heads = alignment_heads(cfg)

    with torch.no_grad():
        out = hf_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.tensor([full]),
            output_attentions=True,
        )
    jt = _oracle_jump_times(out.cross_attentions, heads, len(prefix), 60)

    xa = encode(params, jnp.asarray(mel), cfg)
    words = word_timestamps(
        params, text, xa, n_frames=60, cfg=cfg,
        tokenizer=_WordPerTokenTokenizer(), prefix=tuple(prefix), heads=heads,
    )
    assert len(words) == len(text)
    for k, w in enumerate(words):
        assert abs(w.start - jt[k]) <= TIME_PER_FRAME + 1e-9, (k, w, jt)
        assert abs(w.end - jt[k + 1]) <= TIME_PER_FRAME + 1e-9, (k, w, jt)
    # contiguous tiling
    for a, b in zip(words, words[1:]):
        assert abs(a.end - b.start) < 1e-9
