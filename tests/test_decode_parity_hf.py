"""Token-level decode parity vs HuggingFace `generate` (VERDICT r2 #1).

The same random weights are loaded into torch
WhisperForConditionalGeneration and our JAX engine; HF's `generate` —
with its WhisperTimeStampLogitsProcessor, begin/always suppression
lists, prompt conditioning, and sequential chunked long-form
generation — must then produce EXACTLY the per-window token sequences
(including timestamp tokens) and seek trajectory that our engine's
greedy decode + seek loop produces. This converts random-weight
architecture parity into *decode-rule* parity against an independent
decoder implementation (north star "token-for-token"; reference engine
params semantics at managers/transcription.rs:445-534).

Both sides consume the SAME precomputed mel (ours injected via a
subclassed frontend) so the comparison isolates decode/seek behavior
from frontend numerics. Any divergence fails with the window index,
position, and both token streams around the mismatch.

Bookkeeping note: HF's `_retrieve_segment` includes the final
consecutive-pair's closing timestamp in its last segment
(`slices[-1] += 1`), while our `_parse_window` (OpenAI transcribe-loop
semantics) cuts before it; `_normalize_hf_window` drops that one token
— seek math is identical on both sides.

Beam-5 is deliberately NOT in this suite (VERDICT r2 #1's conditional:
"beam-5 if HF's beam semantics align" — they don't). Measured on this
harness (4 seeds, beam_size=5 both sides): greedy paths are token-exact
per the tests below, but the beam winners diverge at the first
beam-bookkeeping decision (position 2, right after the opening
timestamp) and never re-converge. The semantic gap is structural, not a
rule bug: HF beam search expands 2*num_beams candidates per step and
RETIRES a beam to a hypothesis list when it emits EOS (scoring it with
`length_penalty` at finalize, default sum/len^1.0 over a
differently-counted length), while this engine implements the
whisper.cpp/OpenAI BeamSearchDecoder: finished beams stay in their slot
re-emitting EOT as a frozen candidate, expansion is top-k per live
beam, and the final pick is argmax of sum-logprob/emitted-length. The
same logit rules feed both (greedy parity proves that); the search
trees differ, so token equality is not a meaningful target. Beam
correctness is covered by tests/test_whisper_beam.py (rule obedience,
score >= greedy, quantization-invariance).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from spittle_tpu.engine.base import TranscribeParams
from spittle_tpu.engine.whisper_engine import WhisperEngine
from spittle_tpu.models.whisper.config import CONFIGS, WhisperConfig
from spittle_tpu.models.whisper.model import encode
from spittle_tpu.models.whisper.weights import (
    hf_to_openai_names,
    params_from_openai_tensors,
)

# The standard OpenAI Whisper suppress list (generation_config.json of
# openai/whisper-large-v2 and friends) — identical on both sides.
SUPPRESS = (
    1, 2, 7, 8, 9, 10, 14, 25, 26, 27, 28, 29, 31, 58, 59, 60, 61, 62,
    63, 90, 91, 92, 93, 359, 503, 522, 542, 873, 893, 902, 918, 922,
    931, 1350, 1853, 1982, 2460, 2627, 3246, 3253, 3268, 3536, 3846,
    3961, 4183, 4667, 6585, 6647, 7273, 9061, 9383, 10428, 10929,
    11938, 12033, 12331, 12562, 13793, 14157, 14635, 15265, 15618,
    16553, 16604, 18362, 18956, 20075, 21675, 22520, 26130, 26161,
    26435, 28279, 29464, 31650, 32302, 32470, 36865, 42863, 47425,
    49870, 50254, 50258, 50358, 50359, 50360, 50361, 50362,
)
SPACE = 220
EOT = 50257
SOT = 50258
LANG_EN = 50259
TRANSCRIBE = 50359
PREV_SOT = 50361
NO_TIMESTAMPS = 50363
TS_BEGIN = 50364
N_TEXT_CTX = 128
PROMPT = (493, 1722, 3241, 7043, 291)

CONFIGS.setdefault(
    "hf-parity",
    WhisperConfig(
        name="hf-parity", n_mels=80, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_vocab=51865,
        n_text_ctx=N_TEXT_CTX, n_text_state=64, n_text_head=4,
        n_text_layer=2,
    ),
)


def _gen_config():
    gc = transformers.GenerationConfig(
        max_length=N_TEXT_CTX,
        decoder_start_token_id=SOT,
        eos_token_id=EOT,
        pad_token_id=EOT,
        bos_token_id=EOT,
        do_sample=False,
        num_beams=1,
    )
    gc.no_timestamps_token_id = NO_TIMESTAMPS
    gc.begin_suppress_tokens = [SPACE, EOT]
    gc.suppress_tokens = list(SUPPRESS)
    gc.max_initial_timestamp_index = 50
    gc.is_multilingual = True
    gc.lang_to_id = {"<|en|>": LANG_EN, "<|zh|>": 50260}
    gc.task_to_id = {"transcribe": TRANSCRIBE, "translate": 50358}
    gc.prev_sot_token_id = PREV_SOT
    return gc


class MelInjectedEngine(WhisperEngine):
    """Engine whose frontend reads windows from a precomputed global mel
    (slice + zero-pad, exactly like HF's long-form feature slicing), and
    which records every window's (offset, generated, kept, advance)."""

    def __init__(self, params, forced_prompt=()):
        super().__init__(dtype=jnp.float32)
        self.load_model("random:hf-parity")
        self.params = params
        self._space_token = SPACE
        self.suppress_non_speech = True
        self._non_speech = SUPPRESS
        self.NO_SPEECH_THRESHOLD = 2.0  # HF: no_speech_threshold=None
        self._forced_prompt = tuple(forced_prompt)
        self._global_mel = None
        self.window_log = []

    def _base_prompt(self, params):
        return self._forced_prompt

    def _assemble_windows(self, audios, positions, window_samples):
        self._positions = positions
        return super()._assemble_windows(audios, positions, window_samples)

    def _frontend(self, windows):
        from spittle_tpu.audio.mel import HOP_LENGTH

        mels = []
        for (_i, off) in self._positions:
            fr = off // HOP_LENGTH
            m = self._global_mel[:, fr : fr + 3000]
            if m.shape[1] < 3000:
                m = np.pad(m, ((0, 0), (0, 3000 - m.shape[1])))
            mels.append(m)
        return encode(
            self.params, jnp.asarray(np.stack(mels), jnp.float32), self.cfg
        )

    def _parse_window(self, gen_tokens, offset_sec, window_sec=30.0,
                      keep_tail=False):
        segs, kept, advance = super()._parse_window(
            gen_tokens, offset_sec, window_sec, keep_tail
        )
        self.window_log.append(
            (offset_sec, list(gen_tokens), list(kept), advance)
        )
        return segs, kept, advance

    def run(self, mel: np.ndarray):
        """mel [80, T] -> list of per-window (offset_sec, kept tokens)."""
        self._global_mel = mel
        self.window_log = []
        n_samples = mel.shape[1] * 160
        audio = np.zeros(n_samples, np.float32)  # only the length matters
        self.transcribe_batch(
            [audio],
            TranscribeParams(
                language="en",
                condition_on_previous_text=False,
                temperatures=(0.0,),
                max_tokens=N_TEXT_CTX - 3 - len(
                    (PREV_SOT,) + self._forced_prompt if self._forced_prompt
                    else ()
                ),
            ),
        )
        return [(off, kept) for (off, _gen, kept, _adv) in self.window_log]


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=51865,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        encoder_ffn_dim=256,
        decoder_ffn_dim=256,
        max_source_positions=1500,
        max_target_positions=N_TEXT_CTX,
    )
    torch.manual_seed(0)
    hf_model = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    hf_model.generation_config = _gen_config()

    cfg = CONFIGS["hf-parity"]
    tensors = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    mapped = hf_to_openai_names(tensors)
    params = jax.tree.map(jnp.asarray, params_from_openai_tensors(mapped, cfg))
    return cfg, params, hf_model


def _mel(seed: int, frames: int = 3000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((80, frames)).astype(np.float32)


def _hf_windows(hf_model, mel: np.ndarray, prompt=None):
    """Run HF generate; return per-window (offset_sec, tokens)."""
    kwargs = dict(
        input_features=torch.from_numpy(mel[None]),
        return_timestamps=True,
        return_segments=True,
        language="en",
        task="transcribe",
        do_sample=False,
        num_beams=1,
        condition_on_prev_tokens=False,
        temperature=0.0,
        logprob_threshold=None,
        no_speech_threshold=None,
    )
    if prompt is not None:
        kwargs["prompt_ids"] = torch.tensor([PREV_SOT, *prompt])
    with torch.no_grad():
        out = hf_model.generate(**kwargs)
    if isinstance(out, dict):
        segments = out["segments"][0]
    else:  # plain tensor (no segments): single window
        return [(0.0, out[0].tolist())]
    windows = []
    for seg in segments:
        toks = [int(t) for t in seg["tokens"].tolist() if t != EOT]
        # Group segments decoded in the same generate call (same result
        # object identity == same 30 s window).
        key = id(seg["result"])
        start = float(seg["start"])
        first_ts_off = (
            (toks[0] - TS_BEGIN) * 0.02 if toks and toks[0] >= TS_BEGIN
            else 0.0
        )
        if windows and windows[-1][0] == key:
            windows[-1][2].extend(toks)
        else:
            windows.append([key, start - first_ts_off, toks])
    return [(off, toks) for (_k, off, toks) in windows]


def _normalize_hf_window(tokens):
    """Drop HF's extra closing-pair timestamp (see module docstring)."""
    if (
        len(tokens) >= 2
        and tokens[-1] >= TS_BEGIN
        and tokens[-2] >= TS_BEGIN
    ):
        return tokens[:-1]
    return tokens


def _assert_windows_match(ours, hf, label):
    assert len(ours) == len(hf), (
        f"{label}: window count mismatch ours={len(ours)} hf={len(hf)}\n"
        f"our offsets={[o for o, _ in ours]}\n"
        f" hf offsets={[o for o, _ in hf]}"
    )
    for w, ((o_off, o_toks), (h_off, h_toks_raw)) in enumerate(zip(ours, hf)):
        # Offsets are diagnostic only: HF's no-consecutive-pair segments
        # report window-relative starts differently, but seek parity is
        # implied by per-window token equality (a diverged seek reads
        # different mel -> different tokens immediately).
        h_toks = _normalize_hf_window(h_toks_raw)
        n = min(len(o_toks), len(h_toks))
        for i in range(n):
            assert o_toks[i] == h_toks[i], (
                f"{label}: window {w} diverges at position {i}: "
                f"ours={o_toks[i]} hf={h_toks[i]}\n"
                f"ours[{max(0, i - 5)}:{i + 3}]="
                f"{o_toks[max(0, i - 5):i + 3]}\n"
                f"  hf[{max(0, i - 5)}:{i + 3}]="
                f"{h_toks[max(0, i - 5):i + 3]}"
            )
        assert len(o_toks) == len(h_toks), (
            f"{label}: window {w} length mismatch ours={len(o_toks)} "
            f"hf={len(h_toks)}; tails ours={o_toks[n - 3:]} "
            f"hf={h_toks[n - 3:]}"
        )


class TestDecodeParity:
    def test_greedy_single_window(self, pair):
        cfg, params, hf_model = pair
        engine = MelInjectedEngine(params)
        for seed in (0, 1, 2):
            mel = _mel(seed)
            ours = engine.run(mel)
            hf = _hf_windows(hf_model, mel)
            _assert_windows_match(ours, hf, f"greedy seed={seed}")

    def test_with_initial_prompt(self, pair):
        cfg, params, hf_model = pair
        engine = MelInjectedEngine(params, forced_prompt=PROMPT)
        for seed in (3, 4):
            mel = _mel(seed)
            ours = engine.run(mel)
            hf = _hf_windows(hf_model, mel, prompt=PROMPT)
            _assert_windows_match(ours, hf, f"prompted seed={seed}")

    def test_long_form_multi_window(self, pair):
        cfg, params, hf_model = pair
        engine = MelInjectedEngine(params)
        for seed, frames in ((5, 9000), (6, 7500)):
            mel = _mel(seed, frames)
            ours = engine.run(mel)
            hf = _hf_windows(hf_model, mel)
            assert len(ours) >= 3, "long-form must cover multiple windows"
            _assert_windows_match(ours, hf, f"long-form seed={seed}")

    def test_long_form_with_initial_prompt(self, pair):
        """HF's prompt_condition_type='first-segment' (OpenAI semantics
        with condition_on_previous_text off): only the FIRST window is
        conditioned on the initial prompt."""
        cfg, params, hf_model = pair
        engine = MelInjectedEngine(params, forced_prompt=PROMPT)
        mel = _mel(7, 7500)
        ours = engine.run(mel)
        hf = _hf_windows(hf_model, mel, prompt=PROMPT)
        assert len(ours) >= 2, "needs multiple windows"
        _assert_windows_match(ours, hf, "prompted long-form")
