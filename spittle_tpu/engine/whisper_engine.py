"""Whisper engine: batched long-form transcription on TPU.

Replaces the whisper.cpp path the reference drives through transcribe-rs
(`managers/transcription.rs:262-276,445-504`). Key TPU-first differences:

- every 30 s window is a fixed-shape (batch, 80/128, 3000) mel tensor, so
  compiled programs are reused across calls;
- concurrent utterances batch into one device program — the long-form loop
  advances a per-utterance seek cursor and regroups unfinished utterances
  into the next batched round (whisper.cpp decodes windows serially);
- language auto-detect (reference language=None semantics,
  transcription.rs:448-459) runs batched on the first window;
- audio crosses host->device as int16 (the mic wire format, half the
  bytes), normalized inside the fused mel+encoder program;
- transcribe_stream prefetches batch k+1 to the device while batch k
  computes (sustained throughput = max(transfer, compute));
- TranscribeParams.audio_ctx (whisper.cpp params.audio_ctx analog)
  shrinks the encoded window for short utterances — opt-in
  speed/accuracy trade.

Segment timestamps come from the decoded timestamp tokens (0.02 s units),
like whisper.cpp's segment output.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spittle_tpu.audio.mel import (
    HOP_LENGTH,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
)
from spittle_tpu.models.whisper.config import CONFIGS, WhisperConfig
from spittle_tpu.models.whisper.decode import (
    DecodeOptions,
    detect_language,
    greedy_decode,
)
from spittle_tpu.models.whisper.model import encode, init_params
from spittle_tpu.models.whisper.tokenizer import (
    WhisperTokenizer,
    load_tokenizer,
    make_test_vocab,
)
from .base import Segment, TranscribeParams, TranscriptionResult

WINDOW_FRAMES = 3000  # mel frames per 30 s window (standard Whisper)
FRAMES_PER_SECOND = 100


def _pcm_f32(w: jnp.ndarray) -> jnp.ndarray:
    """Device-side PCM normalize: wire format -> float32 [-1, 1).

    Audio ships to the device as int16 (the mic's native format) because
    the host->device link is the scarce resource in serving — int16
    halves the bytes of the dominant transfer; uint8 is the opt-in mu-law
    wire (audio/mulaw.py), one byte per sample. Either convert fuses into
    the mel program."""
    if w.dtype == jnp.int16:
        return w.astype(jnp.float32) / 32768.0
    if w.dtype == jnp.uint8:
        from spittle_tpu.audio.mulaw import mulaw_decode_jnp

        return mulaw_decode_jnp(w)
    return w.astype(jnp.float32)


def _as_audio(a) -> np.ndarray:
    """Accept float32 [-1,1] or int16 PCM; other dtypes convert to f32."""
    a = np.asarray(a)
    if a.dtype == np.int16:
        return a
    return a.astype(np.float32, copy=False)


def _cast_params_bf16(params):
    """Cast weights AND biases to bf16; layernorm gains/biases stay float32
    (model.py computes layernorm in float32 — the stacked [L, D] ln leaves
    need the key test, not an ndim test). Biases must follow the weights:
    a float32 bias added to a bf16 conv/matmul output promotes the
    activations to float32, which crashes the second encoder conv
    (conv_general_dilated requires matching dtypes) and silently de-bf16s
    every transformer block after a bias add. Matches init_params, which
    creates biases in the compute dtype (model.py:104-112,148-150)."""
    def cast(path, a):
        key = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if key.endswith(("ln_g", "ln_b")):
            return a
        if a.dtype == jnp.float32:
            return a.astype(jnp.bfloat16)
        return a

    return jax.tree_util.tree_map_with_path(cast, params)



def select_core_segments(segments, seek_s, window_s, overlap_s,
                         is_first, is_last):
    """Overlap-stitch: keep items whose midpoint lies in this window's
    core region (absolute seconds). Core regions of consecutive windows
    partition the timeline, so nothing duplicates or drops."""
    lo = seek_s if is_first else seek_s + overlap_s / 2
    hi = seek_s + window_s if is_last else seek_s + window_s - overlap_s / 2
    return [x for x in segments if lo <= (x.start + x.end) / 2 < hi]


class WhisperEngine:
    """TranscriptionEngine backed by the JAX Whisper stack."""

    def __init__(
        self,
        dtype=jnp.float32,
        suppress_non_speech: bool = False,
        quantize_decoder=False,
        quantize_encoder: bool = False,
        quantize_cache: bool = False,
        wire: str = "auto",
    ):
        """suppress_non_speech mirrors whisper.cpp's
        suppress_non_speech_tokens (default false there too).
        quantize_decoder: False, True/"int8", "w8a8", or "int4" — weight-only
        int8 on the decoder blocks (halves per-token HBM weight traffic;
        the whisper.cpp-q8 analog, served TPU-native) plus quantized
        cross-attention K/V at the given width; "int4" packs cross-KV
        two-per-byte, a quarter of bf16 bytes for the 32-layer large-v3
        decode's dominant stream (see ops/quant.py); "w8a8" keeps int8
        weights/cross-KV but runs the cross-attention dots int8xint8 on
        the MXU (queries/probs dynamically quantized) so the K/V HBM
        stream stays int8 with no materialized convert.
        quantize_encoder: W8A8 int8 on the encoder block GEMMs — runs the
        compute-bound encoder on the MXU's 2x-rate int8 mode with dynamic
        activation quantization (ops/quant.py:_mm_w8a8).
        quantize_cache: int8 self-attention KV cache (per-position
        scales, quantized on write) — halves the second-largest stream
        batched decode steps re-read; independent of quantize_decoder so
        the two quantizations A/B separately.
        wire: host->device audio wire format — "auto" ships the input's
        own dtype (int16 in, int16 across; the lossless default) or
        "mulaw" companded 8-bit (audio/mulaw.py; halves transfer again
        for transfer-bound links)."""
        self.dtype = dtype
        self.suppress_non_speech = suppress_non_speech
        if quantize_decoder is True:
            quantize_decoder = "int8"
        if quantize_decoder not in (False, "int8", "int4", "w8a8"):
            raise ValueError(
                "quantize_decoder must be False, True/'int8', 'int4' or"
                f" 'w8a8', got {quantize_decoder!r}"
            )
        self.quantize_decoder = quantize_decoder
        self.quantize_encoder = quantize_encoder
        self.quantize_cache = quantize_cache
        if wire not in ("auto", "mulaw"):
            # Fail loudly: the env path (SPITTLE_WIRE, the production
            # config surface) would otherwise silently treat a typo like
            # "mu-law" as "auto" and drop the transfer optimization.
            raise ValueError(
                f"wire must be 'auto' or 'mulaw', got {wire!r}"
            )
        self.wire = wire
        self.draft_cfg: Optional[WhisperConfig] = None
        self.draft_params = None
        # Model-specific DTW heads (alignment_heads.json sidecar); None ->
        # upper-half fallback.
        self.alignment_heads = None
        self.cfg: Optional[WhisperConfig] = None
        self.params = None
        # Optional jax Mesh: window batches are placed with a
        # NamedSharding over the leading ('data') axis so XLA splits the
        # frontend + decode across chips (set by the serving layer).
        self.mesh = None
        self.tokenizer: Optional[WhisperTokenizer] = None
        self.mel_filters: Optional[jnp.ndarray] = None
        self._space_token: Optional[int] = None
        self._non_speech: Optional[Tuple[int, ...]] = None
        self._frontend_fn = None  # jitted mel+encode, built per model
        self._self_draft = False
        # Speculative-decode telemetry from the most recent decode call
        # (mean rounds / accepted draft tokens / emitted length).
        self.last_spec_stats: Optional[Dict[str, float]] = None

    @classmethod
    def from_env(cls, **overrides) -> "WhisperEngine":
        """Engine with serving options from SPITTLE_* env flags.

        The CLI and the app factory share these TPU-serving knobs (they
        have no reference-settings counterpart): SPITTLE_QUANTIZE_DECODER
        (0|1|int8|int4|w8a8), SPITTLE_QUANTIZE_ENCODER,
        SPITTLE_QUANTIZE_CACHE,
        SPITTLE_WIRE (auto|mulaw)."""
        qd = os.environ.get("SPITTLE_QUANTIZE_DECODER", "0")
        if qd not in ("0", "1", "int8", "int4", "w8a8"):
            raise ValueError(
                "SPITTLE_QUANTIZE_DECODER must be 0, 1, int8, int4 or"
                f" w8a8, got {qd!r}"
            )
        opts = dict(
            quantize_decoder=(
                qd if qd in ("int8", "int4", "w8a8") else qd == "1"
            ),
            quantize_encoder=os.environ.get(
                "SPITTLE_QUANTIZE_ENCODER", "0") == "1",
            quantize_cache=os.environ.get(
                "SPITTLE_QUANTIZE_CACHE", "0") == "1",
            wire=os.environ.get("SPITTLE_WIRE", "auto"),
        )
        opts.update(overrides)
        return cls(**opts)

    # -- lifecycle -------------------------------------------------------

    def load_model(self, model_path: str) -> None:
        """Load a GGML file, HF safetensors dir, or `random:<config>` (tests)."""
        # Reset EVERY per-model cache: a reload must not leak the previous
        # model's mel filters (80- vs 128-mel), suppression token ids
        # (different vocab), alignment heads, or jitted frontend.
        self._frontend_fn = None
        self._non_speech = None
        self.mel_filters = None
        self.alignment_heads = None
        if model_path.startswith("random:"):
            name = model_path.split(":", 1)[1]
            self.cfg = CONFIGS[name]
            self.params = init_params(self.cfg, jax.random.PRNGKey(0), self.dtype)
            self.tokenizer = WhisperTokenizer(self.cfg, make_test_vocab())
        else:
            from spittle_tpu.models.whisper.weights import load_params

            self.cfg, self.params, extras = load_params(
                model_path, dtype=np.dtype(self.dtype) if self.dtype != jnp.bfloat16
                else np.float32
            )
            if self.dtype == jnp.bfloat16:
                self.params = _cast_params_bf16(self.params)
            if "mel_filters" in extras:
                self.mel_filters = jnp.asarray(extras["mel_filters"])
            if "vocab" in extras:
                vocab = {tok: i for i, tok in enumerate(extras["vocab"])}
                self.tokenizer = WhisperTokenizer(self.cfg, vocab)
            else:
                self.tokenizer = load_tokenizer(
                    self.cfg,
                    model_path if os.path.isdir(model_path)
                    else os.path.dirname(model_path),
                )
        if not model_path.startswith("random:"):
            from spittle_tpu.models.whisper.alignment import (
                load_alignment_heads,
            )

            self.alignment_heads = load_alignment_heads(model_path)
        if self.quantize_decoder:
            from spittle_tpu.ops.quant import quantize_whisper_decoder

            self.params = quantize_whisper_decoder(self.params)
        if self.quantize_encoder:
            from spittle_tpu.ops.quant import quantize_whisper_encoder_w8a8

            self.params = quantize_whisper_encoder_w8a8(self.params)
        space = self.tokenizer.encode(" ")
        self._space_token = space[0] if space else None

    def load_draft_model(self, model_path: str) -> None:
        """Load a small draft Whisper for speculative decoding.

        The draft must share the main model's token table and audio
        context (e.g. distil variants of the same family). Greedy
        temperature-0 decodes then verify K draft tokens per main-model
        pass (models/whisper/speculative.py) and still produce exactly
        the main model's transcript.
        """
        assert self.is_loaded, "load the main model before the draft"
        if model_path.startswith("random:"):
            draft_cfg = CONFIGS[model_path.split(":", 1)[1]]
            draft_params = init_params(
                draft_cfg, jax.random.PRNGKey(1), self.dtype
            )
        else:
            from spittle_tpu.models.whisper.weights import load_params

            draft_cfg, draft_params, _ = load_params(
                model_path,
                dtype=np.dtype(self.dtype)
                if self.dtype != jnp.bfloat16 else np.float32,
            )
            if self.dtype == jnp.bfloat16:
                draft_params = _cast_params_bf16(draft_params)
        for attr in ("n_vocab", "sot", "eot", "timestamp_begin",
                     "lang_begin", "n_audio_ctx"):
            if getattr(self.cfg, attr) != getattr(draft_cfg, attr):
                raise ValueError(
                    f"draft incompatible with main model on {attr}"
                )
        self.draft_cfg = draft_cfg
        self.draft_params = draft_params

    def load_self_draft(self, stride: int = 2) -> None:
        """Layer-dropped self-draft for speculative decoding: the draft
        decoder is the MAIN model's decoder with every `stride`-th block
        (always keeping the first and last), sharing its embeddings,
        final LN, and — crucially — its encoder output, so drafting
        costs ~1/stride of the per-token cross-KV + weight traffic and
        needs no second checkpoint. Unlike a random draft (acceptance
        ~0, ROUND_NOTES r2), a layer subset of the same weights is a
        meaningful approximation of the full decoder, so accepted runs
        amortize the bandwidth-bound decode (~1.5 GB/step cross-KV at
        batch 48). Output tokens remain EXACTLY the main model's
        (speculative.py verifies every draft token)."""
        import dataclasses as _dc

        assert self.is_loaded, "load the main model first"
        n_layers = self.cfg.n_text_layer
        idx = sorted(set(range(0, n_layers, max(stride, 1))) | {n_layers - 1})
        take = np.asarray(idx)
        draft = dict(self.params)
        dec = dict(self.params["decoder"])
        dec["blocks"] = jax.tree.map(lambda a: a[take], dec["blocks"])
        draft["decoder"] = dec  # encoder/embeddings shared by reference
        self.draft_params = draft
        self.draft_cfg = _dc.replace(
            self.cfg, name=f"{self.cfg.name}-selfdraft{stride}",
            n_text_layer=len(idx),
        )
        self._self_draft = True

    def unload_model(self) -> None:
        self.cfg = None
        self.params = None
        self.tokenizer = None
        self.mel_filters = None
        self.draft_cfg = None
        self.draft_params = None
        self._frontend_fn = None
        self._self_draft = False

    @property
    def is_loaded(self) -> bool:
        return self.params is not None

    # -- transcription ---------------------------------------------------

    @property
    def window_frames(self) -> int:
        # Standard models use 1500 encoder positions = 3000 mel frames;
        # smaller n_audio_ctx (tests, custom models) scales the window.
        return self.cfg.n_audio_ctx * 2

    @property
    def window_samples(self) -> int:
        return self.window_frames * HOP_LENGTH

    def _window_geometry(
        self, params: TranscribeParams
    ) -> Tuple[int, int]:
        """(window_frames, window_samples) for this call.

        params.audio_ctx (whisper.cpp audio_ctx analog) shrinks the
        window: the encoder runs over audio_ctx positions = 2*audio_ctx
        mel frames, so short utterances skip padded-frame compute in the
        encoder AND per-step cross-KV reads in the decoder."""
        if params.audio_ctx:
            wf = min(2 * params.audio_ctx, self.window_frames)
            return wf, wf * HOP_LENGTH
        return self.window_frames, self.window_samples

    def _mel(self, audio_batch: np.ndarray) -> jnp.ndarray:
        """[B, n_samples] -> [B, n_mels, frames]."""
        return log_mel_spectrogram(
            jnp.asarray(audio_batch), n_mels=self.cfg.n_mels,
            filters=self.mel_filters,
        )

    def _assemble_windows(
        self, audios, items, window_samples: Optional[int] = None
    ) -> np.ndarray:
        """items: [(audio_idx, start_sample)] -> [len(items), window] PCM.

        All-int16 inputs assemble (and transfer) as int16 — half the
        host->device bytes, normalized on device in the fused frontend;
        mixed batches normalize to float32 on host."""
        ws = window_samples or self.window_samples
        all_i16 = all(a.dtype == np.int16 for a in audios)
        dtype = np.int16 if all_i16 else np.float32
        windows = np.zeros((len(items), ws), dtype)
        for wi, (i, start) in enumerate(items):
            chunk = audios[i][start : start + ws]
            if chunk.dtype == np.int16 and not all_i16:
                chunk = chunk.astype(np.float32) / 32768.0
            windows[wi, : len(chunk)] = chunk
        # getattr: duck-typed stubs (tests) borrow this method unbound
        if getattr(self, "wire", "auto") == "mulaw":
            from spittle_tpu.audio.mulaw import mulaw_encode

            return mulaw_encode(windows)
        return windows

    def _frontend(self, windows: np.ndarray) -> jnp.ndarray:
        """windows [B, 480000] PCM -> encoder output, as ONE cached
        program. mel + the encoder conv stem otherwise run as an eager op
        chain — each op a separate dispatch (and host round-trip on a
        tunneled backend) with big intermediates materialized in HBM."""
        if self._frontend_fn is None:
            cfg = self.cfg
            filters = self.mel_filters

            def fe(params, w):
                mel = log_mel_spectrogram(
                    _pcm_f32(w), n_mels=cfg.n_mels, filters=filters
                )
                return encode(params, mel, cfg)

            self._frontend_fn = jax.jit(fe)
        return self._frontend_fn(self.params, jnp.asarray(windows))

    def _decode_options(
        self, params: TranscribeParams, timestamps: bool = True
    ) -> DecodeOptions:
        suppress: Tuple[int, ...] = ()
        if self.suppress_non_speech and self.tokenizer is not None:
            from spittle_tpu.models.whisper.tokenizer import non_speech_tokens

            if self._non_speech is None:
                self._non_speech = non_speech_tokens(self.tokenizer)
            suppress = self._non_speech
        return DecodeOptions(
            task="translate" if params.translate else "transcribe",
            language=params.language,
            timestamps=timestamps,
            space_token=self._space_token,
            suppress_tokens=suppress,
            quant_kv=bool(self.quantize_decoder),
            quant_kv_bits=4 if self.quantize_decoder == "int4" else 8,
            quant_kv_w8a8=self.quantize_decoder == "w8a8",
            quant_cache=self.quantize_cache,
            rig_advance=int(os.environ.get("SPITTLE_SPEC_RIG", "0")),
            # whisper.cpp splits the text context: half for the carried
            # prompt, half for the window's decode. Bounding max_tokens
            # also halves the static KV cache the decode loop re-reads
            # every step.
            max_tokens=params.max_tokens or self.cfg.n_text_ctx // 2,
        )

    def transcribe_samples(
        self, samples: np.ndarray, params: Optional[TranscribeParams] = None
    ) -> TranscriptionResult:
        return self.transcribe_batch([samples], params)[0]

    def transcribe_batch(
        self,
        batch: Sequence[np.ndarray],
        params: Optional[TranscribeParams] = None,
    ) -> List[TranscriptionResult]:
        """Batched long-form transcription.

        Each item is a float32 16 kHz mono buffer of any length. Items are
        chunked into 30 s windows; all items' current windows decode as one
        batch, then items with remaining audio re-enter the next round at
        their seek offsets (timestamp-guided, whisper.cpp-style).
        """
        assert self.is_loaded, "no model loaded"
        params = params or TranscribeParams()
        cfg = self.cfg
        tok = self.tokenizer

        base_prompt = prompt_tokens = self._base_prompt(params)

        n = len(batch)
        audios = [_as_audio(a) for a in batch]
        if params.parallel_windows:
            if params.condition_on_previous_text:
                raise ValueError(
                    "parallel_windows requires condition_on_previous_text="
                    "False (windows decode independently)"
                )
            return self._transcribe_parallel_windows(
                audios, params, base_prompt
            )
        seeks = [0] * n  # in mel frames
        wf, ws = self._window_geometry(params)
        content_frames = [max(1, len(a) // HOP_LENGTH) for a in audios]
        seg_tokens: List[List[int]] = [[] for _ in range(n)]
        segments: List[List[Segment]] = [[] for _ in range(n)]
        words: List[list] = [[] for _ in range(n)]
        languages: List[Optional[str]] = [params.language] * n

        lang_tokens_arr: Optional[np.ndarray] = None
        round_idx = 0
        while True:
            active = [i for i in range(n) if seeks[i] < content_frames[i]]
            if not active:
                break
            # Build this round's window batch.
            windows = self._assemble_windows(
                audios, [(i, seeks[i] * HOP_LENGTH) for i in active],
                window_samples=ws,
            )
            xa = self._frontend(windows)
            draft_xa = None
            if self.draft_params is not None:
                if self._self_draft:
                    draft_xa = xa  # shared encoder: no second encode
                else:
                    draft_mel = log_mel_spectrogram(
                        _pcm_f32(jnp.asarray(windows)),
                        n_mels=self.draft_cfg.n_mels,
                    )
                    draft_xa = encode(
                        self.draft_params, draft_mel, self.draft_cfg
                    )

            lt = None
            if cfg.multilingual:
                if params.language is None and round_idx == 0:
                    probs = np.asarray(detect_language(self.params, xa, cfg))
                    det = probs.argmax(-1)
                    lang_tokens_arr = np.full(n, cfg.lang_begin, np.int64)
                    for bi, i in enumerate(active):
                        lang_tokens_arr[i] = cfg.lang_begin + det[bi]
                        languages[i] = tok.lang_code(int(lang_tokens_arr[i]))
                if lang_tokens_arr is not None:
                    lt = jnp.asarray(
                        [lang_tokens_arr[i] for i in active], jnp.int32
                    )
            opts = self._decode_options(params)
            out = self._decode_with_fallback(
                xa, opts, params, lt, prompt_tokens, draft_xa=draft_xa
            )
            tokens = np.asarray(out["tokens"])
            sb = out["sample_begin"]

            for bi, i in enumerate(active):
                row = tokens[bi, sb:]
                gen = []
                for t in row:
                    if t == cfg.eot:
                        break
                    gen.append(int(t))
                win_offset = seeks[i] / FRAMES_PER_SECOND
                window_frames = min(wf, content_frames[i] - seeks[i])
                # whisper.cpp/OpenAI no-speech skip: a window that looks like
                # silence (high no_speech_prob) with a weak decode is dropped
                # and the seek advances the full window.
                if (
                    float(out["no_speech_prob"][bi])
                    > self.NO_SPEECH_THRESHOLD
                    and float(out["avg_logprob"][bi]) < self.LOGPROB_THRESHOLD
                ):
                    seeks[i] += window_frames
                    continue
                segs, gen, advance = self._parse_window(
                    gen, win_offset,
                    window_sec=window_frames / FRAMES_PER_SECOND,
                )
                if params.word_timestamps and gen:
                    from spittle_tpu.models.whisper.alignment import (
                        word_timestamps as _wt,
                    )
                    from .base import Word

                    timings = _wt(
                        self.params, gen, xa[bi : bi + 1],
                        n_frames=window_frames // 2,  # encoder positions
                        cfg=cfg, tokenizer=tok,
                        prefix=tuple(int(t) for t in tokens[bi, :sb]),
                        heads=self.alignment_heads,
                    )
                    words[i].extend(
                        Word(w.word, w.start + win_offset, w.end + win_offset)
                        for w in timings
                    )
                segments[i].extend(segs)
                seg_tokens[i].extend(gen)
                # Clamp to the encoded window: with a reduced audio_ctx
                # the timestamp vocabulary still spans 0-30 s, and an
                # unclamped advance would skip audio no window ever saw.
                seeks[i] += (
                    min(advance, window_frames) if advance > 0
                    else window_frames
                )
            # Prompt carry (whisper.cpp no_context=false): single-utterance
            # sequential windows condition on the text decoded so far.
            if (
                n == 1
                and params.condition_on_previous_text
                and seg_tokens[0]
            ):
                text_tokens = [
                    t for t in seg_tokens[0] if t < cfg.timestamp_begin
                ]
                combined = (list(base_prompt) + text_tokens)[
                    -(cfg.n_text_ctx // 2 - 1):
                ]
                # Bucket the carried length: the decode program's prefix
                # shape is static, so every distinct prompt length would
                # trigger a full XLA recompile per window. Keeping the
                # LAST k tokens for a small bucket set trades a little
                # conditioning context for compile-once decoding.
                max_prompt = cfg.n_text_ctx // 2 - 1
                if len(combined) >= 32:
                    k = max(
                        bb for bb in (32, 64, 128, max_prompt)
                        if bb <= len(combined)
                    )
                    combined = combined[-k:]
                prompt_tokens = tuple(combined)
            round_idx += 1

        results = []
        for i in range(n):
            text = tok.decode(seg_tokens[i]).strip()
            results.append(
                TranscriptionResult(
                    text=text, segments=segments[i], language=languages[i],
                    words=words[i], tokens=[int(t) for t in seg_tokens[i]],
                )
            )
        return results

    def _base_prompt(self, params: TranscribeParams) -> Tuple[int, ...]:
        """initial_prompt -> conditioning tokens, truncated to
        n_text_ctx/2 - 1 (whisper.cpp prompt-half split)."""
        if not params.initial_prompt:
            return ()
        max_prompt = self.cfg.n_text_ctx // 2 - 1
        ids = self.tokenizer.encode(" " + params.initial_prompt.strip())
        return tuple(ids[-max_prompt:])

    def _place_windows(self, windows):
        """Host->device transfer of a window batch. With a mesh set, the
        batch is placed with a NamedSharding over the mesh's leading
        axis (rows must divide evenly — the serving ladder guarantees
        it); XLA then runs the frontend/decode data-parallel across the
        mesh with no further annotation. On a process-spanning (multi-
        host) mesh the local rows are this host's contribution and the
        global batch is assembled across processes
        (make_array_from_process_local_data — jax.device_put cannot fill
        non-addressable shards)."""
        if self.mesh is None:
            return jax.device_put(windows)
        from jax.sharding import NamedSharding, PartitionSpec

        from spittle_tpu.parallel.multihost import (
            global_batch_from_local,
            mesh_is_multiprocess,
        )

        axis = self.mesh.axis_names[0]
        if mesh_is_multiprocess(self.mesh):
            return global_batch_from_local(
                windows, self.mesh, PartitionSpec(axis)
            )
        if windows.shape[0] % self.mesh.shape[axis]:
            return jax.device_put(windows)  # ragged: replicate instead
        return jax.device_put(
            windows, NamedSharding(self.mesh, PartitionSpec(axis))
        )

    def stage_batch(self, batch, params: Optional[TranscribeParams] = None):
        """Host + transfer half of a batched transcription: window plan,
        PCM assembly, and the (async) host->device put — everything a
        stager thread can do while the previous batch computes. Returns
        an opaque handle for transcribe_staged, or None when the params
        need the sequential path (prompt carry / non-parallel windows),
        which cannot be staged."""
        params = params or TranscribeParams()
        if not params.parallel_windows or params.condition_on_previous_text:
            return None
        assert self.is_loaded, "no model loaded"
        audios = [_as_audio(a) for a in batch]
        plan, windows, content_frames, overlap = self._plan_parallel_windows(
            audios, params
        )
        dev = self._place_windows(windows)
        return (audios, (plan, dev, content_frames, overlap), params)

    def transcribe_staged(self, handle) -> List[TranscriptionResult]:
        """Compute half for a stage_batch handle."""
        audios, staged, params = handle
        return self._transcribe_parallel_windows(
            audios, params, self._base_prompt(params), staged=staged
        )

    def transcribe_stream(self, batches, params=None, prefetch: int = 1,
                          overlap_fetch: bool = False):
        """Pipelined batched transcription: prefetch-to-device double
        buffering (the tf.data-prefetch pattern, TPU-idiomatic input
        pipelining).

        batches: iterable of Sequence[np.ndarray] (each a batch of PCM
        buffers, float32 or int16). Yields List[TranscriptionResult] per
        batch, in order. A worker thread assembles windows and streams
        them host->device while the PREVIOUS batch's encode/decode runs
        on the device — on a host link slower than the model, sustained
        throughput becomes max(transfer, compute) instead of their sum.

        overlap_fetch: additionally dispatch batch k+1's device programs
        BEFORE blocking on batch k's token fetch, hiding the
        device->host round-trip + host parse behind device compute (the
        measured inter-group stream gap). Results still yield in order,
        one batch later than the dispatch. Costs one extra in-flight
        group's device buffers (~xa: B x 1500 x d_model bf16), so leave
        it off when batch size sits at the HBM frontier.

        Requires independent windows (parallel_windows semantics;
        condition_on_previous_text must be off). prefetch bounds how many
        staged batches may wait on device (HBM: one 48 x 30 s int16 batch
        is 46 MB).
        """
        import queue as _queue
        import threading

        assert self.is_loaded, "no model loaded"
        params = params or TranscribeParams(
            parallel_windows=True, condition_on_previous_text=False
        )
        if params.condition_on_previous_text:
            raise ValueError(
                "transcribe_stream requires condition_on_previous_text="
                "False (windows decode independently)"
            )
        base_prompt = self._base_prompt(params)

        q: _queue.Queue = _queue.Queue(maxsize=max(1, prefetch))
        done = object()
        stop = threading.Event()

        def _put(item) -> bool:
            # Bounded put that gives up when the consumer abandoned the
            # generator — a plain q.put would park this thread forever,
            # pinning its staged device buffer (46 MB per 48 x 30 s
            # batch) for the process lifetime.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except _queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch in batches:
                    if stop.is_set():
                        return
                    audios = [_as_audio(a) for a in batch]
                    plan, windows, content_frames, overlap = (
                        self._plan_parallel_windows(audios, params)
                    )
                    dev = self._place_windows(windows)
                    if not _put((audios, (plan, dev, content_frames,
                                          overlap))):
                        return
            except BaseException as e:  # surface in the consumer
                _put(("__error__", e))
            else:
                _put(done)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            held = None  # overlap_fetch: batch k's dispatched programs
            while True:
                item = q.get()
                if item is done:
                    break
                if isinstance(item, tuple) and item[0] == "__error__":
                    raise item[1]
                audios, staged = item
                if not overlap_fetch:
                    yield self._transcribe_parallel_windows(
                        audios, params, base_prompt, staged=staged
                    )
                    continue
                # Dispatch batch k+1's device programs FIRST, then block
                # on batch k's token fetch — the fetch round-trip + host
                # parse now hide behind k+1's device compute.
                disp = self._dispatch_parallel_windows(
                    audios, params, base_prompt, staged
                )
                if held is not None:
                    yield self._finalize_parallel_windows(held)
                held = disp
            if held is not None:  # flush the last held dispatch
                yield self._finalize_parallel_windows(held)
        finally:
            stop.set()  # unblock + terminate the producer on early exit

    def _plan_parallel_windows(self, audios, params: TranscribeParams):
        """Host half of the parallel-windows path: window plan + PCM batch.

        Returns (plan, windows, content_frames, overlap). Split out so
        transcribe_stream can run it (plus the device transfer) on a
        prefetch thread while the previous batch computes."""
        n = len(audios)
        content_frames = [max(1, len(a) // HOP_LENGTH) for a in audios]
        # (item, seek) for every window. With overlap-stitch, windows
        # advance by (window - overlap) and each keeps only segments whose
        # midpoint falls in its core region, so boundary words aren't cut.
        overlap = min(
            int(params.parallel_overlap_s * FRAMES_PER_SECOND),
            self._window_geometry(params)[0] // 2,
        )
        wf, ws = self._window_geometry(params)
        stride = max(wf - overlap, 1)
        # A window is only needed while the previous one doesn't already
        # cover the remaining content: stop at content - overlap, else a
        # 30 s utterance with overlap > 0 would decode a second window
        # containing nothing but already-covered tail.
        plan = [
            (i, seek)
            for i in range(n)
            for seek in range(0, max(content_frames[i] - overlap, 1), stride)
        ]
        windows = self._assemble_windows(
            audios, [(i, seek * HOP_LENGTH) for i, seek in plan],
            window_samples=ws,
        )
        return plan, windows, content_frames, overlap

    def _transcribe_parallel_windows(
        self, audios, params: TranscribeParams, base_prompt, staged=None
    ) -> List[TranscriptionResult]:
        """Long-form fast path: every 30 s window of every item decodes in
        ONE batched device program (fixed-stride chunking).

        Trades whisper.cpp's timestamp-guided seek + prompt carry for a
        single compile-once batch — the right shape for TPU serving when
        windows are independent (condition_on_previous_text=False).
        staged: optional (plan, device_windows, content_frames, overlap)
        from _plan_parallel_windows + device_put on a prefetch thread.
        """
        return self._finalize_parallel_windows(
            self._dispatch_parallel_windows(audios, params, base_prompt,
                                            staged)
        )

    def _dispatch_parallel_windows(
        self, audios, params: TranscribeParams, base_prompt, staged=None
    ) -> dict:
        """Device half of _transcribe_parallel_windows: frontend + language
        detect + the temperature ladder's FIRST decode rung, dispatched but
        NOT fetched. Returns the context _finalize_parallel_windows needs.

        Splitting here lets transcribe_stream(overlap_fetch=True) enqueue
        group k+1's device programs before blocking on group k's token
        fetch, so the fetch round-trip + host parse hide behind device
        compute instead of serializing the stream (the measured ~139 ms
        inter-group gap, docs/PERFORMANCE.md stream-gap probe)."""
        cfg = self.cfg
        tok = self.tokenizer
        n = len(audios)
        if staged is None:
            plan, windows, content_frames, overlap = (
                self._plan_parallel_windows(audios, params)
            )
            windows = self._place_windows(windows)
        else:
            plan, windows, content_frames, overlap = staged
        wf, _ = self._window_geometry(params)
        stride = max(wf - overlap, 1)
        xa = self._frontend(windows)
        draft_xa = None
        if self.draft_params is not None:
            if self._self_draft:
                draft_xa = xa  # shared encoder: no second encode
            else:
                draft_mel = log_mel_spectrogram(
                    _pcm_f32(jnp.asarray(windows)),
                    n_mels=self.draft_cfg.n_mels,
                )
                draft_xa = encode(
                    self.draft_params, draft_mel, self.draft_cfg
                )

        languages: List[Optional[str]] = [params.language] * n
        lt = None
        det = None
        if cfg.multilingual:
            if params.language is None:
                # Detect on each item's FIRST window; share across windows.
                # Everything stays on device (argmax + gather) so dispatch
                # never blocks — the per-item language STRINGS are resolved
                # from `det` in _finalize_parallel_windows, where a fetch
                # already happens anyway (overlap_fetch depends on this
                # half being non-blocking).
                first = [next(w for w, (j, s) in enumerate(plan) if j == i)
                         for i in range(n)]
                probs = detect_language(
                    self.params, xa[np.asarray(first)], cfg
                )
                det = jnp.argmax(probs, axis=-1).astype(jnp.int32)  # [n]
                lt = (cfg.lang_begin + det)[
                    jnp.asarray([i for i, _ in plan], jnp.int32)
                ]

        opts = self._decode_options(params)
        out0 = self._dispatch_decode(
            xa, opts, params, lt, base_prompt, draft_xa=draft_xa
        )
        return dict(
            out0=out0, xa=xa, opts=opts, params=params, lt=lt,
            base_prompt=base_prompt, draft_xa=draft_xa, plan=plan,
            content_frames=content_frames, overlap=overlap, wf=wf,
            languages=languages, det=det, n=n,
        )

    def _finalize_parallel_windows(self, disp) -> List[TranscriptionResult]:
        """Host half of _transcribe_parallel_windows: fetch the dispatched
        rung-0 decode, run any temperature-ladder retries, parse + stitch."""
        cfg = self.cfg
        tok = self.tokenizer
        params = disp["params"]
        xa = disp["xa"]
        plan = disp["plan"]
        content_frames = disp["content_frames"]
        overlap = disp["overlap"]
        wf = disp["wf"]
        languages = disp["languages"]
        if disp.get("det") is not None:
            # Language detect ran on device in the dispatch half; resolve
            # the per-item code strings at this (first) fetch point.
            det = np.asarray(disp["det"])
            languages = [
                tok.lang_code(int(cfg.lang_begin + d)) for d in det
            ]
        n = disp["n"]
        out = self._finish_decode(
            disp["out0"], xa, disp["opts"], params, disp["lt"],
            disp["base_prompt"], draft_xa=disp["draft_xa"],
        )
        tokens = np.asarray(out["tokens"])
        sb = out["sample_begin"]

        seg_tokens: List[List[int]] = [[] for _ in range(n)]
        segments: List[List[Segment]] = [[] for _ in range(n)]
        words: List[list] = [[] for _ in range(n)]
        # The stitch flags must come from the ACTUAL plan: with the plan
        # stopping at content - overlap, the last window of an item can
        # have seek + stride < content, and a stride-based is_last test
        # would drop its final overlap/2 seconds of segments.
        last_seek = {}
        for j, sk in plan:
            last_seek[j] = max(sk, last_seek.get(j, 0))
        for wi, (i, seek) in enumerate(plan):
            gen = []
            for t in tokens[wi, sb:]:
                if t == cfg.eot:
                    break
                gen.append(int(t))
            win_offset = seek / FRAMES_PER_SECOND
            window_frames = min(wf, content_frames[i] - seek)
            if (
                float(out["no_speech_prob"][wi]) > self.NO_SPEECH_THRESHOLD
                and float(out["avg_logprob"][wi]) < self.LOGPROB_THRESHOLD
            ):
                continue  # silence window (whisper.cpp no-speech skip)
            # keep_tail: fixed-stride windows never re-decode the tail, so
            # trailing tokens after the last timestamp pair stay (overlap
            # stitching dedupes them against the next window's core).
            segs, gen, _ = self._parse_window(
                gen, win_offset,
                window_sec=window_frames / FRAMES_PER_SECOND,
                keep_tail=True,
            )
            if overlap:
                is_first = seek == 0
                is_last = seek == last_seek[i]
                segs = select_core_segments(
                    segs, win_offset,
                    wf / FRAMES_PER_SECOND,
                    overlap / FRAMES_PER_SECOND, is_first, is_last,
                )
            if params.word_timestamps and gen:
                from spittle_tpu.models.whisper.alignment import (
                    word_timestamps as _wt,
                )
                from .base import Word

                timings = _wt(
                    self.params, gen, xa[wi : wi + 1],
                    n_frames=window_frames // 2, cfg=cfg, tokenizer=tok,
                    prefix=tuple(int(t) for t in tokens[wi, :sb]),
                    heads=self.alignment_heads,
                )
                shifted = [
                    Word(w.word, w.start + win_offset, w.end + win_offset)
                    for w in timings
                ]
                if overlap:
                    shifted = select_core_segments(
                        shifted, win_offset,
                        wf / FRAMES_PER_SECOND,
                        overlap / FRAMES_PER_SECOND, is_first, is_last,
                    )
                words[i].extend(shifted)
            segments[i].extend(segs)
            seg_tokens[i].extend(gen)

        # With overlap-stitching, windows re-decode shared audio: raw token
        # concatenation would duplicate the overlap text, so the transcript
        # is the stitched segments' text (like OpenAI's segment-joined text).
        def item_text(i: int) -> str:
            if overlap:
                return "".join(s.text for s in segments[i]).strip()
            return tok.decode(seg_tokens[i]).strip()

        return [
            TranscriptionResult(
                text=item_text(i),
                segments=segments[i],
                language=languages[i],
                words=words[i],
                tokens=[int(t) for t in seg_tokens[i]],
            )
            for i in range(n)
        ]

    # Quality-gated temperature ladder (whisper.cpp fallback semantics:
    # retry at increasing temperature when the decode is degenerate).
    FALLBACK_TEMPERATURES = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    COMPRESSION_RATIO_THRESHOLD = 2.4
    LOGPROB_THRESHOLD = -1.0
    NO_SPEECH_THRESHOLD = 0.6

    @staticmethod
    def _compression_ratio(text: str) -> float:
        import zlib

        if not text:
            return 0.0
        raw = text.encode("utf-8")
        return len(raw) / len(zlib.compress(raw))

    def _decode_once(self, xa, opts, params, lt, prompt_tokens,
                     draft_xa=None):
        if params.beam_size > 1 and opts.temperature == 0.0:
            from spittle_tpu.models.whisper.beam import beam_decode

            return beam_decode(
                self.params, xa, self.cfg, opts, beam_size=params.beam_size,
                lang_tokens=lt, prompt_tokens=prompt_tokens,
            )
        if draft_xa is not None and opts.temperature == 0.0:
            from spittle_tpu.models.whisper.speculative import (
                speculative_greedy_decode,
            )

            # Acceptance telemetry (rounds/accepted_total/length) is
            # fetched in _finish_decode, folded into the same device_get
            # as the tokens — keeping this dispatch half non-blocking so
            # overlap_fetch's dispatch-ahead actually overlaps.
            return speculative_greedy_decode(
                self.params, self.draft_params, xa, draft_xa,
                self.cfg, self.draft_cfg, opts,
                lang_tokens=lt, prompt_tokens=prompt_tokens,
            )
        return greedy_decode(
            self.params, xa, self.cfg, opts,
            lang_tokens=lt, prompt_tokens=prompt_tokens,
        )

    def _decode_with_fallback(self, xa, opts, params, lt, prompt_tokens,
                              draft_xa=None):
        """Per-item retry ladder: a window whose decode looks degenerate
        (compression ratio > 2.4 or avg logprob < -1.0) re-decodes at the
        next temperature; accepted items keep their first good result."""
        return self._finish_decode(
            self._dispatch_decode(xa, opts, params, lt, prompt_tokens,
                                  draft_xa=draft_xa),
            xa, opts, params, lt, prompt_tokens, draft_xa=draft_xa,
        )

    def _dispatch_decode(self, xa, opts, params, lt, prompt_tokens,
                         draft_xa=None):
        """Dispatch the temperature ladder's FIRST rung without fetching:
        device work is enqueued, the returned out dict holds device
        arrays. _finish_decode owns the fetch and any retry rungs."""
        import dataclasses as _dc

        ladder = params.temperatures or self.FALLBACK_TEMPERATURES
        return self._decode_once(
            xa, _dc.replace(opts, temperature=ladder[0]), params, lt,
            prompt_tokens, draft_xa=draft_xa,
        )

    def _finish_decode(self, out, xa, opts, params, lt, prompt_tokens,
                       draft_xa=None):
        """Fetch a dispatched rung-0 decode and run the remaining
        temperature-ladder rungs (per-item retry on degenerate decodes)."""
        import dataclasses as _dc

        n = xa.shape[0]
        best = None
        pending = list(range(n))
        ladder = params.temperatures or self.FALLBACK_TEMPERATURES
        for ri, temp in enumerate(ladder):
            if ri > 0:
                t_opts = _dc.replace(opts, temperature=temp)
                sub = len(pending) != n
                out = self._decode_once(
                    xa[np.asarray(pending)] if sub else xa,
                    t_opts, params,
                    (lt[np.asarray(pending)]
                     if lt is not None and sub else lt),
                    prompt_tokens,
                    draft_xa=(
                        draft_xa[np.asarray(pending)]
                        if draft_xa is not None and sub else draft_xa
                    ),
                )
            # One batched device->host fetch: separate np.asarray calls
            # cost one round-trip each on a tunneled backend. Speculative
            # acceptance telemetry rides the same fetch when present.
            spec = "rounds" in out
            fetch = [out["tokens"], out["avg_logprob"],
                     out["no_speech_prob"]]
            if spec:
                fetch += [out["rounds"], out["accepted_total"],
                          out["length"]]
            vals = jax.device_get(tuple(fetch))
            tokens, avg_lp, ns_prob = vals[:3]
            if spec:
                self.last_spec_stats = {
                    "rounds": float(np.mean(vals[3])),
                    "accepted_total": float(np.mean(vals[4])),
                    "emitted": float(np.mean(vals[5])),
                }
            sb = out["sample_begin"]
            if best is None:
                best = {
                    "tokens": tokens.copy(),
                    "avg_logprob": avg_lp.copy(),
                    "no_speech_prob": ns_prob.copy(),
                    "sample_begin": sb,
                }
            still = []
            for bi, item in enumerate(pending):
                text = self._tokens_to_text(tokens[bi], sb)
                ok = (
                    self._compression_ratio(text)
                    <= self.COMPRESSION_RATIO_THRESHOLD
                    and avg_lp[bi] >= self.LOGPROB_THRESHOLD
                )
                best["tokens"][item] = tokens[bi]
                best["avg_logprob"][item] = avg_lp[bi]
                best["no_speech_prob"][item] = ns_prob[bi]
                if not ok:
                    still.append(item)
            pending = still
            if not pending:
                break
        return best

    def _tokens_to_text(self, row, sample_begin) -> str:
        gen = []
        for t in row[sample_begin:]:
            if t == self.cfg.eot:
                break
            gen.append(int(t))
        return self.tokenizer.decode(gen)

    def transcribe_vad_segments(
        self,
        audio: np.ndarray,
        params: Optional[TranscribeParams] = None,
        vad_params=None,
    ) -> TranscriptionResult:
        """Long-form transcription gated by the Silero+Smoothed VAD chain.

        Splits a long 16 kHz buffer into speech spans (batched Silero over
        all 30 ms frames), transcribes all spans as one batch, and stitches
        the text with absolute timestamps — replacing the reference's
        serial whisper.cpp windowing over silence-laden audio (BASELINE
        config 2)."""
        from spittle_tpu.audio.vad.segmenter import segment_speech

        from .base import normalize_pcm

        audio = normalize_pcm(audio)
        spans = segment_speech(audio, params=vad_params)
        if not spans:
            return TranscriptionResult(text="")
        chunks = [audio[s.start_sample : s.end_sample] for s in spans]
        results = self.transcribe_batch(chunks, params)
        segments: List[Segment] = []
        texts = []
        words: List = []
        for span, res in zip(spans, results):
            if res.text:
                texts.append(res.text)
            for seg in res.segments:
                segments.append(
                    Segment(
                        start=seg.start + span.start_sec,
                        end=seg.end + span.start_sec,
                        text=seg.text,
                    )
                )
            for w in res.words:
                from .base import Word

                words.append(
                    Word(w.word, w.start + span.start_sec,
                         w.end + span.start_sec)
                )
        return TranscriptionResult(
            text=" ".join(texts).strip(),
            segments=segments,
            language=results[0].language if results else None,
            words=words,
        )

    def _parse_window(
        self,
        gen_tokens: List[int],
        offset_sec: float,
        window_sec: float = 30.0,
        keep_tail: bool = False,
    ) -> Tuple[List[Segment], List[int], int]:
        """Split decoded tokens at consecutive-timestamp pairs into segments
        (whisper.cpp result_len / OpenAI transcribe-loop semantics).

        When a window contains at least one consecutive-timestamp pair and
        does NOT end with a single trailing timestamp, tokens after the last
        pair are DROPPED (the next window re-decodes that audio from the
        pair's end timestamp) — emitting them would duplicate phrases when
        the sequential seek re-transcribes the tail.

        Returns (segments, kept tokens, seek advance in mel frames;
        0 = advance the full window). keep_tail=True retains trailing
        tokens after the last pair as an open segment (fixed-stride
        parallel windows, where no re-decode of the tail happens).
        """
        cfg = self.cfg
        tok = self.tokenizer
        ts_begin = cfg.timestamp_begin
        is_ts = [t >= ts_begin for t in gen_tokens]
        consecutive = [
            k + 1
            for k in range(len(gen_tokens) - 1)
            if is_ts[k] and is_ts[k + 1]
        ]
        single_ts_ending = (
            len(gen_tokens) >= 2 and not is_ts[-2] and is_ts[-1]
        )
        segs: List[Segment] = []

        def emit(sl: List[int]) -> None:
            if not sl:
                return
            start_t = (sl[0] - ts_begin) * 0.02 if sl[0] >= ts_begin else 0.0
            end_t = (
                (sl[-1] - ts_begin) * 0.02
                if sl[-1] >= ts_begin
                else window_sec
            )
            end_t = max(end_t, start_t)  # open tail may out-run window_sec
            segs.append(
                Segment(
                    start=offset_sec + start_t,
                    end=offset_sec + end_t,
                    text=tok.decode([t for t in sl if t < ts_begin]),
                )
            )

        if consecutive:
            slices = list(consecutive)
            if single_ts_ending or (keep_tail and consecutive[-1] < len(gen_tokens)):
                slices.append(len(gen_tokens))
            last = 0
            for cur in slices:
                emit(gen_tokens[last:cur])
                last = cur
            kept = list(gen_tokens[:last])
            if single_ts_ending or keep_tail:
                advance = 0  # full window
            else:
                last_ts_pos = gen_tokens[last - 1] - ts_begin
                advance = int(last_ts_pos * 0.02 * FRAMES_PER_SECOND)
        else:
            # No consecutive pair: the whole window is one segment and the
            # seek advances the full window (OpenAI else-branch).
            ts = [t for t in gen_tokens if t >= ts_begin]
            end = window_sec
            if ts and ts[-1] != ts_begin:
                end = (ts[-1] - ts_begin) * 0.02
            text_toks = [t for t in gen_tokens if t < ts_begin]
            if text_toks:
                segs.append(
                    Segment(
                        start=offset_sec,
                        end=offset_sec + end,
                        text=tok.decode(text_toks),
                    )
                )
            kept = list(gen_tokens)
            advance = 0
        return segs, kept, advance
