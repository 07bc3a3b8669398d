"""Engine interface: the seam the app shell drives.

Mirrors the reference's TranscriptionEngine trait semantics
(`/root/reference/src-tauri/src/managers/transcription.rs:14-27,444-534`):
load/unload a model and synchronously transcribe a float32 16 kHz mono
buffer with optional language / translate / initial-prompt parameters.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Protocol, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class TranscribeParams:
    """Per-call decode options (transcription.rs:494-499).

    beam_size > 1 selects beam search (whisper.cpp BeamSearch strategy);
    1 is greedy."""

    language: Optional[str] = None  # None -> auto-detect
    translate: bool = False
    initial_prompt: Optional[str] = None
    beam_size: int = 1
    word_timestamps: bool = False  # cross-attention DTW word timings
    # whisper.cpp no_context=false equivalent: condition later windows on
    # the previous window's text (applied on the single-utterance path;
    # batched rounds keep the shared initial prompt only).
    condition_on_previous_text: bool = True
    # TPU fast path for long audio: decode ALL 30 s windows of every item
    # in one batch (fixed-stride chunking, no timestamp-guided seek or
    # prompt carry). Requires condition_on_previous_text=False; one
    # device program replaces the sequential seek loop.
    parallel_windows: bool = False
    # Overlap between parallel windows (seconds). Windows overlap by this
    # much and each keeps only segments whose midpoint falls in its core
    # region (overlap-stitch), so words at window boundaries aren't cut.
    parallel_overlap_s: float = 0.0
    # Per-window decode budget (whisper.cpp n_max_text_ctx analog).
    # None -> n_text_ctx // 2. Smaller budgets shrink the static KV cache
    # the decode loop re-reads each step.
    max_tokens: Optional[int] = None
    # Reduced encoder context (whisper.cpp params.audio_ctx analog):
    # encode only the first audio_ctx positions (= audio_ctx*2 mel frames
    # = audio_ctx/50 seconds) per window instead of the full 30 s. A 5 s
    # dictation utterance at audio_ctx=256 pays ~1/6 of the encoder FLOPs
    # and cross-KV decode traffic. Like whisper.cpp, this is a speed/
    # accuracy trade the caller opts into; transcripts are NOT bit-equal
    # to the full-window decode. None -> full window.
    audio_ctx: Optional[int] = None
    # Temperature-fallback ladder override (whisper.cpp temperature +
    # temperature_inc). None -> the engine default (0.0, 0.2, ..., 1.0);
    # (0.0,) disables retries.
    temperatures: Optional[tuple] = None


@dataclasses.dataclass
class Word:
    word: str
    start: float
    end: float


@dataclasses.dataclass
class Segment:
    start: float  # seconds
    end: float
    text: str


@dataclasses.dataclass
class TranscriptionResult:
    text: str
    segments: List[Segment] = dataclasses.field(default_factory=list)
    language: Optional[str] = None
    words: List[Word] = dataclasses.field(default_factory=list)
    # Raw decoded token ids (text + timestamp tokens, before tokenizer
    # decode) — the unit the north star's "token-for-token match vs
    # whisper.cpp" (transcription.rs:445-504) is verified in; golden
    # tests compare these, not just text.
    tokens: List[int] = dataclasses.field(default_factory=list)


def normalize_pcm(a) -> np.ndarray:
    """PCM input contract for every engine: float32 in [-1, 1] passes
    through; int16 (the wire format — half the host->device bytes) scales
    by 1/32768. Engines that can normalize on device (Whisper's fused
    frontend) keep int16 instead of calling this."""
    a = np.asarray(a)
    if a.dtype == np.int16:
        return a.astype(np.float32) / 32768.0
    return a.astype(np.float32, copy=False)


class TranscriptionEngine(Protocol):
    def load_model(self, model_path: str) -> None: ...

    def unload_model(self) -> None: ...

    @property
    def is_loaded(self) -> bool: ...

    def transcribe_samples(
        self, samples: np.ndarray, params: Optional[TranscribeParams] = None
    ) -> TranscriptionResult: ...

    def transcribe_batch(
        self,
        batch: Sequence[np.ndarray],
        params: Optional[TranscribeParams] = None,
    ) -> List[TranscriptionResult]: ...
