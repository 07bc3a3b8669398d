"""Offline VAD segmentation for long-form audio.

The reference gates the mic stream frame-by-frame (recorder.rs:296-303) so
silence never reaches the engine. For offline/batch long-form audio
(BASELINE config 2: Silero + resample chunking on 10-minute audio) the same
chain runs vectorized: batched Silero probabilities over all 30 ms frames
in one device call, the SmoothedVad keep-mask via the batched scan, then
contiguous kept-frame runs become speech segments with sample offsets.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from .silero import FRAME_SAMPLES_16K, load_silero_params, silero_scan_frames
from .smoothed import (
    DEFAULT_HANGOVER,
    DEFAULT_ONSET,
    DEFAULT_PREFILL,
    DEFAULT_THRESHOLD,
    smooth_probs,
)


@dataclass
class SpeechSegment:
    start_sample: int
    end_sample: int

    @property
    def start_sec(self) -> float:
        return self.start_sample / 16000.0

    @property
    def end_sec(self) -> float:
        return self.end_sample / 16000.0


def segment_speech(
    audio: np.ndarray,
    params=None,
    threshold: float = DEFAULT_THRESHOLD,
    prefill: int = DEFAULT_PREFILL,
    hangover: int = DEFAULT_HANGOVER,
    onset: int = DEFAULT_ONSET,
    min_gap_frames: int = 0,
    frame_samples: int = FRAME_SAMPLES_16K,
) -> List[SpeechSegment]:
    """Speech spans of a 16 kHz mono buffer using the production VAD chain."""
    if params is None:
        params = load_silero_params()
    audio = np.asarray(audio, np.float32)
    n_frames = len(audio) // frame_samples
    if n_frames == 0:
        return []
    trimmed = audio[: n_frames * frame_samples]
    probs = silero_scan_frames(params, jnp.asarray(trimmed)[None])
    mask = np.asarray(
        smooth_probs(probs, threshold=threshold, prefill=prefill,
                     hangover=hangover, onset=onset)
    )[0]

    segments: List[SpeechSegment] = []
    start: Optional[int] = None
    gap = 0
    for i, keep in enumerate(mask):
        if keep:
            if start is None:
                start = i
            gap = 0
        elif start is not None:
            gap += 1
            if gap > min_gap_frames:
                segments.append(
                    SpeechSegment(
                        start * frame_samples, (i - gap + 1) * frame_samples
                    )
                )
                start = None
                gap = 0
    if start is not None:
        segments.append(
            SpeechSegment(start * frame_samples, n_frames * frame_samples)
        )
    return segments


def gated_audio(
    audio: np.ndarray, segments: List[SpeechSegment]
) -> np.ndarray:
    """Concatenate only the speech spans (what the mic path accumulates)."""
    if not segments:
        return np.zeros(0, np.float32)
    return np.concatenate(
        [audio[s.start_sample : s.end_sample] for s in segments]
    )
