"""VAD smoothing: pre-roll, onset debounce, hangover.

Port of the reference's hysteresis wrapper
(`/root/reference/src-tauri/src/audio_toolkit/vad/smoothed.rs:48-100`) with
production parameters prefill=15, hangover=15, onset=2 frames and threshold
0.3 (`managers/audio.rs:127-151`).

Two forms:
- `SmoothedVad`: the streaming host-side state machine, frame in / decision
  out, exactly mirroring the reference (including emitting the buffered
  pre-roll audio when onset triggers).
- `smooth_probs`: batched array form for offline long-form audio — given
  per-frame speech probabilities (from silero_scan_frames), computes the
  same keep-mask for every stream at once with a scan + backward dilation,
  entirely jit-compatible.
"""

from __future__ import annotations

import enum
import functools
from collections import deque
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_THRESHOLD = 0.3
DEFAULT_PREFILL = 15
DEFAULT_HANGOVER = 15
DEFAULT_ONSET = 2


class VadFrame(enum.Enum):
    SPEECH = "speech"
    NOISE = "noise"


class SmoothedVad:
    """Streaming hysteresis smoother over any boolean VAD.

    push_frame(frame) -> (VadFrame, samples-to-keep or None). On the onset
    trigger the returned samples include the buffered pre-roll frames.
    """

    def __init__(
        self,
        inner_vad,
        prefill_frames: int = DEFAULT_PREFILL,
        hangover_frames: int = DEFAULT_HANGOVER,
        onset_frames: int = DEFAULT_ONSET,
    ):
        self.inner = inner_vad
        self.prefill_frames = prefill_frames
        self.hangover_frames = hangover_frames
        self.onset_frames = onset_frames
        self._buffer: deque = deque()
        self._hangover = 0
        self._onset = 0
        self._in_speech = False

    def push_frame(self, frame: np.ndarray) -> Tuple[VadFrame, Optional[np.ndarray]]:
        self._buffer.append(np.asarray(frame))
        while len(self._buffer) > self.prefill_frames + 1:
            self._buffer.popleft()

        is_voice = self.inner.is_voice(frame)

        if not self._in_speech and is_voice:
            self._onset += 1
            if self._onset >= self.onset_frames:
                self._in_speech = True
                self._hangover = self.hangover_frames
                self._onset = 0
                samples = np.concatenate(list(self._buffer))
                return VadFrame.SPEECH, samples
            return VadFrame.NOISE, None
        if self._in_speech and is_voice:
            self._hangover = self.hangover_frames
            return VadFrame.SPEECH, np.asarray(frame)
        if self._in_speech and not is_voice:
            if self._hangover > 0:
                self._hangover -= 1
                return VadFrame.SPEECH, np.asarray(frame)
            self._in_speech = False
            return VadFrame.NOISE, None
        self._onset = 0
        return VadFrame.NOISE, None

    def reset(self) -> None:
        self._buffer.clear()
        self._hangover = 0
        self._onset = 0
        self._in_speech = False
        if hasattr(self.inner, "reset"):
            self.inner.reset()


@functools.partial(
    jax.jit, static_argnames=("prefill", "hangover", "onset")
)
def smooth_probs(
    probs: jnp.ndarray,
    threshold: float = DEFAULT_THRESHOLD,
    prefill: int = DEFAULT_PREFILL,
    hangover: int = DEFAULT_HANGOVER,
    onset: int = DEFAULT_ONSET,
) -> jnp.ndarray:
    """Batched keep-mask from per-frame speech probabilities.

    probs: [B, F] floats. Returns bool [B, F]: frames that the streaming
    SmoothedVad would have emitted as speech, including the retroactive
    pre-roll frames captured at each onset trigger.
    """
    voiced = probs > threshold  # [B, F]

    def step(state, v):
        in_speech, onset_ctr, hang = state
        onset_ctr = jnp.where(~in_speech & v, onset_ctr + 1, onset_ctr)
        trigger = (~in_speech) & v & (onset_ctr >= onset)
        # speech frames: trigger frame itself, ongoing voice, or hangover
        cont_speech = in_speech & v
        hang_speech = in_speech & ~v & (hang > 0)
        out_speech = trigger | cont_speech | hang_speech
        new_in_speech = jnp.where(trigger, True, in_speech)
        new_in_speech = jnp.where(in_speech & ~v & (hang == 0), False, new_in_speech)
        new_hang = jnp.where(trigger | cont_speech, hangover, hang)
        new_hang = jnp.where(hang_speech, hang - 1, new_hang)
        new_onset = jnp.where(trigger | (~in_speech & ~v), 0, onset_ctr)
        return (new_in_speech, new_onset, new_hang), (out_speech, trigger)

    b = probs.shape[0]
    init = (
        jnp.zeros(b, bool),
        jnp.zeros(b, jnp.int32),
        jnp.zeros(b, jnp.int32),
    )
    (_, (speech, triggers)) = jax.lax.scan(
        step, init, jnp.moveaxis(voiced, 1, 0)
    )[0:2]
    speech = jnp.moveaxis(speech, 0, 1)  # [B, F]
    triggers = jnp.moveaxis(triggers, 0, 1)

    # Retroactive pre-roll: a trigger at frame f marks f-prefill..f as kept.
    # Backward dilation = max-pool of triggers over a forward-looking window.
    pad = jnp.pad(triggers, ((0, 0), (0, prefill)))
    idx = jnp.arange(probs.shape[1])[:, None] + jnp.arange(prefill + 1)[None, :]
    preroll = jnp.any(pad[:, idx], axis=-1)
    return speech | preroll
