"""Moonshine engine (engine-slot parity: transcription.rs:298-319)."""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spittle_tpu.models.moonshine.model import (
    CONFIGS,
    MoonshineConfig,
    encode,
    greedy_decode,
    init_params,
)
from .base import normalize_pcm, Segment, TranscribeParams, TranscriptionResult
from .parakeet_engine import SentencePieceTable

MIN_SAMPLES = 1024  # conv stem needs at least ~one stem window


class MoonshineEngine:
    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.cfg: Optional[MoonshineConfig] = None
        self.params = None
        self.table: Optional[SentencePieceTable] = None

    def load_model(self, model_path: str) -> None:
        if model_path.startswith("random:"):
            self.cfg = CONFIGS[model_path.split(":", 1)[1]]
            self.params = init_params(self.cfg, jax.random.PRNGKey(0), self.dtype)
            self.table = SentencePieceTable.test_table(self.cfg.vocab_size)
            return
        if model_path.endswith(".npz"):
            # Spittle-native committed checkpoint (the trained-tiny
            # pattern; io/npz_checkpoint.py).
            from spittle_tpu.io.npz_checkpoint import load_family_npz

            self.cfg, tree, pieces = load_family_npz(
                model_path, MoonshineConfig
            )
            self.params = jax.tree.map(
                lambda a: jnp.asarray(a, self.dtype), tree
            )
            self.table = SentencePieceTable(pieces)
            return
        st = os.path.join(model_path, "model.safetensors")
        if not os.path.exists(st):
            raise FileNotFoundError(f"{model_path}: expected model.safetensors")
        from safetensors.numpy import load_file

        from spittle_tpu.models.moonshine.weights import (
            config_from_hf_tensors,
            params_from_hf_tensors,
        )

        tensors = dict(load_file(st))
        self.cfg = config_from_hf_tensors(tensors)
        self.params = jax.tree.map(
            lambda a: jnp.asarray(a, self.dtype),
            params_from_hf_tensors(tensors, self.cfg),
        )
        self.table = SentencePieceTable.load(model_path)

    def unload_model(self) -> None:
        self.cfg = self.params = self.table = None

    @property
    def is_loaded(self) -> bool:
        return self.params is not None

    def transcribe_samples(
        self, samples: np.ndarray, params: Optional[TranscribeParams] = None
    ) -> TranscriptionResult:
        return self.transcribe_batch([samples], params)[0]

    def transcribe_batch(
        self,
        batch: Sequence[np.ndarray],
        params: Optional[TranscribeParams] = None,
    ) -> List[TranscriptionResult]:
        assert self.is_loaded
        audios = [normalize_pcm(a) for a in batch]
        max_len = max(max(len(a) for a in audios), MIN_SAMPLES)
        padded = np.zeros((len(audios), max_len), np.float32)
        for i, a in enumerate(audios):
            padded[i, : len(a)] = a
        xa = encode(self.params, jnp.asarray(padded), self.cfg)
        # Moonshine scales max tokens with audio length (~6.5 tok/s).
        max_tok = min(self.cfg.max_tokens, max(8, int(max_len / 16000 * 7)))
        tokens, lengths = greedy_decode(self.params, xa, self.cfg, max_tok)
        tokens, lengths = np.asarray(tokens), np.asarray(lengths)
        out = []
        for i in range(len(audios)):
            ids = tokens[i, : lengths[i]].tolist()
            text = self.table.decode(ids)
            dur = len(audios[i]) / 16000.0
            out.append(
                TranscriptionResult(
                    text=text,
                    segments=[Segment(0.0, dur, text)] if text else [],
                    language="en",
                )
            )
        return out
