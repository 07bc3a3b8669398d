"""Parakeet FastConformer-TDT engine.

Engine-slot parity with the reference's ParakeetEngine (transcribe-rs ONNX
int8, `managers/transcription.rs:278-296,505-513`): load/unload/
transcribe_samples with segment timestamps (80 ms encoder frames) and the
v3 model's multilingual operation. v3 has no language head — the language
is implicit in what it decodes — so the result's `language` carries what
the MODEL produced (text/lang_id.py classification of the decoded text),
falling back to the request only when the text is inconclusive: the
reference result reflects the engine's decision, not an echo of the
request (transcription.rs:505-513).

Tokens decode through a SentencePiece-style piece table (vocab.txt /
tokenizer.json next to the checkpoint; a deterministic test table under
`random:` models).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spittle_tpu.models.parakeet.config import CONFIGS, ParakeetConfig
from spittle_tpu.models.parakeet.decode import tdt_greedy_decode
from spittle_tpu.models.parakeet.features import HOP, parakeet_features
from spittle_tpu.models.parakeet.model import encode, init_params
from .base import normalize_pcm, Segment, TranscribeParams, TranscriptionResult

SECONDS_PER_FRAME = 8 * HOP / 16000.0  # 80 ms per encoder frame


class SentencePieceTable:
    """Minimal SentencePiece piece table: id -> piece, '▁' = space."""

    def __init__(self, pieces: Sequence[str]):
        self.pieces = list(pieces)

    @classmethod
    def load(cls, model_dir: str) -> "SentencePieceTable":
        vocab_txt = os.path.join(model_dir, "vocab.txt")
        if os.path.exists(vocab_txt):
            with open(vocab_txt, encoding="utf-8") as f:
                return cls([line.rstrip("\n").split("\t")[0] for line in f])
        tok_json = os.path.join(model_dir, "tokenizer.json")
        if os.path.exists(tok_json):
            with open(tok_json, encoding="utf-8") as f:
                data = json.load(f)
            vocab = data.get("model", {}).get("vocab")
            if isinstance(vocab, list):
                return cls([p[0] for p in vocab])
            if isinstance(vocab, dict):
                inv = sorted(vocab.items(), key=lambda kv: kv[1])
                return cls([k for k, _ in inv])
        raise FileNotFoundError(f"no vocab.txt/tokenizer.json in {model_dir}")

    @classmethod
    def test_table(cls, n: int) -> "SentencePieceTable":
        pieces = [f"▁tok{i}" if i % 3 == 0 else f"tok{i}" for i in range(n)]
        return cls(pieces)

    def decode(self, ids: Sequence[int]) -> str:
        out = []
        for i in ids:
            if 0 <= i < len(self.pieces):
                out.append(self.pieces[i])
        return "".join(out).replace("▁", " ").strip()


class ParakeetEngine:
    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.cfg: Optional[ParakeetConfig] = None
        self.params = None
        self.table: Optional[SentencePieceTable] = None
        self.mode = "tdt"  # or "ctc" (ParakeetForCTC checkpoints)

    def load_model(self, model_path: str) -> None:
        if model_path.startswith("random:"):
            name = model_path.split(":", 1)[1]
            self.cfg = CONFIGS[name]
            self.params = init_params(self.cfg, jax.random.PRNGKey(0), self.dtype)
            self.table = SentencePieceTable.test_table(self.cfg.vocab_size)
            self.mode = "tdt"
            return
        if model_path.endswith(".npz"):
            # Spittle-native committed checkpoint (the trained-tiny
            # pattern; io/npz_checkpoint.py).
            from spittle_tpu.io.npz_checkpoint import load_family_npz

            self.cfg, tree, pieces = load_family_npz(
                model_path, ParakeetConfig
            )
            self.params = jax.tree.map(
                lambda a: jnp.asarray(a, self.dtype)
                if np.asarray(a).ndim >= 2 else jnp.asarray(a),
                tree,
            )
            self.table = SentencePieceTable(pieces)
            self.mode = "tdt"
            return
        if model_path.endswith(".nemo"):
            # NVIDIA .nemo tar: the canonical parakeet-tdt artifact
            # (transcription.rs:278-296 serves its int8 ONNX export).
            from spittle_tpu.models.parakeet.nemo import load_nemo

            self.cfg, tree, pieces = load_nemo(model_path)
            self.params = jax.tree.map(
                lambda a: jnp.asarray(a, self.dtype)
                if np.asarray(a).ndim >= 2 else jnp.asarray(a),
                tree,
            )
            self.mode = "tdt"
            if pieces:
                self.table = SentencePieceTable(pieces)
            else:
                self.table = SentencePieceTable.load(
                    os.path.dirname(model_path) or "."
                )
            return
        st_path = os.path.join(model_path, "model.safetensors")
        if not os.path.exists(st_path):
            raise FileNotFoundError(
                f"{model_path}: no supported Parakeet checkpoint found "
                "(expected model.safetensors or a .nemo archive)"
            )
        from safetensors.numpy import load_file

        raw = dict(load_file(st_path))
        if "ctc_head.weight" in raw:
            # HF ParakeetForCTC export: config inferred from shapes, CTC
            # greedy decode (blank = last id, NeMo convention).
            from spittle_tpu.models.parakeet.weights import (
                config_from_hf_ctc_tensors,
                params_from_hf_ctc_tensors,
            )

            self.cfg = config_from_hf_ctc_tensors(raw)
            self.params = jax.tree.map(
                lambda a: jnp.asarray(a, self.dtype)
                if np.asarray(a).ndim >= 2 else jnp.asarray(a),
                params_from_hf_ctc_tensors(raw, self.cfg),
            )
            self.mode = "ctc"
        else:
            # TDT tree saved in our stacked layout (converted from NeMo).
            name = ("parakeet-tdt-0.6b-v3" if "v3" in model_path
                    else "parakeet-tdt-0.6b-v2")
            self.cfg = CONFIGS[name]
            self.params = jax.tree.map(jnp.asarray, raw)
            self.mode = "tdt"
        self.table = SentencePieceTable.load(model_path)

    def unload_model(self) -> None:
        self.cfg = None
        self.params = None
        self.table = None

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
        assert self.is_loaded, "no model loaded"
        params = params or TranscribeParams()
        audios = [normalize_pcm(a) for a in batch]
        max_len = max(len(a) for a in audios)
        # Round up so the conv subsampling sees full frames.
        max_len = max(max_len, HOP * 16)
        padded = np.zeros((len(audios), max_len), np.float32)
        for i, a in enumerate(audios):
            padded[i, : len(a)] = a
        feats = parakeet_features(jnp.asarray(padded), n_mels=self.cfg.n_mels)
        enc = encode(self.params, feats, self.cfg)
        frames_per_audio = jnp.asarray(
            [min(len(a) // HOP // 8 + 1, enc.shape[1]) for a in audios],
            jnp.int32,
        )
        if self.mode == "ctc":
            from spittle_tpu.models.parakeet.decode import ctc_greedy_decode

            id_lists = ctc_greedy_decode(
                self.params, enc, frames_per_audio, blank=self.cfg.vocab_size
            )
            results = []
            for i, ids in enumerate(id_lists):
                text = self.table.decode(ids)
                dur = len(audios[i]) / 16000.0
                results.append(
                    TranscriptionResult(
                        text=text,
                        segments=[Segment(0.0, dur, text)] if text else [],
                        language=self._result_language(text, params),
                    )
                )
            return results

        tokens, counts, frames = tdt_greedy_decode(
            self.params, enc, frames_per_audio, self.cfg
        )
        tokens = np.asarray(tokens)
        counts = np.asarray(counts)
        frames = np.asarray(frames)
        results = []
        for i in range(len(audios)):
            ids = tokens[i, : counts[i]].tolist()
            text = self.table.decode(ids)
            segments = []
            if ids:
                start = frames[i, 0] * SECONDS_PER_FRAME
                end = frames[i, counts[i] - 1] * SECONDS_PER_FRAME
                segments = [Segment(start=float(start), end=float(end), text=text)]
            results.append(
                TranscriptionResult(
                    text=text, segments=segments,
                    language=self._result_language(text, params),
                )
            )
        return results

    @staticmethod
    def _result_language(text: str, params: TranscribeParams):
        """The language the MODEL decided on: classified from the decoded
        text (v3 is multilingual with no language head), with the
        caller's requested language as the fallback when the text gives
        no evidence (empty, digits-only, unknown script)."""
        from spittle_tpu.text.lang_id import detect_language

        return detect_language(text) or params.language
