"""SenseVoice engine (engine-slot parity: transcription.rs:321-339).

Params semantics match the reference: language in zh/en/ja/ko/yue/auto and
use_itn (inverse text normalization prompt)."""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spittle_tpu.models.parakeet.features import HOP, parakeet_features
from spittle_tpu.models.sensevoice.model import (
    CONFIGS,
    SenseVoiceConfig,
    ctc_collapse_ids,
    encode,
    init_params,
    lfr_stack,
    prompt_ids_for,
)
from .base import normalize_pcm, Segment, TranscribeParams, TranscriptionResult
from .parakeet_engine import SentencePieceTable


class SenseVoiceEngine:
    def __init__(self, dtype=jnp.float32, use_itn: bool = True):
        self.dtype = dtype
        self.use_itn = use_itn
        self.cfg: Optional[SenseVoiceConfig] = None
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
                model_path, SenseVoiceConfig
            )
            self.params = jax.tree.map(
                lambda a: jnp.asarray(a, self.dtype)
                if np.asarray(a).ndim >= 2 else jnp.asarray(a),
                tree,
            )
            self.table = SentencePieceTable(pieces)
            return
        # FunASR SenseVoiceSmall release layout: model.pt (torch) or
        # model.safetensors with FunASR names, am.mvn CMVN stats, and a
        # SentencePiece .bpe.model. Config is inferred from tensor shapes.
        from spittle_tpu.models.sensevoice.weights import (
            config_from_funasr_tensors,
            params_from_funasr_tensors,
        )

        tensors = self._read_checkpoint(model_path)
        self.cfg = config_from_funasr_tensors(tensors)
        tree = params_from_funasr_tensors(tensors, self.cfg)
        mvn_path = os.path.join(model_path, "am.mvn")
        if os.path.exists(mvn_path):
            from spittle_tpu.models.sensevoice.model import parse_kaldi_cmvn

            cmvn = parse_kaldi_cmvn(mvn_path)
            if cmvn:
                tree.update(cmvn)
        self.params = jax.tree.map(
            lambda a: jnp.asarray(a, self.dtype)
            if np.asarray(a).ndim >= 2 else jnp.asarray(a),
            tree,
        )
        self.table = self._load_table(model_path)

    @staticmethod
    def _read_checkpoint(model_path: str):
        st = os.path.join(model_path, "model.safetensors")
        if os.path.exists(st):
            from safetensors.numpy import load_file

            return dict(load_file(st))
        pt = os.path.join(model_path, "model.pt")
        if os.path.exists(pt):
            import torch

            state = torch.load(pt, map_location="cpu", weights_only=True)
            return {k: v.numpy() for k, v in state.items()}
        raise FileNotFoundError(
            f"{model_path}: expected model.safetensors or model.pt"
        )

    @staticmethod
    def _load_table(model_path: str) -> SentencePieceTable:
        for name in sorted(os.listdir(model_path)):
            if name.endswith(".bpe.model") or name == "tokenizer.model":
                from spittle_tpu.models.parakeet.nemo import (
                    sentencepiece_pieces,
                )

                with open(os.path.join(model_path, name), "rb") as f:
                    return SentencePieceTable(sentencepiece_pieces(f.read()))
        return SentencePieceTable.load(model_path)

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
        params = params or TranscribeParams()
        language = params.language or "auto"
        audios = [normalize_pcm(a) for a in batch]
        max_len = max(max(len(a) for a in audios), HOP * 16)
        padded = np.zeros((len(audios), max_len), np.float32)
        for i, a in enumerate(audios):
            padded[i, : len(a)] = a
        mel = parakeet_features(jnp.asarray(padded), n_mels=self.cfg.n_mels)
        feats = lfr_stack(mel, self.cfg.lfr_m, self.cfg.lfr_n)
        pids = np.tile(
            prompt_ids_for(self.cfg, language, self.use_itn), (len(audios), 1)
        )
        logits = encode(self.params, feats, jnp.asarray(pids), self.cfg)
        # argmax on device: fetching the [B, T, 25k-vocab] logits costs
        # hundreds of MB host transfer; the [B, T] id matrix is ~kB.
        ids = np.asarray(jnp.argmax(logits, axis=-1).astype(jnp.int32))
        decoded = ctc_collapse_ids(
            ids, self.cfg.blank_id, self.cfg.n_prompt
        )
        out = []
        for i, ids in enumerate(decoded):
            text = self.table.decode(ids)
            dur = len(audios[i]) / 16000.0
            out.append(
                TranscriptionResult(
                    text=text,
                    segments=[Segment(0.0, dur, text)] if text else [],
                    language=None if language == "auto" else language,
                )
            )
        return out
