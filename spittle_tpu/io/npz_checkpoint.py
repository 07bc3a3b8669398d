"""Committable .npz checkpoints for the non-Whisper engine families.

Same contract as models/whisper/weights.save_npz_checkpoint (the
trained-tiny pattern): one compressed npz holding the stacked parameter
tree (float leaves stored f16 — loaders cast back, and goldens are
recorded against the SAVED artifact so the f16 round-trip is inside the
contract), the config dataclass as embedded JSON, and the SentencePiece
piece table. Purpose: MB-scale TRAINED checkpoints committed to the
repo so each engine's full decode path (TDT duration-advance, Moonshine
generate, SenseVoice CTC + prompt frames) runs non-random weights in CI
— real checkpoints cannot reach this environment (no egress; the
reference engines they would bit-match live at
`src-tauri/src/managers/transcription.rs:444-534`).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


def save_family_npz(
    path: str,
    cfg: Any,  # a frozen config dataclass (asdict-able)
    params: Any,  # pytree of arrays
    pieces: Optional[Sequence[str]] = None,
    store_dtype=np.float16,
) -> None:
    """store_dtype: float leaves are stored at this width. f16 halves
    the committed artifact and is the default; pass np.float32 for
    models whose decision boundaries don't survive the rounding — the
    Parakeet trained-tiny's LSTM+joint argmaxes flipped under f16 (a
    checkpoint at teacher-forced held-out accuracy 1.000 in memory
    decoded at 0.00 from the saved artifact, 2026-08-21) while the
    attention/CTC families' margins survived."""
    import jax

    flat: Dict[str, np.ndarray] = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        arr = np.asarray(leaf)
        flat["param:" + name] = (
            arr.astype(store_dtype) if arr.dtype.kind == "f" else arr
        )
    flat["__config__"] = np.frombuffer(
        json.dumps(dataclasses.asdict(cfg)).encode(), np.uint8
    )
    if pieces is not None:
        flat["__pieces__"] = np.frombuffer(
            json.dumps(list(pieces)).encode(), np.uint8
        )
    np.savez_compressed(path, **flat)


def load_family_npz(
    path: str, config_cls, dtype=np.float32
) -> Tuple[Any, Dict[str, Any], List[str]]:
    """-> (cfg, nested params dict, pieces list ([] if absent))."""
    z = np.load(path)
    cfg = config_cls(**json.loads(bytes(z["__config__"]).decode()))
    params: Dict[str, Any] = {}
    for key in z.files:
        if not key.startswith("param:"):
            continue
        node = params
        parts = key[len("param:"):].split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = z[key]
        node[parts[-1]] = arr.astype(dtype) if arr.dtype.kind == "f" else arr
    pieces: List[str] = []
    if "__pieces__" in z.files:
        pieces = json.loads(bytes(z["__pieces__"]).decode())
    return cfg, params, pieces
