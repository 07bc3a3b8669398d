#!/usr/bin/env python
"""Fetch the real-weight artifacts the golden-transcript tests consume.

Run this anywhere with network access:

    python scripts/fetch_real_models.py [--dir DIR]

Artifacts land in DIR (default ~/.cache/spittle_tpu/real, overridable via
SPITTLE_REAL_MODELS). tests/test_golden_real_weights.py auto-skips until
these files exist, then runs real-checkpoint transcript/tokenizer parity.

Downloads go through ModelManager.download_model — the production
Range-resume/throttled-progress path (mirrors the reference's
model.rs:384-732) — via a synthetic catalog, so running this script also
exercises the real downloader against real servers.

Artifacts (all public):
- ggml-tiny.en.bin / ggml-tiny.bin — whisper.cpp-format checkpoints with
  embedded mel filterbank and the REAL token table (ggerganov/whisper.cpp
  HF mirror). tiny.en drives golden greedy/beam transcripts; multilingual
  tiny drives language detection.
- jfk.wav — the canonical 11 s whisper.cpp sample
  (samples/jfk.wav in the whisper.cpp repo).
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spittle_tpu.config.catalog import ModelCatalog, ModelCatalogEntry  # noqa: E402
from spittle_tpu.managers.model import ModelManager  # noqa: E402

HF = "https://huggingface.co/ggerganov/whisper.cpp/resolve/main"
WAV_URL = (
    "https://github.com/ggerganov/whisper.cpp/raw/master/samples/jfk.wav"
)

GGML_MODELS = [
    ("whisper-tiny-en", "ggml-tiny.en.bin", f"{HF}/ggml-tiny.en.bin", 78),
    ("whisper-tiny", "ggml-tiny.bin", f"{HF}/ggml-tiny.bin", 78),
]


def default_dir() -> str:
    return os.environ.get(
        "SPITTLE_REAL_MODELS",
        os.path.expanduser("~/.cache/spittle_tpu/real"),
    )


def _entry(mid: str, filename: str, url: str, mb: int) -> ModelCatalogEntry:
    return ModelCatalogEntry(
        id=mid, name=mid, description="golden-test artifact",
        filename=filename, url=url, size_mb=mb, is_directory=False,
        engine_type="whisper", accuracy_score=0.0, speed_score=0.0,
        supports_translation=False, is_recommended=False,
        language_group="english",
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=default_dir())
    args = ap.parse_args()
    os.makedirs(args.dir, exist_ok=True)

    catalog = ModelCatalog(
        language_groups={"english": ["en"]},
        models=[_entry(*m) for m in GGML_MODELS],
    )
    mgr = ModelManager(args.dir, catalog=catalog)
    mgr.events.listen_all(
        lambda name, payload: name == "model-download-progress"
        and print(
            f"  {payload['model_id']}: "
            f"{payload['downloaded'] // (1 << 20)} MB", end="\r"
        )
    )
    for mid, filename, _url, _mb in GGML_MODELS:
        dest = os.path.join(args.dir, filename)
        if os.path.exists(dest):
            print(f"{filename}: already present")
            continue
        print(f"downloading {filename} ...")
        mgr.download_model(mid)
        print(f"\n{filename}: done")

    wav = os.path.join(args.dir, "jfk.wav")
    if not os.path.exists(wav):
        print("downloading jfk.wav ...")
        urllib.request.urlretrieve(WAV_URL, wav + ".partial")
        os.replace(wav + ".partial", wav)
        print("jfk.wav: done")
    else:
        print("jfk.wav: already present")

    print(f"\nartifacts in {args.dir}; now run:")
    print(f"  SPITTLE_REAL_MODELS={args.dir} "
          "python -m pytest tests/test_golden_real_weights.py -v")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
