"""Local LLM text cleanup (dormant subsystem).

Port of `/root/reference/src-tauri/src/cleanup.rs` — the flan-t5-small
cleanup provider that the reference ships but never wires into the app
(SURVEY §2.2: "Not wired into the app"; kept here with the same dormant
status). The durable pieces are ported with behavior parity:

- TextCleanupProvider protocol (cleanup.rs:18-26),
- protected-span masking with ⟦Pn⟧ placeholders for @tokens, backtick
  code, URLs, paths and CLI flags (cleanup.rs:36-75), with the same
  fail-open restore check,
- the prompt framing and greedy seq2seq loop structure (max 512 tokens).

The T5 forward itself is a provider hook: `Seq2SeqFn(text) -> text`. A JAX
T5 can be plugged in when the checkpoint is present; the reference's
default behavior (return the original text on any failure) is preserved.
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Protocol, Tuple

_PROTECTED = re.compile(
    r"@[\w\-./]+"
    r"|`[^`]+`"
    r"|https?://\S+"
    r"|(?:~/|/[\w\-]+(?:/[\w\-.*]+)+)"
    r"|(?:^|\s)--?[\w\-]+=?(?:[\w\-./]+)?"
)

MAX_DECODE_TOKENS = 512
PROMPT_TEMPLATE = (
    "Fix grammar, punctuation, and capitalization. Do not change wording: "
    "{text}"
)


class TextCleanupProvider(Protocol):
    def cleanup(self, text: str) -> str: ...

    @property
    def name(self) -> str: ...


def mask_protected_spans(text: str) -> Tuple[str, List[Tuple[str, str]]]:
    matches = list(_PROTECTED.finditer(text))
    spans: List[Tuple[str, str]] = []
    masked = text
    for idx in range(len(matches) - 1, -1, -1):
        m = matches[idx]
        placeholder = f"⟦P{idx}⟧"
        spans.append((placeholder, m.group(0)))
        masked = masked[: m.start()] + placeholder + masked[m.end() :]
    spans.reverse()
    return masked, spans


def restore_protected_spans(text: str, spans: List[Tuple[str, str]]) -> str:
    for placeholder, original in spans:
        text = text.replace(placeholder, original)
    return text


def validate_cleanup(
    original: str, cleaned: str, spans: List[Tuple[str, str]]
) -> bool:
    """Sanity gate on provider output (cleanup.rs validate_cleanup):
    non-empty, within a 3x length band of the input, and every protected
    placeholder replaced."""
    if not cleaned or not cleaned.strip():
        return False
    lo, lc = len(original), len(cleaned)
    if lc * 3 < lo or lc > lo * 3:
        return False
    for placeholder, _ in spans:
        if placeholder in cleaned:
            return False
    return True


_SENTENCE_END = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> List[str]:
    """Split on sentence-final punctuation (cleanup.rs sentence batching:
    long inputs clean one sentence at a time)."""
    parts = [p.strip() for p in _SENTENCE_END.split(text)]
    return [p for p in parts if p]


class CleanupManager:
    """Masking + provider orchestration; falls back to the input text."""

    split_sentences = staticmethod(split_sentences)

    def __init__(self, seq2seq: Optional[Callable[[str], str]] = None):
        self._seq2seq = seq2seq

    @property
    def name(self) -> str:
        return "local-seq2seq-cleanup"

    @property
    def is_available(self) -> bool:
        return self._seq2seq is not None

    def cleanup(self, text: str) -> str:
        if not text.strip() or self._seq2seq is None:
            return text
        masked, spans = mask_protected_spans(text)
        try:
            result = self._seq2seq(PROMPT_TEMPLATE.format(text=masked))
        except Exception:
            return text  # fail open (cleanup.rs provider contract)
        if not result or not result.strip():
            return text
        restored = restore_protected_spans(result.strip(), spans)
        if not validate_cleanup(text, restored, spans):
            return text  # degenerate output or leaked placeholder
        return restored
