from .base import (
    Segment,
    TranscribeParams,
    TranscriptionEngine,
    TranscriptionResult,
)
from .mock import MockEngine

__all__ = [
    "Segment",
    "TranscribeParams",
    "TranscriptionEngine",
    "TranscriptionResult",
    "MockEngine",
]
