from .filters import (
    apply_custom_words,
    clean_segment_boundaries,
    filter_transcription_output,
)
from .diff import TextDiff, compute_text_diff

__all__ = [
    "apply_custom_words",
    "clean_segment_boundaries",
    "filter_transcription_output",
    "TextDiff",
    "compute_text_diff",
]
