from .attention import (
    attention_reference,
    flash_attention,
    flash_attention_fullkv,
    multihead_attention,
)

__all__ = [
    "attention_reference",
    "flash_attention",
    "flash_attention_fullkv",
    "multihead_attention",
]
