from .config import WhisperConfig
from .model import (
    decode_step,
    encode,
    init_params,
    init_kv_cache,
    logits_from_hidden,
)

__all__ = [
    "WhisperConfig",
    "encode",
    "decode_step",
    "init_params",
    "init_kv_cache",
    "logits_from_hidden",
]
