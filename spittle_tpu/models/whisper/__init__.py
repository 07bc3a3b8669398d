from .config import CONFIGS, WhisperConfig
from .model import (
    decode_step,
    decoder_forward,
    encode,
    init_kv_cache,
    init_params,
    logits_from_hidden,
    precompute_cross_kv,
)
from .decode import DecodeOptions, detect_language, greedy_decode
from .beam import beam_decode

__all__ = [
    "CONFIGS",
    "WhisperConfig",
    "encode",
    "decode_step",
    "decoder_forward",
    "init_params",
    "init_kv_cache",
    "logits_from_hidden",
    "precompute_cross_kv",
    "DecodeOptions",
    "detect_language",
    "greedy_decode",
    "beam_decode",
]
