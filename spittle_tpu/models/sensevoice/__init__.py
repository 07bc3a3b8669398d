from .model import SenseVoiceConfig, CONFIGS, init_params, encode, ctc_greedy_decode

__all__ = [
    "SenseVoiceConfig", "CONFIGS", "init_params", "encode", "ctc_greedy_decode",
]
