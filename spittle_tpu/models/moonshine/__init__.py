from .model import MoonshineConfig, CONFIGS, init_params, encode, greedy_decode

__all__ = ["MoonshineConfig", "CONFIGS", "init_params", "encode", "greedy_decode"]
