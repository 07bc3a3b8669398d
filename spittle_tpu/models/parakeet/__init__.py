from .config import ParakeetConfig
from .model import encode, init_params
from .decode import tdt_greedy_decode

__all__ = ["ParakeetConfig", "encode", "init_params", "tdt_greedy_decode"]
