from .model import (  # noqa: F401
    FLAN_T5_SMALL,
    T5Config,
    greedy_generate,
    t5_decode_step,
    t5_decoder_forward,
    t5_encode,
)
from .weights import load_t5_dir, params_from_hf_tensors  # noqa: F401
