"""8-bit mu-law companding for the host->device audio wire.

The host->device link is the scarce resource of the serving path (the
reference ships f32 PCM straight into whisper.cpp in-process,
`src-tauri/src/managers/transcription.rs:344-420`; here audio must cross
to the TPU). int16 already halves f32; mu-law companding (the G.711
telephony curve, mu=255) halves it again to one byte per sample:

    encode: y = sign(x) * ln(1 + mu*|x|) / ln(1 + mu),  code = round((y+1)*127.5)
    decode: y = code/127.5 - 1,  x = sign(y) * ((1+mu)^|y| - 1) / mu

Logarithmic quantization matches speech's amplitude distribution: SNR is
~38 dB across the full dynamic range (vs linear 8-bit collapsing quiet
speech), and the log-mel frontend is itself log-domain, so transcription
is insensitive to the companding error. Opt-in (engine wire="mulaw"):
the default wire stays int16, which is bit-exact to the mic capture.

Encode runs on host over numpy (cheap, vectorized); decode is three
device ops that fuse into the mel program's window read.
"""

from __future__ import annotations

import numpy as np

MU = 255.0


def mulaw_encode(audio: np.ndarray) -> np.ndarray:
    """f32 [-1,1] or int16 PCM -> uint8 mu-law codes.

    Encode sits on the host batch-assembly thread (~23M samples per
    headline batch group), so it prefers the single-pass native loop
    (native/spittle_audio.cpp mulaw_encode_*, bit-identical to the numpy
    expression below); numpy is the fallback when g++ is unavailable."""
    x = np.asarray(audio)
    out = _mulaw_encode_native(x)
    if out is not None:
        return out
    if x.dtype == np.int16:
        x = x.astype(np.float32) / np.float32(32768.0)
    else:
        x = np.clip(x.astype(np.float32), -1.0, 1.0)
    # Promotions spelled out so the result is identical under numpy 1
    # (value-based casting) and numpy 2 (NEP 50): log1p in f32, then a
    # f64 divide/round — the exact chain the native encoder mirrors
    # (native/spittle_audio.cpp mulaw_code).
    num = np.log1p(np.float32(MU) * np.abs(x)).astype(np.float64)
    y = np.sign(x).astype(np.float64) * (num / np.log1p(MU))
    return np.round((y + 1.0) * 127.5).astype(np.uint8)


def _mulaw_encode_native(x: np.ndarray):
    """Native one-pass encode, or None when the library isn't available."""
    import ctypes

    from spittle_tpu.native.ringbuffer import load_native

    lib = load_native()
    if lib is None or x.dtype not in (np.int16, np.float32):
        return None
    if not hasattr(lib, "_mulaw_bound"):
        lib.mulaw_encode_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.mulaw_encode_i16.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib._mulaw_bound = True
    flat = np.ascontiguousarray(x).reshape(-1)
    out = np.empty(flat.shape, np.uint8)
    n = ctypes.c_int64(flat.size)
    dst = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    if flat.dtype == np.int16:
        lib.mulaw_encode_i16(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n, dst
        )
    else:
        lib.mulaw_encode_f32(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, dst
        )
    return out.reshape(x.shape)


def mulaw_decode_np(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> f32 [-1,1] (host-side reference/tests)."""
    y = codes.astype(np.float32) / 127.5 - 1.0
    return np.sign(y) * (np.power(1.0 + MU, np.abs(y)) - 1.0) / MU


def mulaw_decode_jnp(codes):
    """Device-side decode; fuses into the consuming mel program."""
    import jax.numpy as jnp

    y = codes.astype(jnp.float32) / 127.5 - 1.0
    return jnp.sign(y) * (jnp.power(1.0 + MU, jnp.abs(y)) - 1.0) / MU
