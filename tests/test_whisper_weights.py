"""Checkpoint loader tests: synthesized GGML files (round-trip through our
own writer) and HF-name mapping."""

import struct

import numpy as np
import pytest

from spittle_tpu.models.whisper.config import WhisperConfig
from spittle_tpu.models.whisper.weights import (
    GGML_F16,
    GGML_F32,
    GGML_MAGIC,
    GGML_Q4_0,
    GGML_Q4_1,
    GGML_Q5_0,
    GGML_Q8_0,
    _dequant,
    hf_to_openai_names,
    load_ggml,
    params_from_openai_tensors,
)

TINY = dict(
    n_vocab=51865, n_audio_ctx=60, n_audio_state=8, n_audio_head=2,
    n_audio_layer=1, n_text_ctx=16, n_text_state=8, n_text_head=2,
    n_text_layer=1, n_mels=80,
)


def openai_tensor_names(cfg):
    """All tensors whisper.cpp stores, with shapes, for a config."""
    d, mels = cfg.n_audio_state, cfg.n_mels
    names = {
        "encoder.conv1.weight": (d, mels, 3),
        "encoder.conv1.bias": (d,),
        "encoder.conv2.weight": (d, d, 3),
        "encoder.conv2.bias": (d,),
        "encoder.ln_post.weight": (d,),
        "encoder.ln_post.bias": (d,),
        "decoder.token_embedding.weight": (cfg.n_vocab, d),
        "decoder.positional_embedding": (cfg.n_text_ctx, d),
        "decoder.ln.weight": (d,),
        "decoder.ln.bias": (d,),
    }
    for side, n in (("encoder", cfg.n_audio_layer), ("decoder", cfg.n_text_layer)):
        for i in range(n):
            p = f"{side}.blocks.{i}"
            names.update({
                f"{p}.attn_ln.weight": (d,), f"{p}.attn_ln.bias": (d,),
                f"{p}.attn.query.weight": (d, d), f"{p}.attn.query.bias": (d,),
                f"{p}.attn.key.weight": (d, d),
                f"{p}.attn.value.weight": (d, d), f"{p}.attn.value.bias": (d,),
                f"{p}.attn.out.weight": (d, d), f"{p}.attn.out.bias": (d,),
                f"{p}.mlp_ln.weight": (d,), f"{p}.mlp_ln.bias": (d,),
                f"{p}.mlp.0.weight": (4 * d, d), f"{p}.mlp.0.bias": (4 * d,),
                f"{p}.mlp.2.weight": (d, 4 * d), f"{p}.mlp.2.bias": (d,),
            })
            if side == "decoder":
                names.update({
                    f"{p}.cross_attn_ln.weight": (d,),
                    f"{p}.cross_attn_ln.bias": (d,),
                    f"{p}.cross_attn.query.weight": (d, d),
                    f"{p}.cross_attn.query.bias": (d,),
                    f"{p}.cross_attn.key.weight": (d, d),
                    f"{p}.cross_attn.value.weight": (d, d),
                    f"{p}.cross_attn.value.bias": (d,),
                    f"{p}.cross_attn.out.weight": (d, d),
                    f"{p}.cross_attn.out.bias": (d,),
                })
    return names


def write_ggml(path, cfg, tensors):
    """Minimal whisper.cpp-format writer (test fixture)."""
    out = bytearray()
    out += struct.pack("<I", GGML_MAGIC)
    out += struct.pack(
        "<11i", cfg.n_vocab, cfg.n_audio_ctx, cfg.n_audio_state,
        cfg.n_audio_head, cfg.n_audio_layer, cfg.n_text_ctx, cfg.n_text_state,
        cfg.n_text_head, cfg.n_text_layer, cfg.n_mels, 1,
    )
    filters = np.arange(cfg.n_mels * 201, dtype=np.float32).reshape(cfg.n_mels, 201)
    out += struct.pack("<2i", cfg.n_mels, 201)
    out += filters.tobytes()
    out += struct.pack("<i", cfg.n_vocab)
    for i in range(cfg.n_vocab):
        tok = f"tok{i}".encode()
        out += struct.pack("<i", len(tok)) + tok
    for name, arr in tensors.items():
        nb = name.encode()
        dims = list(reversed(arr.shape))  # ggml stores ne[] fastest-first
        out += struct.pack("<3i", len(dims), len(nb), GGML_F32)
        out += struct.pack(f"<{len(dims)}i", *dims)
        out += nb
        out += arr.astype(np.float32).tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))
    return filters


@pytest.fixture()
def tiny_cfg():
    return WhisperConfig(name="t", **TINY)


def test_ggml_roundtrip(tmp_path, tiny_cfg):
    rng = np.random.default_rng(0)
    tensors = {
        name: rng.standard_normal(shape).astype(np.float32)
        for name, shape in openai_tensor_names(tiny_cfg).items()
    }
    path = tmp_path / "model.bin"
    filters = write_ggml(path, tiny_cfg, tensors)
    cfg, loaded, fb, vocab = load_ggml(str(path))
    assert cfg.n_audio_state == 8 and cfg.n_vocab == 51865
    np.testing.assert_array_equal(fb, filters)
    assert vocab[5] == b"tok5"
    for name, arr in tensors.items():
        np.testing.assert_array_equal(loaded[name], arr)

    # And the mapped parameter tree drives the model.
    import jax.numpy as jnp
    import jax

    params = params_from_openai_tensors(loaded, cfg)
    params = jax.tree.map(jnp.asarray, params)
    from spittle_tpu.models.whisper.model import encode

    mel = jnp.zeros((1, cfg.n_mels, cfg.n_audio_ctx * 2))
    xa = encode(params, mel, cfg)
    assert xa.shape == (1, cfg.n_audio_ctx, cfg.n_audio_state)
    # Linear convention: loaded wq rows/cols transposed from disk [out,in]
    blk = params["decoder"]["blocks"]
    np.testing.assert_allclose(
        np.asarray(blk["wq"][0]),
        tensors["decoder.blocks.0.attn.query.weight"].T,
        atol=0,
    )


@pytest.mark.parametrize("ttype", [GGML_Q4_0, GGML_Q4_1, GGML_Q5_0, GGML_Q8_0])
def test_dequant_formats(ttype):
    """Quantize synthetically with the public block formats, then dequant."""
    rng = np.random.default_rng(1)
    n = 64
    vals = rng.standard_normal(n).astype(np.float32)
    blocks = vals.reshape(-1, 32)
    payload = bytearray()
    expect = []
    for blk in blocks:
        if ttype == GGML_Q4_0:
            d = np.float16(np.abs(blk).max() / 7 or 1.0)
            q = np.clip(np.round(blk / np.float32(d)) + 8, 0, 15).astype(np.uint8)
            payload += d.tobytes() + bytes(q[:16] | (q[16:] << 4))
            expect.append((q.astype(np.float32) - 8) * np.float32(d))
        elif ttype == GGML_Q4_1:
            mn, mx = blk.min(), blk.max()
            d = np.float16((mx - mn) / 15 or 1.0)
            m = np.float16(mn)
            q = np.clip(np.round((blk - np.float32(m)) / np.float32(d)), 0, 15).astype(np.uint8)
            payload += d.tobytes() + m.tobytes() + bytes(q[:16] | (q[16:] << 4))
            expect.append(q.astype(np.float32) * np.float32(d) + np.float32(m))
        elif ttype == GGML_Q5_0:
            d = np.float16(np.abs(blk).max() / 15 or 1.0)
            q = np.clip(np.round(blk / np.float32(d)) + 16, 0, 31).astype(np.uint8)
            qh = 0
            for i in range(32):
                qh |= int(q[i] >> 4) << i
            payload += d.tobytes() + struct.pack("<I", qh) + bytes(
                (q[:16] & 0xF) | ((q[16:] & 0xF) << 4)
            )
            expect.append((q.astype(np.float32) - 16) * np.float32(d))
        elif ttype == GGML_Q8_0:
            d = np.float16(np.abs(blk).max() / 127 or 1.0)
            q = np.clip(np.round(blk / np.float32(d)), -127, 127).astype(np.int8)
            payload += d.tobytes() + q.tobytes()
            expect.append(q.astype(np.float32) * np.float32(d))
    got = _dequant(bytes(payload), ttype, n)
    np.testing.assert_allclose(got, np.concatenate(expect), atol=1e-6)


def test_hf_name_mapping():
    hf = {
        "model.encoder.conv1.weight": np.zeros((8, 80, 3)),
        "model.encoder.layers.0.self_attn.q_proj.weight": np.zeros((8, 8)),
        "model.encoder.layers.0.self_attn_layer_norm.weight": np.zeros(8),
        "model.decoder.layers.0.encoder_attn.k_proj.weight": np.zeros((8, 8)),
        "model.decoder.layers.0.fc1.bias": np.zeros(32),
        "model.decoder.embed_tokens.weight": np.zeros((100, 8)),
        "model.decoder.layer_norm.bias": np.zeros(8),
        "model.encoder.embed_positions.weight": np.zeros((60, 8)),
        "proj_out.weight": np.zeros((100, 8)),
    }
    mapped = hf_to_openai_names(hf)
    assert "encoder.conv1.weight" in mapped
    assert "encoder.blocks.0.attn.query.weight" in mapped
    assert "encoder.blocks.0.attn_ln.weight" in mapped
    assert "decoder.blocks.0.cross_attn.key.weight" in mapped
    assert "decoder.blocks.0.mlp.0.bias" in mapped
    assert "decoder.token_embedding.weight" in mapped
    assert "decoder.ln.bias" in mapped
    assert "encoder.positional_embedding" in mapped
    assert "proj_out.weight" not in mapped  # tied weights dropped


def test_engine_loads_ggml_end_to_end(tmp_path, tiny_cfg):
    """WhisperEngine.load_model on a GGML file: embedded vocab + filters +
    tensors drive a full transcribe call."""
    import numpy as np
    from spittle_tpu.engine.base import TranscribeParams
    from spittle_tpu.engine.whisper_engine import WhisperEngine

    rng = np.random.default_rng(1)
    tensors = {
        name: (rng.standard_normal(shape) * 0.05).astype(np.float32)
        for name, shape in openai_tensor_names(tiny_cfg).items()
    }
    path = str(tmp_path / "tiny-model.bin")
    write_ggml(path, tiny_cfg, tensors)

    eng = WhisperEngine()
    eng.load_model(path)
    assert eng.is_loaded
    assert eng.cfg.n_audio_state == tiny_cfg.n_audio_state
    assert eng.mel_filters is not None
    audio = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    res = eng.transcribe_samples(audio, TranscribeParams(language="en"))
    assert isinstance(res.text, str)
    eng.unload_model()
