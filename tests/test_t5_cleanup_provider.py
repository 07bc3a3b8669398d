"""End-to-end cleanup provider: checkpoint dir on disk -> cleaned text.

Synthesizes a real HF-format flan-t5 checkpoint directory (safetensors +
config.json + tokenizer.json built programmatically) and drives
CleanupManager through t5_seq2seq — the full load-tokenize-encode-
greedy-decode-detokenize loop the reference's CleanupManager runs via
ort sessions (cleanup.rs:105-295). Random weights mean the output text
is arbitrary; what's under test is the wiring, the mask/validate
fail-open contract, and checkpoint-dir loading.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
tokenizers = pytest.importorskip("tokenizers")

from spittle_tpu.text.cleanup import CleanupManager, t5_seq2seq

VOCAB = 64


def _make_checkpoint(tmp_path):
    from safetensors.numpy import save_file

    hf_cfg = transformers.T5Config(
        vocab_size=VOCAB, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, decoder_start_token_id=0,
    )
    torch.manual_seed(1)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()
    save_file(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()},
        str(tmp_path / "model.safetensors"),
    )
    (tmp_path / "config.json").write_text(json.dumps({
        "vocab_size": VOCAB, "d_model": 32, "d_kv": 8, "d_ff": 64,
        "num_layers": 2, "num_heads": 4,
        "relative_attention_num_buckets": 32,
        "relative_attention_max_distance": 128,
        "eos_token_id": 1, "pad_token_id": 0,
    }))

    # word-level tokenizer over a tiny closed vocabulary
    words = ["<pad>", "</s>", "<unk>"] + [f"w{i}" for i in range(VOCAB - 3)]
    tok = tokenizers.Tokenizer(
        tokenizers.models.WordLevel(
            {w: i for i, w in enumerate(words)}, unk_token="<unk>"
        )
    )
    tok.pre_tokenizer = tokenizers.pre_tokenizers.Whitespace()
    tok.save(str(tmp_path / "tokenizer.json"))
    return hf


def test_t5_cleanup_end_to_end(tmp_path):
    _make_checkpoint(tmp_path)
    fn = t5_seq2seq(str(tmp_path), max_tokens=8)
    out = fn("w5 w6 w7")
    assert isinstance(out, str)  # random weights: arbitrary but valid text

    mgr = CleanupManager(seq2seq=fn)
    assert mgr.is_available
    # fail-open contract: random-weight output almost surely fails
    # validate_cleanup (or returns junk), so cleanup() must return a str
    # and never raise; protected spans must survive whatever happens
    text = "run `make test` at /tmp/x --now w3 w4"
    cleaned = mgr.cleanup(text)
    assert isinstance(cleaned, str)
    for protected in ("`make test`", "/tmp/x", "--now"):
        assert protected in cleaned or cleaned == text


def test_t5_seq2seq_matches_hf_generate(tmp_path):
    """The provider's decode loop is hf.generate-greedy, token for token,
    on the same checkpoint dir it loaded from disk."""
    hf = _make_checkpoint(tmp_path)
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(str(tmp_path / "tokenizer.json"))
    prompt = "w10 w11 w12 w13"
    ids = tok.encode(prompt).ids + [1]
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]), max_new_tokens=8,
            do_sample=False, num_beams=1,
        ).numpy()[0]
    want = []
    for t in ref[1:]:
        if t == 1:
            break
        if t != 0:
            want.append(int(t))

    fn = t5_seq2seq(str(tmp_path), max_tokens=8)
    got_text = fn(prompt)
    assert got_text == tok.decode(want)
