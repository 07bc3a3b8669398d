"""Dormant LLM cleanup subsystem (text/cleanup.py) — behavior parity with
the reference's cleanup.rs test suite (masking per span type, output
validation, sentence splitting)."""

from spittle_tpu.text.cleanup import (
    CleanupManager,
    mask_protected_spans,
    restore_protected_spans,
    split_sentences,
    validate_cleanup,
)


def _roundtrip(text):
    masked, spans = mask_protected_spans(text)
    return masked, spans, restore_protected_spans(masked, spans)


def test_mask_and_restore_at_tokens():
    text = "open @auth.ts and @src/utils.rs please"
    masked, spans, restored = _roundtrip(text)
    assert "@auth.ts" not in masked and "@src/utils.rs" not in masked
    assert len(spans) == 2
    assert restored == text


def test_mask_and_restore_backtick_code():
    text = "run `cargo test --all` then check"
    masked, spans, restored = _roundtrip(text)
    assert "`cargo test --all`" not in masked
    assert restored == text


def test_mask_and_restore_urls():
    text = "see https://example.com/docs?q=1 and http://a.b/c"
    masked, spans, restored = _roundtrip(text)
    assert "https://example.com" not in masked
    assert "http://a.b" not in masked
    assert restored == text


def test_mask_and_restore_paths():
    text = "edit /home/user/project/main.rs and ~/notes.txt"
    masked, spans, restored = _roundtrip(text)
    assert "/home/user/project/main.rs" not in masked
    assert restored == text


def test_mask_and_restore_cli_flags():
    text = "use --verbose and -o=out.txt when running"
    masked, spans, restored = _roundtrip(text)
    assert "--verbose" not in masked
    assert restored == text


def test_validate_cleanup_empty():
    assert not validate_cleanup("some text", "", [])
    assert not validate_cleanup("some text", "   ", [])


def test_validate_cleanup_length_ratio():
    assert not validate_cleanup(
        "this is a relatively long sentence here", "hi", []
    )
    assert not validate_cleanup(
        "short", "this is way too long for the original short text here", []
    )


def test_validate_cleanup_unreplaced_placeholder():
    spans = [("⟦P0⟧", "@auth.ts")]
    assert not validate_cleanup(
        "open @auth.ts now", "open ⟦P0⟧ now", spans
    )


def test_validate_cleanup_ok():
    assert validate_cleanup("hello world this is", "Hello world, this is.", [])


def test_sentence_splitting():
    text = "Hello world. This is a test! Another sentence? Final one."
    assert len(CleanupManager.split_sentences(text)) == 4
    assert split_sentences("no terminal punctuation") == [
        "no terminal punctuation"
    ]


def test_manager_rejects_degenerate_provider_output():
    mgr = CleanupManager(lambda prompt: "x")  # absurdly short output
    original = "this sentence is long enough that 'x' fails the ratio gate"
    assert mgr.cleanup(original) == original
