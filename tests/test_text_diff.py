"""Text diff parity tests (reference: pipeline.rs:973-1173)."""

from spittle_tpu.text.diff import apply_text_diff, compute_text_diff


def roundtrip(original, processed):
    d = compute_text_diff(original, processed)
    assert d is not None
    assert apply_text_diff(original, d) == processed
    return d


def test_identical_returns_none():
    assert compute_text_diff("hello world", "hello world") is None


def test_completely_different():
    d = roundtrip("abc", "xyz")
    assert (d.suffix_chars, d.delete_chars, d.insert) == (0, 3, "xyz")


def test_common_prefix():
    d = roundtrip("hello world", "hello there")
    assert (d.suffix_chars, d.delete_chars, d.insert) == (0, 5, "there")


def test_common_suffix():
    d = roundtrip("bad world", "good world")
    assert (d.suffix_chars, d.delete_chars, d.insert) == (7, 2, "goo")


def test_common_prefix_and_suffix():
    d = roundtrip("the quick brown fox", "the slow brown fox")
    assert (d.suffix_chars, d.delete_chars, d.insert) == (10, 5, "slow")


def test_insertion_only():
    d = roundtrip("hello world", "hello beautiful world")
    assert (d.suffix_chars, d.delete_chars, d.insert) == (5, 0, "beautiful ")


def test_deletion_only():
    d = roundtrip("hello beautiful world", "hello world")
    assert (d.suffix_chars, d.delete_chars, d.insert) == (5, 10, "")


def test_filler_word_removal():
    original = "so um I think we should refactor"
    d = roundtrip(original, "I think we should refactor")
    assert d.delete_chars > 0
    assert len(d.insert) < len(original)


def test_punctuation_change():
    d = roundtrip("hello world", "Hello world.")
    assert (d.suffix_chars, d.delete_chars, d.insert) == (0, 11, "Hello world.")


def test_middle_change_preserves_both_ends():
    d = roundtrip("The cat sat on the mat", "The dog sat on the mat")
    assert (d.suffix_chars, d.delete_chars, d.insert) == (15, 3, "dog")


def test_segment_filler_removal_and_punctuation():
    original = (
        "this is the test to determine if it's a little bit of a ni text to "
        "speech silence segmentation is working the pasting is not working"
    )
    processed = (
        "this is the test to determine if it's a little bit of a text to "
        "speech. Silence segmentation is working, the pasting is not working."
    )
    roundtrip(original, processed)


def test_segments_no_spaces_llm_adds_them():
    original = (
        "please do add the integration tests, preferably with an i term to"
        "process actually launched"
        "such that we can"
        "properly"
        "assess whether or not"
        "our current integration method"
    )
    processed = (
        "Please do add the integration tests, preferably with an iTerm to "
        "process actually launched such that we can properly assess "
        "whether or not our current integration method."
    )
    roundtrip(original, processed)


def test_segments_with_trailing_spaces():
    original = "".join(["okay let's test ", "i'm not sure ", "there may be bugs "])
    processed = "Okay, let's test. I'm not sure there may be bugs."
    roundtrip(original, processed)


def test_capitalize_and_add_period():
    d = roundtrip("this is a test sentence", "This is a test sentence.")
    assert (d.suffix_chars, d.delete_chars, d.insert) == (
        0,
        23,
        "This is a test sentence.",
    )


def test_multiple_segment_boundary_cleanup():
    original = (
        "okay let's test i'm not sure if it's going to there may be other "
        "small bugs such as the growing number of spaces being added to the "
        "end of each segments "
    )
    processed = (
        "Okay, let's test. I'm not sure if it's going to there may be other "
        "small bugs, such as the growing number of spaces being added to the "
        "end of each segment."
    )
    roundtrip(original, processed)
