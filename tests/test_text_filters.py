"""Text filter behavior parity tests.

Cases mirror the reference suite in
`/root/reference/src-tauri/src/audio_toolkit/text.rs:398-673`.
"""

from spittle_tpu.text import (
    apply_custom_words,
    clean_segment_boundaries,
    filter_transcription_output,
)
from spittle_tpu.text.filters import (
    _extract_punctuation,
    _preserve_case_pattern,
    soundex_code,
)


class TestApplyCustomWords:
    def test_exact_match(self):
        assert apply_custom_words("hello world", ["Hello", "World"], 0.5) == "Hello World"

    def test_fuzzy_match(self):
        assert apply_custom_words("helo wrold", ["hello", "world"], 0.5) == "hello world"

    def test_empty_custom_words(self):
        assert apply_custom_words("hello world", [], 0.5) == "hello world"

    def test_ngram_two_words(self):
        result = apply_custom_words(
            "il cui nome è Charge B, che permette", ["ChargeBee"], 0.5
        )
        assert "ChargeBee," in result
        assert "Charge B" not in result

    def test_ngram_three_words(self):
        result = apply_custom_words("use Chat G P T for this", ["ChatGPT"], 0.5)
        assert "ChatGPT" in result

    def test_prefers_longer_ngram(self):
        result = apply_custom_words("Open AI GPT model", ["OpenAI", "GPT"], 0.5)
        assert result == "OpenAI GPT model"

    def test_ngram_preserves_case(self):
        result = apply_custom_words("CHARGE B is great", ["ChargeBee"], 0.5)
        assert "CHARGEBEE" in result

    def test_ngram_with_spaces_in_custom(self):
        result = apply_custom_words("using Mac Book Pro", ["MacBook Pro"], 0.5)
        assert "MacBook" in result

    def test_trailing_number_not_doubled(self):
        result = apply_custom_words("use GPT4 for this", ["GPT-4"], 0.5)
        assert "GPT-44" not in result


class TestCasePattern:
    def test_preserve_case_pattern(self):
        assert _preserve_case_pattern("HELLO", "world") == "WORLD"
        assert _preserve_case_pattern("Hello", "world") == "World"
        assert _preserve_case_pattern("hello", "WORLD") == "WORLD"

    def test_digits_not_all_upper(self):
        # "GPT4" is not all-uppercase char-wise ('4' is neither case)
        assert _preserve_case_pattern("GPT4", "gpt-4") == "Gpt-4"

    def test_extract_punctuation(self):
        assert _extract_punctuation("hello") == ("", "")
        assert _extract_punctuation("!hello?") == ("!", "?")
        assert _extract_punctuation("...hello...") == ("...", "...")


class TestSoundex:
    def test_basic_codes(self):
        assert soundex_code("robert") == "R163"
        assert soundex_code("rupert") == "R163"
        assert soundex_code("ashcraft") == "A261"
        assert soundex_code("tymczak") == "T522"
        assert soundex_code("pfister") == "P236"
        assert soundex_code("honeyman") == "H555"


class TestFilterTranscriptionOutput:
    def test_filler_words(self):
        assert (
            filter_transcription_output("So um I was thinking uh about this")
            == "So I was thinking about this"
        )

    def test_filler_case_insensitive(self):
        assert filter_transcription_output("UM this is UH a test") == "this is a test"

    def test_filler_with_punctuation(self):
        assert (
            filter_transcription_output("Well, um, I think, uh. that's right")
            == "Well, I think, that's right"
        )

    def test_cleans_whitespace(self):
        assert filter_transcription_output("Hello    world   test") == "Hello world test"

    def test_trims(self):
        assert filter_transcription_output("  Hello world  ") == "Hello world"

    def test_combined(self):
        assert (
            filter_transcription_output("  Um, so I was, uh, thinking about this  ")
            == "so I was, thinking about this"
        )

    def test_preserves_valid_text(self):
        text = "This is a completely normal sentence."
        assert filter_transcription_output(text) == text

    def test_stutter_collapse(self):
        assert (
            filter_transcription_output("w wh wh wh wh wh wh wh wh wh why")
            == "w wh why"
        )

    def test_stutter_short_words(self):
        assert filter_transcription_output("I I I I think so so so so") == "I think so"

    def test_stutter_mixed_case(self):
        assert filter_transcription_output("No NO no NO no") == "No"

    def test_stutter_preserves_two_repetitions(self):
        assert filter_transcription_output("no no is fine") == "no no is fine"


class TestHallucinations:
    def test_exact_match(self):
        assert filter_transcription_output("Thank you for watching") == ""
        assert filter_transcription_output("bye") == ""
        assert filter_transcription_output("you") == ""

    def test_case_insensitive(self):
        assert filter_transcription_output("THANK YOU FOR WATCHING") == ""
        assert filter_transcription_output("Thank You") == ""
        assert filter_transcription_output("Please Subscribe") == ""

    def test_trailing_punctuation(self):
        assert filter_transcription_output("Thank you for watching.") == ""
        assert filter_transcription_output("Bye bye!") == ""
        assert filter_transcription_output("Thanks...") == ""
        assert filter_transcription_output("See you next time!") == ""

    def test_url_patterns(self):
        assert (
            filter_transcription_output("For more information, visit www.microsoft.com")
            == ""
        )
        assert (
            filter_transcription_output(
                "For more information, visit www.microsoft.com or visit "
                "www.microsoft.com for more information."
            )
            == ""
        )
        assert (
            filter_transcription_output("Visit www.example.org for more information.")
            == ""
        )
        assert (
            filter_transcription_output("Subtitles by the Amara.org community") == ""
        )

    def test_does_not_filter_legitimate_text(self):
        assert (
            filter_transcription_output(
                "Thank you for watching the demo, now let me explain"
            )
            != ""
        )
        assert filter_transcription_output("I want to say thank you for the help") != ""
        assert (
            filter_transcription_output("Please subscribe to the newsletter for updates")
            != ""
        )
        assert (
            filter_transcription_output(
                "See you next time we discuss this topic in detail"
            )
            != ""
        )


class TestCleanSegmentBoundaries:
    def test_basic(self):
        segments = [
            "So I'm trying out.",
            "With parakeet instead of Whisper.",
            "Because it seems to have better.",
        ]
        assert clean_segment_boundaries(segments, "Who cares?") == (
            "so i'm trying out with parakeet instead of whisper because it "
            "seems to have better who cares"
        )

    def test_ellipsis(self):
        segments = ["And see if that...", "It starts to collapse."]
        assert (
            clean_segment_boundaries(segments, "")
            == "and see if that it starts to collapse"
        )

    def test_empty_segments(self):
        assert (
            clean_segment_boundaries([], "Just the remaining text.")
            == "just the remaining text"
        )

    def test_no_remaining(self):
        assert (
            clean_segment_boundaries(["Hello world.", "Goodbye."], "")
            == "hello world goodbye"
        )
