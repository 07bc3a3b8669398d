"""Pipeline state machine tests (reference: pipeline.rs flows)."""

import time

import numpy as np
import pytest

from spittle_tpu.config.settings import AppSettings, AutoSubmitKey, PasteMethod
from spittle_tpu.pipeline import (
    BufferTextOutput,
    PipelineHooks,
    PipelineState,
    TranscriptionPipeline,
    normalize_segment_text_for_post_process,
    should_insert_boundary_space,
    strip_leaked_prompt_instructions,
)


def make_pipeline(text="hello world", settings=None, post_process=False,
                  segments=(), hooks=None, llm_response=None):
    settings = settings or AppSettings()
    out = BufferTextOutput()
    hooks = hooks or PipelineHooks()
    if llm_response is not None:
        hooks.send_chat_completion = (
            lambda provider, key, model, prompt, system=None: llm_response
        )
    p = TranscriptionPipeline(
        samples=np.zeros(1600, np.float32),
        pasted_segments=list(segments),
        settings=settings,
        post_process=post_process,
        binding_id="transcribe",
        transcribe=lambda samples: text,
        output=out,
        hooks=hooks,
    )
    return p, out


class TestHelpers:
    def test_normalize_segment_text(self):
        assert (
            normalize_segment_text_for_post_process("  hello   world . more ,x ")
            == "hello world. more,x"
        )

    def test_boundary_space(self):
        assert should_insert_boundary_space("abc", "def")
        assert not should_insert_boundary_space("abc ", "def")
        assert not should_insert_boundary_space("abc", ".def")
        assert not should_insert_boundary_space("(", "def")
        assert not should_insert_boundary_space("", "def")

    def test_strip_leaked_jargon(self):
        leaked = (
            "Cleaned text here.\n\nIMPORTANT: Use these exact spellings for "
            "technical terms: TypeScript, GraphQL\n\nMore text."
        )
        out = strip_leaked_prompt_instructions(leaked)
        assert "exact spellings" not in out
        assert "Cleaned text here." in out


class TestNonPostProcess:
    def test_simple_paste(self):
        p, out = make_pipeline("hello world")
        p.run()
        assert p.state is PipelineState.DONE
        assert out.buffer == "hello world "

    def test_empty_transcription_no_paste(self):
        p, out = make_pipeline("")
        p.run()
        assert out.buffer == ""

    def test_empty_transcription_hides_overlay(self):
        """Empty transcription is a terminal state: the overlay must be
        hidden and the tray reset just like on a successful paste —
        otherwise a silent recording leaves 'transcribing' stuck forever
        (actions.rs defers hiding to pipeline terminal states)."""
        calls = []
        hooks = PipelineHooks(
            hide_overlay=lambda: calls.append("hide"),
            set_tray_idle=lambda: calls.append("idle"),
        )
        p, out = make_pipeline("", hooks=hooks)
        p.run()
        assert p.state is PipelineState.DONE
        assert "hide" in calls and "idle" in calls

    def test_segments_paste_remaining_only(self):
        p, out = make_pipeline("tail", segments=["seg one ", "seg two "])
        p.run()
        assert out.buffer == "tail "  # segments were pasted live already


class TestPostProcess:
    def _settings(self):
        s = AppSettings()
        s.post_process_enabled = True
        s.post_process_provider_id = "openai"
        s.post_process_models["openai"] = "gpt-test"
        s.post_process_selected_prompt_id = "default_improve_transcriptions"
        return s

    def test_llm_rewrite_single_write(self):
        p, out = make_pipeline(
            "so um the cat sat", settings=self._settings(), post_process=True,
            llm_response="The cat sat.",
        )
        p.run()
        assert p.state is PipelineState.DONE
        assert out.buffer == "The cat sat."
        assert p.raw_text == "so um the cat sat"
        assert p.final_text == "The cat sat."

    def test_llm_failure_falls_back_to_raw(self):
        def boom(*a, **k):
            raise RuntimeError("api down")

        hooks = PipelineHooks(send_chat_completion=boom)
        p, out = make_pipeline(
            "raw words", settings=self._settings(), post_process=True, hooks=hooks
        )
        p.run()
        assert out.buffer == "raw words"  # fail-open

    def test_no_model_configured_skips_llm(self):
        s = self._settings()
        s.post_process_models["openai"] = ""
        p, out = make_pipeline("raw words", settings=s, post_process=True,
                               llm_response="SHOULD NOT APPEAR")
        p.run()
        assert out.buffer == "raw words"

    def test_segment_reconstruction_with_boundary_space(self):
        p, out = make_pipeline(
            "remaining text", settings=self._settings(), post_process=True,
            segments=["first segment", "second"],
            llm_response=None,
        )
        p.hooks.send_chat_completion = (
            lambda provider, key, model, prompt, system=None: None
        )
        p.run()
        # raw_text = joined segments + boundary space + normalized remaining
        assert p.raw_text == "first segmentsecond remaining text"

    def test_trailing_space_and_autosubmit(self):
        s = self._settings()
        s.append_trailing_space = True
        s.auto_submit = True
        s.auto_submit_key = AutoSubmitKey.CTRL_ENTER
        p, out = make_pipeline("words", settings=s, post_process=True,
                               llm_response="Words.")
        p.run()
        assert out.buffer == "Words. "
        assert out.keys == ["ctrl+enter"]

    def test_autosubmit_skipped_when_paste_none(self):
        s = self._settings()
        s.auto_submit = True
        s.paste_method = PasteMethod.NONE
        p, out = make_pipeline("words", settings=s, post_process=True,
                               llm_response="Words.")
        p.run()
        assert out.keys == []

    def test_history_saved(self):
        saved = []
        hooks = PipelineHooks(
            save_history=lambda samples, raw, post, prompt: saved.append(
                (raw, post)
            ),
            send_chat_completion=lambda *a, **k: "Better text.",
        )
        p, out = make_pipeline("raw stuff", settings=self._settings(),
                               post_process=True, hooks=hooks)
        p.run()
        deadline = time.time() + 2
        while not saved and time.time() < deadline:
            time.sleep(0.01)
        assert saved == [("raw stuff", "Better text.")]

    def test_jargon_terms_injected_into_prompt(self):
        s = self._settings()
        s.jargon_enabled_profiles = ["web_dev"]
        captured = {}

        def capture(provider, key, model, prompt, system=None):
            captured["prompt"] = prompt
            captured["system"] = system
            return "ok"

        hooks = PipelineHooks(send_chat_completion=capture)
        p, out = make_pipeline("deploy the app", settings=s,
                               post_process=True, hooks=hooks)
        p.run()
        assert "IMPORTANT: Use these exact spellings" in captured["prompt"]
        assert "TypeScript" in captured["prompt"]
        assert captured["system"].startswith("You are a dictation post-processor")

    def test_segment_system_message(self):
        captured = {}

        def capture(provider, key, model, prompt, system=None):
            captured["system"] = system
            return "ok"

        hooks = PipelineHooks(send_chat_completion=capture)
        p, out = make_pipeline("tail", settings=self._settings(),
                               post_process=True, segments=["a ", "b "],
                               hooks=hooks)
        p.run()
        assert "multiple independent audio chunks" in captured["system"]

    def test_chinese_conversion_hook(self):
        s = self._settings()
        s.selected_language = "zh-Hant"
        s.post_process_models["openai"] = ""  # no LLM; conversion only
        hooks = PipelineHooks(
            convert_chinese=lambda lang, text: "converted:" + text
        )
        p, out = make_pipeline("简体", settings=s, post_process=True, hooks=hooks)
        p.run()
        assert out.buffer == "converted:简体"
