"""Apple Intelligence FFI binding + pipeline branch tests.

The binding (spittle_tpu/shell/apple_llm.py) is exercised against a
REAL shared library: a from-scratch C fake implementing the same
3-symbol ABI as the Swift shim, compiled with the system compiler at
test time (the Windows-COM fake pattern — argtypes/ownership bugs crash
the test process instead of a user's Mac). A live-allocation counter in
the fake proves the free contract (reference semantics:
src-tauri/src/apple_intelligence.rs:23-60).

The pipeline branch tests mirror pipeline.rs:815-856: availability
gate, system-message fold-in, token limit parsed from the provider's
"model" field, empty -> None, error -> fail-open.
"""

import ctypes
import os
import shutil
import subprocess
import sys

import pytest

from spittle_tpu.config.settings import (
    APPLE_INTELLIGENCE_PROVIDER_ID,
    AppSettings,
    PostProcessProvider,
)
from spittle_tpu.pipeline import PipelineHooks
from spittle_tpu.shell import apple_llm

from test_pipeline import make_pipeline

# The fake honors the exact ABI the Swift shim exports, plus two
# test-only knobs: spittle_fake_set_available and spittle_fake_live
# (net malloc counter — every strdup/malloc bumps it, every free drops
# it, so a missing or double free fails the leak assertion).
FAKE_C = r"""
#include <stdlib.h>
#include <string.h>

typedef struct {
    char *response;
    int success;
    char *error_message;
} AppleLLMResponse;

static int live_allocs = 0;
static int available = 1;

int spittle_fake_live(void) { return live_allocs; }
void spittle_fake_set_available(int a) { available = a; }

static char *dup_counted(const char *s) {
    char *d = strdup(s);
    if (d) live_allocs++;
    return d;
}

int is_apple_intelligence_available(void) { return available; }

AppleLLMResponse *process_text_with_apple_llm(const char *prompt,
                                              int max_tokens) {
    if (strcmp(prompt, "NULLPTR") == 0) return NULL;

    AppleLLMResponse *r = malloc(sizeof *r);
    live_allocs++;
    r->response = NULL;
    r->success = 0;
    r->error_message = NULL;

    if (strcmp(prompt, "ERR") == 0) {
        r->error_message = dup_counted("model offline");
        return r;
    }
    if (strcmp(prompt, "ERRNULL") == 0) return r;  /* success=0, no msg */
    if (strcmp(prompt, "EMPTY") == 0) { r->success = 1; return r; }

    /* Echo "cleaned: <prompt>", clamped to max_tokens words like the
       Swift shim's clampWords. */
    size_t n = strlen(prompt) + 16;
    char *out = malloc(n);
    live_allocs++;
    strcpy(out, "cleaned: ");
    strcat(out, prompt);
    if (max_tokens > 0) {
        int words = 0, in_word = 0;
        for (char *p = out; *p; p++) {
            if (*p == ' ' || *p == '\t' || *p == '\n') {
                in_word = 0;
            } else if (!in_word) {
                in_word = 1;
                if (++words > max_tokens) { *(p - 1) = '\0'; break; }
            }
        }
    }
    r->response = out;
    r->success = 1;
    return r;
}

void free_apple_llm_response(AppleLLMResponse *r) {
    if (!r) return;
    if (r->response) { free(r->response); live_allocs--; }
    if (r->error_message) { free(r->error_message); live_allocs--; }
    free(r);
    live_allocs--;
}
"""


@pytest.fixture(scope="module")
def fake_dylib(tmp_path_factory):
    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("g++")
    if cc is None:
        pytest.skip("no C compiler in image")
    d = tmp_path_factory.mktemp("apple_llm")
    src = d / "fake_apple_llm.c"
    src.write_text(FAKE_C)
    ext = ".dylib" if sys.platform == "darwin" else ".so"
    out = d / ("libfake_apple_llm" + ext)
    subprocess.run(
        [cc, "-shared", "-fPIC", "-O1", "-o", str(out), str(src)], check=True
    )
    return str(out)


@pytest.fixture
def client(fake_dylib):
    lib = apple_llm.load_library(fake_dylib)
    c = apple_llm.AppleLLM(lib)
    yield c, lib
    assert lib.spittle_fake_live() == 0, "response structs leaked"


class TestBinding:
    def test_availability_toggles(self, client):
        c, lib = client
        lib.spittle_fake_set_available(1)
        assert c.available()
        lib.spittle_fake_set_available(0)
        assert not c.available()
        lib.spittle_fake_set_available(1)

    def test_roundtrip_utf8(self, client):
        c, _ = client
        assert c.process_text("héllo wörld 中文") == "cleaned: héllo wörld 中文"

    def test_token_limit_clamps_words(self, client):
        c, _ = client
        assert c.process_text("one two three four", 3) == "cleaned: one two"

    def test_zero_limit_keeps_all(self, client):
        c, _ = client
        assert c.process_text("one two three", 0) == "cleaned: one two three"

    def test_error_message_raised(self, client):
        c, _ = client
        with pytest.raises(apple_llm.AppleLLMError, match="model offline"):
            c.process_text("ERR")

    def test_null_error_message_is_unknown(self, client):
        c, _ = client
        with pytest.raises(apple_llm.AppleLLMError, match="Unknown error"):
            c.process_text("ERRNULL")

    def test_success_with_null_response_is_empty(self, client):
        c, _ = client
        assert c.process_text("EMPTY") == ""

    def test_null_struct_pointer(self, client):
        c, _ = client
        with pytest.raises(apple_llm.AppleLLMError, match="Null response"):
            c.process_text("NULLPTR")

    def test_interior_nul_rejected_before_ffi(self, client):
        c, _ = client
        with pytest.raises(apple_llm.AppleLLMError, match="NUL"):
            c.process_text("a\x00b")

    def test_no_leak_across_many_calls(self, client):
        c, lib = client
        for i in range(50):
            c.process_text(f"call {i}", i % 4)
        for bad in ("ERR", "ERRNULL", "EMPTY", "NULLPTR"):
            try:
                c.process_text(bad)
            except apple_llm.AppleLLMError:
                pass
        assert lib.spittle_fake_live() == 0


class TestDefaultClient:
    def test_env_override_loads_anywhere(self, fake_dylib, monkeypatch):
        monkeypatch.setenv(apple_llm.DYLIB_ENV, fake_dylib)
        apple_llm.reset_default_client()
        try:
            c = apple_llm.default_client()
            assert c is not None and c.available()
            # cached: same object back
            assert apple_llm.default_client() is c
        finally:
            apple_llm.reset_default_client()

    def test_absent_off_macos_without_override(self, monkeypatch):
        monkeypatch.delenv(apple_llm.DYLIB_ENV, raising=False)
        apple_llm.reset_default_client()
        try:
            if sys.platform != "darwin":
                assert apple_llm.default_client() is None
        finally:
            apple_llm.reset_default_client()

    def test_ui_state_delegates(self, fake_dylib, monkeypatch):
        from spittle_tpu.app import ui_state

        monkeypatch.setenv(apple_llm.DYLIB_ENV, fake_dylib)
        apple_llm.reset_default_client()
        try:
            assert ui_state.check_apple_intelligence_availability()
            assert (
                ui_state.apple_intelligence_process_text("hi", 0)
                == "cleaned: hi"
            )
        finally:
            apple_llm.reset_default_client()


def _apple_settings():
    s = AppSettings()
    s.post_process_enabled = True
    s.post_process_provider_id = APPLE_INTELLIGENCE_PROVIDER_ID
    # Off-macOS default_post_process_providers omits the apple row
    # (settings.py:181-186); the branch itself is platform-independent.
    if not any(p.id == APPLE_INTELLIGENCE_PROVIDER_ID
               for p in s.post_process_providers):
        s.post_process_providers.append(PostProcessProvider(
            APPLE_INTELLIGENCE_PROVIDER_ID, "Apple Intelligence",
            "apple-intelligence://local", False, None))
    s.post_process_models[APPLE_INTELLIGENCE_PROVIDER_ID] = "100"
    s.post_process_selected_prompt_id = "default_improve_transcriptions"
    return s


class TestPipelineBranch:
    """pipeline.rs:815-856 semantics through PipelineHooks seams."""

    def _hooks(self, calls, result="Cleaned.", available=True, error=None):
        def process(prompt, limit):
            calls.append((prompt, limit))
            if error is not None:
                raise error
            return result

        return PipelineHooks(
            apple_intelligence_available=lambda: available,
            apple_intelligence_process=process,
        )

    def test_success_folds_system_message(self):
        calls = []
        p, out = make_pipeline(
            "so um raw words", settings=_apple_settings(), post_process=True,
            hooks=self._hooks(calls),
        )
        p.run()
        assert out.buffer == "Cleaned."
        (prompt, limit), = calls
        assert prompt.startswith("[System instruction: ")
        assert "raw words" in prompt
        assert limit == 100  # parsed from the provider's model field

    def test_non_numeric_model_means_no_limit(self):
        calls = []
        s = _apple_settings()
        s.post_process_models[APPLE_INTELLIGENCE_PROVIDER_ID] = "on-device"
        p, _ = make_pipeline(
            "raw", settings=s, post_process=True, hooks=self._hooks(calls),
        )
        p.run()
        assert calls[0][1] == 0

    def test_unavailable_falls_back_to_raw(self):
        calls = []
        p, out = make_pipeline(
            "raw words", settings=_apple_settings(), post_process=True,
            hooks=self._hooks(calls, available=False),
        )
        p.run()
        assert out.buffer == "raw words"
        assert calls == []

    def test_error_falls_open(self):
        p, out = make_pipeline(
            "raw words", settings=_apple_settings(), post_process=True,
            hooks=self._hooks([], error=apple_llm.AppleLLMError("down")),
        )
        p.run()
        assert out.buffer == "raw words"

    def test_empty_result_falls_back(self):
        p, out = make_pipeline(
            "raw words", settings=_apple_settings(), post_process=True,
            hooks=self._hooks([], result="   "),
        )
        p.run()
        assert out.buffer == "raw words"

    def test_leaked_instructions_stripped(self):
        leaked = (
            "Fixed text.\n\nIMPORTANT: Use these exact spellings for "
            "technical terms: Foo\n"
        )
        p, out = make_pipeline(
            "raw", settings=_apple_settings(), post_process=True,
            hooks=self._hooks([], result=leaked),
        )
        p.run()
        assert "exact spellings" not in out.buffer
        assert "Fixed text." in out.buffer

    def test_end_to_end_through_real_binding(self, fake_dylib, monkeypatch):
        """Full path: pipeline default hooks -> shell binding -> C fake."""
        monkeypatch.setenv(apple_llm.DYLIB_ENV, fake_dylib)
        apple_llm.reset_default_client()
        try:
            s = _apple_settings()
            s.post_process_models[APPLE_INTELLIGENCE_PROVIDER_ID] = "0"
            p, out = make_pipeline(
                "raw words", settings=s, post_process=True,
            )
            p.run()
            assert out.buffer.startswith("cleaned: [System instruction: ")
            assert "raw words" in out.buffer
        finally:
            apple_llm.reset_default_client()
