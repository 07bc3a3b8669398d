"""@file expansion tests (reference: at_file_expansion.rs:646-1367 suite)."""

import os

import pytest

from spittle_tpu.text.at_file import (
    damerau_levenshtein,
    expand_at_refs,
    extract_snippet,
    fuzzy_basename_match,
    is_git_repository,
    maybe_expand_at_refs,
    normalize_to_words,
    normalize_token,
    parse_at_tokens,
    resolve_token,
    walk_workspace,
    _index_cache,
)


@pytest.fixture(autouse=True)
def clear_cache():
    _index_cache.clear()
    yield
    _index_cache.clear()


class TestParse:
    def test_simple(self):
        toks = parse_at_tokens("check @main.rs for bugs")
        assert [t.token for t in toks] == ["main.rs"]

    def test_quoted(self):
        toks = parse_at_tokens('open @"my file.ts" please')
        assert [t.token for t in toks] == ["my file.ts"]

    def test_email_skipped(self):
        assert parse_at_tokens("mail me at user@example.com thanks") == []

    def test_multiple(self):
        toks = parse_at_tokens("diff @a.rs and @b.rs")
        assert [t.token for t in toks] == ["a.rs", "b.rs"]

    def test_with_path(self):
        toks = parse_at_tokens("see @src/lib/mod.rs here")
        assert toks[0].token == "src/lib/mod.rs"

    def test_trailing_punctuation_stripped(self):
        toks = parse_at_tokens("look at @main.rs.")
        assert toks[0].token == "main.rs"

    def test_spoken_alias(self):
        toks = parse_at_tokens("include file auth dot ts in the prompt")
        assert any(t.token == "auth.ts" for t in toks)

    def test_spoken_alias_with_slash(self):
        toks = parse_at_tokens("reference src slash lib dot rs")
        assert any(t.token == "src/lib.rs" for t in toks)

    def test_for_requires_file_like(self):
        assert not any(
            t.token == "everyone" for t in parse_at_tokens("this is for everyone")
        )
        toks = parse_at_tokens("fix this for main dot rs")
        assert any(t.token == "main.rs" for t in toks)

    def test_split_extension_normalized(self):
        assert normalize_token("trade. r s", True) == "trade.rs"
        assert normalize_token("app. t s x", True) == "app.tsx"

    def test_trailing_phrase_after_extension_trimmed(self):
        assert normalize_token("main.rs and then fix it", True) == "main.rs"


class TestFuzzy:
    def test_damerau(self):
        assert damerau_levenshtein("abc", "acb") == 1
        assert damerau_levenshtein("abc", "abc") == 0
        assert damerau_levenshtein("ab", "ba") == 1

    def test_normalize_to_words(self):
        assert normalize_to_words("myFileName") == ["my", "file", "name"]
        assert normalize_to_words("my_file-name two") == ["my", "file", "name", "two"]
        assert normalize_to_words("HTTPServer") == ["httpserver"]

    def test_basename_match(self):
        assert fuzzy_basename_match("auth handler", "auth_handler.ts")
        assert fuzzy_basename_match("authhandler", "AuthHandler.ts") is False  # 1 vs 2 words
        assert fuzzy_basename_match("auth", "auth.rs")
        assert not fuzzy_basename_match("auth", "login.rs")


class TestResolve:
    @pytest.fixture()
    def ws(self, tmp_path):
        (tmp_path / "src").mkdir()
        (tmp_path / "src" / "main.rs").write_text("fn main() {}")
        (tmp_path / "src" / "auth_handler.ts").write_text("x")
        (tmp_path / "README.md").write_text("hi")
        (tmp_path / "dup.txt").write_text("a")
        (tmp_path / "src" / "dup.txt").write_text("b")
        return str(tmp_path)

    def entries(self, ws):
        return walk_workspace(ws)

    def test_unique_exact(self, ws):
        r = resolve_token("main.rs", ws, self.entries(ws))
        assert r and r.endswith(os.path.join("src", "main.rs"))

    def test_no_match(self, ws):
        assert resolve_token("nonexistent.go", ws, self.entries(ws)) is None

    def test_ambiguous_returns_none(self, ws):
        assert resolve_token("dup.txt", ws, self.entries(ws)) is None

    def test_relative_path(self, ws):
        r = resolve_token("src/main.rs", ws, self.entries(ws))
        assert r and r.endswith(os.path.join("src", "main.rs"))

    def test_fuzzy_spoken_name(self, ws):
        r = resolve_token("auth handler.ts", ws, self.entries(ws))
        assert r and r.endswith("auth_handler.ts")

    def test_fuzzy_path_typo(self, ws):
        r = resolve_token("src/man.rs", ws, self.entries(ws))
        assert r and r.endswith("main.rs")


class TestExpand:
    @pytest.fixture()
    def repo(self, tmp_path):
        (tmp_path / ".git").mkdir()
        (tmp_path / "src").mkdir()
        (tmp_path / "src" / "main.rs").write_text("fn main() {}")
        (tmp_path / "my file.ts").write_text("x")
        return str(tmp_path)

    def test_no_tokens_unchanged(self, repo):
        assert expand_at_refs("nothing here", repo) == "nothing here"

    def test_expands_to_absolute(self, repo):
        out = expand_at_refs("check @main.rs now", repo)
        assert "@" + os.path.join(repo, "src", "main.rs") in out

    def test_unresolved_left_alone(self, repo):
        text = "check @missing.go now"
        assert expand_at_refs(text, repo) == text

    def test_space_path_quoted(self, repo):
        out = expand_at_refs('see @"my file.ts" ok', repo)
        assert '@"' in out and out.endswith(" ok")

    def test_spoken_alias_expansion(self, repo):
        out = expand_at_refs("include file main dot rs please", repo)
        assert os.path.join(repo, "src", "main.rs") in out

    def test_sentence_with_punctuation(self, repo):
        out = expand_at_refs("Fix @main.rs, then commit.", repo)
        assert out.startswith("Fix @" + os.path.join(repo, "src"))
        assert out.endswith(", then commit.")

    def test_maybe_expand_requires_git(self, tmp_path):
        (tmp_path / "main.rs").write_text("x")
        text = "check @main.rs"
        assert maybe_expand_at_refs(text, True, str(tmp_path)) == text
        (tmp_path / ".git").mkdir()
        _index_cache.clear()
        assert maybe_expand_at_refs(text, True, str(tmp_path)) != text

    def test_disabled_no_expansion(self, repo):
        text = "check @main.rs"
        assert maybe_expand_at_refs(text, False, repo) == text


class TestWalkAndSnippets:
    def test_walk_skips_dirs(self, tmp_path):
        (tmp_path / "node_modules").mkdir()
        (tmp_path / "node_modules" / "junk.js").write_text("x")
        (tmp_path / "keep.py").write_text("print(1)")
        entries = walk_workspace(str(tmp_path))
        names = [os.path.basename(e) for e in entries]
        assert "keep.py" in names
        assert "junk.js" not in names

    def test_snippet_binary_rejected(self, tmp_path):
        p = tmp_path / "bin.dat"
        p.write_bytes(b"abc\0def")
        assert extract_snippet(str(p), str(tmp_path)) is None

    def test_snippet_format_and_caps(self, tmp_path):
        p = tmp_path / "x.py"
        p.write_text("\n".join(f"line{i}" for i in range(500)))
        snip = extract_snippet(str(p), str(tmp_path))
        assert "### Referenced file: x.py" in snip
        assert "```python" in snip
        assert "line199" in snip and "line200" not in snip

    def test_git_detection(self, tmp_path):
        sub = tmp_path / "a" / "b"
        sub.mkdir(parents=True)
        assert not is_git_repository(str(sub))
        (tmp_path / ".git").mkdir()
        assert is_git_repository(str(sub))


# ---------------------------------------------------------------------------
# Behavior parity for the remainder of the reference's 62-test suite
# (at_file_expansion.rs tests; assertions re-derived, not copied).
# ---------------------------------------------------------------------------


def test_parse_at_start_of_text():
    tokens = parse_at_tokens("@auth.ts is important")
    assert [t.token for t in tokens] == ["auth.ts"]


def test_parse_at_end_of_text():
    tokens = parse_at_tokens("see @auth.ts")
    assert [t.token for t in tokens] == ["auth.ts"]


def test_parse_with_comma():
    tokens = parse_at_tokens("open @auth.ts, then continue")
    assert [t.token for t in tokens] == ["auth.ts"]


def test_parse_duplicate_same_token():
    tokens = parse_at_tokens("@auth.ts and @auth.ts again")
    assert [t.token for t in tokens] == ["auth.ts", "auth.ts"]


def test_parse_special_chars_in_name():
    tokens = parse_at_tokens("Check @auth-config.ts and @utils_helpers.ts")
    assert [t.token for t in tokens] == ["auth-config.ts", "utils_helpers.ts"]


def test_parse_quoted_with_spaces():
    tokens = parse_at_tokens('Look at @"my auth file.ts"')
    assert [t.token for t in tokens] == ["my auth file.ts"]


def test_parse_quoted_with_path():
    tokens = parse_at_tokens('Open @"src/my utils/helper.ts" now')
    assert [t.token for t in tokens] == ["src/my utils/helper.ts"]


def test_parse_no_false_positives():
    for case in ["hello@world.com", "test@test.org", "user@domain.co.uk",
                 "a@b", "@", "@ ", '@""']:
        assert parse_at_tokens(case) == [], case


def test_parse_spoken_include_and_file_aliases():
    assert [t.token for t in parse_at_tokens("please at file auth dot ts")] \
        == ["auth.ts"]
    assert [t.token for t in
            parse_at_tokens("include file config dot json here")] \
        == ["config.json"]


def test_parse_spoken_split_extension_tsx():
    tokens = parse_at_tokens("at file widget dot tsx")
    assert [t.token for t in tokens] == ["widget.tsx"]


def test_resolve_case_insensitive_fuzzy(tmp_path):
    f = tmp_path / "Auth.ts"
    f.write_text("test")
    entries = [str(f)]
    assert resolve_token("Auth.ts", str(tmp_path), entries) == str(f)
    assert resolve_token("auth.ts", str(tmp_path), entries) == str(f)


def test_exact_match_preferred_over_fuzzy(tmp_path):
    exact = tmp_path / "auth.ts"
    exact.write_text("exact")
    close = tmp_path / "auth2.ts"
    close.write_text("close")
    entries = [str(close), str(exact)]
    assert resolve_token("auth.ts", str(tmp_path), entries) == str(exact)


def test_fuzzy_resolve_case_styles(tmp_path):
    for fname, spoken in [
        ("auth_helpers.ts", "auth helpers.ts"),     # snake_case
        ("authHelpers.ts", "auth helpers.ts"),      # camelCase
        ("auth-helpers.ts", "auth helpers.ts"),     # kebab-case
        ("AuthHelpers.ts", "auth helpers.ts"),      # PascalCase
    ]:
        f = tmp_path / fname
        f.write_text("x")
        assert resolve_token(spoken, str(tmp_path), [str(f)]) == str(f), fname
        f.unlink()


def test_fuzzy_resolve_without_extension(tmp_path):
    f = tmp_path / "dockerfile"
    f.write_text("FROM scratch")
    assert resolve_token("dockerfile", str(tmp_path), [str(f)]) == str(f)


def test_fuzzy_extension_mismatch_no_match(tmp_path):
    f = tmp_path / "auth_helpers.rs"
    f.write_text("x")
    assert resolve_token("auth helpers.ts", str(tmp_path), [str(f)]) is None


def test_fuzzy_minor_extension_typo(tmp_path):
    f = tmp_path / "cargo.toml"
    f.write_text('name = "demo"')
    assert resolve_token("cargo.tomal", str(tmp_path), [str(f)]) == str(f)


def test_fuzzy_filename_typo(tmp_path):
    f = tmp_path / "transcription.rs"
    f.write_text("x")
    assert resolve_token("transcripton.rs", str(tmp_path), [str(f)]) == str(f)


def test_fuzzy_path_segment_typo(tmp_path):
    sub = tmp_path / "managers"
    sub.mkdir()
    f = sub / "audio.rs"
    f.write_text("x")
    assert resolve_token("managrs/audio.rs", str(tmp_path), [str(f)]) == str(f)


def test_resolve_basename_vs_path_precedence(tmp_path):
    deep = tmp_path / "src" / "auth.ts"
    deep.parent.mkdir()
    deep.write_text("deep")
    entries = [str(deep)]
    # A bare basename resolves even though the file lives in a subdir.
    assert resolve_token("auth.ts", str(tmp_path), entries) == str(deep)
    # A relative path with the dir resolves to the same file.
    assert resolve_token("src/auth.ts", str(tmp_path), entries) == str(deep)


def test_extract_snippet_line_cap(tmp_path):
    f = tmp_path / "bigfile.rs"
    f.write_text("".join(f"line {i}\n" for i in range(300)))
    snip = extract_snippet(str(f), str(tmp_path))
    assert snip is not None
    assert "line 0" in snip
    assert "line 199" in snip
    assert "line 250" not in snip  # capped at MAX_LINES=200


def test_extract_snippet_char_cap(tmp_path):
    f = tmp_path / "wide.txt"
    f.write_text("x" * 30_000 + "\nEND\n")
    snip = extract_snippet(str(f), str(tmp_path))
    assert snip is not None
    assert "END" not in snip  # truncated by MAX_CHARS before line 2


def test_extract_snippet_utf8(tmp_path):
    f = tmp_path / "unicode.rs"
    f.write_text("// Unicode test: 你好世界 \U0001F680 Ñoño\nfn main() {}",
                 encoding="utf-8")
    snip = extract_snippet(str(f), str(tmp_path))
    assert snip is not None
    assert "你好世界" in snip
    assert "\U0001F680" in snip


def test_walk_respects_max_depth(tmp_path):
    p = tmp_path
    for i in range(15):
        p = p / f"level{i}"
        p.mkdir()
    (p / "deep.txt").write_text("deep")
    entries = walk_workspace(str(tmp_path))
    assert not any(e.count("level") > 10 for e in entries)


def test_walk_multiple_skip_dirs(tmp_path):
    for skip in ("node_modules", "target", ".git"):
        d = tmp_path / skip
        d.mkdir()
        (d / "hidden.txt").write_text("x")
    (tmp_path / "visible.txt").write_text("x")
    entries = walk_workspace(str(tmp_path))
    assert any(e.endswith("visible.txt") for e in entries)
    assert not any("hidden.txt" in e for e in entries)


def test_expand_empty_text(tmp_path):
    assert expand_at_refs("", str(tmp_path)) == ""


def test_expand_only_token(tmp_path):
    f = tmp_path / "auth.ts"
    f.write_text("content")
    out = expand_at_refs("@auth.ts", str(tmp_path))
    assert str(f) in out


def test_expand_multiple_tokens_mixed(tmp_path):
    f = tmp_path / "real.ts"
    f.write_text("content")
    out = expand_at_refs("see @real.ts and @missing.xyz", str(tmp_path))
    assert str(f) in out
    assert "@missing.xyz" in out  # unresolved token untouched


def test_expand_preserves_order(tmp_path):
    f1 = tmp_path / "first.ts"
    f2 = tmp_path / "second.ts"
    f1.write_text("first content")
    f2.write_text("second content")
    out = expand_at_refs("See @first.ts then @second.ts", str(tmp_path))
    assert out.find(str(f1)) != -1 and out.find(str(f2)) != -1
    assert out.find(str(f1)) < out.find(str(f2))
