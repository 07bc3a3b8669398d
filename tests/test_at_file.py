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
