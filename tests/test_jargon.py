"""Jargon system parity tests (reference: jargon.rs:722-961)."""

from spittle_tpu.text.jargon import (
    ActiveDictionary,
    JargonCorrection,
    JargonSettings,
    apply_corrections,
    build_initial_prompt,
    builtin_profiles,
    compute_active_dictionary,
)


def make_settings(profiles=(), terms=(), corrections=()):
    return JargonSettings(
        enabled_profiles=list(profiles),
        custom_terms=list(terms),
        custom_corrections=[JargonCorrection(f, t) for f, t in corrections],
    )


def test_profile_merging():
    d = compute_active_dictionary(make_settings(["web_dev", "devops"]))
    assert "TypeScript" in d.terms
    assert "Terraform" in d.terms


def test_correction_override_priority():
    d = compute_active_dictionary(
        make_settings(["web_dev"], corrections=[("next js", "NextJS")])
    )
    corr = next(c for c in d.corrections if c.from_.lower() == "next js")
    assert corr.to == "NextJS"


def test_case_insensitive_dedup():
    d = compute_active_dictionary(make_settings(["web_dev"], ["typescript"]))
    ts = [t for t in d.terms if t.lower() == "typescript"]
    assert ts == ["typescript"]  # custom casing wins, single entry


def test_protected_span_at_refs():
    result = apply_corrections(
        "Check @file.rs for type script code",
        [JargonCorrection("type script", "TypeScript")],
    )
    assert "@file.rs" in result and "TypeScript" in result


def test_protected_span_backticks():
    result = apply_corrections(
        "Run `type script build` with type script",
        [JargonCorrection("type script", "TypeScript")],
    )
    assert "`type script build`" in result and "TypeScript" in result


def test_protected_span_urls():
    result = apply_corrections(
        "Visit https://type-script.org for type script docs",
        [JargonCorrection("type script", "TypeScript")],
    )
    assert "https://type-script.org" in result and "TypeScript" in result


def test_protected_span_paths():
    result = apply_corrections(
        "Open /usr/local/bin/app and type script",
        [JargonCorrection("type script", "TypeScript")],
    )
    assert "/usr/local/bin/app" in result and "TypeScript" in result


def test_protected_span_cli_flags():
    result = apply_corrections(
        "Use --verbose and type script",
        [JargonCorrection("type script", "TypeScript")],
    )
    assert "--verbose" in result and "TypeScript" in result


def test_multi_word_boundary_safety():
    result = apply_corrections(
        "This script is good", [JargonCorrection("type script", "TypeScript")]
    )
    assert result == "This script is good"


def test_stable_initial_prompt():
    d = compute_active_dictionary(make_settings(["web_dev"], ["MyCustomTerm"]))
    prompt = build_initial_prompt(d)
    assert prompt.startswith("Technical dictation. Common terms: ")
    assert prompt.endswith(".")
    assert len(prompt) <= 1000
    assert prompt.index("MyCustomTerm") < prompt.index("TypeScript")


def test_initial_prompt_char_limit():
    d = ActiveDictionary(terms=[f"VeryLongTermNumber{i}" for i in range(200)])
    assert len(build_initial_prompt(d)) <= 1000


def test_longest_first_ordering():
    d = compute_active_dictionary(
        make_settings(corrections=[("E C", "EC"), ("E C two", "EC2")])
    )
    assert d.corrections[0].from_ == "E C two"
    assert d.corrections[1].from_ == "E C"


def test_empty_input():
    assert apply_corrections("", [JargonCorrection("test", "Test")]) == ""


def test_no_corrections():
    assert apply_corrections("Hello world", []) == "Hello world"


def test_case_insensitive_correction():
    result = apply_corrections(
        "I use Type Script and TYPE SCRIPT",
        [JargonCorrection("type script", "TypeScript")],
    )
    assert result == "I use TypeScript and TypeScript"


def test_multiple_corrections():
    result = apply_corrections(
        "I use type script with next js",
        [
            JargonCorrection("type script", "TypeScript"),
            JargonCorrection("next js", "Next.js"),
        ],
    )
    assert result == "I use TypeScript with Next.js"


def test_empty_dictionary_prompt():
    assert build_initial_prompt(ActiveDictionary()) == ""


def test_new_domain_profiles_present():
    p = builtin_profiles()
    for pid in ("coding", "business", "law_enforcement", "web_dev",
                "embedded", "data_science", "devops"):
        assert pid in p
