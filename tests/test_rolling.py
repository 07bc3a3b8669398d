"""Rolling harness tests + scenario JSON replays (reference:
rolling_harness.rs tests and tests/rolling_scenarios/)."""

import glob
import os

import pytest

from spittle_tpu.text.rolling import (
    Perfect,
    ReplayScenario,
    UnderDeletePerRewrite,
    load_scenario,
    normalize_hypothesis,
    normalize_scenario,
    replay_hypotheses,
    run_scenario_file,
)

SCENARIOS = os.path.join(os.path.dirname(__file__), "data", "rolling_scenarios")


def test_normalizes_scenario_hypotheses():
    s = normalize_scenario(
        ReplayScenario("spacing", [" All   right . ", "Alright , let's see"])
    )
    assert s.hypotheses == ["All right.", "Alright, let's see"]


def test_perfect_replay_matches_last_hypothesis():
    hyps = [
        "All right.",
        "Alright, let's see if that's doing any better.",
        "Alright, let's see if that's doing any better. Nope.",
    ]
    assert replay_hypotheses(hyps, Perfect()).matches_expected


def test_under_delete_detects_prefix_drift():
    hyps = [
        "All right.",
        "Alright, let's see if that's doing any better.",
        "Alright, let's see if that's doing any better. Nope.",
    ]
    report = replay_hypotheses(hyps, UnderDeletePerRewrite(1))
    assert not report.matches_expected
    assert report.final_actual.startswith("A")
    assert len(report.final_actual) > len(report.final_expected)


def test_regression_alright_prefix_case():
    s = normalize_scenario(ReplayScenario("alright", [
        "All right.",
        "Alright, let's see if that's doing any better.",
        "Alright, let's see if that's doing any better. Nope.",
        "Alright, let's see if that's doing any better. Nope, it's still "
        "leaving one to two characters per rewrite.",
    ]))
    assert replay_hypotheses(s.hypotheses, Perfect()).matches_expected
    assert not replay_hypotheses(
        s.hypotheses, UnderDeletePerRewrite(1)
    ).matches_expected


def test_regression_okay_prefix_case():
    s = normalize_scenario(ReplayScenario("okay", [
        "Okay.",
        "Okay, let's see if this is working.",
        "Okay, let's see if this is working. It's adding unnecessary commas "
        "and maybe extra spaces as well.",
    ]))
    assert replay_hypotheses(s.hypotheses, Perfect()).matches_expected
    assert not replay_hypotheses(
        s.hypotheses, UnderDeletePerRewrite(2)
    ).matches_expected


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(SCENARIOS, "*.json")))
)
def test_reference_scenarios_replay(path):
    scenario = normalize_scenario(load_scenario(path))
    assert scenario.hypotheses
    perfect = replay_hypotheses(scenario.hypotheses, Perfect())
    assert perfect.matches_expected
    lines = run_scenario_file(path)
    assert any("PASS" in line for line in lines)
