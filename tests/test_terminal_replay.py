"""Real-terminal rolling replay (scripts/replay_terminal_scenario.py).

Counterpart of the reference's expect-driven terminal scenarios: bash on
a pty receives the rolling rewrite keystrokes (DEL + retype) through the
tty line discipline and must end up with the final hypothesis."""

import glob
import os
import shutil
import subprocess
import sys

import pytest

SCRIPT = os.path.join(
    os.path.dirname(__file__), "..", "scripts", "replay_terminal_scenario.py"
)
SCENARIOS = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "data",
                           "rolling_scenarios", "*.json"))
)

pytestmark = pytest.mark.skipif(
    shutil.which("bash") is None or not hasattr(os, "fork"),
    reason="needs bash and a unixy pty",
)


def test_scenarios_exist():
    assert len(SCENARIOS) >= 4


@pytest.mark.parametrize("path", SCENARIOS, ids=os.path.basename)
def test_terminal_replay(path):
    proc = subprocess.run(
        [sys.executable, SCRIPT, path], capture_output=True, text=True,
        timeout=60,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS" in proc.stdout
