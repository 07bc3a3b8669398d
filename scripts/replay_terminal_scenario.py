#!/usr/bin/env python
"""Replay rolling-rewrite scenarios against a REAL terminal.

Analog of the reference's `scripts/run_terminal_rolling_scenarios.sh` +
`replay_terminal_scenario.expect` (SURVEY.md §4.3): where the reference
drives an interactive bash via expect and verifies the final typed line
from shell history, this drives bash through a pty and verifies the final
line as the shell's line discipline actually received it.

Mechanics: bash runs `IFS= read -r __line` so the tty's canonical mode
processes our keystrokes (erase = DEL) exactly as a terminal would for a
dictating user. Each hypothesis rewrite keeps the common prefix and sends
DEL for the rest, then types the new tail — the keystroke pattern the
rolling dictation mode produces. After the last hypothesis we press
Enter and have bash print base64 of the received line, which must equal
the final hypothesis byte-for-byte.

Usage: replay_terminal_scenario.py scenario.json [scenario2.json ...]
Exit 0 if every scenario's final line round-trips.
"""

import base64
import os
import pty
import select
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spittle_tpu.text.rolling import load_scenario, normalize_scenario  # noqa: E402

DEL = b"\x7f"
MARK = "__SPITTLE_B64__"


def _read_until(fd: int, token: bytes, timeout: float = 10.0) -> bytes:
    buf = b""
    deadline = time.monotonic() + timeout
    while token not in buf:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            raise TimeoutError(f"waiting for {token!r}; got {buf!r}")
        r, _, _ = select.select([fd], [], [], remaining)
        if not r:
            continue
        try:
            chunk = os.read(fd, 4096)
        except OSError:
            break
        if not chunk:
            break
        buf += chunk
    return buf


def _drain(fd: int, settle: float = 0.05) -> None:
    while True:
        r, _, _ = select.select([fd], [], [], settle)
        if not r:
            return
        try:
            if not os.read(fd, 4096):
                return
        except OSError:
            return


def replay_scenario_in_terminal(path: str) -> bool:
    scenario = normalize_scenario(load_scenario(path))
    if not scenario.hypotheses:
        print(f"{scenario.name}: SKIP (no hypotheses)")
        return True

    pid, fd = pty.fork()
    if pid == 0:  # child: a real interactive-ish bash on the pty
        os.execvp(
            "bash",
            [
                "bash", "--norc", "-c",
                # read one line through the tty line discipline, then emit
                # what actually arrived, base64-wrapped for safe parsing.
                'IFS= read -r __line; printf "%s%s%s\\n" "' + MARK + '" '
                '"$(printf %s "$__line" | base64 -w0)" "' + MARK + '"',
            ],
        )
        raise SystemExit(1)

    try:
        time.sleep(0.1)  # let read(1) take the tty
        typed = ""
        for hyp in scenario.hypotheses:
            # Rolling rewrite: erase back to the common prefix, type the tail.
            common = 0
            for a, b in zip(typed, hyp):
                if a != b:
                    break
                common += 1
            os.write(fd, DEL * (len(typed) - common))
            os.write(fd, hyp[common:].encode())
            typed = hyp
            _drain(fd)
        os.write(fd, b"\n")
        out = _read_until(fd, MARK.encode() + b"\r\n", timeout=10.0)
    finally:
        try:
            os.close(fd)
        except OSError:
            pass
        os.waitpid(pid, 0)

    text = out.decode(errors="replace")
    try:
        payload = text.split(MARK)[-2]
        received = base64.b64decode(payload).decode()
    except Exception:
        print(f"{scenario.name}: FAIL (no result marker in {text!r})")
        return False

    ok = received == scenario.hypotheses[-1]
    print(
        f"{scenario.name}: {'PASS' if ok else 'FAIL'}"
        + ("" if ok else f" (terminal got {received!r},"
                         f" expected {scenario.hypotheses[-1]!r})")
    )
    return ok


def main(argv):
    if not argv:
        print(__doc__)
        return 2
    ok = True
    for path in argv:
        ok &= replay_scenario_in_terminal(path)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
