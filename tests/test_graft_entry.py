"""Multichip dry-run path (the driver runs this with virtual devices)."""

import jax
import pytest


def test_dryrun_multichip_8():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    n = min(8, len(jax.devices()))
    mod.dryrun_multichip(n)


def test_dryrun_multichip_odd():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__2",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if len(jax.devices()) >= 1:
        mod.dryrun_multichip(1)  # tp=1 fallback path
