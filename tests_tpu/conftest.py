"""TPU-marked parity subset configuration (VERDICT r1 item 8).

Unlike tests/conftest.py this does NOT pin CPU — these tests exercise the
real chip at the 1e-8 production parity bar, catching TPU-specific numeric
regressions (the f32-exponent-range rule, emulated-f64 drift, Mosaic
lowering changes) outside bench.py.

The axon tunnel flaps, and a downed tunnel HANGS jax calls rather than
failing them — so availability is probed in a killable subprocess before
any in-process backend touch, and the whole directory skips cleanly when
the chip is unreachable.

Run: python -m pytest -m tpu tests_tpu/ -q   (from the repo root)
"""

import os
import subprocess
import sys

import pytest

_TPU_STATE = {}


def _tpu_reachable():
    if "ok" not in _TPU_STATE:
        try:
            # inherit the environment UNCHANGED: the preset
            # PYTHONPATH=/root/.axon_site is itself the axon plugin
            # registration — stripping or replacing it kills the backend
            # (the CLAUDE.md "never set PYTHONPATH" rule means never
            # OVERRIDE it; the preset value must survive)
            res = subprocess.run(
                [sys.executable, "-c", "import jax, jax.numpy as jnp; print(jnp.arange(8.0).sum())"],
                capture_output=True,
                timeout=600,
                text=True,
            )
            _TPU_STATE["ok"] = res.returncode == 0 and "28.0" in res.stdout
        except subprocess.TimeoutExpired:
            _TPU_STATE["ok"] = False
    return _TPU_STATE["ok"]


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Make a tunnel-down run distinguishable from a real pass (VERDICT
    r3 item 6): a green `pytest -m tpu` with every test skipped means
    NOTHING ran on chip.  Emits one machine-greppable JSON status line —
    the test-suite mirror of bench.py's tunnel_down flag."""
    skipped = len(terminalreporter.stats.get("skipped", []))
    passed = len(terminalreporter.stats.get("passed", []))
    failed = len(terminalreporter.stats.get("failed", []))
    status = {
        "tests_tpu_passed": passed,
        "tests_tpu_failed": failed,
        "tests_tpu_skipped": skipped,
        "tunnel_down": bool(skipped and not passed and not failed and not _TPU_STATE.get("ok", True)),
    }
    import json

    terminalreporter.write_line("TESTS_TPU_STATUS " + json.dumps(status))
    if status["tunnel_down"]:
        terminalreporter.write_line(
            "WARNING: every on-chip test skipped — TPU tunnel unreachable; this run verified NOTHING on chip"
        )


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if not _tpu_reachable():
        pytest.skip("TPU tunnel unreachable (probe hung or failed)", allow_module_level=False)
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend in this process")


@pytest.fixture(scope="session")
def test_nc():
    return "/root/reference/unittests/reference/test.nc"
