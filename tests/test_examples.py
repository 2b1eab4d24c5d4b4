"""Smoke-run every example script (VERDICT r1 item 7: the reference's
notebooks are its de-facto documentation; our ports are asserted scripts,
so running them IS a regression test of the high-level API)."""

import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


@pytest.mark.parametrize(
    "script",
    [
        "square_well_phase_diagram.py",
        "square_well_notebook.py",
        "binary_isopleth.py",
        "multivariable_extrapolation.py",
        "combining_simulations.py",
        "mutual_diffusion.py",
        "joint_binary_surface.py",
    ],
)
def test_example_runs(script):
    # fresh interpreter pinned to CPU (examples self-locate the package;
    # PYTHONPATH must stay unset for axon compatibility)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy; runpy.run_path(%r, run_name='__main__')" % os.path.join(EXAMPLES, script)
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=EXAMPLES,
    )
    assert res.returncode == 0, "%s failed:\n%s\n%s" % (script, res.stdout[-2000:], res.stderr[-2000:])
