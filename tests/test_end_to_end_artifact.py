"""End-to-end parity against a reference-PRODUCED artifact.

The reference's unittest fixture test.nc is itself the output of patching
the test_sim window tree (offset=1, smooth=True) with the original Cython
pipeline.  Running our pipeline on the same inputs must reproduce it:

  - the moments tensor and both sub-histogram blocks are exact
  - lnPI matches up to (a) the overall normalization constant and (b) the
    reference's own Nelder-Mead shift tolerance: we use the closed-form
    least-squares shift (fhmc_patch.py:patch_window_pair), the reference
    fmins the same objective to ftol=1e-6 (fhmc_patch.pyx:668), leaving a
    ~3e-6 constant offset on the upper window's bins.

This is the strongest available oracle: a byte artifact produced by the
reference implementation itself (the Python-2 reference cannot be
executed here, SURVEY §7 hard-part 6).
"""

import numpy as np

import fhmcanalysis_tpu.win_patch.fhmc_patch as wP
from fhmcanalysis_tpu.io import read_composite

REF_NC = "/root/reference/unittests/reference/test.nc"
SRC = "/root/reference/unittests/reference/test_sim/"


def test_composite_reproduces_reference_artifact(tmp_path):
    ref = read_composite(REF_NC)

    seq = wP.get_patch_sequence(SRC)
    out_fn = str(tmp_path / "composite.nc")
    wP.patch_all_windows(seq, out_fn, str(tmp_path / "patch.log"), offset=1, smooth=True)
    out = read_composite(out_fn)

    # moments tensor: exact
    assert np.array_equal(ref["mom"], out["mom"])

    # particle-number and energy sub-histograms: exact
    for key in ("pk_hist", "e_hist"):
        for field in ("hist", "lb", "ub", "bw"):
            assert np.allclose(ref[key][field], out[key][field], rtol=0, atol=1e-12), (key, field)

    # metadata
    assert ref["volume"] == out["volume"]
    assert ref["nspec"] == out["nspec"]
    assert ref["max_order"] == out["max_order"]
    assert np.array_equal(ref["op"], out["op"])

    # lnPI: constant per window segment; inter-segment delta bounded by the
    # reference's fmin ftol
    d = ref["lnpi"] - out["lnpi"]
    low = d[:17]  # pure window-1 region
    high = d[21:]  # pure (shifted) window-2 region
    assert low.max() - low.min() < 1e-9
    assert high.max() - high.min() < 1e-9
    assert abs(high.mean() - low.mean()) < 1e-5  # reference fmin inaccuracy
