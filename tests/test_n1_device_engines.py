"""N_1 histograms through the device sweep engines (VERDICT r1 item 6).

The engines dispatch on the Hist pytree only, and reweight by h.op —
which IS the N_1 reweight rule (n1/gc_hist.pyx:70-78) when op = N_1.
These tests turn that structural argument into evidence: an n1 fixture
through the double-single lanes kernel and the XLA pipeline must agree
with each other and with the n1 class path at 1e-12 on CPU.
"""

import numpy as np
import pytest

import fhmcanalysis_tpu.histogram.n1 as oneDH
from fhmcanalysis_tpu.core import pipeline as P
from fhmcanalysis_tpu.core.pallas_sweep import mu_sweep_thermo_ds

from test_gc_n1 import BETA_REF, MU_REF, make_n1_fixture


@pytest.fixture(scope="module")
def n1_hist(tmp_path_factory):
    p = tmp_path_factory.mktemp("n1dev") / "n1_composite.nc"
    make_n1_fixture(p)
    h = oneDH.histogram(str(p), BETA_REF, MU_REF, 1)
    return h


def test_n1_sweep_kernel_vs_xla(n1_hist):
    """Lanes kernel == XLA pipeline on an n1 fixture: segmentation
    bitwise, fe/props at pair precision."""
    hh, meta = n1_hist._hist(), n1_hist._meta(max_phases=4)
    mus = np.linspace(0.4, 2.0, 48)
    got = mu_sweep_thermo_ds(hh, meta, mus, props=True, mode="xla")
    want = P.mu_sweep_thermo(hh, meta, mus, props=True, engine="xla")
    for k in ("valid", "mask", "n_phases", "left", "right"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), err_msg=k)
    msk = np.asarray(want["mask"])
    for k in ("fe", "ntot", "u", "density"):
        d = np.max(np.abs(np.where(msk, np.asarray(got[k]) - np.asarray(want[k]), 0.0)))
        assert d < 1e-10, (k, d)


def test_n1_sweep_vs_class_path(n1_hist):
    """Both engines == the n1 class path (reweight + thermo per mu)."""
    import copy

    hh, meta = n1_hist._hist(), n1_hist._meta(max_phases=4)
    mus = np.linspace(0.4, 2.0, 9)
    out = P.mu_sweep_thermo(hh, meta, mus, props=True, engine="xla")
    for i, mu in enumerate(mus):
        hc = copy.deepcopy(n1_hist)
        hc.reweight(float(mu))
        hc.thermo()
        nph = len(hc.data["thermo"])
        msk = np.asarray(out["mask"][i])
        assert msk.sum() == nph, "phase count mismatch at mu=%g" % mu
        fe_ref = np.array([hc.data["thermo"][p]["F.E./kT"] for p in range(nph)])
        n1_ref = np.array([hc.data["thermo"][p]["n1"] for p in range(nph)])
        np.testing.assert_allclose(np.asarray(out["fe"][i])[msk], fe_ref, rtol=0, atol=1e-12)
        # the sweep's "ntot" output is sum_i <N_i>; the n1 class reports
        # per-species n1 — compare against the n_i slot instead
        np.testing.assert_allclose(np.asarray(out["n_i"][i])[msk, 0], n1_ref, rtol=0, atol=1e-12)


def test_n1_janus_collect_engines_agree(n1_hist):
    """collect='janus' on an n1 fixture: kernel lanes == XLA pipeline.

    The n1 CLASS rejects collect (n1/gc_hist.pyx has no collect.py
    sibling; histogram/n1.py:104-108 mirrors that), but the generic
    device pipeline is class-agnostic — cross-engine consistency must
    still hold for users driving core.pipeline directly."""
    hh, meta = n1_hist._hist(), n1_hist._meta(max_phases=4)
    mus = np.linspace(0.4, 2.0, 24)
    got = mu_sweep_thermo_ds(hh, meta, mus, props=True, mode="xla", collect="janus")
    want = P.mu_sweep_thermo(hh, meta, mus, props=True, collect="janus", engine="xla")
    for k in ("valid", "mask", "n_phases"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), err_msg=k)
    msk = np.asarray(want["mask"])
    d = np.max(np.abs(np.where(msk, np.asarray(got["fe"]) - np.asarray(want["fe"]), 0.0)))
    assert d < 1e-10


def test_n1_mb_boundary(n1_hist):
    """The (mu, beta, dMu) extrapolating kernel is ntot-semantics (fixed
    dMu); the n1 engine extrapolates in ABSOLUTE mu (temp_mu_extrap,
    n1/gc_hist.pyx:691-1032) — the class boundary must stay explicit."""
    with pytest.raises(AttributeError, match="absolute mu"):
        n1_hist.temp_dmu_extrap(1.05, np.array([-5.0]), 1, 10.0, True, True, False)
