"""Batched sweep pipelines: parity vs the host path, vmap/shard behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import fhmcanalysis_tpu.histogram.ntot as oneDH
from fhmcanalysis_tpu.core import pipeline as P


@pytest.fixture
def hist(test_nc):
    return oneDH.histogram(test_nc, 1.0, [5.0, 0.0], 1)


def test_mu_sweep_matches_class_path(hist, test_nc):
    hh, meta = hist._hist(), hist._meta()
    mus = np.linspace(-2.0, 7.0, 64)
    out = P.mu_sweep_thermo(hh, meta, mus, props=True)
    for i in [0, 13, 31, 63]:
        hc = oneDH.histogram(test_nc, 1.0, [5.0, 0.0], 1)
        hc.reweight(float(mus[i]))
        hc.thermo()
        nph = len(hc.data["thermo"])
        msk = np.asarray(out["mask"][i])
        assert msk.sum() == nph
        fe_ref = np.array([hc.data["thermo"][p]["F.E./kT"] for p in range(nph)])
        nt_ref = np.array([hc.data["thermo"][p]["ntot"] for p in range(nph)])
        u_ref = np.array([hc.data["thermo"][p]["u"] for p in range(nph)])
        x1_ref = np.array([hc.data["thermo"][p]["x1"] for p in range(nph)])
        assert np.allclose(np.asarray(out["fe"][i])[msk], fe_ref, rtol=0, atol=1e-10)
        assert np.allclose(np.asarray(out["ntot"][i])[msk], nt_ref, rtol=0, atol=1e-10)
        assert np.allclose(np.asarray(out["u"][i])[msk], u_ref, rtol=0, atol=1e-10)
        assert np.allclose(np.asarray(out["x_i"][i])[msk][:, 0], x1_ref, rtol=0, atol=1e-10)


def test_mu_beta_sweep_matches_class_path(hist, test_nc):
    hh, meta = hist._hist(), hist._meta()
    mus = np.array([3.0, 5.0])
    betas = np.array([1.05, 0.95])
    dmus = np.array([[-4.5], [-5.5]])
    out = P.mu_beta_sweep_thermo(hh, meta, mus, betas, dmus, order=1, props=True)
    for i, mu in enumerate(mus):
        for a in range(2):
            hc = oneDH.histogram(test_nc, 1.0, [5.0, 0.0], 1)
            hc.reweight(float(mu))
            hc2 = hc.temp_dmu_extrap(float(betas[a]), dmus[a], 1, 10.0, True, True, False)
            hc2.thermo()
            nph = len(hc2.data["thermo"])
            msk = np.asarray(out["mask"][i, a])
            assert msk.sum() == nph
            fe_ref = np.array([hc2.data["thermo"][p]["F.E./kT"] for p in range(nph)])
            assert np.allclose(np.asarray(out["fe"][i, a])[msk], fe_ref, rtol=0, atol=1e-9)


def test_most_stable_phase():
    fe = jnp.array([[1.0, -2.0, 0.0], [5.0, 3.0, -1.0]])
    mask = jnp.array([[True, True, False], [True, False, False]])
    idx = P.most_stable_phase(fe, mask)
    assert list(np.asarray(idx)) == [1, 0]


def test_sharded_sweep_matches_single_device(hist):
    from fhmcanalysis_tpu.parallel import grid_mesh, sharded_mu_beta_sweep

    hh, meta = hist._hist(), hist._meta()
    n = min(8, len(jax.devices()))
    mesh = grid_mesh(n)
    M, A = 8, 4
    mus = np.linspace(4.0, 6.0, M)
    betas = np.linspace(0.95, 1.05, A)
    dmus = np.tile([[-5.0]], (A, 1))

    out_sharded, fe_min = sharded_mu_beta_sweep(mesh, hh, meta, mus, betas, dmus, order=1, props=True)
    out_single = P.mu_beta_sweep_thermo(hh, meta, mus, betas, dmus, order=1, props=True)

    assert np.allclose(np.asarray(out_sharded["fe"]), np.asarray(out_single["fe"]), equal_nan=True)
    fe_valid = np.where(np.asarray(out_single["mask"]), np.asarray(out_single["fe"]), np.inf)
    assert np.isclose(float(fe_min), fe_valid.min())


def test_shard_map_sweep_matches(hist):
    """Explicit-collective shard_map sweep == single-device sweep."""
    from fhmcanalysis_tpu.parallel import grid_mesh, shard_map_mu_sweep

    hh, meta = hist._hist(), hist._meta()
    n = min(8, len(jax.devices()))
    mesh = grid_mesh(n)
    total = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    mus = np.linspace(-2.0, 7.0, total * 8)

    out, fe_min = shard_map_mu_sweep(mesh, hh, meta, mus, props=True)
    ref = P.mu_sweep_thermo(hh, meta, mus, props=True)
    assert np.allclose(np.asarray(out["fe"]), np.asarray(ref["fe"]))
    assert np.allclose(np.asarray(out["ntot"]), np.asarray(ref["ntot"]))
    fe_valid = np.where(np.asarray(ref["mask"]), np.asarray(ref["fe"]), np.inf)
    assert np.isclose(float(fe_min), fe_valid.min())

    with pytest.raises(ValueError):
        shard_map_mu_sweep(mesh, hh, meta, np.linspace(0, 1, total * 8 + 1))


def test_mu_sweep_with_n1_engine(tmp_path_factory):
    """The batched sweep works for the N_1 order parameter too: op drives
    the reweight shift, segmentation/props are op-agnostic."""
    import sys

    sys.path.insert(0, "tests")
    from test_gc_n1 import make_n1_fixture

    import fhmcanalysis_tpu.histogram.n1 as n1H

    p = tmp_path_factory.mktemp("n1sweep") / "n1.nc"
    make_n1_fixture(p)
    h = n1H.histogram(str(p), 1.0, [1.2, -0.4], 1)
    hh, meta = h._hist(), h._meta()

    mus = np.linspace(0.5, 2.0, 16)
    out = P.mu_sweep_thermo(hh, meta, mus, props=True)
    for i in [0, 7, 15]:
        hc = n1H.histogram(str(p), 1.0, [1.2, -0.4], 1)
        hc.reweight(float(mus[i]))
        hc.thermo()
        nph = len(hc.data["thermo"])
        msk = np.asarray(out["mask"][i])
        assert msk.sum() == nph
        fe_ref = np.array([hc.data["thermo"][q]["F.E./kT"] for q in range(nph)])
        assert np.allclose(np.asarray(out["fe"][i])[msk], fe_ref, atol=1e-10)


def test_pipeline_nan_free_under_debug_nans(hist):
    """SURVEY §5: keep the logsumexp discipline so no NaNs occur by
    construction; jax.debug_nans would raise on any intermediate NaN."""
    hh, meta = hist._hist(), hist._meta()
    with jax.debug_nans(True):
        out = P.mu_sweep_thermo(hh, meta, np.linspace(-2.0, 7.0, 8), props=True)
        jax.block_until_ready(out)


def test_thermo_core_props_matches_full_tensor(hist):
    """The fused key-row props path (segment.thermo_core_props) must agree
    exactly with phase_props(thermo_core(props=True)) — same contraction,
    just restricted to the <N_i>/<U> rows the sweep outputs consume."""
    from fhmcanalysis_tpu.core import ops
    from fhmcanalysis_tpu.core import segment as S

    hh, meta = hist._hist(), hist._meta()
    for mu in [-2.0, 1.5, 4.0, 7.0]:
        hr = ops.reweight(hh, mu)
        lnpi = hr.lnpi - jax.scipy.special.logsumexp(hr.lnpi)
        pt_full = S.thermo_core(lnpi, hr.mom, meta, props=True)
        ref = S.phase_props(pt_full, hr.volume)
        pt_key, got = S.thermo_core_props(lnpi, hr.mom, meta, hr.volume)
        for k in ref:
            assert np.array_equal(np.asarray(ref[k]), np.asarray(got[k])), (mu, k)
        for f in ("fe", "left", "right", "mask", "n_phases", "valid"):
            assert np.array_equal(np.asarray(getattr(pt_full, f)), np.asarray(getattr(pt_key, f))), (mu, f)


def test_temp_dmu_extrap_key_matches_full(hist):
    """temp_dmu_extrap_key must equal the key rows of the full-tensor
    extrapolation (same Taylor series, restricted apply)."""
    from fhmcanalysis_tpu.core import extrap as E
    from fhmcanalysis_tpu.core import ops, segment as S

    hh, meta = hist._hist(), hist._meta()
    hh = ops.reweight(hh, 3.5)
    kra = S.key_row_addresses(meta)
    n = hh.lnpi.shape[-1]
    for order, fom in [(1, False), (2, True), (2, False)]:
        full = E.temp_dmu_extrap(hh, meta, 1.07, jnp.array([-4.7]), order=order, first_order_mom=fom)
        key_full = np.asarray(full.mom).reshape(meta.n_addr, n)[kra]
        lnpi_k, key = E.temp_dmu_extrap_key(hh, meta, 1.07, jnp.array([-4.7]), order=order, first_order_mom=fom)
        assert np.allclose(np.asarray(key), key_full, rtol=0, atol=1e-12), (order, fom)
        # lnpi is returned unnormalized; must match up to the normalization constant
        d = np.asarray(full.lnpi) - np.asarray(lnpi_k)
        assert d.max() - d.min() < 1e-12, (order, fom)


def test_max_phases_padding_invariance(hist):
    """Results must not depend on the padding width while phase counts
    fit: bench.py relies on this to run with max_phases=4."""
    hh = hist._hist()
    mus = np.linspace(-2.0, 7.0, 128)
    a = P.mu_sweep_thermo(hh, hist._meta(max_phases=8), mus, props=True)
    b = P.mu_sweep_thermo(hh, hist._meta(max_phases=4), mus, props=True)
    assert bool(np.asarray(b["valid"]).all())
    assert np.array_equal(np.asarray(a["n_phases"]), np.asarray(b["n_phases"]))
    for k in ("fe", "ntot", "u"):
        am = np.where(np.asarray(a["mask"][:, :4]), np.asarray(a[k][:, :4]), 0.0)
        bm = np.where(np.asarray(b["mask"]), np.asarray(b[k]), 0.0)
        assert np.array_equal(am, bm), k


class TestDeviceCollect:
    """Device-side collect hooks (segment.COLLECT_TRANSFORMS) vs the host
    thermo(collect=janus_collect) loop — VERDICT r1 item 5: collect must be
    available everywhere thermo is (gc_hist.pyx:484-486, 2612)."""

    def _host_sweep(self, test_nc, lnpi, mom, mus):
        from fhmcanalysis_tpu.histogram.collect import janus_collect

        rows = []
        for mu in mus:
            hc = oneDH.histogram(test_nc, 1.0, [5.0, 0.0], 1)
            hc.data["ln(PI)"] = lnpi.copy()
            hc.data["mom"] = mom.copy()
            hc.reweight(float(mu))
            try:
                hc.thermo(collect=janus_collect)
                rows.append(hc.data["thermo"])
            except Exception:
                rows.append(None)
        return rows

    def _surfaces(self, n):
        x = np.linspace(0.0, 1.0, n)
        # three peaks, big one last (janus target shape)
        tri = (
            5 * np.exp(-((x - 0.15) ** 2) / 0.004)
            + 4 * np.exp(-((x - 0.45) ** 2) / 0.003)
            + 12 * np.exp(-((x - 0.8) ** 2) / 0.006)
        )
        # four peaks
        quad = sum(
            a * np.exp(-((x - c) ** 2) / w)
            for c, w, a in [(0.1, 0.002, 6), (0.35, 0.002, 5), (0.6, 0.002, 7), (0.85, 0.003, 14)]
        )
        # big first (the merged mean index lands before the last peak)
        rev = (
            15 * np.exp(-((x - 0.2) ** 2) / 0.006)
            + 4 * np.exp(-((x - 0.55) ** 2) / 0.002)
            + 5 * np.exp(-((x - 0.85) ** 2) / 0.003)
        )
        # two peaks only: collect must be a no-op (collect.py:49-50)
        two = 8 * np.exp(-((x - 0.3) ** 2) / 0.005) + 9 * np.exp(-((x - 0.75) ** 2) / 0.005)
        # near-degenerate last peak: coexistence reachable under collect
        tri2 = (
            9 * np.exp(-((x - 0.15) ** 2) / 0.004)
            + 8 * np.exp(-((x - 0.45) ** 2) / 0.003)
            + 10 * np.exp(-((x - 0.8) ** 2) / 0.006)
        )
        return {"tri": tri, "quad": quad, "rev": rev, "two": two, "tri2": tri2}

    @pytest.mark.parametrize("shape", ["tri", "quad", "rev", "two"])
    def test_mu_sweep_collect_matches_host(self, hist, test_nc, shape):
        hh, meta = hist._hist(), hist._meta()
        n = hh.lnpi.shape[-1]
        lnpi = self._surfaces(n)[shape]
        mom = np.asarray(hist.data["mom"], dtype=float)
        h2 = hh.replace(lnpi=jnp.asarray(lnpi))
        mus = np.linspace(4.85, 5.15, 13)  # small tilts keep 3+ peaks alive
        out = P.mu_sweep_thermo(h2, meta, mus, props=True, collect="janus")
        host = self._host_sweep(test_nc, lnpi, mom, mus)
        checked = 0
        for i, row in enumerate(host):
            if row is None:
                continue
            msk = np.asarray(out["mask"][i])
            if not np.asarray(out["valid"][i]):
                continue
            assert msk.sum() == len(row), (shape, i)
            fe_ref = np.array([row[p]["F.E./kT"] for p in range(len(row))])
            b_ref = np.array([row[p]["bound_idx"] for p in range(len(row))])
            np.testing.assert_allclose(np.asarray(out["fe"][i])[msk], fe_ref, rtol=0, atol=1e-10)
            np.testing.assert_array_equal(np.asarray(out["left"][i])[msk], b_ref[:, 0])
            np.testing.assert_array_equal(np.asarray(out["right"][i])[msk], b_ref[:, 1])
            nt_ref = np.array([row[p]["ntot"] for p in range(len(row))])
            np.testing.assert_allclose(np.asarray(out["ntot"][i])[msk], nt_ref, rtol=0, atol=1e-10)
            checked += 1
        # the host path is reference-faithful and CRASHES (IndexError in
        # the min_ctr walk, gc_hist.pyx:498-520) on some strongly-tilted
        # surfaces where the device path reports masked output instead;
        # demand agreement on the points the host can actually do
        assert checked >= len(mus) // 2, "host path rejected almost every point"

    def test_collect_none_unchanged(self, hist):
        """collect=None stays bitwise identical to the pre-hook pipeline."""
        hh, meta = hist._hist(), hist._meta()
        mus = np.linspace(-2.0, 7.0, 32)
        a = P.mu_sweep_thermo(hh, meta, mus, props=True)
        b = P.mu_sweep_thermo(hh, meta, mus, props=True, collect=None)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def test_find_phase_eq_collect(self, hist):
        """Device solver accepts collect; on a janus surface it equates
        the merged micellar phase with the liquid peak."""
        from fhmcanalysis_tpu.core import solve as S

        hh, meta = hist._hist(), hist._meta()
        n = hh.lnpi.shape[-1]
        lnpi = self._surfaces(n)["tri2"]
        h2 = hh.replace(lnpi=jnp.asarray(lnpi))
        out, mu_star, err, conv = S.find_phase_eq_state(h2, meta, 1e-6, 5.0, collect="janus")
        assert bool(conv)
        _, pt = __import__("fhmcanalysis_tpu.core.segment", fromlist=["thermo"]).thermo(
            out, meta, props=False, collect="janus"
        )
        fe = np.asarray(pt.fe)[np.asarray(pt.mask)]
        assert len(fe) == 2
        assert abs(fe[0] - fe[1]) < 1e-5


class TestSegF32:
    """Opt-in f32 segmentation decisions (VERDICT r1 item 10): identical
    results away from f32-eps ties, full-precision integration either way."""

    def test_fixture_sweep_identical(self, hist):
        hh, meta = hist._hist(), hist._meta()
        mus = np.linspace(-2.0, 7.0, 256)
        a = P.mu_sweep_thermo(hh, meta, mus, props=True)
        b = P.mu_sweep_thermo(hh, meta, mus, props=True, seg_f32=True)
        for k in ("valid", "mask", "n_phases", "left", "right"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        msk = np.asarray(a["mask"])
        for k in ("fe", "ntot", "u"):
            # identical bounds -> identical f64 integrals, bitwise
            np.testing.assert_array_equal(
                np.where(msk, np.asarray(a[k]), 0.0), np.where(msk, np.asarray(b[k]), 0.0)
            )

    def test_random_surfaces_mostly_identical(self, hist, rng):
        """Randomized smooth surfaces: decisions agree except within f32
        eps of ties (none are expected in a continuous random draw)."""
        hh, meta = hist._hist(), hist._meta()
        n = hh.lnpi.shape[-1]
        x = np.linspace(0, 1, n)
        mus = np.linspace(4.9, 5.1, 16)
        for _ in range(5):
            y = sum(
                a * np.exp(-((x - c) ** 2) / w)
                for c, w, a in zip(rng.random(3), 0.003 + 0.01 * rng.random(3), 5 + 20 * rng.random(3))
            )
            h2 = hh.replace(lnpi=jnp.asarray(y))
            a = P.mu_sweep_thermo(h2, meta, mus, props=False)
            b = P.mu_sweep_thermo(h2, meta, mus, props=False, seg_f32=True)
            for k in ("valid", "mask", "left", "right"):
                np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


class TestDeepSubdominantPhase:
    def test_xla_engine_keeps_deep_phases_finite(self, hist):
        """A phase >750 log units below the dominant one must keep a
        finite F.E. and true props through the XLA engine (regression:
        the previous single-global-shift integration underflowed it to
        fe=inf/props=0 in native f64 — and already at ~88 log units on
        TPU-emulated f64 — while the reference's per-phase spec_exp
        logsumexp, the numpy class path, and the Pallas kernel all keep
        the exact finite answer; bitten by the N=573 production
        composite, bench n573 gate 2026-08-17)."""
        hh, meta = hist._hist(), hist._meta(max_phases=4)
        n = hh.lnpi.shape[-1]
        x = np.arange(n, dtype=float)
        # two sharp peaks, the second 800 log units below the first
        y = np.where(x < n // 2, 10.0 - 4.0 * np.abs(x - 7.0), -800.0 + 10.0 - 4.0 * np.abs(x - 23.0))
        h2 = hh.replace(lnpi=jnp.asarray(y))
        out = P.mu_sweep_thermo(h2, meta, np.array([hh.curr_mu[0]]), props=True, engine="xla")
        msk = np.asarray(out["mask"][0])
        assert msk.sum() == 2
        fe = np.asarray(out["fe"][0])[msk]
        assert np.isfinite(fe).all(), fe
        # class-path oracle (numpy, per-phase shifted)
        hist.data["ln(PI)"] = y.copy()
        hist.thermo()
        fe_ref = np.array([hist.data["thermo"][p]["F.E./kT"] for p in range(2)])
        nt_ref = np.array([hist.data["thermo"][p]["ntot"] for p in range(2)])
        np.testing.assert_allclose(fe, fe_ref, rtol=0, atol=1e-10)
        # props: the class path now per-phase max-shifts its probability
        # weights (the reference, gc_hist.pyx:534-541, uses globally-
        # normalized probabilities and reads 0/0 = nan for this phase —
        # an unrunnable-upstream deviation called out in ntot.thermo), so
        # both paths give the exact answer (peak centered on bin 23)
        nt = np.asarray(out["ntot"][0])[msk]
        np.testing.assert_allclose(nt, nt_ref, rtol=0, atol=1e-10)
        assert np.isfinite(nt_ref).all(), nt_ref
        np.testing.assert_allclose(nt[1], 23.0, rtol=0, atol=1e-9)


class TestXlaChunkGuards:
    """The HBM chunk guards must be transparent: chunked == unchunked
    elementwise (triggered in production only above 96M [B,N] elements —
    the N=573/B=262k compile-time OOM; forced small here)."""

    def test_sweep_chunked_matches(self, hist, monkeypatch):
        hh, meta = hist._hist(), hist._meta(max_phases=4)
        mus = np.linspace(4.0, 6.0, 10000)
        want = P.mu_sweep_thermo(hh, meta, mus, engine="xla")
        monkeypatch.setattr(P, "_XLA_CHUNK_TRIGGER", 1000)
        monkeypatch.setattr(P, "_XLA_CHUNK_TARGET", 31 * 4096 * 2)
        got = P.mu_sweep_thermo(hh, meta, mus, engine="xla")
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), err_msg=k)

    def test_mb_chunked_matches(self, hist, monkeypatch):
        hh, meta = hist._hist(), hist._meta(max_phases=4)
        mus = np.linspace(4.5, 5.5, 24)
        betas = np.linspace(0.97, 1.03, 4)
        dmus = np.full((4, 1), -5.0)
        want = P.mu_beta_sweep_thermo(hh, meta, mus, betas, dmus, order=1, engine="xla")
        monkeypatch.setattr(P, "_XLA_CHUNK_TRIGGER", 10)
        got = P.mu_beta_sweep_thermo(hh, meta, mus, betas, dmus, order=1, engine="xla")
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), err_msg=k)
