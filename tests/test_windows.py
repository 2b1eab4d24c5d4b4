"""Window-bound generators (win_patch/windows.py parity: windows.py:10-76)."""

import numpy as np
import pytest

from fhmcanalysis_tpu.win_patch.windows import n1_window_scaling, ntot_window_scaling


class TestN1WindowScaling:
    def test_bounds_invariants(self):
        n_f, w_max, n_ov = 100, 5, 4
        b = n1_window_scaling(n_f, w_max, n_ov)
        # w_max equal-width windows plus the trailing remainder window
        assert len(b) == w_max + 1
        assert b[0][0] == 0
        assert b[-1][1] == n_f
        dw = int(round((n_f + (w_max - 1) * n_ov) / float(w_max)))
        for lb, ub in b[:-1]:
            assert ub - lb == dw
        # consecutive windows share exactly the prescribed overlap
        for (lb0, ub0), (lb1, ub1) in zip(b, b[1:]):
            assert ub0 - lb1 == n_ov
            assert lb1 > lb0

    def test_rejects_excessive_overlap(self):
        with pytest.raises(AssertionError):
            n1_window_scaling(20, 10, 4)  # dw=5, n_ov >= dw/2


class TestNtotWindowScaling:
    def test_reference_example(self):
        # the reference module's own example: ntot_window_scaling(800, 25, 20, 5)
        b = ntot_window_scaling(800, 25, 20, 5)
        assert len(b) == 20
        assert b[0][0] == 0
        assert b[-1][1] == 800
        # final window has the requested width after the overlap correction
        assert b[-1][1] - b[-2][1] == 25 - 5
        # widths increase toward low N (power-law alpha < 1 front-loads bins)
        widths = [ub - lb for lb, ub in b]
        assert widths[0] > widths[-1]

    def test_overlap_and_monotonicity(self):
        n_ov = 3
        b = ntot_window_scaling(200, 15, 8, n_ov)
        ubs = [ub for _, ub in b]
        assert ubs == sorted(ubs)
        for (lb0, ub0), (lb1, ub1) in zip(b, b[1:]):
            # lb_{i+1} = ub_i - n_ov + 1 -> overlap of exactly n_ov points
            assert ub0 - lb1 + 1 == n_ov

    def test_rejects_large_overlap(self):
        with pytest.raises(AssertionError):
            ntot_window_scaling(200, 15, 4, 10)
