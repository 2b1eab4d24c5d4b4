"""Prototype: production-scale two-basin lnPI(h, N_tot) pore surface.

Scales the toy 13x21 two-hill construction (tests/test_pore_pipeline.py)
to O(10^2) h values x O(10^2) N bins so the numpy class path costs real
compute per state (VERDICT r2 item 3).  Run on CPU.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

from fhmcanalysis_tpu.two_dim import free_energy_profile, joint_hist, pore_hist, pore_state_sweep


def big_joint(H=96, N=385):
    jh = joint_hist()
    # hill centers/widths scale with the surface; same two-basin geometry
    n1, n2 = 0.25 * (N - 1), 0.72 * (N - 1)
    h1, h2 = 0.25 * H, 0.7 * H
    wn = (0.12 * (N - 1)) ** 2  # n-direction gaussian width^2
    wh = (0.2 * H) ** 2
    g1_0 = np.exp(-(n1**2) / wn)
    g2_0 = np.exp(-(n2**2) / wn)
    for i in range(H):
        # ragged rows: max N grows with pore width like the toy
        nmax = min(int(0.55 * (N - 1)) + int(i * 0.5 * (N - 1) / H) * 1, N - 1)
        n = np.arange(0, nmax + 1, dtype=float)
        G1 = np.exp(-((n - n1) ** 2) / wn) - g1_0
        G2 = np.exp(-((n - n2) ** 2) / wn) - g2_0
        lnpi = 40.0 * np.exp(-((i - h1) ** 2) / wh) * G1 + 55.0 * np.exp(-((i - h2) ** 2) / wh) * G2
        jh.enter(float(i + 1), lnpi, n.astype(int), {"N_tot": n, "U": -0.5 * n})
    return jh


def main():
    H, N = 96, 385
    jh = big_joint(H, N)
    fh = free_energy_profile.polynomial([0.1, 0.0])
    S = 8
    ps = np.linspace(0.0, 0.02, S)
    betas = np.linspace(0.92, 1.08, S)[::-1].copy()

    # numpy class path per state: the denominator
    t0 = time.perf_counter()
    stats = []
    for s in range(S):
        ph = pore_hist(jh, fh.free_energy, float(ps[s]), 1.0, float(betas[s]), engine="numpy")
        try:
            props = ph.phase_average(nnebr=1, max_peaks=4)
            keys = sorted(k for k in props if isinstance(k, int))
            stats.append((len(keys), [round(props[k]["F.E./kT"], 3) for k in keys]))
        except Exception as e:
            stats.append(("FAIL", str(e)[:60]))
    t_np = (time.perf_counter() - t0) / S
    print("numpy per-state: %.3f s" % t_np)
    for s, st in enumerate(stats):
        print("  state", s, "p=%.3f beta=%.3f" % (ps[s], betas[s]), st)

    # device pipeline
    out = pore_state_sweep(jh, fh.free_energy, ps, betas, A=1.0, nnebr=1, max_peaks=4)
    print("ridge_ok:", np.asarray(out["ridge_ok"]).tolist())
    print("n_phases:", np.asarray(out["n_phases"]).tolist())
    # parity check
    names = list(out["prop_names"])
    worst = 0.0
    for s in range(S):
        if stats[s][0] == "FAIL":
            continue
        ph = pore_hist(jh, fh.free_energy, float(ps[s]), 1.0, float(betas[s]), engine="numpy")
        props = ph.phase_average(nnebr=1, max_peaks=4)
        keys = sorted(k for k in props if isinstance(k, int))
        for k in keys:
            worst = max(worst, abs(float(out["fe"][s, k]) - props[k]["F.E./kT"]))
            worst = max(worst, abs(float(out["ave"][s, k, names.index("N_tot")]) - props[k]["N_tot"]))
    print("parity worst:", worst)


if __name__ == "__main__":
    main()
