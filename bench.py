"""Headline benchmark: (beta, mu) reweight + thermo state points/sec.

BASELINE.md north star: 1e6 state points/sec on one TPU v5e chip with
lnPI/thermo parity <= 1e-8 vs the host reference path.

Runs the fully batched device pipeline (core.pipeline.mu_sweep_thermo):
reweight -> normalize -> masked segmentation -> per-phase free energies +
moment-averaged properties, one fused launch per chunk.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import signal
import sys
import time

import numpy as np

import jax


def _watchdog(seconds=540):
    """Fail fast with a JSON error line instead of hanging forever when
    the TPU tunnel is unresponsive (it flaps in this environment)."""

    def handler(signum, frame):
        print(json.dumps({"metric": "bench_timeout", "value": 0.0, "unit": "points/s", "vs_baseline": 0.0}))
        sys.stdout.flush()
        import os

        os._exit(2)

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)

import fhmcanalysis_tpu  # noqa: F401  (enables x64)
from fhmcanalysis_tpu.core import pipeline as P
from fhmcanalysis_tpu.histogram.ntot import histogram

FIXTURE = "/root/reference/unittests/reference/test.nc"
TARGET = 1.0e6  # points/sec north star (BASELINE.md)


def main():
    _watchdog()
    h = histogram(FIXTURE, 1.0, [5.0, 0.0], smooth=1)
    # max_phases=4 padding: this workload has <= 2 phases everywhere and
    # every [B, P, N] tensor scales with the padding; the validity flag
    # guards against overflow (points needing more phases would read
    # valid=False and trip the parity gate's phase-count assert).
    hh, meta = h._hist(), h._meta(max_phases=4)

    # Large batch amortizes the fixed per-call RPC latency of the tunnel
    # (~26 ms round trip regardless of payload; measured 2026-08-16).
    # B=2M is the sweet spot after the gather-free segmentation rewrite
    # (11.1M pts/s; 4M exceeds the 16G HBM).
    B = 2_097_152
    mu_lo, mu_hi = -2.0, 7.0

    sweep = lambda mus: P.mu_sweep_thermo(hh, meta, mus, props=True)  # noqa: E731

    # warmup / compile
    mus0 = jax.numpy.linspace(mu_lo, mu_hi, B)
    out = sweep(mus0)
    jax.block_until_ready(out)

    # every point must fit the max_phases=4 padding (valid=False would
    # mean garbage fe/mask for that point — fail loudly, not just at the
    # 8 spot-checked indices)
    assert bool(np.asarray(out["valid"]).all()), "padding overflow: some points need more than max_phases phases"

    # parity spot-check vs the host reference path (<= 1e-8 bar)
    idxs = np.linspace(0, B - 1, 8).astype(int)
    mus_np = np.asarray(mus0)
    worst = 0.0
    for i in idxs:
        hc = histogram(FIXTURE, 1.0, [5.0, 0.0], smooth=1)
        hc.reweight(float(mus_np[i]))
        hc.thermo()
        nph = len(hc.data["thermo"])
        msk = np.asarray(out["mask"][i])
        assert msk.sum() == nph, "phase count mismatch at mu=%g" % mus_np[i]
        fe_ref = np.array([hc.data["thermo"][p]["F.E./kT"] for p in range(nph)])
        fe_dev = np.asarray(out["fe"][i])[msk]
        nt_ref = np.array([hc.data["thermo"][p]["ntot"] for p in range(nph)])
        nt_dev = np.asarray(out["ntot"][i])[msk]
        worst = max(worst, np.max(np.abs(fe_dev - fe_ref)), np.max(np.abs(nt_dev - nt_ref)))
    if worst > 1e-8:
        print(json.dumps({"metric": "parity_failure", "value": worst, "unit": "abs", "vs_baseline": 0.0}))
        sys.exit(1)

    # steady-state timing over fresh grids.  NB: on the axon platform
    # jax.block_until_ready does not reliably block, so force completion by
    # reading back a scalar from each launch.
    n_rep = 8
    grids = [jax.numpy.linspace(mu_lo + 0.001 * k, mu_hi, B) for k in range(n_rep)]
    _ = [float(g[0]) for g in grids]
    _ = float(sweep(grids[0])["fe"][0, 0])  # sync point
    t0 = time.perf_counter()
    acc = 0.0
    for g in grids:
        o = sweep(g)
        acc += float(o["fe"][0, 0])
    dt = time.perf_counter() - t0

    pts_per_sec = n_rep * B / dt
    print(
        json.dumps(
            {
                "metric": "reweight_thermo_points_per_sec",
                "value": round(pts_per_sec, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_sec / TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
