"""Measure the isopleth engine crossover: Pallas cell kernel vs batched
XLA grid, warm-vs-warm, at several grid sizes in ONE run (VERDICT r2
item 5 — cross-run tunnel congestion skews numbers 3-5x, so the curve
must come from a single session).

Run on the TPU (no env overrides):  python tools/iso_crossover.py
Writes one JSON line per (cells, engine) pair; paste the curve into
PERFORMANCE.md and set isopleth.make_grid's auto threshold from it.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from fhmcanalysis_tpu.histogram.ntot import histogram

FIXTURE = "/root/reference/unittests/reference/test.nc"


def force_done(iso):
    # scalar readback: block_until_ready is unreliable on axon
    return float(np.asarray(iso.data["Z"])[0, 0])


def main():
    from fhmcanalysis_tpu.binary.isopleth import isopleth

    srcs = [
        histogram(FIXTURE, 1.0, [5.0, 0.0], smooth=1),
        histogram(FIXTURE, 1.0, [5.0, 1.0], smooth=1),
    ]
    mu1_b, dmu2_b = (-9.0, -4.0), (-4.95, -4.05)
    # ~16k, ~48k, ~96k, ~256k cells via delta scaling
    deltas = [
        (0.04, 0.02),  # 126 x 46  = 5.8k
        (0.02, 0.01),  # 251 x 91  = 23k
        (0.01, 0.005),  # 501 x 182 = 91k
        (0.006, 0.003),  # 834 x 301 = 251k
    ]
    reps = 3
    for delta in deltas:
        row = {}
        for engine in ("xla", "pallas"):
            iso = isopleth(srcs, 1.02, order=1)
            t0 = time.perf_counter()
            iso.make_grid(mu1_b, dmu2_b, delta, engine=engine)
            force_done(iso)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(reps):
                iso.make_grid(mu1_b, dmu2_b, delta, engine=engine)
                force_done(iso)
            warm = (time.perf_counter() - t0) / reps
            cells = iso.data["X"].size
            row[engine] = cells / warm
            print(
                json.dumps(
                    {
                        "cells": int(cells),
                        "engine": engine,
                        "cells_per_sec": round(cells / warm, 1),
                        "warm_s": round(warm, 3),
                        "first_s": round(compile_s, 1),
                    }
                ),
                flush=True,
            )
        print(
            json.dumps({"cells": int(cells), "kernel_over_xla": round(row["pallas"] / row["xla"], 3)}),
            flush=True,
        )


if __name__ == "__main__":
    main()
