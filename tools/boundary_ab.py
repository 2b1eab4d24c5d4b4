"""On-chip A/B: boundary_pair_integrals segment-op vs one-hot engine.

The engine constant is read at trace time, so each arm runs in a fresh
subprocess (the jit cache would otherwise pin the first engine).

Run on the TPU: python tools/boundary_ab.py          (drives both arms)
               python tools/boundary_ab.py --arm X  (internal)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def _arm(engine):
    import numpy as np

    from fhmcanalysis_tpu.core import segment2d

    segment2d.BOUNDARY_SEGMENT_ENGINE = engine

    sys.path.insert(0, "/root/repo")
    import bench
    from fhmcanalysis_tpu.two_dim import free_energy_profile, pore_state_sweep

    jh = bench._pore_joint_prod(96, 385)
    jh.make()  # pre-assemble: the sweep uses made hists read-only, so the
    # per-call copy+make overhead does not dilute the engine delta
    fh = free_energy_profile.polynomial([0.1, 0.0])
    S = 64
    ps, betas = bench._pore_states_prod(S)
    f = lambda: pore_state_sweep(jh, fh.free_energy, ps, betas, A=1.0, nnebr=1, max_peaks=4)  # noqa: E731
    out = f()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(3):
        out = f()
    secs = (time.perf_counter() - t0) / 3
    assert bool(np.asarray(out["ridge_ok"]).all())
    print(json.dumps({"engine": engine, "states_per_sec": round(S / secs, 2), "warm_s": round(secs, 4)}))


def main():
    for engine in ("segment", "onehot"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", engine],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-1500:])


if __name__ == "__main__":
    if "--arm" in sys.argv:
        _arm(sys.argv[sys.argv.index("--arm") + 1])
    else:
        main()
