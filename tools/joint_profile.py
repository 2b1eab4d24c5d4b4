"""On-chip stage profile of two_dim.joint_state_sweep on the bench's
96x385 S=64 production surface, plus the bench numpy oracle for the
vs_baseline denominator.  Run on a live tunnel:

    timeout 900 python tools/joint_profile.py

Times (warm) each stage of the sweep separately, then the end-to-end
call, then the per-state numpy path.  Tunnel numbers are only
comparable within one run (CLAUDE.md timing rule).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from fhmcanalysis_tpu.core import segment2d as s2d  # noqa: E402
from fhmcanalysis_tpu.two_dim import joint_state_sweep  # noqa: E402
from fhmcanalysis_tpu.two_dim.joint_pipeline import _jits  # noqa: E402
from fhmcanalysis_tpu.two_dim.pore_pipeline import _footprint, _segment_batch_host  # noqa: E402


def main():
    H, N, S = 96, 385, 64
    jh = bench._joint_prod(H, N)
    jh.make()
    tgt = bench._joint_states(S)
    beta, mu_ref = bench.JOINT_BETA, bench.JOINT_MU_REF

    # warm the whole path once (compiles)
    t0 = time.time()
    out = joint_state_sweep(jh, beta, mu_ref, tgt, nnebr=1, max_peaks=4)
    print("cold e2e %.2fs  fail codes %s" % (time.time() - t0, set(np.asarray(out["fail_code"]).tolist())))

    # ---- stage-by-stage (warm) ----
    hd = jh.data
    lnpi_raw = np.asarray(hd["ln(PI)"], dtype=np.float64)
    op1 = np.asarray(hd["op_1"], dtype=np.float64)
    op2 = np.asarray(hd["op_2"], dtype=np.float64)
    valid = np.isfinite(lnpi_raw)
    edge_idx = np.array(hd["bounds_idx"][:, 1], dtype=int)
    prop_names = list(hd["props"])
    props = np.stack([np.asarray(hd["props"][p], dtype=np.float64) for p in prop_names])
    dmu1 = tgt[:, 0] - mu_ref[0]
    dmu2 = tgt[:, 1] - mu_ref[1]
    P = 5
    fp = _footprint(H, N, 1)

    jits = _jits()

    def sync(x):
        return float(np.asarray(x).ravel()[0])

    # stage 1 launch (device only, no download)
    lnpi_dev = jits["surface"](lnpi_raw, op1, op2, beta, dmu1, dmu2, valid)
    sync(lnpi_dev[:1, :1, :1])
    t0 = time.time()
    for _ in range(3):
        lnpi_dev = jits["surface"](lnpi_raw, op1, op2, beta, dmu1, dmu2, valid)
        sync(lnpi_dev[:1, :1, :1])
    t_s1 = (time.time() - t0) / 3
    print("stage1 launch      %.3fs" % t_s1)

    # download
    t0 = time.time()
    for _ in range(3):
        lnpi_b = np.asarray(lnpi_dev)
    t_dl = (time.time() - t0) / 3
    print("download %.1f MB    %.3fs" % (lnpi_b.nbytes / 1e6, t_dl))

    # host watershed (threaded)
    mn = np.min(np.where(valid, lnpi_b, np.inf), axis=(1, 2))
    x_b = np.where(valid, lnpi_b - mn[:, None, None], 0.0)
    t0 = time.time()
    for _ in range(3):
        labels_b, n_labels, peak_lnpi, peak_sat, lm = _segment_batch_host(x_b, lnpi_b, valid, fp, 1, P)
    t_ws = (time.time() - t0) / 3
    print("host watershed      %.3fs" % t_ws)

    # stage 2 launch
    core = jits["phase"](
        lnpi_dev, labels_b, valid, edge_idx, props, peak_lnpi, n_labels,
        max_phases=P, boundary_engine=s2d.BOUNDARY_SEGMENT_ENGINE,
    )
    sync(core["fe"][:1, :1])
    t0 = time.time()
    for _ in range(3):
        core = jits["phase"](
            lnpi_dev, labels_b, valid, edge_idx, props, peak_lnpi, n_labels,
            max_phases=P, boundary_engine=s2d.BOUNDARY_SEGMENT_ENGINE,
        )
        sync(core["fe"][:1, :1])
    t_s2 = (time.time() - t0) / 3
    print("stage2 launch      %.3fs  (engine=%s)" % (t_s2, s2d.BOUNDARY_SEGMENT_ENGINE))

    # stage-2 result download
    t0 = time.time()
    for _ in range(3):
        _ = {k: np.asarray(v) for k, v in core.items()}
    t_dl2 = (time.time() - t0) / 3
    print("stage2 download     %.3fs" % t_dl2)

    # ---- end-to-end (warm) ----
    t0 = time.time()
    for _ in range(3):
        out = joint_state_sweep(jh, beta, mu_ref, tgt, nnebr=1, max_peaks=4)
    t_e2e = (time.time() - t0) / 3
    print("e2e warm            %.3fs  -> %.1f st/s" % (t_e2e, S / t_e2e))
    print("stage sum           %.3fs" % (t_s1 + t_dl + t_ws + t_s2 + t_dl2))

    # ---- numpy oracle (same surface, same states) ----
    t0 = time.time()
    for s in range(S):
        bench._joint_numpy_state(jh, beta, mu_ref, tgt[s], nnebr=1, max_peaks=4)
    t_np = time.time() - t0
    print("numpy oracle        %.3fs  -> %.1f st/s" % (t_np, S / t_np))
    print("vs_baseline         %.3f" % ((S / t_e2e) / (S / t_np)))


if __name__ == "__main__":
    main()
