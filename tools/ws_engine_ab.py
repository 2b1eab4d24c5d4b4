"""On-chip A/B: device watershed engine vs host flood on the bench's
joint (96x385, S=64) and pore production workloads, plus the full-scope
numpy oracle rate — all warm-vs-warm within one session (PERFORMANCE.md
rule 9).

Usage: python tools/ws_engine_ab.py [--quick]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    quick = "--quick" in sys.argv
    import jax

    if quick:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    print("backend:", jax.default_backend())

    import bench
    from fhmcanalysis_tpu.two_dim import joint_state_sweep, pore_state_sweep, free_energy_profile

    HJ, NJ = (24, 97) if quick else (96, 385)
    SJ = 4 if quick else 64
    jh = bench._joint_prod(HJ, NJ)
    jh.make()
    jt = bench._joint_states(SJ)

    def timed(tag, f, S, n=2):
        f()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(n):
            out = f()
        dt = (time.perf_counter() - t0) / n
        print(f"{tag:34s} {S / dt:8.1f} st/s   ({dt:.3f} s)")
        return out, dt

    o_dev, _ = timed("joint device engine (no surfaces)", lambda: joint_state_sweep(
        jh, bench.JOINT_BETA, bench.JOINT_MU_REF, jt, nnebr=1, max_peaks=4,
        segment_engine="device", return_surfaces=False), SJ)
    o_devs, _ = timed("joint device engine (+surfaces)", lambda: joint_state_sweep(
        jh, bench.JOINT_BETA, bench.JOINT_MU_REF, jt, nnebr=1, max_peaks=4,
        segment_engine="device", return_surfaces=True), SJ)
    o_host, _ = timed("joint host engine", lambda: joint_state_sweep(
        jh, bench.JOINT_BETA, bench.JOINT_MU_REF, jt, nnebr=1, max_peaks=4,
        segment_engine="host"), SJ)

    # numpy full-scope oracle (shares the native flood)
    t0 = time.perf_counter()
    for s in range(SJ):
        bench._joint_numpy_state(jh, bench.JOINT_BETA, bench.JOINT_MU_REF, jt[s], 1, 4)
    dt = time.perf_counter() - t0
    print(f"{'joint numpy full-scope oracle':34s} {SJ / dt:8.1f} st/s   ({dt:.3f} s)")

    # parity: device vs host on everything the bench gates
    assert (np.asarray(o_dev["fail_code"]) == 0).all()
    np.testing.assert_array_equal(np.asarray(o_devs["labels"]), np.asarray(o_host["labels"]))
    for k in ("fe", "ave", "act_kT", "act_kT_diff"):
        np.testing.assert_allclose(np.asarray(o_dev[k]), np.asarray(o_host[k]), rtol=0, atol=1e-10, err_msg=k)
    print("parity device vs host: OK")

    # pore production surface
    H2, N2 = (24, 97) if quick else (96, 385)
    S2 = 4 if quick else 64
    jhp = bench._pore_joint_prod(H2, N2)
    ps2, pb2 = bench._pore_states_prod(S2)
    fh = free_energy_profile.polynomial([0.1, 0.0])
    p_dev, _ = timed("pore prod device (no surfaces)", lambda: pore_state_sweep(
        jhp, fh.free_energy, ps2, pb2, A=1.0, nnebr=1, max_peaks=4,
        segment_engine="device", return_surfaces=False), S2)
    p_devs, _ = timed("pore prod device (+surfaces)", lambda: pore_state_sweep(
        jhp, fh.free_energy, ps2, pb2, A=1.0, nnebr=1, max_peaks=4,
        segment_engine="device", return_surfaces=True), S2)
    p_host, _ = timed("pore prod host engine", lambda: pore_state_sweep(
        jhp, fh.free_energy, ps2, pb2, A=1.0, nnebr=1, max_peaks=4, segment_engine="host"), S2)
    fin = np.isfinite(np.asarray(p_host["lnpi"]))
    # finiteness patterns must match BEFORE the masked allclose — a
    # device surface that is -inf where the host is finite (or vice
    # versa) must not pass silently (mirrors tests_tpu parity asserts)
    assert (np.isfinite(np.asarray(p_devs["lnpi"])) == fin).all()
    np.testing.assert_allclose(
        np.asarray(p_devs["lnpi"])[fin], np.asarray(p_host["lnpi"])[fin], rtol=0, atol=1e-10
    )
    for k in ("fe", "ave"):
        np.testing.assert_allclose(np.asarray(p_dev[k]), np.asarray(p_host[k]), rtol=0, atol=1e-10, err_msg=k)
    np.testing.assert_array_equal(np.asarray(p_dev["n_phases"]), np.asarray(p_host["n_phases"]))
    print("pore parity device vs host: OK")


if __name__ == "__main__":
    main()
