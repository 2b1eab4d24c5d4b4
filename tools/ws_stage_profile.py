"""On-chip stage ablation of the fused joint sweep (device watershed).

Times, warm-vs-warm in one session: surfaces alone, surfaces+watershed,
watershed sub-stages (parent argmax / peak ranking / pointer jumping),
and the full fused program.  All variants force a scalar readback.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    import bench
    from fhmcanalysis_tpu.core import segment2d as s2d
    from fhmcanalysis_tpu.two_dim.pore_pipeline import _footprint

    HJ, NJ, SJ = 96, 385, 64
    jh = bench._joint_prod(HJ, NJ)
    jh.make()
    jt = bench._joint_states(SJ)
    hd = jh.data
    lnpi_raw = np.asarray(hd["ln(PI)"])
    valid = np.isfinite(lnpi_raw)
    op1 = np.asarray(hd["op_1"])
    op2 = np.asarray(hd["op_2"])
    edge_idx = np.array(hd["bounds_idx"][:, 1], dtype=int)
    props = np.stack([np.asarray(hd["props"][p]) for p in hd["props"]])
    dmu1 = jt[:, 0] - bench.JOINT_MU_REF[0]
    dmu2 = jt[:, 1] - bench.JOINT_MU_REF[1]
    fp = _footprint(HJ, NJ, 1)
    fs = tuple(fp.shape)
    P = 5

    def timed(tag, f, n=3):
        r = f()
        jax.tree_util.tree_map(lambda x: np.asarray(x), r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f()
            jax.tree_util.tree_map(lambda x: np.asarray(jnp.ravel(jnp.asarray(x))[0]) if hasattr(x, "shape") else x, r)
        dt = (time.perf_counter() - t0) / n
        print(f"{tag:30s} {dt*1000:8.1f} ms  ({SJ/dt:7.1f} st/s)")
        return dt

    args = (lnpi_raw, op1, op2, 1.1, dmu1, dmu2, valid)

    f_surf = jax.jit(lambda *a: s2d.joint_surface_batch(*a)[0])

    @jax.jit
    def f_seg(*a):
        lb = s2d.joint_surface_batch(*a)[0]
        return s2d.hillclimb_segment_batch(lb, valid, fs, P)["labels"]



    @jax.jit
    def f_parent(*a):
        lb = s2d.joint_surface_batch(*a)[0]

        def one(lnpi):
            out = s2d.hillclimb_segment(lnpi, valid, fs, P)
            return out["n_labels"]  # DCE keeps peaks+parents, drops jumps? no — labels dropped

        return jax.vmap(one)(lb)



    f_full = jax.jit(s2d.joint_sweep_fused, static_argnames=("fp_shape", "max_phases", "boundary_engine"))
    variants = [
        ("surfaces only", lambda: f_surf(*args)),
        ("surfaces + watershed", lambda: f_seg(*args)),
        ("surf + peaks (DCE jumps)", lambda: f_parent(*args)),
        ("full fused sweep", lambda: f_full(lnpi_raw, op1, op2, 1.1, dmu1, dmu2, valid, edge_idx, props,
                                            fp_shape=fs, max_phases=P, boundary_engine="onehot")),
    ]
    # stage-2 internals on precomputed device inputs
    import jax.numpy as jnp2
    lnpi_b = f_seg.lower(*args) if False else None
    f_pre = jax.jit(lambda *a: (s2d.joint_surface_batch(*a)[0],))
    lb_dev = f_pre(*args)[0]
    seg_dev = jax.jit(lambda l: s2d.hillclimb_segment_batch(l, valid, fs, P))(lb_dev)
    labels_dev = seg_dev["labels"]

    def _ave_only(lnpi_b2, labels_b2):
        def one(lnpi, lab):
            slots = jnp2.arange(1, P + 1)
            region = lab[None] == slots[:, None, None]
            m = jnp2.max(jnp2.where(region, lnpi[None], -jnp2.inf), axis=(1, 2))
            m_f = jnp2.where(jnp2.isfinite(m), m, 0.0)
            m_cell = jnp2.sum(jnp2.where(region, m_f[:, None, None], 0.0), axis=0)
            z = jnp2.where(region, jnp2.exp(lnpi - m_cell)[None], 0.0)
            sphase = jnp2.sum(z, axis=(1, 2))
            prob = z / jnp2.where(sphase > 0, sphase, 1.0)[:, None, None]
            ave = jnp2.einsum("phn,khn->pk", prob, jnp2.asarray(props))
            return ave, m_f + jnp2.log(jnp2.where(sphase > 0, sphase, 1.0))
        return jax.vmap(one)(lnpi_b2, labels_b2)

    f_ave = jax.jit(_ave_only)

    def _bnd_only(lnpi_b2, labels_b2):
        def one(lnpi, lab):
            return s2d.boundary_pair_integrals(lnpi, lab, P, engine="onehot")
        return jax.vmap(one)(lnpi_b2, labels_b2)

    f_bnd = jax.jit(_bnd_only)

    variants += [
        ("stage2: averages only", lambda: f_ave(lb_dev, labels_dev)),
        ("stage2: boundary only", lambda: f_bnd(lb_dev, labels_dev)),
    ]
    for rnd in range(2):
        print("--- pass", rnd)
        for tag, f in variants:
            timed(tag, f)


if __name__ == "__main__":
    main()
