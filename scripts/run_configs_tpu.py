#!/usr/bin/env python
"""Non-flagship acceptance configs on the REAL TPU (VERDICT r3 next #3).

All hardware artifacts so far run 3-D Poisson + Chebyshev V + CG; the
GELL packer, dense thresholds and chunked Krylov were tuned on that band
structure.  This script runs the OTHER acceptance configs in one TPU
session and writes CONFIGS_r4.json:

  * poisson2d 1024^2 — BASELINE config[0] (V + weighted-Jacobi + PCG)
  * anisotropic eps=1e-3 rotated 45deg at 1024^2 — config[2] exactly
    (smoothed aggregation, W-cycle, BiCGStab)
  * elasticity2d 512 RBM-SA — rigid-body nullspace, node-amalgamated
    aggregation (agg_blocksize=2), unfiltered P smoothing, V+CG
  * elasticity3d 40 (hex Q1, 81-entry rows) RBM-SA — 6 rigid-body
    modes, agg_blocksize=3 (VERDICT r3 next #8 hardware row)
  * jump2d random contrast 1e4 at 1024^2 — PMIS + ext+i, V+CG

Per config: iters / relres / solve_s / setup_s / opC / levels, plus the
device operator kinds (GELL window counts on 81-entry elasticity rows
are exactly what this run is meant to expose).  A config failure is
recorded and does not abort the rest (VERDICT: "any config that
misbehaves on chip gets a measured note").

Usage: python scripts/run_configs_tpu.py [--out CONFIGS_r4.json]
Tunnel rules apply (CLAUDE.md): single TPU client, run via nohup,
never kill mid-compile.
"""
import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARSH_NO_PALLAS_DIA", "1")   # relay economics

import numpy as np


def configs(scale: int = 1):
    from sparsh_amg_tpu.models.poisson import poisson2d
    from sparsh_amg_tpu.models.anisotropic import anisotropic2d
    from sparsh_amg_tpu.models.elasticity import (
        elasticity2d, elasticity2d_nullspace,
        elasticity3d, elasticity3d_nullspace)
    from sparsh_amg_tpu.models.jump import jump2d
    from sparsh_amg_tpu.params import AMGParams, KrylovParams

    m2, me, m3 = 1024 // scale, 512 // scale, 40 // scale

    yield (f"poisson2d_{m2}_wjacobi_V_cg",
           lambda: (poisson2d(m2), None),
           AMGParams(smoother="jacobi", coarsening="pmis",
                     interpolation="extpi", interp_max=4),
           KrylovParams(method="cg", tol=1e-8, maxiter=300))
    # agg_theta=0.25 (round 5): the default 0.08 marks cross-
    # characteristic couplings strong and aggregation loses the rotated
    # direction — iterations grew 80 -> 118 with n.  At 0.25 aggregates
    # follow the characteristic: 22/22/21/25 iters at 256/512/1024/1448^2
    # on the CPU mesh (grid-independent), opC 1.54.
    yield (f"aniso2d_{m2}_eps1e-3_rot45_aggW_bicgstab",
           lambda: (anisotropic2d(m2, epsilon=1e-3, angle_deg=45), None),
           AMGParams(coarsening="aggregation", interpolation="smoothed",
                     cycle="W", smoother="l1jacobi", agg_theta=0.25),
           KrylovParams(method="bicgstab", tol=1e-8, maxiter=400))
    m2b = 2048 // scale
    yield (f"aniso2d_{m2b}_eps1e-3_rot45_aggW_bicgstab",
           lambda: (anisotropic2d(m2b, epsilon=1e-3, angle_deg=45), None),
           AMGParams(coarsening="aggregation", interpolation="smoothed",
                     cycle="W", smoother="l1jacobi", agg_theta=0.25),
           KrylovParams(method="bicgstab", tol=1e-8, maxiter=400))
    yield (f"aniso2d_{m2}_pmis_extpi_W_gs2_bicgstab",
           lambda: (anisotropic2d(m2, epsilon=1e-3, angle_deg=45), None),
           AMGParams(coarsening="pmis", interpolation="extpi",
                     interp_max=4, cycle="W", smoother="gs2",
                     rap_drop_tol=0.01),
           KrylovParams(method="bicgstab", tol=1e-8, maxiter=400))
    yield (f"elasticity2d_{me}_rbm_sa_V_cg",
           lambda: (elasticity2d(me), elasticity2d_nullspace(me)),
           AMGParams(coarsening="aggregation", interpolation="smoothed",
                     smoother="chebyshev", coarse_size=200,
                     agg_blocksize=2, p_smooth_filter=False),
           KrylovParams(method="cg", tol=1e-8, maxiter=300))
    yield (f"elasticity3d_{m3}_rbm_sa_V_cg",
           lambda: (elasticity3d(m3), elasticity3d_nullspace(m3)),
           AMGParams(coarsening="aggregation", interpolation="smoothed",
                     smoother="chebyshev", coarse_size=200,
                     agg_blocksize=3, p_smooth_filter=False),
           KrylovParams(method="cg", tol=1e-8, maxiter=300))
    from sparsh_amg_tpu.models.convection import convection3d
    mc = 96 // scale
    yield (f"convection3d_{mc}_pmis_extpi_V_bicgstab",
           lambda: (convection3d(mc), None),
           AMGParams(smoother="gs2", coarsening="pmis",
                     interpolation="extpi", interp_max=4,
                     rap_drop_tol=0.01),
           KrylovParams(method="bicgstab", tol=1e-8, maxiter=300))
    yield (f"jump2d_{m2}_random_1e4_V_cg",
           lambda: (jump2d(m2, contrast=1e4, pattern="random"), None),
           AMGParams(smoother="chebyshev", coarsening="pmis",
                     interpolation="extpi", interp_max=4),
           KrylovParams(method="cg", tol=1e-8, maxiter=300))
    # irregular structure (VERDICT r4 missing #3): Delaunay-graph
    # Laplacian, RCM-ordered, >= 1M rows — the G3_circuit-class surrogate
    # (SuiteSparse unfetchable: zero egress).  l1-Jacobi: the Chebyshev
    # window mis-behaves on heterogeneous-weight graphs (82 vs 21 iters
    # at 256^2 on the CPU mesh); iteration counts pinned grid-independent
    # 20-22 from 16k to 1M.
    from sparsh_amg_tpu.models.unstructured import delaunay_laplacian
    yield (f"delaunay_{m2}sq_rcm_l1jac_V_cg",
           lambda: (delaunay_laplacian(m2 * m2), None),
           AMGParams(smoother="l1jacobi", coarsening="pmis",
                     interpolation="extpi", interp_max=4,
                     rap_drop_tol=0.01),
           KrylovParams(method="cg", tol=1e-8, maxiter=300))


def _op_stats(op):
    """Window statistics of a packed operator (the packer-survives-
    irregularity evidence VERDICT r4 next #5 asks for)."""
    from sparsh_amg_tpu.ops.gell import GellMatrix, SplitGell
    if isinstance(op, SplitGell):
        return {"type": "SplitGell", "part": _op_stats(op.part),
                "comb": _op_stats(op.comb)}
    if isinstance(op, GellMatrix):
        c = np.asarray(op.counts)
        return {"type": "GellMatrix", "k": int(op.k), "s": int(op.s),
                "tr": int(op.tr), "n_tiles": int(c.size),
                "windows_per_tile_mean": float(c.mean()),
                "windows_per_tile_max": int(c.max())}
    return {"type": type(op).__name__}


def run_one(name, build, params, krylov):
    import jax
    from sparsh_amg_tpu.setup.hierarchy import amg_setup
    from sparsh_amg_tpu.solve.solver import AMGSolver
    rec = {"name": name}
    t0 = time.perf_counter()
    A, ns = build()
    A = A.tocsr()
    rec["n"] = int(A.shape[0])
    rec["nnz"] = int(A.nnz)
    rec["gen_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    hier = amg_setup(A, params, nullspace=ns)
    rec["amg_setup_s"] = time.perf_counter() - t0
    rec["levels"] = hier.n_levels
    rec["operator_complexity"] = hier.operator_complexity()
    t0 = time.perf_counter()
    solver = AMGSolver(A, params, krylov, hierarchy=hier)
    rec["to_device_s"] = time.perf_counter() - t0
    rec["setup_s"] = rec["amg_setup_s"] + rec["to_device_s"]
    rec["device_ops"] = [type(l.A).__name__ for l in solver.device.levels]
    rec["gell_stats"] = [
        {"level": li, "A": _op_stats(l.A),
         **({"P": _op_stats(l.P), "R": _op_stats(l.R)}
            if l.P is not None else {})}
        for li, l in enumerate(solver.device.levels)]
    rec["device_bytes_mb"] = solver.device_bytes() / 1e6
    b = np.random.default_rng(0).standard_normal(A.shape[0])
    t0 = time.perf_counter()
    solver.warm()
    rec["warm_s"] = time.perf_counter() - t0
    rhs = solver.prepare_rhs(b)
    solver.solve(rhs, tol=1e-2)          # prime contraction estimate
    res = solver.solve(rhs)
    rec.update(iterations=res.iterations, refine_passes=res.refine_passes,
               converged=bool(res.converged), relres=res.relres,
               solve_s=res.solve_time)
    x = res.x
    rec["true_relres"] = float(np.linalg.norm(b - A @ x)
                               / np.linalg.norm(b))
    print(f"{name}: n={rec['n']:,} iters={res.iterations} "
          f"relres={res.relres:.2e} solve={res.solve_time:.2f}s "
          f"setup={rec['setup_s']:.1f}s opC="
          f"{rec['operator_complexity']:.2f} ops={rec['device_ops']}",
          flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="substring filter on config names")
    ap.add_argument("--scale", type=int, default=1,
                    help="divide problem sizes by this (CPU smoke test)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CONFIGS_r4.json"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_sparsh_amg")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # tunnel registration can refuse transiently; re-exec for a fresh
    # attempt (the bench.py pattern)
    try:
        jax.devices()
        import jax.numpy as jnp
        jnp.ones(8).block_until_ready()
    except RuntimeError as e:
        tries = int(os.environ.get("SPARSH_BENCH_RETRY", "0"))
        if tries >= 30:
            raise
        print(f"# device init failed (try {tries}): {e}", flush=True)
        os.environ["SPARSH_BENCH_RETRY"] = str(tries + 1)
        time.sleep(20)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    dev = jax.devices()[0]
    out = {"device": str(dev), "platform": dev.platform,
           "ts": time.strftime("%Y-%m-%d %H:%M:%S"), "configs": []}
    for name, build, params, krylov in configs(args.scale):
        if args.only and args.only not in name:
            continue
        try:
            out["configs"].append(run_one(name, build, params, krylov))
        except Exception as e:
            traceback.print_exc()
            out["configs"].append({"name": name, "error": repr(e)})
    out["ok"] = all(c.get("converged") and c.get("true_relres", 1) <= 1e-8
                    for c in out["configs"])
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ok": out["ok"],
                      "n_configs": len(out["configs"])}))
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
