#!/usr/bin/env python
"""North-star DRESS REHEARSAL (VERDICT r4 next #1/#2): the pipeline a
pod would actually run, end to end at 464^3 = 99.9M unknowns.

8 forked ranks (PipeComm — real process boundaries) each:
  1. assemble ONLY their row block (`poisson3d_rows`),
  2. run the process-local blocked setup (`blocked_amg_setup` with
     device-aligned `partition_bounds`),
  3. freeze ONLY their device shards (`blocked_to_dist` +
     `fine_df64_blocked`, as_numpy) — per-rank setup_s / freeze_s /
     maxrss recorded;
then the parent AOT-compiles the SAME `kr_chunk` program the blocked
pipeline runs (`DistAMGSolver._build_jitted`) for the v5p-16 topology
from the ranks' frozen shard SHAPES — no global matrix, hierarchy, or
O(n) vector ever exists in any process.

A mid-size pre-flight (default 160^3 / 4 ranks) asserts the rehearsal
path is exact: the forked blocked setup's per-rank frozen shards are
compared BITWISE (sha1) against the global `to_dist` freeze of the
stitched blocked hierarchy — the tests/test_blocked_dist.py:76
equivalence, extended to the real forked-generator path.

Writes MEMCHECK_dist_r5.json with "setup": "blocked".

Usage: python scripts/rehearsal_dist.py [--n 464] [--procs 8]
       [--preflight-n 160] [--chunk 12]
       (--n 96 --preflight-n 48 for a fast self-check)
"""
import argparse
import dataclasses
import hashlib
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))
# CPU everywhere (8 forked ranks must NEVER touch the single-client TPU
# tunnel); bench flags as in memcheck_dist_aot.py so the AOT trace holds
# the real Pallas GELL kernels.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["SPARSH_FORCE_GELL"] = "1"
os.environ["SPARSH_NO_PALLAS_DIA"] = "1"
os.environ["SPARSH_FORCE_PALLAS_GELL"] = "1"

# The axon sitecustomize imports jax at interpreter START, so the
# jax_platforms config is frozen from the OUTER env ("axon") before the
# line above runs — the env var alone is too late, and every forked rank
# would then initialize the TPU-tunnel backend (serialized relay claims:
# measured 150 s of pure blocked wall for an otherwise 5 s freeze, plus
# 8 concurrent claimants on a one-client tunnel).  Pin the config
# explicitly pre-fork; children inherit it.
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from sparsh_amg_tpu.params import AMGParams, KrylovParams
from sparsh_amg_tpu.models.poisson import poisson3d_rows
from sparsh_amg_tpu.setup.blocked import (blocked_amg_setup,
                                          partition_bounds, stitch_blocked)
from sparsh_amg_tpu.setup.comm import run_blocked_procs
from sparsh_amg_tpu.parallel.partition import Partition

PARAMS = AMGParams(smoother="chebyshev", cycle="V", band_dtype="bfloat16",
                   coarsening="pmis", interpolation="extpi", interp_max=4,
                   rap_drop_tol=0.01, agg_levels=1, interp_max_composed=5,
                   intermediate_drop_tol=0.02, aggressive="pmis2",
                   dense_size=2048, cheby_degree_coarse=1,
                   cheby_coarse_from=1)


@dataclasses.dataclass(frozen=True)
class LeafSpec:
    """Picklable stand-in for a frozen shard leaf: shape + dtype (+ sha1
    when hashing is on).  Shipped through the result pipe instead of the
    multi-GB arrays themselves."""
    shape: tuple
    dtype: str
    sha1: str = ""


def _leaf_digest(a) -> str:
    a = np.asarray(a)
    h = hashlib.sha1(f"{a.shape}|{a.dtype}".encode())
    h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def _spec_tree(tree, with_hash: bool):
    import jax
    return jax.tree.map(
        lambda a: LeafSpec(tuple(np.shape(a)), str(np.asarray(a).dtype),
                           _leaf_digest(a) if with_hash else ""), tree)


def _rank_fn(rank, comm, n_grid, nd, with_hash, ship_hierarchy):
    """One rank's full rehearsal: generate -> blocked setup -> freeze."""
    from sparsh_amg_tpu.parallel.blocked_dist import (blocked_to_dist,
                                                      fine_df64_blocked)
    n = n_grid ** 3
    bounds = partition_bounds(n, nd, comm.size)
    r0, r1 = int(bounds[comm.rank]), int(bounds[comm.rank + 1])
    t0 = time.perf_counter()
    A_own = poisson3d_rows(n_grid, r0, r1)
    t_gen = time.perf_counter() - t0

    t0 = time.perf_counter()
    bh = blocked_amg_setup(
        A_own, bounds, comm, PARAMS,
        bounds_fn=lambda nc: partition_bounds(nc, nd, comm.size))
    t_setup = time.perf_counter() - t0

    dpp = nd // comm.size
    d0 = comm.rank * dpp
    t0 = time.perf_counter()
    dist = blocked_to_dist(bh, nd, comm, PARAMS, as_numpy=True)
    part0 = dist.parts[0]
    Adf = fine_df64_blocked(bh.levels[0].A, bh.levels[0].r0, part0, comm,
                            PARAMS, d0, dpp, as_numpy=True)
    t_freeze = time.perf_counter() - t0

    spec = _spec_tree((dist.levels, Adf), with_hash)
    maxrss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out = {"rank": comm.rank, "gen_s": t_gen, "setup_s": t_setup,
           "freeze_s": t_freeze, "maxrss_gb": maxrss_gb,
           "local_fine_rows": int(A_own.shape[0]),
           "local_fine_nnz": int(A_own.nnz),
           "holds_global_fine": False,
           "n_blocked_levels": len(bh.levels),
           "level_ns": [l.n for l in bh.levels]
           + [lev.A.shape[0] for lev in bh.tail.levels],
           "level_ops": [type(l.A).__name__ for l in dist.levels],
           "spec": spec, "n_loc": int(part0.n_loc)}
    if ship_hierarchy:
        out["bh"] = bh
    return out


def run_phase(n_grid, nd, procs, omp, with_hash=False,
              ship_hierarchy=False):
    fn = lambda rank, comm: _rank_fn(rank, comm, n_grid, nd, with_hash,
                                     ship_hierarchy)
    t0 = time.perf_counter()
    outs = run_blocked_procs(fn, procs, omp_threads=omp)
    wall = time.perf_counter() - t0
    return outs, wall


def preflight(n_grid, nd, procs, omp):
    """Forked blocked setup + freeze, checked BITWISE against the global
    freeze of the stitched hierarchy (the test_blocked_dist equivalence
    on the real rehearsal path)."""
    print(f"preflight: {n_grid}^3 x {procs} ranks...", flush=True)
    outs, wall = run_phase(n_grid, nd, procs, omp, with_hash=True,
                           ship_hierarchy=True)
    import jax
    from sparsh_amg_tpu.parallel.hierarchy import to_dist, fine_df64
    hier = stitch_blocked([o["bh"] for o in outs])
    dist_g = to_dist(hier, nd, PARAMS)
    Adf_g = fine_df64(hier, dist_g, PARAMS)
    leaves_g = jax.tree_util.tree_leaves((dist_g.levels, Adf_g))
    dpp = nd // procs
    n_checked = 0
    for o in outs:
        d0 = o["rank"] * dpp
        leaves_b = jax.tree_util.tree_leaves(o["spec"])
        assert len(leaves_b) == len(leaves_g), \
            (len(leaves_b), len(leaves_g))
        for i, (g, b) in enumerate(zip(leaves_g, leaves_b)):
            sl = np.asarray(g)[d0:d0 + dpp]
            assert _leaf_digest(sl) == b.sha1, \
                f"rank {o['rank']} leaf {i} {b.shape} differs from global"
            n_checked += 1
    print(f"preflight OK: {n_checked} shard leaves bitwise-identical to "
          f"the global freeze ({wall:.1f}s wall)", flush=True)
    return {"n_grid": n_grid, "procs": procs, "wall_s": wall,
            "leaves_checked": n_checked,
            "per_rank": [{k: o[k] for k in
                          ("rank", "gen_s", "setup_s", "freeze_s",
                           "maxrss_gb")} for o in outs]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=464)
    ap.add_argument("--procs", type=int, default=8)
    ap.add_argument("--preflight-n", type=int, default=160)
    ap.add_argument("--preflight-procs", type=int, default=4)
    ap.add_argument("--no-preflight", action="store_true")
    ap.add_argument("--chunk", type=int, default=12)
    ap.add_argument("--omp", type=int, default=1)
    ap.add_argument("--topology", default="v5p:2x2x2")
    ap.add_argument("--hbm-gb", type=float, default=95.0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "MEMCHECK_dist_r5.json"))
    args = ap.parse_args()

    report = {"setup": "blocked", "grid": args.n, "n": args.n ** 3,
              "procs": args.procs, "topology": args.topology,
              "chunk": args.chunk, "omp_per_rank": args.omp,
              "hbm_gb": args.hbm_gb}

    # ---- rehearsal ranks (fork BEFORE the parent touches jax) ----------
    import jax  # noqa: F401  (import only; no backend init pre-fork)
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=args.topology)
    nd = len(topo.devices)
    report["nd"] = nd

    print(f"rehearsal: {args.n}^3 = {args.n**3:,} unknowns, "
          f"{args.procs} forked ranks -> {nd} chips...", flush=True)
    outs, wall = run_phase(args.n, nd, args.procs, args.omp)
    report["ranks_wall_s"] = wall
    report["per_rank"] = [{k: o[k] for k in
                           ("rank", "gen_s", "setup_s", "freeze_s",
                            "maxrss_gb", "local_fine_rows",
                            "local_fine_nnz", "holds_global_fine")}
                          for o in outs]
    report["level_ns"] = outs[0]["level_ns"]
    report["level_ops"] = outs[0]["level_ops"]
    for k in ("gen_s", "setup_s", "freeze_s", "maxrss_gb"):
        vals = [o[k] for o in outs]
        report[f"{k}_max"] = max(vals)
        report[f"{k}_mean"] = sum(vals) / len(vals)
    print(f"ranks done ({wall:.0f}s wall): setup max "
          f"{report['setup_s_max']:.0f}s, freeze max "
          f"{report['freeze_s_max']:.0f}s, rss max "
          f"{report['maxrss_gb_max']:.2f} GB", flush=True)

    # ---- mid-size bitwise pre-flight (second fork, parent still clean)
    if not args.no_preflight:
        report["preflight"] = preflight(args.preflight_n, nd,
                                        args.preflight_procs, args.omp)

    # ---- parent: AOT-compile the blocked pipeline's programs -----------
    from sparsh_amg_tpu.parallel.solver import DistAMGSolver
    from memcheck_dist_aot import analyze_overlap

    mesh = Mesh(np.array(topo.devices), ("rows",))
    shr = NamedSharding(mesh, P("rows"))
    shn = NamedSharding(mesh, P())

    s = DistAMGSolver.__new__(DistAMGSolver)
    s.params = PARAMS
    s.krylov = KrylovParams(method="cg", loop_mode="host", chunk=args.chunk)
    s.mesh, s.axis, s.nd = mesh, "rows", nd
    s._local = None
    s._build_jitted()

    def absd(spec_tree):
        return jax.tree.map(
            lambda sp_: jax.ShapeDtypeStruct(
                (nd,) + sp_.shape[1:], jax.numpy.dtype(sp_.dtype),
                sharding=shr), spec_tree)

    abs_levels, abs_Adf = absd(outs[0]["spec"])
    n_loc = outs[0]["n_loc"]
    assert n_loc == Partition.make(args.n ** 3, nd).n_loc
    abs_b = jax.ShapeDtypeStruct((nd, n_loc), np.float32, sharding=shr)

    report["programs"] = {}

    def record(name, lowered, scan_overlap=False):
        t0 = time.perf_counter()
        compiled = lowered.compile()
        dt = time.perf_counter() - t0
        ma = compiled.memory_analysis()
        g = 1e9
        peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
        entry = {"compile_s": dt,
                 "arg_gb": ma.argument_size_in_bytes / g,
                 "out_gb": ma.output_size_in_bytes / g,
                 "temp_gb": ma.temp_size_in_bytes / g,
                 "alias_gb": ma.alias_size_in_bytes / g,
                 "peak_gb": peak / g, "fits": peak / g < args.hbm_gb}
        if scan_overlap:
            entry["overlap"] = analyze_overlap(compiled.as_text())
        report["programs"][name] = entry
        print(f"{name}: peak {peak/g:.2f} GB/chip compile {dt:.0f}s",
              flush=True)

    print("lowering kr_init...", flush=True)
    record("kr_init", s._kr_init.lower(abs_levels, abs_Adf, abs_b))
    state_shapes = jax.eval_shape(s._kr_init, abs_levels, abs_Adf, abs_b)
    n_vec = 4
    abs_state = tuple(
        jax.ShapeDtypeStruct(st.shape, st.dtype,
                             sharding=shr if i < n_vec else shn)
        for i, st in enumerate(state_shapes))
    print("lowering kr_chunk...", flush=True)
    record(f"kr_chunk{args.chunk}",
           s._kr_chunk.lower(abs_levels, abs_Adf, abs_b, abs_state,
                             k=args.chunk), scan_overlap=True)

    ok = all(p["fits"] for p in report["programs"].values()) and \
        report["programs"][f"kr_chunk{args.chunk}"]["overlap"][
            "fma_between_any_pair"] and \
        not any(r["holds_global_fine"] for r in report["per_rank"]) and \
        (args.no_preflight or report["preflight"]["leaves_checked"] > 0)
    report["ok"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"ok": report["ok"],
                      "setup_s_max": report["setup_s_max"],
                      "freeze_s_max": report["freeze_s_max"],
                      "peak_gb": report["programs"][
                          f"kr_chunk{args.chunk}"]["peak_gb"]}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
