#!/usr/bin/env python
"""Deviceless AOT compile of the DISTRIBUTED north-star program
(VERDICT r3 next #2): the sharded host-chunked solve from
DistAMGSolver, with the real Pallas GELL path, compiled for a v5p-16
topology (v5p:2x2x2 — 8 megacore chips, 16 TensorCores) at 464^3
(~100M unknowns, 12.5M rows/chip).

Produces MEMCHECK_dist_r4.json with, per compiled program
(kr_init + one chunk=12 kr_chunk):

  * the TPU compiler's per-chip argument/output/temp/alias byte
    assignment and the implied peak vs the 95 GB v5p HBM,
  * the scheduled-HLO overlap check at NORTH-STAR shapes: every
    collective-permute start/done pair must bracket the interior
    7-band DIA FMA fusion (the reference's Irecv/Isend-around-local-
    SpMV pattern, SURVEY.md §3.4).

No pod is touched: jax.experimental.topologies supplies the target,
`put_sharded` is bypassed so the frozen hierarchy stays host-side, and
`.lower().compile()` runs the real XLA:TPU pipeline deviceless.

Usage: python scripts/memcheck_dist_aot.py [--n 464] [--chunk 12]
       (--n 96 for a fast self-check)
"""
import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SPARSH_FORCE_GELL"] = "1"
os.environ["SPARSH_NO_PALLAS_DIA"] = "1"      # bench flags (CLAUDE.md)
os.environ["SPARSH_FORCE_PALLAS_GELL"] = "1"  # real kernels in the AOT trace

import numpy as np


def analyze_overlap(txt: str):
    """Scan the scheduled HLO: positions of collective-permute
    start/done pairs and of compute fusions scheduled BETWEEN a pair
    (the interior work hiding the halo exchange).

    The r3 detector keyed on `/add` + >=6 %bitcast operands, which
    matched the 96^3 fusion bodies but not the 464^3 ones (XLA names
    and splits the big fusions differently at scale) — the acceptance
    rule is structural instead: any non-collective fusion/computation
    line scheduled between a start and its done."""
    lines = txt.splitlines()
    starts, dones, computes, fmas = [], [], [], []
    for i, l in enumerate(lines):
        ls = l.strip()
        if re.match(r"%?collective-permute-start", ls):
            starts.append(i)
        elif re.match(r"%?collective-permute-done", ls):
            dones.append(i)
        else:
            if ("fusion(" in ls and "/add" in ls
                    and ls.count("%bitcast") >= 6):
                fmas.append(i)
            if (" = " in ls and "collective" not in ls
                    and ("fusion(" in ls or " add(" in ls
                         or " multiply(" in ls or " dot(" in ls
                         or "custom-call" in ls)):
                computes.append(i)
    pairs = list(zip(starts, dones))
    overlapped = any(any(s < c < d for s, d in pairs) for c in computes)
    # sample of what sits inside the first busy pair, for the artifact
    sample = []
    for s, d in pairs:
        inner = [c for c in computes if s < c < d]
        if inner:
            sample = [lines[c].strip()[:160] for c in inner[:3]]
            break
    return {"n_permute_pairs": len(pairs),
            "n_interior_fmas": len(fmas),
            "n_interior_computes": sum(
                1 for c in computes if any(s < c < d for s, d in pairs)),
            "first_pair": [starts[0], dones[0]] if pairs else None,
            "interior_sample": sample,
            "fma_between_any_pair": overlapped}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=464)
    ap.add_argument("--chunk", type=int, default=12)
    ap.add_argument("--topology", default="v5p:2x2x2")
    ap.add_argument("--hbm-gb", type=float, default=95.0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "MEMCHECK_dist_r4.json"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_sparsh_amg")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import topologies

    from sparsh_amg_tpu.models.poisson import poisson3d
    from sparsh_amg_tpu.params import AMGParams, KrylovParams
    from sparsh_amg_tpu.setup.hierarchy import amg_setup
    from sparsh_amg_tpu.parallel import solver as psolver

    params = AMGParams(smoother="chebyshev", cycle="V",
                       band_dtype="bfloat16", coarsening="pmis",
                       interpolation="extpi", interp_max=4,
                       rap_drop_tol=0.01, agg_levels=1,
                       interp_max_composed=5, intermediate_drop_tol=0.02,
                       aggressive="pmis2", dense_size=2048,
                       cheby_degree_coarse=1, cheby_coarse_from=1)

    t0 = time.perf_counter()
    A = poisson3d(args.n)
    t_gen = time.perf_counter() - t0
    print(f"generator: n={A.shape[0]:,} nnz={A.nnz:,} ({t_gen:.1f}s)",
          flush=True)
    t0 = time.perf_counter()
    hier = amg_setup(A, params)
    t_setup = time.perf_counter() - t0
    print(f"setup: {hier!r} ({t_setup:.1f}s)", flush=True)

    topo = topologies.get_topology_desc(platform="tpu",
                                       topology_name=args.topology)
    mesh = Mesh(np.array(topo.devices), ("rows",))
    nd = len(topo.devices)

    # bypass the device upload: keep the frozen hierarchy host-side and
    # lower against abstract sharded inputs (the deviceless-AOT pattern
    # of memcheck_aot.py, applied to the DISTRIBUTED program)
    orig_put = psolver.put_sharded
    psolver.put_sharded = lambda tree, mesh_, axis_: tree
    try:
        t0 = time.perf_counter()
        s = psolver.DistAMGSolver(
            A, mesh=mesh, params=params,
            krylov=KrylovParams(method="cg", loop_mode="host",
                                chunk=args.chunk),
            hierarchy=hier)
        t_freeze = time.perf_counter() - t0
    finally:
        psolver.put_sharded = orig_put
    print(f"freeze: nd={nd} n_loc={s.part.n_loc:,} ({t_freeze:.1f}s)",
          flush=True)
    del A, hier

    shr = NamedSharding(mesh, P("rows"))
    shn = NamedSharding(mesh, P())

    def absd(tree, sh):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype,
                                           sharding=sh), tree)

    abs_levels = absd(s.levels, shr)
    abs_Adf = absd(s.A_df, shr)
    abs_b = jax.ShapeDtypeStruct((nd, s.part.n_loc), np.float32,
                                 sharding=shr)

    report = {"n": s.n, "grid": args.n, "nd": nd,
              "topology": args.topology, "chunk": args.chunk,
              "rows_per_chip": s.part.n_loc,
              "level_ops": [type(l.A).__name__ for l in s.dist.levels],
              "gen_s": t_gen, "setup_s": t_setup, "freeze_s": t_freeze,
              "hbm_gb": args.hbm_gb, "programs": {}}

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
                 "peak_gb": peak / g,
                 "fits": peak / g < args.hbm_gb}
        if scan_overlap:
            entry["overlap"] = analyze_overlap(compiled.as_text())
        report["programs"][name] = entry
        print(f"{name}: peak {peak/g:.2f} GB/chip "
              f"(args {entry['arg_gb']:.2f} + temp {entry['temp_gb']:.2f})"
              f" compile {dt:.0f}s"
              + (f" overlap={entry.get('overlap')}" if scan_overlap else ""),
              flush=True)

    # kr_init: rhs in, Krylov state out
    print("lowering kr_init...", flush=True)
    low_init = s._kr_init.lower(abs_levels, abs_Adf, abs_b)
    record("kr_init", low_init)

    # state structs from the traced output of kr_init
    state_shapes = jax.eval_shape(s._kr_init, abs_levels, abs_Adf, abs_b)
    n_vec = 4  # cg: x, r, p, z row-sharded; scalars replicated
    abs_state = tuple(
        jax.ShapeDtypeStruct(st.shape, st.dtype,
                             sharding=shr if i < n_vec else shn)
        for i, st in enumerate(state_shapes))

    print("lowering kr_chunk...", flush=True)
    low_chunk = s._kr_chunk.lower(abs_levels, abs_Adf, abs_b, abs_state,
                                  k=args.chunk)
    record(f"kr_chunk{args.chunk}", low_chunk, scan_overlap=True)

    ok = all(p["fits"] for p in report["programs"].values()) and \
        report["programs"][f"kr_chunk{args.chunk}"]["overlap"][
            "fma_between_any_pair"]
    report["ok"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"ok": report["ok"],
                      "peak_gb": report["programs"][
                          f"kr_chunk{args.chunk}"]["peak_gb"]}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
