#!/usr/bin/env python
"""Block-GELL vs scalar GELL/SplitGell on-chip A/B (VERDICT r4 next #4).

Packs the elasticity3d systems levels (fine 3x3 blocks, SA coarse 6x6)
both ways and times the SpMV on the real TPU, against the Poisson DIA/
GELL per-nnz yardstick.  Writes KBENCH_blockgell_r5.jsonl: one JSON
line per (level, layout) with nnz, ms/apply and Gnnz/s.

Tunnel rules (CLAUDE.md): single TPU client, run via nohup, timings use
fresh inputs + forced content readbacks.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARSH_FORCE_GELL", "1")

import numpy as np


def time_op(fn, x_pool, reps=10):
    import jax
    import jax.numpy as jnp
    jfn = jax.jit(fn)
    y = jfn(x_pool[0])
    float(jnp.sum(y))                     # force compile + content
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(reps):
        y = jfn(x_pool[i % len(x_pool)])
    acc += float(jnp.sum(y))              # one readback closes the chain
    dt = (time.perf_counter() - t0) / reps
    # chained timing: launch+execute amortized; the final sum forces
    # completion of the whole chain
    return dt, acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=40)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "KBENCH_blockgell_r5.jsonl"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_sparsh_amg")
    print("device:", jax.devices()[0], flush=True)

    from sparsh_amg_tpu.models.elasticity import (elasticity3d,
                                                  elasticity3d_nullspace)
    from sparsh_amg_tpu.params import AMGParams
    from sparsh_amg_tpu.setup.hierarchy import amg_setup
    from sparsh_amg_tpu.ops.block_gell import csr_to_block_gell
    from sparsh_amg_tpu.ops.formats import csr_to_device

    params = AMGParams(coarsening="aggregation", interpolation="smoothed",
                       smoother="chebyshev", coarse_size=200,
                       agg_blocksize=3, p_smooth_filter=False)
    t0 = time.perf_counter()
    A = elasticity3d(args.m)
    ns = elasticity3d_nullspace(args.m)
    hier = amg_setup(A, params, nullspace=ns)
    print(f"setup {time.perf_counter()-t0:.1f}s  {hier!r}", flush=True)

    rng = np.random.default_rng(0)
    rows = []
    for li in (0, 1):
        lev = hier.levels[li]
        M = lev.A.tocsr()
        bs = lev.bs
        n = M.shape[0]
        # scalar packing (what r4 shipped)
        os.environ["SPARSH_NO_BLOCK_GELL"] = "1"
        dev_s = csr_to_device(M, dtype=jnp.bfloat16, prefer_dia=True,
                              dense_size=0, pad_multiple=2048,
                              prefer_gell=True)
        del os.environ["SPARSH_NO_BLOCK_GELL"]
        dev_b = csr_to_block_gell(M, bs, dtype=jnp.bfloat16)
        pool = [jnp.asarray(rng.standard_normal(dev_s.n_pad),
                            dtype=jnp.float32) for _ in range(4)]
        for name, op in (("scalar_" + type(dev_s).__name__, dev_s),
                         ("block_gell", dev_b)):
            if op is None:
                continue
            ms, _ = time_op(op.spmv, pool, reps=args.reps)
            rec = {"level": li, "n": n, "nnz": int(M.nnz), "bs": bs,
                   "layout": name, "ms": ms * 1e3,
                   "gnnz_s": M.nnz / ms / 1e9}
            if hasattr(op, "s"):
                rec.update(S=int(op.s), tr=int(op.tr), k=int(op.k),
                           n_tiles=int(op.n_tiles))
            rows.append(rec)
            print(json.dumps(rec), flush=True)
    with open(args.out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    by_level = {}
    for r in rows:
        by_level.setdefault(r["level"], {})[
            "block" if r["layout"] == "block_gell" else "scalar"] = r["ms"]
    print(json.dumps({f"L{li}_speedup": round(v.get("scalar", 0)
                                              / v["block"], 2)
                      for li, v in by_level.items() if "block" in v}))


if __name__ == "__main__":
    main()
