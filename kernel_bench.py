"""Per-kernel speed-of-light microbenchmark (VERDICT r1 next-round #2).

Times each hierarchy level's SpMV and the full V-cycle by chaining K
repetitions inside ONE jitted dispatch — through the axon relay a single
kernel launch costs ~1.5 ms RPC, so un-chained timings measure the wire,
not the chip.  Chaining amortizes the launch cost to measure what the
kernels actually sustain on the TPU.

Prints one JSON line per measurement:
  {"kernel": "dia_spmv_l0", "layout": "dia", "n": ..., "nnz": ...,
   "per_op_ms": ..., "nnz_per_s": ..., "bytes_per_op": ...,
   "hbm_frac": ...}  (hbm_frac = achieved bytes/s / measured copy bw)

Usage:  python kernel_bench.py [--n 96] [--reps 100] [--pallas {0,1}]
"""
import argparse
import json
import os
import time

import numpy as np


def measure(fn, x0, reps_outer: int = 3):
    """Median wall time of fn (already jitted, chained inside) with a
    content readback to beat relay caching (CLAUDE.md timing rules)."""
    import jax.numpy as jnp
    ts = []
    for i in range(reps_outer):
        x = x0 * (1.0 + 1e-6 * (i + 1))     # fresh content each rep
        t0 = time.perf_counter()
        y = fn(x)
        float(jnp.sum(y))                    # force content readback
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--reps", type=int, default=100,
                    help="chained ops per dispatch")
    ap.add_argument("--aggressive", default="composed",
                    choices=["composed", "pmis2"],
                    help="aggressive-step scheme for the measured "
                         "hierarchy (composed keeps KBENCH_r2_* "
                         "comparability)")
    ap.add_argument("--pallas", type=int, default=None,
                    help="1 = force Pallas DIA kernels, 0 = XLA fallback; "
                         "default measures both")
    args = ap.parse_args()

    results = []

    def emit(r):
        results.append(r)
        print(json.dumps(r), flush=True)   # incremental: keep partials on
                                           # a mid-suite failure

    def run_suite(tag):
        import jax
        import jax.numpy as jnp
        from sparsh_amg_tpu.models.poisson import poisson3d
        from sparsh_amg_tpu.params import AMGParams
        from sparsh_amg_tpu.setup.hierarchy import amg_setup
        from sparsh_amg_tpu.solve.device import to_device
        from sparsh_amg_tpu.solve.cycles import make_cycle
        from sparsh_amg_tpu.ops.formats import DiaMatrix, EllMatrix, \
            DenseMatrix

        params = AMGParams(smoother="chebyshev", coarsening="pmis",
                           interpolation="extpi", interp_max=4,
                           rap_drop_tol=0.01, agg_levels=1,
                           interp_max_composed=5, intermediate_drop_tol=0.02,
                           band_dtype="bfloat16", dense_size=8192,
                           cheby_degree_coarse=1, cheby_coarse_from=1,
                           aggressive=args.aggressive)
        A = poisson3d(args.n)
        hier = amg_setup(A, params)
        dev = to_device(hier, params)
        reps = args.reps

        # copy bandwidth as the roofline denominator — the 20 copies are
        # chained INSIDE one jit (separate dispatches through the relay
        # are launch-bound and report ~1 GB/s for a 819 GB/s chip)
        nbytes = 1 << 27
        nv = nbytes // 4
        xbw = jnp.ones((nv,), dtype=jnp.float32)

        @jax.jit
        def bw_fn(v):
            for _ in range(20):
                v = v * 1.0000001
            return v
        bw_fn(xbw).block_until_ready()
        # median of 3 fresh-content runs: a single reading taken on a
        # cold link recorded 2.1 GB/s in KBENCH_r3 xla mode (same chained
        # code measured 188.5 GB/s minutes later) and poisoned every
        # hbm_frac of that suite
        ts = []
        for i in range(3):
            xi = xbw * (1.0 + 1e-6 * (i + 1))
            xi.block_until_ready()
            t0 = time.perf_counter()
            float(jnp.sum(bw_fn(xi)))
            ts.append(time.perf_counter() - t0)
        bw = 2 * nv * 4 * 20 / float(np.median(ts))
        # fixed spec denominator next to the measurement: fractions are
        # reported against BOTH (VERDICT r2 weak #1 — the un-chained
        # measured denominator made hbm_frac nonsense on bad-relay days)
        from sparsh_amg_tpu.utils.meminfo import hbm_spec_bw
        bw_spec = hbm_spec_bw()
        emit({"kernel": "copy_bw", "mode": tag, "GBs": bw / 1e9,
              "spec_GBs": bw_spec / 1e9})

        from sparsh_amg_tpu.ops.gell import GellMatrix, SplitGell

        def bytes_of(op):
            # HBM traffic of one SpMV: matrix data + x read + y write
            if isinstance(op, DiaMatrix):
                mat = op.bands.size * op.bands.dtype.itemsize
                vec = 2 * op.n_pad * 4
            elif isinstance(op, EllMatrix):
                mat = op.vals.size * (op.vals.dtype.itemsize + 4)  # + cols
                vec = (op.k + 1) * op.n_pad * 4   # gathered x + y
            elif isinstance(op, GellMatrix):
                mat = (op.packed.size * 4
                       + op.vals.size * op.vals.dtype.itemsize)
                vec = op.packed.size * 4 + op.n_pad * 4  # gathered x + y
            elif isinstance(op, SplitGell):
                return bytes_of(op.part) + bytes_of(op.comb)
            else:
                mat = op.mat.size * op.mat.dtype.itemsize
                vec = (op.mat.shape[0] + op.mat.shape[1]) * 4
            return mat + vec

        rng = np.random.default_rng(0)
        for li, lev in enumerate(dev.levels):
            op = lev.A
            nnz = hier.levels[li].nnz
            layout = type(op).__name__.replace("Matrix", "").lower()
            x0 = jnp.asarray(rng.standard_normal(op.n_pad),
                             dtype=jnp.float32)

            @jax.jit
            def chain_op(o, x):
                # trace-time unrolled: ONE dispatch for all reps (device
                # loop bodies re-dispatch per-op through the relay —
                # CLAUDE.md tunnel rules).  The operator is a pytree ARG,
                # not a closure constant, so its arrays are uploaded once
                # as buffers instead of being inlined into the HLO (the
                # relay rejects >100 MB compile payloads).
                for _ in range(reps):
                    x = o.spmv(x) * (1.0 / 7.0)
                return x

            chain = lambda x, op=op: chain_op(op, x)
            chain(x0).block_until_ready()          # compile
            dt = measure(chain, x0) / reps
            b = bytes_of(op)
            emit({
                "kernel": f"spmv_l{li}", "mode": tag, "layout": layout,
                "n": hier.levels[li].n, "n_pad": op.n_pad, "nnz": int(nnz),
                "per_op_ms": dt * 1e3,
                "nnz_per_s": nnz / dt,
                "bytes_per_op": int(b),
                "hbm_frac": (b / dt) / bw,
                "hbm_frac_spec": (b / dt) / bw_spec,
            })

        # transfer operators (prolongation/restriction): the gather-
        # heaviest ops of the cycle — GELL plain or row-split
        for li, lev in enumerate(dev.levels):
            for nm in ("P", "R"):
                op = getattr(lev, nm)
                if op is None or not isinstance(op, (GellMatrix, SplitGell)):
                    continue
                hop = getattr(hier.levels[li], nm)
                nnz = hop.nnz
                layout = ("splitgell" if isinstance(op, SplitGell)
                          else "gell")
                src = getattr(op, "src_pad", op.n_pad)
                xt = jnp.asarray(rng.standard_normal(src),
                                 dtype=jnp.float32)

                @jax.jit
                def chain_t(o, x, _n=op.n_pad, _s=src):
                    acc = jnp.zeros(_n, dtype=jnp.float32)
                    for _ in range(reps):
                        acc = acc + o.spmv(x)
                        x = x * 1.0000001
                    return acc

                chain = lambda x, op=op: chain_t(op, x)
                chain(xt).block_until_ready()
                dt = measure(chain, xt) / reps
                b = bytes_of(op)
                emit({
                    "kernel": f"{nm}_l{li}", "mode": tag, "layout": layout,
                    "shape": list(hop.shape), "nnz": int(nnz),
                    "per_op_ms": dt * 1e3, "nnz_per_s": nnz / dt,
                    "bytes_per_op": int(b), "hbm_frac": (b / dt) / bw,
                    "hbm_frac_spec": (b / dt) / bw_spec,
                })

        # full V-cycle chained
        cycle = make_cycle(params)
        n_pad0 = dev.levels[0].n_pad
        x0 = jnp.asarray(rng.standard_normal(n_pad0), dtype=jnp.float32)

        n_cyc = max(reps // 10, 1)

        @jax.jit
        def cyc_levels(levels, b):
            for _ in range(n_cyc):       # trace-time unrolled (see above)
                w = cycle(levels, b)
                b = w / (jnp.max(jnp.abs(w)) + 1e-30)
            return b

        cyc_chain = lambda b: cyc_levels(dev.levels, b)
        cyc_chain(x0).block_until_ready()
        dt = measure(cyc_chain, x0) / n_cyc
        fine_nnz = hier.levels[0].nnz
        emit({
            "kernel": "vcycle", "mode": tag,
            "n": hier.levels[0].n, "levels": dev.n_levels,
            "per_op_ms": dt * 1e3,
            "fine_nnz_per_s": fine_nnz / dt,
        })

    modes = [args.pallas] if args.pallas is not None else [0, 1]
    for p in modes:
        os.environ["SPARSH_NO_PALLAS"] = "" if p else "1"
        tag = "pallas" if p else "xla"
        run_suite(tag)



if __name__ == "__main__":
    main()
