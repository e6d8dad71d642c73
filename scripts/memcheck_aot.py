#!/usr/bin/env python
"""Deviceless AOT memory analysis of the chunked-solve program at a given
problem size (v5e target): compiles kr_start for a real TPU topology with
the REAL Pallas GELL path (SPARSH_FORCE_PALLAS_GELL) and prints the
compiler's argument/output/temp byte assignment — how close a single-chip
problem sits to the 16 GB HBM ceiling, without touching the chip.

Usage: python scripts/memcheck_aot.py [--n 400] [--chunk 12]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SPARSH_FORCE_GELL"] = "1"
os.environ["SPARSH_NO_PALLAS_DIA"] = "1"
os.environ["SPARSH_FORCE_PALLAS_GELL"] = "1"

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--chunk", type=int, default=12)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import SingleDeviceSharding
    from jax.experimental import topologies
    from sparsh_amg_tpu.models.poisson import poisson3d
    from sparsh_amg_tpu.params import AMGParams, KrylovParams
    from sparsh_amg_tpu.setup.hierarchy import amg_setup
    from sparsh_amg_tpu.solve.solver import AMGSolver

    params = AMGParams(smoother="chebyshev", cycle="V",
                       band_dtype="bfloat16", coarsening="pmis",
                       interpolation="extpi", interp_max=4,
                       rap_drop_tol=0.01, agg_levels=1,
                       interp_max_composed=5, intermediate_drop_tol=0.02,
                       aggressive="pmis2", dense_size=2048,
                       cheby_degree_coarse=1, cheby_coarse_from=1)
    A = poisson3d(args.n)
    hier = amg_setup(A, params)
    s = AMGSolver(A, params,
                  KrylovParams(method="cg", loop_mode="host",
                               chunk=args.chunk),
                  hierarchy=hier)

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    sh = SingleDeviceSharding(topo.devices[0])
    absd = lambda t: jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype, sharding=sh)
        if isinstance(a, jax.Array) else a, t)
    lowered = s._kr_start.lower(
        absd(s.device.levels), absd(s.A_df.A_hi),
        jax.ShapeDtypeStruct((s.n_pad,), np.float32, sharding=sh),
        k=args.chunk)
    ma = lowered.compile().memory_analysis()
    g = 1e9
    print(f"n={args.n}^3 chunk={args.chunk}: args {ma.argument_size_in_bytes/g:.2f} GB, "
          f"out {ma.output_size_in_bytes/g:.2f} GB, "
          f"temp {ma.temp_size_in_bytes/g:.2f} GB, "
          f"alias {ma.alias_size_in_bytes/g:.2f} GB -> peak "
          f"{(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes - ma.alias_size_in_bytes)/g:.2f} GB")


if __name__ == "__main__":
    main()
