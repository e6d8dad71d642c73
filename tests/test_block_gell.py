"""Block-GELL (BCSR-analogue) device layout for systems operators
(ops/block_gell.py; VERDICT r4 missing #4)."""
import os

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from sparsh_amg_tpu.models.elasticity import (elasticity2d, elasticity3d,
                                              elasticity3d_nullspace)
from sparsh_amg_tpu.ops.block_gell import (csr_to_block_gell,
                                           block_gell_pallas,
                                           _block_gather_xla)


@pytest.mark.parametrize("case", ["elas3d", "elas2d", "random"])
def test_block_spmv_matches_scipy(case):
    rng = np.random.default_rng(0)
    if case == "elas3d":
        A, bs = elasticity3d(8), 3
    elif case == "elas2d":
        A, bs = elasticity2d(12), 2
    else:
        # random block-sparse with missing intra-block entries
        nb, bs = 70, 3
        P = (sp.random(nb, nb, density=0.08, random_state=1) > 0)
        P = (P + P.T + sp.eye(nb)).tocsr()
        dense = sp.kron(P, np.ones((bs, bs))).tocsr()
        dense.data = rng.standard_normal(dense.nnz)
        mask = rng.random(dense.nnz) > 0.3      # punch intra-block holes
        dense.data = np.where(mask, dense.data, 0.0)
        dense.eliminate_zeros()
        A = dense
    A = A.tocsr()
    B = csr_to_block_gell(A, bs, dtype=jnp.float32)
    assert B is not None
    assert B.bs == bs and B.n_rows == A.shape[0]
    x = rng.standard_normal(B.n_pad).astype(np.float32)
    y_ref = A @ x[: A.shape[0]].astype(np.float64)
    y = np.asarray(B.spmv(jnp.asarray(x)))[: A.shape[0]]
    scale = max(np.abs(y_ref).max(), 1.0)
    assert np.abs(y - y_ref).max() / scale < 5e-6


def test_block_kernel_interpret_matches_xla():
    """The Pallas kernel (interpret mode) against the XLA gather oracle
    on the same packed tables."""
    A, bs = elasticity3d(6), 3
    B = csr_to_block_gell(A.tocsr(), bs, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    n_node_src = B.n_cols // bs
    planes = rng.standard_normal((bs, B.src_pad)).astype(np.float32)
    out_i = np.asarray(block_gell_pallas(
        B.wwords, B.counts, B.packed, B.bvals, jnp.asarray(planes),
        s=B.s, tr=B.tr, wmode=B.wmode, bs=bs, interpret=True))
    out_x = np.asarray(_block_gather_xla(B, jnp.asarray(planes)))
    got = out_i.transpose(1, 0, 2, 3).reshape(bs, -1)
    scale = max(np.abs(out_x).max(), 1.0)
    assert np.abs(got - out_x).max() / scale < 1e-5


def test_block_gell_in_hierarchy(monkeypatch):
    """to_device picks the block layout for systems levels (fine bs from
    agg_blocksize, SA coarse bs from the nullspace dim) and the solve
    matches the scalar layout."""
    monkeypatch.setenv("SPARSH_FORCE_GELL", "1")
    from sparsh_amg_tpu.params import AMGParams, KrylovParams
    from sparsh_amg_tpu.solve.solver import AMGSolver
    A = elasticity3d(12)
    ns = elasticity3d_nullspace(12)
    p = AMGParams(coarsening="aggregation", interpolation="smoothed",
                  smoother="chebyshev", coarse_size=200, agg_blocksize=3,
                  p_smooth_filter=False, dense_size=512)
    kr = KrylovParams(method="cg", tol=1e-8, maxiter=300)
    b = np.random.default_rng(0).standard_normal(A.shape[0])
    s = AMGSolver(A, params=p, krylov=kr, nullspace=ns)
    ops = [type(l.A).__name__ for l in s.device.levels]
    assert ops[0] == "BlockGellMatrix", ops
    r = s.solve(b)
    assert r.converged and r.relres <= 1e-8
    monkeypatch.setenv("SPARSH_NO_BLOCK_GELL", "1")
    s2 = AMGSolver(A, params=p, krylov=kr, nullspace=ns)
    assert type(s2.device.levels[0].A).__name__ != "BlockGellMatrix"
    r2 = s2.solve(b)
    assert abs(r2.iterations - r.iterations) <= 1
