"""Gathered-ELL layout + window-gather kernel oracles (ops/gell.py).

Covers the three operator shapes the kernel serves in the solve phase:
square coarse operators, prolongation (wide source slope < 1) and
restriction (source = fine vector, slope ~ coarsening ratio)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from sparsh_amg_tpu.ops.gell import (GellMatrix, csr_to_gell,
                                     _gell_gather_xla, gell_gather_pallas,
                                     LANE, WIN)
from sparsh_amg_tpu.models.poisson import poisson2d, poisson3d
from sparsh_amg_tpu.params import AMGParams
from sparsh_amg_tpu.setup.hierarchy import amg_setup


def _spmv_oracle(A, G, x=None):
    rng = np.random.default_rng(0)
    if x is None:
        x = rng.standard_normal(A.shape[1])
    xp = jnp.asarray(np.pad(x, (0, G.src_pad - len(x))), jnp.float32)
    y = np.asarray(G.spmv(xp))[: A.shape[0]]
    want = A @ x
    np.testing.assert_allclose(y, want, rtol=2e-5, atol=1e-5)


def test_gell_square_poisson2d():
    A = poisson2d(40)
    G = csr_to_gell(A)
    assert G is not None and G.k == 5
    _spmv_oracle(A, G)


def test_gell_reconstructs_indices():
    """Packed windows/sel/sub/lane must reconstruct the CSR columns."""
    A = poisson2d(24)
    G = csr_to_gell(A)
    tile = G.tr * LANE
    packed = np.asarray(G.packed).reshape(G.n_tiles, tile)
    windows = np.array([[G.window(t, s) for s in range(G.s)]
                        for t in range(G.n_tiles)])
    sel, sub, ln = packed >> 10, (packed >> 7) & 7, packed & 127
    base = np.take_along_axis(windows, sel, axis=1)
    nr = G.stream_rows
    idx = (base * WIN + sub * 128 + ln).reshape(nr, G.k)
    vals = np.asarray(G.vals, dtype=np.float64).reshape(nr, G.k)
    R = sp.csr_matrix((vals.ravel(),
                       (np.repeat(np.arange(nr), G.k), idx.ravel())),
                      shape=(nr, max(G.src_pad, A.shape[1])))
    R.sum_duplicates()
    diff = abs(R[:A.shape[0], :A.shape[1]] - A)
    assert diff.max() < 1e-6


def test_gell_rectangular_transfers():
    """P (fine x coarse) and R (coarse x fine) from a real hierarchy."""
    A = poisson3d(16)
    hier = amg_setup(A, AMGParams(coarsening="pmis", interpolation="extpi",
                                  interp_max=4))
    lev = hier.levels[0]
    for M in (lev.P.tocsr(), lev.R.tocsr()):
        G = csr_to_gell(M)
        assert G is not None, f"packer refused shape {M.shape}"
        _spmv_oracle(M, G)


def test_gell_irregular_random():
    rng = np.random.default_rng(3)
    A = sp.random(300, 450, density=0.02, random_state=4, format="csr")
    G = csr_to_gell(A, s_max=32, k_cap=64)
    if G is None:
        pytest.skip("random matrix too irregular for GELL (expected)")
    _spmv_oracle(A, G)


def test_gell_pallas_interpret_matches_xla():
    A = poisson2d(32)
    G = csr_to_gell(A)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(G.src_pad), jnp.float32)
    got = np.asarray(gell_gather_pallas(G.wwords, G.counts, G.packed,
                                        G.vals, x, s=G.s, tr=G.tr,
                                        wmode=G.wmode, interpret=True))
    want = np.asarray(_gell_gather_xla(G, x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_gell_native_packer_matches_numpy(monkeypatch):
    """The OpenMP packer (amg_core gell_windows/gell_fill) must produce
    bit-identical tables to the vectorized-numpy oracle."""
    from sparsh_amg_tpu._native import get_lib
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    A3 = poisson3d(12)
    hier = amg_setup(A3, AMGParams(coarsening="pmis",
                                   interpolation="extpi", interp_max=4))
    lev = hier.levels[0]
    mats = [poisson2d(40), A3, lev.P.tocsr(), lev.R.tocsr(),
            sp.csr_matrix((np.array([2.0, 3.0, 4.0]),
                           (np.array([0, 0, 5]), np.array([1, 7, 3]))),
                          shape=(9, 11))]
    for dt in (jnp.float32, jnp.bfloat16):
        for M in mats:
            Gn = csr_to_gell(M, dtype=dt)
            monkeypatch.setenv("SPARSH_GELL_NUMPY", "1")
            Gp = csr_to_gell(M, dtype=dt)
            monkeypatch.delenv("SPARSH_GELL_NUMPY")
            assert (Gn is None) == (Gp is None)
            if Gn is None:
                continue
            for f in ("n_rows", "n_cols", "k", "s", "tr", "wmode",
                      "src_pad", "n_pad"):
                assert getattr(Gn, f) == getattr(Gp, f), f
            for f in ("wwords", "counts", "packed"):
                np.testing.assert_array_equal(np.asarray(getattr(Gn, f)),
                                              np.asarray(getattr(Gp, f)),
                                              err_msg=f)
            np.testing.assert_array_equal(
                np.asarray(Gn.vals, dtype=np.float32),
                np.asarray(Gp.vals, dtype=np.float32))


def test_gell_empty_and_padded_rows():
    """Rows with zero nonzeros and degree variance still pack correctly."""
    A = sp.csr_matrix(
        (np.array([2.0, 3.0, 4.0]),
         (np.array([0, 0, 5]), np.array([1, 7, 3]))),
        shape=(9, 11))
    G = csr_to_gell(A)
    _spmv_oracle(A, G)


def _skewed_csr(n=600, m=3000, seed=7):
    """Rows mostly light with a heavy tail — the restriction profile that
    makes plain GELL pad ~2x."""
    rng = np.random.default_rng(seed)
    deg = np.where(rng.random(n) < 0.9,
                   rng.integers(3, 12, n), rng.integers(60, 90, n))
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    cols = []
    for i in range(n):
        base = int(i * m / n)
        c = np.unique((base + rng.integers(0, 400, deg[i])) % m)
        cols.append(np.sort(c))
    indices = np.concatenate(cols).astype(np.int32)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(c) for c in cols], out=indptr[1:])
    data = rng.standard_normal(indptr[-1])
    return sp.csr_matrix((data, indices, indptr), shape=(n, m))


def test_split_gell_matches_scipy():
    from sparsh_amg_tpu.ops.gell import csr_to_gell_auto, SplitGell
    A = _skewed_csr()
    G = csr_to_gell_auto(A)
    assert isinstance(G, SplitGell), "skewed profile should trigger a split"
    # the split stream must actually be smaller than the plain packing
    # (logical slots; the fixed tile-padding floor is shared by both)
    deg = np.diff(A.indptr)
    plain_slots = A.shape[0] * int(deg.max())
    kq = G.part.k
    g = np.maximum(1, -(-deg // kq))
    split_slots = int(g.sum()) * kq + A.shape[0] * G.comb.k
    assert split_slots < 0.8 * plain_slots
    _spmv_oracle(A, G)


def test_split_gell_uniform_stays_plain():
    from sparsh_amg_tpu.ops.gell import csr_to_gell_auto, SplitGell
    A = poisson2d(40)          # uniform 5-point rows: nothing to split
    G = csr_to_gell_auto(A)
    assert not isinstance(G, SplitGell)
    _spmv_oracle(A, G)
