"""Device-layout SpMV exactness against scipy (SURVEY.md §4.1)."""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from sparsh_amg_tpu.models import poisson2d, poisson3d, anisotropic2d
from sparsh_amg_tpu.ops.formats import (DiaMatrix, EllMatrix, csr_to_dia,
                                        csr_to_ell, csr_to_device,
                                        csr_diag_offsets)


def _rand_csr(n, m, density, seed):
    rng = np.random.default_rng(seed)
    A = sp.random(n, m, density=density, random_state=np.random.RandomState(seed),
                  format="csr")
    A.data = rng.integers(-8, 8, size=A.nnz).astype(np.float64)
    return A


def _spmv_check(A, dev, atol=1e-5):
    rng = np.random.default_rng(1)
    # integer-valued data and x keep fp32 exact for small sizes
    x = rng.integers(-4, 5, size=A.shape[1]).astype(np.float64)
    y_ref = A @ x
    xp = jnp.asarray(np.pad(x, (0, max(0, dev.n_pad - len(x)))),
                     dtype=jnp.float32)
    y = np.asarray(dev.spmv(xp))[: A.shape[0]]
    np.testing.assert_allclose(y, y_ref, atol=atol)


def test_dia_poisson2d():
    A = poisson2d(13)
    dev = csr_to_dia(A)
    assert isinstance(dev, DiaMatrix)
    assert dev.offsets == (-13, -1, 0, 1, 13)
    _spmv_check(A, dev)


def test_dia_poisson3d():
    A = poisson3d(5)
    dev = csr_to_device(A)
    assert isinstance(dev, DiaMatrix)
    assert len(dev.offsets) == 7
    _spmv_check(A, dev)


def test_ell_random_square():
    A = _rand_csr(97, 97, 0.07, 3)
    dev = csr_to_ell(A)
    assert isinstance(dev, EllMatrix)
    _spmv_check(A, dev)


def test_ell_rectangular():
    A = _rand_csr(120, 37, 0.1, 4)
    dev = csr_to_ell(A)
    _spmv_check(A, dev)


def test_device_format_selection():
    # random sparse -> ELL; stencil -> DIA
    assert isinstance(csr_to_device(_rand_csr(64, 64, 0.05, 5)), EllMatrix)
    assert isinstance(csr_to_device(poisson2d(9)), DiaMatrix)
    # prefer_dia=False forces ELL
    assert isinstance(csr_to_device(poisson2d(9), prefer_dia=False), EllMatrix)


def test_anisotropic_is_dia():
    A = anisotropic2d(11)
    dev = csr_to_device(A)
    assert isinstance(dev, DiaMatrix)
    assert len(dev.offsets) == 9
    _spmv_check(A, dev)


def test_empty_rows_ell():
    A = sp.csr_matrix((8, 8))
    A[3, 4] = 2.0
    A = A.tocsr()
    dev = csr_to_ell(A)
    _spmv_check(A, dev)


def test_ell_one_shot_gather_large_k():
    """K > 2 takes the single 2D-gather path; oracle vs scipy."""
    import scipy.sparse as sp
    from sparsh_amg_tpu.ops.formats import csr_to_ell
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    A = sp.random(300, 300, density=0.15, random_state=rng, format="csr")
    A = (A + sp.identity(300)).tocsr()
    ell = csr_to_ell(A)
    assert ell.k > 2
    x = rng.standard_normal(ell.n_pad).astype(np.float32)
    y = np.asarray(ell.spmv(jnp.asarray(x)))
    want = A @ x[: 300]
    np.testing.assert_allclose(y[:300], want, rtol=2e-4, atol=1e-4)
