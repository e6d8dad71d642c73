"""Pallas DIA SpMV kernel oracle (interpret mode on the CPU backend)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparsh_amg_tpu.models.poisson import poisson2d, poisson3d
from sparsh_amg_tpu.ops.formats import csr_to_dia
from sparsh_amg_tpu.ops.pallas_spmv import dia_spmv_pallas


@pytest.mark.parametrize("mk,arg", [(poisson2d, 20), (poisson3d, 12),
                                    (poisson2d, 37)])
def test_dia_pallas_matches_xla(mk, arg):
    A = mk(arg).tocsr()
    dia = csr_to_dia(A)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(dia.n_pad).astype(np.float32))
    y_ref = np.asarray(dia.spmv(x))
    y_pl = np.asarray(dia_spmv_pallas(dia.bands, x, dia.offsets,
                                      dia.n_pad, interpret=True))
    np.testing.assert_allclose(y_pl, y_ref, rtol=1e-5, atol=1e-5)


def test_dia_pallas_wide_band():
    # offsets not multiples of 128 nor small: stress the q/r decomposition
    import scipy.sparse as sp
    n = 1000
    offs = [-300, -129, -127, -5, 0, 3, 127, 128, 301]
    rng = np.random.default_rng(1)
    diags = [rng.standard_normal(n) for _ in offs]
    A = sp.diags(diags, offs, shape=(n, n), format="csr")
    dia = csr_to_dia(A)
    x = jnp.asarray(rng.standard_normal(dia.n_pad).astype(np.float32))
    y_ref = np.asarray(dia.spmv(x))
    y_pl = np.asarray(dia_spmv_pallas(dia.bands, x, dia.offsets,
                                      dia.n_pad, interpret=True))
    np.testing.assert_allclose(y_pl, y_ref, rtol=1e-4, atol=1e-4)


def test_fused_kernels_interpret():
    import jax.numpy as jnp
    from sparsh_amg_tpu.ops.pallas_spmv import (
        dia_residual, dia_dinv_residual, dia_jacobi_sweep, dia_cheb_step)
    A = poisson3d(12).tocsr()
    dia = csr_to_dia(A)
    rng = np.random.default_rng(2)
    n_pad = dia.n_pad
    x = jnp.asarray(rng.standard_normal(n_pad).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n_pad).astype(np.float32))
    r = jnp.asarray(rng.standard_normal(n_pad).astype(np.float32))
    d = jnp.asarray(rng.standard_normal(n_pad).astype(np.float32))
    dinv = jnp.asarray((1.0 / 6.0) * np.ones(n_pad, np.float32))
    az = np.asarray(dia.spmv(x))
    kw = dict(offsets=dia.offsets, n_pad=n_pad, interpret=True)

    got = np.asarray(dia_residual(dia.bands, x, b, **kw))
    np.testing.assert_allclose(got, np.asarray(b) - az, rtol=1e-5, atol=1e-5)

    got = np.asarray(dia_dinv_residual(dia.bands, x, b, dinv, **kw))
    np.testing.assert_allclose(got, np.asarray(dinv) * (np.asarray(b) - az),
                               rtol=1e-5, atol=1e-5)

    got = np.asarray(dia_jacobi_sweep(dia.bands, x, b, dinv, 0.7, **kw))
    np.testing.assert_allclose(
        got, np.asarray(x) + 0.7 * np.asarray(dinv) * (np.asarray(b) - az),
        rtol=1e-5, atol=1e-5)

    ad = np.asarray(dia.spmv(d))
    x2, r2, d2 = dia_cheb_step(dia.bands, x, d, r, dinv, 0.3, 0.9, **kw)
    r2_ref = np.asarray(r) - np.asarray(dinv) * ad
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x) + np.asarray(d),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2), r2_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2),
                               0.3 * np.asarray(d) + 0.9 * r2_ref,
                               rtol=1e-4, atol=1e-4)
