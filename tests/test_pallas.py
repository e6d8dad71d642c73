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
