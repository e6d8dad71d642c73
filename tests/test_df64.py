"""df64 (double-float) arithmetic correctness (SURVEY.md §7 hard-part #1).

The error-free transforms must deliver ~1e-14 relative accuracy from fp32
pairs; validated against numpy float64.
"""
import numpy as np
import jax
import jax.numpy as jnp

from sparsh_amg_tpu.ops import df64
from sparsh_amg_tpu.ops.df64_ops import csr_to_df64, residual_df64
from sparsh_amg_tpu.models import poisson2d


def test_two_sum_exact():
    a = jnp.float32(1.0)
    b = jnp.float32(1e-8)
    s, e = df64.two_sum(a, b)
    assert float(s) + float(e) == 1.0 + 1e-8


def test_two_prod_exact():
    a = jnp.float32(1.0 + 2 ** -12)
    b = jnp.float32(1.0 - 2 ** -12)
    p, e = df64.two_prod(a, b)
    assert float(np.float64(p) + np.float64(e)) == float(a) * float(b)


def test_df64_dot_accuracy():
    rng = np.random.default_rng(0)
    n = 10_000
    x64 = rng.standard_normal(n)
    y64 = rng.standard_normal(n)
    x = jnp.asarray(x64, dtype=jnp.float32)
    y = jnp.asarray(y64, dtype=jnp.float32)
    hi, lo = jax.jit(df64.dot)(x, y)
    got = np.float64(hi) + np.float64(lo)
    want = np.dot(np.asarray(x, np.float64), np.asarray(y, np.float64))
    # df64 accumulation: error ~ eps32^2 per term; demand << fp32 error
    assert abs(got - want) <= 1e-9 * max(1.0, abs(want))


def test_df64_residual_below_fp32():
    """r = b - A x in df64 must resolve residuals far below fp32 roundoff."""
    A = poisson2d(24)
    n = A.shape[0]
    rng = np.random.default_rng(2)
    x64 = rng.standard_normal(n)
    b64 = A @ x64  # so the true residual of x64 is exactly 0
    Adf = csr_to_df64(A)
    n_pad = Adf.A_hi.n_pad
    x_hi_np, x_lo_np = df64.from_f64_np(np.pad(x64, (0, n_pad - n)))
    b_hi_np, b_lo_np = df64.from_f64_np(np.pad(b64, (0, n_pad - n)))
    r_hi, r_lo = jax.jit(residual_df64)(
        Adf, jnp.asarray(b_hi_np), jnp.asarray(b_lo_np),
        jnp.asarray(x_hi_np), jnp.asarray(x_lo_np))
    r = df64.to_f64_np(np.asarray(r_hi), np.asarray(r_lo))[:n]
    relres = np.linalg.norm(r) / np.linalg.norm(b64)
    # fp32 evaluation would give ~1e-7; df64 must be far below
    assert relres < 5e-13


def test_csr_to_df64_native_matches_numpy():
    """The one-pass native DIA df64 builder must match the numpy path
    bitwise (same offsets, same hi/lo split)."""
    import sparsh_amg_tpu._native as nat
    if nat.get_lib() is None:
        import pytest
        pytest.skip("no native toolchain")
    from sparsh_amg_tpu.models.poisson import poisson3d
    A = poisson3d(7).tocsr()
    A.data = A.data * np.pi / 3     # fp32-inexact entries
    M1 = csr_to_df64(A)
    orig = nat.get_lib
    nat.get_lib = lambda: None      # force the numpy fallback
    try:
        M0 = csr_to_df64(A)
    finally:
        nat.get_lib = orig
    assert M1.A_hi.offsets == M0.A_hi.offsets
    assert np.array_equal(np.asarray(M1.A_hi.bands),
                          np.asarray(M0.A_hi.bands))
    assert np.array_equal(np.asarray(M1.lo), np.asarray(M0.lo))


def test_csr_to_df64_exact_drops_lo():
    """fp32-exact entries (FD stencil integers) -> lo is None and the
    df64 SpMV still matches the f64 product."""
    from sparsh_amg_tpu.models.poisson import poisson2d
    A = poisson2d(16)            # entries {4,-1}: fp32-exact
    M = csr_to_df64(A)
    assert M.lo is None
    n = A.shape[0]
    rng = np.random.default_rng(5)
    x64 = rng.standard_normal(n)
    n_pad = M.A_hi.n_pad
    xh, xl = df64.from_f64_np(np.pad(x64, (0, n_pad - n)))
    yh, yl = jax.jit(M.spmv_df64)(jnp.asarray(xh), jnp.asarray(xl))
    y = df64.to_f64_np(np.asarray(yh), np.asarray(yl))[:n]
    want = A @ x64
    err = np.abs(y - want).max() / max(np.abs(want).max(), 1e-30)
    assert err < 1e-13
    # inexact entries must keep lo
    B = A.copy(); B.data = B.data * np.pi / 3
    assert csr_to_df64(B).lo is not None
