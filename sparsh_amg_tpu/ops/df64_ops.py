"""Double-float sparse operators for high-precision residuals.

The iterative-refinement outer loop (solve to 1e-8 on fp32 hardware,
SURVEY.md §7 hard-part #1) needs r = b - A x evaluated beyond fp32: the
fine-level operator is stored as a df64 pair (hi, lo) in the same DIA/ELL
layout, and the SpMV accumulates in df64.  ~6x the flops of the fp32 SpMV,
still HBM-bound, and runs only once per refinement pass.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from . import df64
from .formats import DiaMatrix, EllMatrix, csr_to_device


@partial(jax.tree_util.register_dataclass,
         data_fields=["A_hi", "lo"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class Df64Matrix:
    """A sparse matrix as a df64 pair: A = A_hi + lo (lo shares A_hi's
    layout arrays).  lo is None when every entry of A is fp32-exact
    (common: FD stencils with integer coefficients) — the lo half of the
    SpMV and its HBM traffic then vanish entirely."""
    A_hi: object              # DiaMatrix | EllMatrix (fp32)
    lo: jax.Array | None      # same shape as A_hi.bands / A_hi.vals

    def _mul(self, d, a_hi, x_hi, x_lo):
        if self.lo is None:
            # entries exact in fp32: df64 * fp32-matrix product
            return df64.mul_f32(x_hi, x_lo, a_hi)
        return df64.mul(a_hi, self.lo[d], x_hi, x_lo)

    def spmv_df64(self, x_hi, x_lo):
        """y = A @ x in df64; returns (y_hi, y_lo)."""
        A = self.A_hi
        if isinstance(A, DiaMatrix):
            n_pad = A.n_pad
            maxoff = max((abs(o) for o in A.offsets), default=0)
            xh = jnp.pad(x_hi, (maxoff, maxoff))
            xl = jnp.pad(x_lo, (maxoff, maxoff))
            y_hi = jnp.zeros(n_pad, dtype=x_hi.dtype)
            y_lo = jnp.zeros(n_pad, dtype=x_hi.dtype)
            for d, off in enumerate(A.offsets):
                sh = jax.lax.dynamic_slice(xh, (maxoff + off,), (n_pad,))
                sl = jax.lax.dynamic_slice(xl, (maxoff + off,), (n_pad,))
                p_hi, p_lo = self._mul(d, A.bands[d], sh, sl)
                y_hi, y_lo = df64.add(y_hi, y_lo, p_hi, p_lo)
            return y_hi, y_lo
        elif isinstance(A, EllMatrix):
            y_hi = jnp.zeros(A.n_pad, dtype=x_hi.dtype)
            y_lo = jnp.zeros(A.n_pad, dtype=x_hi.dtype)
            for k in range(A.k):
                gh = x_hi.at[A.cols[k]].get(mode="promise_in_bounds")
                gl = x_lo.at[A.cols[k]].get(mode="promise_in_bounds")
                p_hi, p_lo = self._mul(k, A.vals[k], gh, gl)
                y_hi, y_lo = df64.add(y_hi, y_lo, p_hi, p_lo)
            return y_hi, y_lo
        raise TypeError(type(A))


def csr_to_df64(A: sp.csr_matrix, prefer_dia: bool = True,
                dia_max_bands: int = 32,
                pad_multiple: int = 2048) -> Df64Matrix:
    """Build a df64 device operator from a host float64 CSR matrix."""
    n, m = A.shape
    if prefer_dia and n == m and A.nnz > 0:
        # single-pass native builder: offsets scan + error-free hi/lo band
        # split in one OpenMP sweep (the numpy path below re-copies the
        # CSR twice, sorts an nnz-length offsets array, and scatters f64
        # bands twice — ~38 s at 5e7 nnz on the deploy VM vs ~1 s here)
        from .._native import get_lib, csr_arrays
        from .formats import _round_up
        lib = get_lib()
        if lib is not None:
            indptr, indices, data = csr_arrays(A)
            uoffs = np.empty(dia_max_bands + 1, dtype=np.int64)
            k = int(lib.dia_offsets(n, indptr, indices, dia_max_bands,
                                    uoffs))
            if k > 0 and k * n <= 4 * A.nnz:
                n_pad = _round_up(max(n, 1), pad_multiple)
                bands_hi = np.empty((k, n_pad), dtype=np.float32)
                bands_lo = np.empty((k, n_pad), dtype=np.float32)
                lib.dia_fill_df64(n, n_pad, k, indptr, indices, data,
                                  uoffs[:k].copy(), bands_hi, bands_lo)
                A_hi = DiaMatrix(bands=jnp.asarray(bands_hi),
                                 offsets=tuple(int(o) for o in uoffs[:k]),
                                 n_rows=n, n_cols=m)
                lo = None if not bands_lo.any() else jnp.asarray(bands_lo)
                return Df64Matrix(A_hi=A_hi, lo=lo)
    A_hi_host = A.copy()
    A_hi_host.data = A.data.astype(np.float32).astype(np.float64)
    lo_host = A.copy()
    lo_host.data = A.data - A_hi_host.data
    # lo shares A's sparsity pattern exactly (no eliminate_zeros), so the
    # format choice and slot/band layout are identical; when the pattern is
    # DIA-eligible, compute the (rows, offsets) maps ONCE for both halves
    # (each pass costs seconds at 5*10^7 nnz).
    n, m = A.shape
    pre = None
    if prefer_dia and n == m and A.nnz > 0:
        from .formats import csr_to_dia
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
        offs = A.indices.astype(np.int64) - rows
        uoffs = np.unique(offs)
        if len(uoffs) <= dia_max_bands and len(uoffs) * n <= 4 * A.nnz:
            pre = (rows, offs, uoffs)
    if pre is not None:
        A_hi = csr_to_dia(A_hi_host, dtype=jnp.float32,
                          pad_multiple=pad_multiple, _pre=pre)
        lo_dev = csr_to_dia(lo_host, dtype=jnp.float32,
                            pad_multiple=pad_multiple, _pre=pre)
    else:
        A_hi = csr_to_device(A_hi_host, dtype=jnp.float32,
                             prefer_dia=prefer_dia,
                             dia_max_bands=dia_max_bands,
                             pad_multiple=pad_multiple)
        lo_dev = csr_to_device(lo_host, dtype=jnp.float32,
                               prefer_dia=prefer_dia,
                               dia_max_bands=dia_max_bands,
                               pad_multiple=pad_multiple)
    exact = not lo_host.data.any()   # every entry fp32-exact -> drop lo
    if isinstance(A_hi, DiaMatrix):
        assert isinstance(lo_dev, DiaMatrix) and lo_dev.offsets == A_hi.offsets
        return Df64Matrix(A_hi=A_hi, lo=None if exact else lo_dev.bands)
    assert isinstance(lo_dev, EllMatrix) and lo_dev.vals.shape == A_hi.vals.shape
    return Df64Matrix(A_hi=A_hi, lo=None if exact else lo_dev.vals)


def residual_df64(Adf: Df64Matrix, b_hi, b_lo, x_hi, x_lo):
    """r = b - A x in df64."""
    ax_hi, ax_lo = Adf.spmv_df64(x_hi, x_lo)
    return df64.sub(b_hi, b_lo, ax_hi, ax_lo)
