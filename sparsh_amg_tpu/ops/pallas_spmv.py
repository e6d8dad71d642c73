"""Pallas TPU kernel for DIA (diagonal) SpMV — the hot kernel of the solve
phase (SURVEY.md §2 C4/C5: the reference's OpenMP/cuSPARSE SpMV; north star
"Pallas SpMV kernels", BASELINE.json:5).

y[j] = sum_d bands[d, j] * x[j + off_d]

The XLA fallback (formats.DiaMatrix.spmv) materializes one shifted copy of
x per diagonal: ~(2D+2) streams of HBM traffic for D diagonals.  This
kernel streams each row-tile of x into VMEM ONCE and realizes every
diagonal shift on-chip with sublane slices + lane rolls, for (D+2) streams
— the memory-bound speed-of-light for the format.

Layout: all operands reshaped to (rows, 128) so the lane dimension is the
fastest axis.  A flattened shift by `off` decomposes as q = off // 128
sublane rows + r = off % 128 lanes; the lane part is two `pltpu.roll`s and
a lane-index select (elements that wrap a 128-lane boundary come from the
next sublane row).

x is pre-padded with H = round_up(max|off|, 128) zeros on both sides, so
every tile's extended window [i*T, i*T + T + 2H) is in bounds and the
Dirichlet boundary needs no masking.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shifted(xs_block, q: int, r: int, R: int, lane_idx):
    """rows [q, q+R) of the extended window, flat-shifted by r lanes."""
    X1 = xs_block[q: q + R, :]
    if r == 0:
        return X1
    X2 = xs_block[q + 1: q + R + 1, :]
    # left-shift by r lanes == non-negative circular roll by LANE - r
    return jnp.where(lane_idx < LANE - r,
                     pltpu.roll(X1, LANE - r, axis=1),
                     pltpu.roll(X2, LANE - r, axis=1))


def _dia_kernel(x_hbm, bands_ref, y_ref, xs, sem, *, offsets, H, R):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * R, R + 2 * (H // LANE)), :], xs, sem)
    dma.start()
    dma.wait()
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    xv = xs[:]
    acc = None
    for d, off in enumerate(offsets):
        q, r = divmod(H + off, LANE)
        seg = _shifted(xv, q, r, R, lane_idx)
        term = bands_ref[d] * seg
        acc = term if acc is None else acc + term
    y_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "n_pad", "interpret"))
def dia_spmv_pallas(bands: jax.Array, x: jax.Array, offsets: tuple,
                    n_pad: int, interpret: bool = False) -> jax.Array:
    """y = DIA(bands, offsets) @ x.  bands (D, n_pad), x (n_pad,)."""
    D = bands.shape[0]
    maxoff = max((abs(o) for o in offsets), default=0)
    H = _round_up(maxoff, LANE) if maxoff else 0
    rows = n_pad // LANE

    # tile size: as large as VMEM comfortably allows.  Pallas double-buffers
    # the streamed bands/y blocks (2x), and the x window adds R + 2H/128
    # rows of scratch; budget well under the 16 MB scoped-vmem limit.
    budget_rows = (4 * 1024 * 1024 // 4 // LANE) // (2 * D + 4)
    R = max(1, min(rows, budget_rows))
    while rows % R:
        R -= 1
    grid = rows // R

    xp = jnp.concatenate([jnp.zeros(H, x.dtype), x, jnp.zeros(H, x.dtype)])
    x2 = xp.reshape(-1, LANE)
    b3 = bands.reshape(D, rows, LANE)

    kernel = functools.partial(_dia_kernel, offsets=offsets, H=H, R=R)
    y2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # x (manual DMA)
            pl.BlockSpec((D, R, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),       # bands tile
        ],
        out_specs=pl.BlockSpec((R, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((R + 2 * (H // LANE), LANE), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * D * n_pad,
            bytes_accessed=4 * (D * n_pad + 2 * n_pad),
            transcendentals=0),
        interpret=interpret,
    )(x2, b3)
    return y2.reshape(-1)
