"""Pallas TPU kernel for DIA (diagonal) SpMV — the hot kernel of the solve
phase (SURVEY.md §2 C4/C5: the reference's OpenMP/cuSPARSE SpMV; north star
"Pallas SpMV kernels", BASELINE.json:5).

y[j] = sum_d bands[d, j] * x[j + off_d]

Design (v2, DMA-free): x is padded by one full row-tile of zeros on each
side; output tile i then needs x rows [i*R + R - h, i*R + 2R + h), which
(for h <= R) lies inside x-tiles {i, i+1, i+2}.  Those three tiles arrive
as ordinary pipelined BlockSpec inputs — no manual DMA (manual
async-copy + gridded inputs faults this TPU stack; bisected 2026-08-17) —
are concatenated in VMEM, and every diagonal shift is realized on-chip:
a flattened shift by `off` is q = off // 128 sublane rows plus r = off %
128 lanes, the lane part being two `pltpu.roll`s and a lane-index select
(elements crossing a 128-lane boundary come from the next sublane row).

HBM traffic: D band streams + 3 x streams + 1 y stream, vs ~(2D + 2) for
the XLA shifted-FMA fallback — and the whole SpMV is ONE fused op.

Whole-kernel oracle in tests/test_pallas.py (interpret mode) and the
device parity script (real TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _vma_union(*arrays):
    """Union of the inputs' varying-mesh-axes sets, so pallas_call
    out_shapes are legal inside a check_vma=True shard_map (the
    distributed solver's replicated levels call these fused kernels
    shard-locally).  Outside shard_map every vma is empty — no-op."""
    vma = None
    for a in arrays:
        v = getattr(jax.typeof(a), "vma", None)
        if v is not None:
            vma = v if vma is None else (vma | v)
    return vma


def _shifted(xw, q: int, r: int, R: int, lane_idx):
    """rows [q, q+R) of the window, flat-shifted left by r lanes."""
    X1 = xw[q: q + R, :]
    if r == 0:
        return X1
    X2 = xw[q + 1: q + R + 1, :]
    # left-shift by r lanes == non-negative circular roll by LANE - r
    return jnp.where(lane_idx < LANE - r,
                     pltpu.roll(X1, LANE - r, axis=1),
                     pltpu.roll(X2, LANE - r, axis=1))


def _dia_kernel(xc_ref, xa_ref, xb_ref, bands_ref, y_ref, *, offsets,
                R: int):
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    # rows [i*R, i*R + 3R) of the padded x; the output window starts at
    # local row R - h
    xw = jnp.concatenate([xc_ref[:], xa_ref[:], xb_ref[:]], axis=0)
    acc = None
    base = R * LANE       # flat start of the output tile inside the window
    for d, off in enumerate(offsets):
        q, r = divmod(base + off, LANE)
        seg = _shifted(xw, q, r, R, lane_idx)
        term = bands_ref[d] * seg
        acc = term if acc is None else acc + term
    y_ref[:] = acc


def _spmv_window(xw, bands_ref, offsets, R: int, lane_idx):
    """sum_d bands[d] * shift(xw, off_d) for the center R-row tile of a
    3R-row window."""
    acc = None
    base = R * LANE
    for d, off in enumerate(offsets):
        q, r = divmod(base + off, LANE)
        seg = _shifted(xw, q, r, R, lane_idx)
        term = bands_ref[d] * seg
        acc = term if acc is None else acc + term
    return acc


def _dia_kernel_single(x_ref, bands_ref, y_ref, *, offsets, R: int):
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    xw = x_ref[:]
    acc = None
    base = R * LANE
    for d, off in enumerate(offsets):
        q, r = divmod(base + off, LANE)
        seg = _shifted(xw, q, r, R, lane_idx)
        term = bands_ref[d] * seg
        acc = term if acc is None else acc + term
    y_ref[:] = acc


def pallas_dia_ok(n_pad: int, offsets: tuple) -> bool:
    """Feasibility check for the DIA kernels: either a valid row tiling
    exists, or the single-block window (3*rows) fits VMEM comfortably."""
    maxoff = max((abs(o) for o in offsets), default=0)
    h = -(-maxoff // LANE)
    rows = n_pad // LANE
    if _pick_R(rows, h, 2 * (len(offsets) + 4)) is not None:
        return True
    return 3 * rows * LANE * 4 <= 6 * 1024 * 1024


def _pick_R(rows: int, h: int, n_resident: int):
    """Largest multiple-of-8 divisor of `rows` covering the halo and
    fitting the VMEM budget (None -> single-block path)."""
    budget_rows = (8 * 1024 * 1024 // 4 // LANE) // max(n_resident, 1)
    R = None
    for cand in range(16, rows + 1, 16):
        if rows % cand or cand < h:
            continue
        if cand <= budget_rows or R is None:
            R = cand
        if cand > budget_rows:
            break
    return R


def _dia_fused(mulvec, bands, offsets, n_pad, extras, scalars, tail,
               n_out, interpret=False):
    """Shared driver: y_0..y_{n_out-1} = tail(A @ mulvec, extras, scalars),
    all fused into ONE Pallas op.  `extras` are (n_pad,) vectors consumed
    elementwise; `scalars` traced scalars (SMEM); `tail` a trace-time
    python function of (az_tile, extras_tiles, scalar_values)."""
    D = bands.shape[0]
    maxoff = max((abs(o) for o in offsets), default=0)
    h = -(-maxoff // LANE)
    rows = n_pad // LANE
    n_ex = len(extras)
    n_sc = len(scalars)
    R = _pick_R(rows, h, 2 * (D + 4 + n_ex + n_out))
    b3 = bands.reshape(D, rows, LANE)
    ex2 = [e.reshape(rows, LANE) for e in extras]
    scal = (jnp.stack([jnp.asarray(s, jnp.float32) for s in scalars])
            .reshape(1, n_sc) if n_sc else None)
    vma = _vma_union(mulvec, bands, *extras, *scalars)
    out_shape = tuple(jax.ShapeDtypeStruct((rows, LANE), mulvec.dtype,
                                           vma=vma)
                      for _ in range(n_out))

    def run_tail(az, ex_refs, scal_ref, outs):
        svals = ([scal_ref[0, i] for i in range(n_sc)] if n_sc else [])
        res = tail(az, [e[:] for e in ex_refs], svals)
        for o_ref, val in zip(outs, res):
            o_ref[:] = val

    if R is None:
        R1 = rows
        x2 = jnp.concatenate([
            jnp.zeros((R1, LANE), mulvec.dtype),
            mulvec.reshape(rows, LANE),
            jnp.zeros((R1, LANE), mulvec.dtype)])

        def kern_single(*refs):
            x_ref, b_ref = refs[0], refs[1]
            ex_refs = refs[2:2 + n_ex]
            pos = 2 + n_ex
            scal_ref = refs[pos] if n_sc else None
            outs = refs[pos + (1 if n_sc else 0):]
            lane_idx = jax.lax.broadcasted_iota(jnp.int32, (R1, LANE), 1)
            az = _spmv_window(x_ref[:], b_ref, offsets, R1, lane_idx)
            run_tail(az, ex_refs, scal_ref, outs)

        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM)]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_ex
        args = [x2, b3] + ex2
        if n_sc:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            args.append(scal)
        outs = pl.pallas_call(
            kern_single,
            in_specs=in_specs,
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in range(n_out)),
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
    else:
        x2 = jnp.concatenate([
            jnp.zeros((R, LANE), mulvec.dtype),
            mulvec.reshape(rows, LANE),
            jnp.zeros((R, LANE), mulvec.dtype)])

        def kern_grid(*refs):
            xc, xa, xb, b_ref = refs[:4]
            ex_refs = refs[4:4 + n_ex]
            pos = 4 + n_ex
            scal_ref = refs[pos] if n_sc else None
            outs = refs[pos + (1 if n_sc else 0):]
            lane_idx = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
            xw = jnp.concatenate([xc[:], xa[:], xb[:]], axis=0)
            az = _spmv_window(xw, b_ref, offsets, R, lane_idx)
            run_tail(az, ex_refs, scal_ref, outs)

        in_specs = [
            pl.BlockSpec((R, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANE), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANE), lambda i: (i + 2, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, R, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ]
        in_specs += [pl.BlockSpec((R, LANE), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)] * n_ex
        args = [x2, x2, x2, b3] + ex2
        if n_sc:
            in_specs.append(pl.BlockSpec((1, n_sc), lambda i: (0, 0),
                                         memory_space=pltpu.SMEM))
            args.append(scal)
        outs = pl.pallas_call(
            kern_grid,
            grid=(rows // R,),
            in_specs=in_specs,
            out_specs=tuple(
                pl.BlockSpec((R, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_out)),
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
    if n_out == 1:
        return outs[0].reshape(-1) if isinstance(outs, (tuple, list)) \
            else outs.reshape(-1)
    return tuple(o.reshape(-1) for o in outs)


@functools.partial(jax.jit, static_argnames=("offsets", "n_pad", "interpret"))
def dia_residual(bands, x, b, offsets: tuple, n_pad: int,
                 interpret: bool = False):
    """r = b - A x — the cycle's coarse-grid-correction residual, one op."""
    return _dia_fused(x, bands, offsets, n_pad, [b], [],
                      lambda az, ex, sc: (ex[0] - az,), 1, interpret)


@functools.partial(jax.jit, static_argnames=("offsets", "n_pad", "interpret"))
def dia_dinv_residual(bands, x, b, dinv, offsets: tuple, n_pad: int,
                      interpret: bool = False):
    """r = dinv * (b - A x) — Jacobi/Chebyshev residual init, one op."""
    return _dia_fused(x, bands, offsets, n_pad, [b, dinv], [],
                      lambda az, ex, sc: (ex[1] * (ex[0] - az),), 1,
                      interpret)


@functools.partial(jax.jit, static_argnames=("offsets", "n_pad", "interpret"))
def dia_jacobi_sweep(bands, x, b, dinv, omega, offsets: tuple, n_pad: int,
                     interpret: bool = False):
    """x' = x + omega * dinv * (b - A x) — one weighted-Jacobi sweep."""
    return _dia_fused(x, bands, offsets, n_pad, [b, dinv, x], [omega],
                      lambda az, ex, sc:
                      (ex[2] + sc[0] * ex[1] * (ex[0] - az),), 1,
                      interpret)


@functools.partial(jax.jit, static_argnames=("offsets", "n_pad", "interpret"))
def dia_cheb_step(bands, x, d, r, dinv, a, c, offsets: tuple, n_pad: int,
                  interpret: bool = False):
    """One Chebyshev iteration, fused:
        x' = x + d;  r' = r - dinv * (A d);  d' = a*d + c*r'
    (see solve.smoothers.chebyshev for the recurrence)."""
    def tail(az, ex, sc):
        xv, rv, dv, di = ex[0], ex[1], ex[2], ex[3]
        r2 = rv - di * az
        return (xv + dv, r2, sc[0] * dv + sc[1] * r2)
    return _dia_fused(d, bands, offsets, n_pad, [x, r, d, dinv], [a, c],
                      tail, 3, interpret)


@functools.partial(jax.jit, static_argnames=("offsets", "n_pad", "interpret"))
def dia_spmv_pallas(bands: jax.Array, x: jax.Array, offsets: tuple,
                    n_pad: int, interpret: bool = False) -> jax.Array:
    """y = DIA(bands, offsets) @ x.  bands (D, n_pad), x (n_pad,)."""
    D = bands.shape[0]
    maxoff = max((abs(o) for o in offsets), default=0)
    h = -(-maxoff // LANE)              # halo in sublane rows
    rows = n_pad // LANE

    # tile rows: multiple of 8 (TPU sublane block constraint), dividing
    # rows, covering the halo, within VMEM budget (pipelined blocks are
    # double-buffered: 2*(D+4) tiles resident)
    budget_rows = (8 * 1024 * 1024 // 4 // LANE) // (2 * (D + 4))
    R = None
    for cand in range(16, rows + 1, 16):
        if rows % cand or cand < h:
            continue
        if cand <= budget_rows or R is None:
            R = cand
        if cand > budget_rows:
            break
    cost = pl.CostEstimate(flops=2 * D * n_pad,
                           bytes_accessed=4 * (D * n_pad + 4 * n_pad),
                           transcendentals=0)
    b3 = bands.reshape(D, rows, LANE)

    if R is None:
        # no valid tiling: single block, x fully VMEM-resident
        R = rows
        x2 = jnp.concatenate([
            jnp.zeros((R, LANE), x.dtype), x.reshape(rows, LANE),
            jnp.zeros((R, LANE), x.dtype)])
        kernel = functools.partial(_dia_kernel_single, offsets=offsets,
                                   R=R)
        y2 = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, LANE), x.dtype,
                                           vma=_vma_union(x, bands)),
            cost_estimate=cost,
            interpret=interpret,
        )(x2, b3)
        return y2.reshape(-1)

    grid = rows // R
    x2 = jnp.concatenate([
        jnp.zeros((R, LANE), x.dtype),
        x.reshape(rows, LANE),
        jnp.zeros((R, LANE), x.dtype)])

    kernel = functools.partial(_dia_kernel, offsets=offsets, R=R)
    y2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((R, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # x tile i
            pl.BlockSpec((R, LANE), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),       # x tile i+1
            pl.BlockSpec((R, LANE), lambda i: (i + 2, 0),
                         memory_space=pltpu.VMEM),       # x tile i+2
            pl.BlockSpec((D, R, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),       # bands tile
        ],
        out_specs=pl.BlockSpec((R, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), x.dtype,
                                       vma=_vma_union(x, bands)),
        cost_estimate=cost,
        interpret=interpret,
    )(x2, x2, x2, b3)
    return y2.reshape(-1)
