"""Block-GELL: the BCSR analogue for systems operators (VERDICT r4
missing #4; SURVEY.md §2 C1 "block-ELL/BCSR device layout").

Dof-interleaved systems matrices (3-D elasticity: 3 dofs/node, 81-entry
rows) ran the scalar GELL/SplitGell path at ~2x Poisson per-nnz
(CONFIGS_r4): the interleaving triples the gather traffic and spreads
windows.  The reference class gets cuSPARSE BSR for free; the TPU-native
equivalent packs the NODE-level pattern ONCE — window/packed tables at
node granularity, K_node ~ 27 instead of K_dof ~ 81 — and stores the
values as dense bs x bs blocks:

    y_c[i] = sum_j sum_d A[c,d](i,j) * x_d[j]        (c, d < bs)

The kernel gathers each window's slab from the bs DE-INTERLEAVED source
component planes (identical geometry => one shared window table) and
folds the bs^2 value planes into bs output streams.  Per packed slot:
bs gathers + bs^2 FMAs, against the scalar layout's bs^2 gathers spread
over ~3x more tiles — same vals bytes, ~bs^2/bs = 3x fewer gather ops
and ~bs^2 x fewer tiles/window-table entries.

Values land block-dense (missing intra-block entries are explicit
zeros); the node pattern is the union of each block's dof pattern.
Vectors stay dof-interleaved outside: spmv de-interleaves x and
re-interleaves y (two n-length reshuffles, small next to the matvec).
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .gell import (LANE, WIN, GellMatrix, csr_to_gell, use_pallas_gell,
                   gell_eligible, _decode_windows_jnp, _smem_per_tile,
                   SMEM_BUDGET, _round_up)


@partial(jax.tree_util.register_dataclass,
         data_fields=["wwords", "counts", "packed", "bvals"],
         meta_fields=["n_rows", "n_cols", "bs", "k", "s", "tr", "wmode",
                      "src_pad", "n_pad"])
@dataclasses.dataclass(frozen=True)
class BlockGellMatrix:
    """Node-pattern GELL tables + dense bs x bs value blocks."""
    wwords: jax.Array         # (n_tiles, W) int32 — node-space windows
    counts: jax.Array         # (n_tiles,)
    packed: jax.Array         # (n_tiles, TR, LANE) uint16/int32
    bvals: jax.Array          # (bs*bs, n_tiles, TR, LANE) band dtype,
                              # plane c*bs+d = A[c,d] values
                              # (component-major: the packer's per-plane
                              # gather lands contiguous, no 160 MB
                              # strided transpose on the host)
    n_rows: int               # logical DOF rows
    n_cols: int
    bs: int
    k: int                    # node-row slots
    s: int
    tr: int
    wmode: int
    src_pad: int              # padded NODE source-plane length
    n_pad: int                # spmv output length (dof space)

    @property
    def n_tiles(self) -> int:
        return self.packed.shape[0]

    @property
    def stream_rows(self) -> int:
        """Node rows of the internal stream."""
        return (self.packed.shape[0] * self.tr * LANE) // self.k

    def spmv(self, x: jax.Array) -> jax.Array:
        bs = self.bs
        n_node_src = self.n_cols // bs
        planes = x[: n_node_src * bs].reshape(n_node_src, bs).T
        if n_node_src < self.src_pad:
            planes = jnp.pad(planes,
                             ((0, 0), (0, self.src_pad - n_node_src)))
        if use_pallas_gell():
            streams = _block_spmv_pallas(self, planes)
        else:
            streams = _block_gather_xla(self, planes)
        rows = self.stream_rows
        y = streams.reshape(bs, rows, self.k).sum(
            axis=2, dtype=jnp.float32)               # (bs, node rows)
        y = y.T.reshape(-1)                          # dof-interleave
        if self.n_pad <= y.shape[0]:
            return y[: self.n_pad]
        return jnp.pad(y, (0, self.n_pad - y.shape[0]))


def _block_gather_xla(B: BlockGellMatrix, planes):
    """Oracle / non-TPU fallback: flat gathers per component plane."""
    packed = B.packed.astype(jnp.int32)
    sel = packed >> 10
    sub = (packed >> 7) & 7
    ln = packed & 127
    windows = _decode_windows_jnp(B.wwords, B.s, B.wmode)
    base = jnp.take_along_axis(
        windows[:, :, None], sel.reshape(sel.shape[0], 1, -1), axis=1
    ).reshape(sel.shape)
    idx = (base * WIN + sub * LANE + ln).reshape(-1)
    bs = B.bs
    xg = [planes[d].at[idx].get(mode="promise_in_bounds")
          for d in range(bs)]                        # (slots,) each
    v = B.bvals.astype(jnp.float32).reshape(bs * bs, -1)
    outs = []
    for c in range(bs):
        acc = v[c * bs] * xg[0]
        for d in range(1, bs):
            acc = acc + v[c * bs + d] * xg[d]
        outs.append(acc)
    return jnp.stack(outs)                           # (bs, slots)


def _block_spmv_pallas(B: BlockGellMatrix, planes):
    """Chunked Pallas dispatch (SMEM window-table budget, as the scalar
    path)."""
    per_tile = _smem_per_tile(B.wwords.shape[1])
    max_tiles = max(SMEM_BUDGET // per_tile, 1)
    n = B.n_tiles
    if n <= max_tiles:
        out = block_gell_pallas(B.wwords, B.counts, B.packed, B.bvals,
                                planes, s=B.s, tr=B.tr, wmode=B.wmode,
                                bs=B.bs)
        return out.transpose(1, 0, 2, 3).reshape(B.bs, -1)
    import math
    K, tile = B.k, B.tr * LANE
    step = K // math.gcd(K, tile)
    chunk = max((max_tiles // step) * step, step)
    outs = []
    for c in range(0, n, chunk):
        e = min(c + chunk, n)
        out = block_gell_pallas(
            B.wwords[c:e], B.counts[c:e], B.packed[c:e],
            B.bvals[:, c:e], planes, s=B.s, tr=B.tr, wmode=B.wmode,
            bs=B.bs)
        outs.append(out.transpose(1, 0, 2, 3).reshape(B.bs, -1))
    return jnp.concatenate(outs, axis=1)


@partial(jax.jit, static_argnames=("s", "tr", "wmode", "bs", "interpret"))
def block_gell_pallas(wwords, counts, packed, bvals, planes, *, s: int,
                      tr: int, wmode: int, bs: int,
                      interpret: bool = False):
    """Block window-gather: per live window, gather the slab from each of
    the bs source planes (shared scalar-prefetched window table) and fold
    the bs^2 value planes into bs output streams."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, TR = s, tr
    n_tiles = packed.shape[0]
    x2 = [planes[d].reshape(-1, LANE) for d in range(bs)]

    def kern(w_ref, c_ref, *refs):
        x_refs = refs[: S * bs]          # si-major, d-minor
        p_ref = refs[S * bs]
        v_ref = refs[S * bs + 1]
        o_ref = refs[S * bs + 2]
        t = pl.program_id(0)
        pk = p_ref[0]
        if pk.dtype != jnp.int32:
            pk = pk.astype(jnp.int32)
        sel = jax.lax.shift_right_logical(pk, 10)
        q = jax.lax.bitwise_and(jax.lax.shift_right_logical(pk, 7), 7)
        ln = jax.lax.bitwise_and(pk, 127)

        def gathered(si, d):
            xw = x_refs[si * bs + d]
            g = jnp.take_along_axis(
                jnp.broadcast_to(xw[0:1, :], (TR, LANE)), ln, axis=1)
            for m in range(1, 8):
                gm = jnp.take_along_axis(
                    jnp.broadcast_to(xw[m:m + 1, :], (TR, LANE)), ln,
                    axis=1)
                g = jnp.where(q == m, gm, g)
            return g

        def contrib(si):
            gs = [gathered(si, d) for d in range(bs)]
            mask = sel == si
            outs = []
            for c in range(bs):
                acc = v_ref[c * bs, 0].astype(jnp.float32) * gs[0]
                for d in range(1, bs):
                    acc = acc + v_ref[c * bs + d, 0].astype(
                        jnp.float32) * gs[d]
                outs.append(jnp.where(mask, acc, 0.0))
            return outs                          # bs x (TR, LANE)

        first = contrib(0)
        for c in range(bs):
            o_ref[0, c] = first[c]
        for si in range(1, S):
            @pl.when(si < c_ref[t])
            def _(si=si):
                cs = contrib(si)
                for c in range(bs):
                    o_ref[0, c] = o_ref[0, c] + cs[c]

    def x_spec(si):
        if wmode == 32:
            return pl.BlockSpec((8, LANE),
                                lambda t, w_ref, c_ref, _s=si:
                                (w_ref[t, _s], 0))
        return pl.BlockSpec(
            (8, LANE),
            lambda t, w_ref, c_ref, _s=si:
            ((w_ref[t, _s // 2] >> (16 * (_s % 2))) & 0xFFFF, 0))

    in_specs = []
    for si in range(S):
        spec = x_spec(si)
        for _ in range(bs):
            in_specs.append(spec)
    in_specs += [
        pl.BlockSpec((1, TR, LANE), lambda t, w_ref, c_ref: (t, 0, 0)),
        pl.BlockSpec((bs * bs, 1, TR, LANE),
                     lambda t, w_ref, c_ref: (0, t, 0, 0)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bs, TR, LANE),
                               lambda t, w_ref, c_ref: (t, 0, 0, 0)),
    )
    vma = None
    for a in (wwords, counts, packed, bvals, *x2):
        v = getattr(jax.typeof(a), "vma", None)
        if v is not None:
            vma = v if vma is None else (vma | v)
    xs = []
    for _ in range(S):
        xs.extend(x2)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, bs, TR, LANE),
                                       jnp.float32, vma=vma),
        interpret=interpret,
    )(wwords, counts, *xs, packed, bvals)
    return out


# ---------------------------------------------------------------------------
# Packer
# ---------------------------------------------------------------------------

def csr_to_block_gell(A: sp.csr_matrix, bs: int, dtype=jnp.float32,
                      n_pad: int | None = None, as_numpy: bool = False,
                      tr_force: int | None = None
                      ) -> BlockGellMatrix | None:
    """Pack a dof-interleaved CSR with bs dofs per node into the block
    layout.  Returns None when the node pattern does not pack (caller
    falls back to scalar GELL/ELL)."""
    n, m = A.shape
    if bs <= 1 or n % bs or m % bs:
        return None
    A = A.tocsr()
    A.sum_duplicates()
    coo = A.tocoo()
    nr = (coo.row // bs).astype(np.int64)
    nc = (coo.col // bs).astype(np.int64)
    n_node, m_node = n // bs, m // bs
    # node pattern (union of each block's dof pattern), block ids 1..nnzb
    pat = sp.coo_matrix((np.ones(len(nr), np.int8), (nr, nc)),
                        shape=(n_node, m_node)).tocsr()
    pat.sum_duplicates()
    nnzb = pat.nnz
    if nnzb + 1 >= (1 << 24):
        return None        # block ids must be f32-exact in the id stream
    ids = sp.csr_matrix(
        (np.arange(1, nnzb + 1, dtype=np.float64), pat.indices,
         pat.indptr), shape=pat.shape)
    if n_pad is None:
        n_pad = _round_up(max(n, 1), 2048)
    G = csr_to_gell(ids, dtype=jnp.float32, n_pad=_round_up(n_node, 128),
                    as_numpy=True, tr_force=tr_force)
    if G is None:
        return None
    # Trim the all-padding tail tiles: the scalar packer pads the stream
    # to 128*LANE rows for TR divisibility, which for SMALL dense-ish
    # levels is >95% padding — the bs^2-plane value gather below would
    # materialize GBs of zeros (measured 25 s at elasticity3d A2: 770
    # node rows padded to 16384, x36 component planes).  Keep whole
    # row-aligned tile groups covering the real rows.
    import math
    tile = G.tr * LANE
    step = G.k // math.gcd(G.k, tile)
    need = -(-max(n_node, 1) * G.k // tile)         # tiles with real rows
    live = min(-(-need // step) * step, G.packed.shape[0])
    if live < G.packed.shape[0]:
        G = dataclasses.replace(
            G, wwords=G.wwords[:live], counts=G.counts[:live],
            packed=G.packed[:live], vals=G.vals[:live])
    # dense block values, COMPONENT-major: Bv_t[c*bs+d, id]; id 0 =
    # padding slot (zeros).  Block ids via one searchsorted over the
    # row-major (node_row, node_col) keys — pat is canonical CSR so its
    # key stream is sorted.  The per-plane gather Bv_t[:, ids] then
    # lands contiguous in the kernel's (bs*bs, n_tiles, TR, LANE)
    # layout — no strided transpose of the 100+ MB value table.
    # table in fp32 (the band dtypes are all <= fp32; rounding before
    # the gather halves the gathered bytes)
    Bv_t = np.zeros((bs * bs, nnzb + 1), dtype=np.float32)
    pat_keys = (np.repeat(np.arange(n_node, dtype=np.int64),
                          np.diff(pat.indptr)) * m_node
                + pat.indices.astype(np.int64))
    bids = np.searchsorted(pat_keys, nr * m_node + nc) + 1
    Bv_t[(coo.row % bs) * bs + (coo.col % bs), bids] = coo.data
    id_stream = np.asarray(G.vals, dtype=np.float64).astype(np.int64)
    bv = Bv_t[:, id_stream.reshape(-1)].reshape(
        bs * bs, G.packed.shape[0], G.tr, LANE)
    if np.dtype(dtype) != np.float32:
        import ml_dtypes  # noqa: F401
        bv = bv.astype(dtype)
    conv = (lambda a: np.asarray(a)) if as_numpy else jnp.asarray
    return BlockGellMatrix(
        wwords=conv(np.asarray(G.wwords)), counts=conv(np.asarray(G.counts)),
        packed=conv(np.asarray(G.packed)), bvals=conv(bv),
        n_rows=n, n_cols=m, bs=bs, k=G.k, s=G.s, tr=G.tr, wmode=G.wmode,
        src_pad=G.src_pad, n_pad=n_pad)
