"""Gathered-ELL ("GELL"): the TPU-native layout + Pallas kernel for
irregular sparse matvecs — coarse-level operators, prolongation and
restriction (SURVEY.md §2 C4/C5/C6: the reference's cuSPARSE csrmv; north
star "Pallas SpMV/SpMM kernels", BASELINE.json:5).

Why: XLA's gather on TPU sustains only ~100M gathered elements/s (measured
on hardware, KBENCH_r2_96.jsonl) — it is the solve-phase bottleneck once
the fine level runs on the DIA Pallas kernel.  Mosaic's legal shuffle set
(probed on hardware 2026-08-17) is: `take_along_axis(axis=1)` lane gather
for any sublane count, sublane broadcasts/selects, and dynamic sublane
slices — no general 2-D or flat gather.  This module builds an SpMV from
exactly those primitives; measured on hardware (96^3 hierarchy,
KBENCH_r2_gell96.txt): A1 14x (0.95 ms vs 13.4), P0 37x (2.35 ms vs
87.8), R0 24x (11.6 ms vs 281) over the XLA gather.

Layout ("stream" form).  The K-padded nonzeros of each row are flattened
row-major into a stream of positions p = row*K + k, tiled (TR, 128).  Each
tile's source entries are covered by at most S "windows" of 1024
consecutive x entries (8 sublane rows x 128 lanes, 1024-aligned).  Per
tile the packer emits:

* wwords (n_tiles, W) int32 — the tile's window bases, two 16-bit values
  per word (32-bit raw when the source exceeds 2^16 windows = 67M
  entries).  Scalar-prefetched (SMEM, hard ~48 KB budget on this chip —
  measured: 39 KB compiles, 59 KB kills the Mosaic compiler); consumed by
  the x BlockSpec index maps, so the pipeline itself delivers the right
  (8,128) x slabs — no in-kernel DMA (manual async-copy faults this TPU
  stack, CLAUDE.md).
* counts (n_tiles,) int32 — how many windows the tile actually uses; the
  kernel skips the rest of its S passes via pl.when (restriction tiles
  average ~2/3 of the max).
* packed (n_tiles, TR, 128) int32 — sel<<10 | q<<7 | lane: which window,
  which sublane row inside it, which lane.
* vals   (n_tiles, TR, 128) band dtype.

Kernel per tile, per live window s: lane-gather each of the window's 8
rows at the positions' lanes, fold with 7 selects on q, mask on sel, FMA.
(Gather must precede the q-select: selecting rows first then gathering
lanes composes as x[q[r, ln], ln] — the row choice must be evaluated at
the OUTPUT lane.)  The row reduction y[i] = sum_k stream[i*K+k] is left
to XLA — a reshape + sum that fuses with whatever elementwise tail
follows (smoother updates etc.).

The stream slope trick: positions advance K per row, so the gather source
advances ~(n_cols/n_rows)/K of the output rate.  Restriction (source =
the FINE vector, slope ~ coarsening ratio ~27 in 3-D) stays
window-coherent precisely because K_R ~ ratio*interp_degree >= the slope;
this is what lets one kernel serve A, P and R.  (A slot-major layout like
classical ELL-T has slope K x larger and dies on restriction.)

TR (tile height) adapts per matrix: the smallest of {16,32,64,128} whose
window table fits the SMEM budget; if even TR=128 is over, the call is
split into equal-tile chunks (identical shapes + index maps, so all
chunks share one executable).

Probed dead end (2026-08-17, do not retry): sub-1024 windows — (1,128)
x BlockSpecs to skip the 8-gather sublane fold on narrow-span operators —
are ILLEGAL: Pallas TPU requires the block's sublane dim divisible by 8
(or the full axis), so 1024 is the minimum window.  Measured anyway: the
fold is the right trade — 3-D transfers spread parents across grid
planes, so 128-granularity multiplies S by ~4x (P0: S 5 -> 18), eating
the per-pass saving.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

LANE = 128
WIN = 8 * LANE             # 1024 x entries per window
# Scalar-prefetch SMEM budget (bytes).  Mosaic lays the prefetched
# (n_tiles, W) window table out with each ROW padded to a full 128-lane
# int32 row (512 B) regardless of W — bisected on hardware: a 2160-tile
# call fails with "allocation (size=1105920 = 2160*512) would exceed
# memory (size=1048576)" while 1872 tiles (958 KB) compiles.  So the
# binding constraint is n_tiles * 4*roundup(W,128) against the 1 MB SMEM;
# budget 768 KB leaves headroom for counts + kernel scalars.  (Round 2's
# earlier "48 KB prefetch cap" was this same limit mis-attributed to W.)
SMEM_BUDGET = int(os.environ.get("SPARSH_GELL_SMEM", 768 * 1024))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _smem_per_tile(W: int) -> int:
    """SMEM bytes one grid tile's prefetched scalars occupy (padded
    wwords row + its counts word)."""
    return 4 * (_round_up(max(W, 1), 128) + 1)


def gell_eligible() -> bool:
    """Should setup CHOOSE the GELL layout?  On TPU yes (the Pallas
    window-gather kernel is ~10x the XLA gather); elsewhere only when
    forced (tests) — the XLA fallback is correct everywhere but the
    classical one-shot ELL gather is marginally leaner on CPU."""
    if os.environ.get("SPARSH_NO_GELL"):
        return False
    if os.environ.get("SPARSH_FORCE_GELL"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def use_pallas_gell() -> bool:
    """Pallas dispatch gate (env-overridable; the blanket SPARSH_NO_PALLAS
    also disables it)."""
    if os.environ.get("SPARSH_NO_PALLAS") or \
            os.environ.get("SPARSH_NO_PALLAS_GELL"):
        return False
    if os.environ.get("SPARSH_FORCE_PALLAS_GELL"):
        return True     # deviceless AOT analysis traces the real program
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


@partial(jax.tree_util.register_dataclass,
         data_fields=["wwords", "counts", "packed", "vals"],
         meta_fields=["n_rows", "n_cols", "k", "s", "tr", "wmode",
                      "src_pad", "n_pad"])
@dataclasses.dataclass(frozen=True)
class GellMatrix:
    wwords: jax.Array         # (n_tiles, W) int32: window bases, packed
    counts: jax.Array         # (n_tiles,) int32: live windows per tile
    packed: jax.Array         # (n_tiles, TR, LANE) int32
    vals: jax.Array           # (n_tiles, TR, LANE) band dtype
    n_rows: int
    n_cols: int
    k: int                    # padded nnz per row
    s: int                    # max windows per tile
    tr: int                   # tile height (sublane rows)
    wmode: int                # 16: two window bases per word; 32: raw
    src_pad: int              # required padded x length (mult of 1024)
    n_pad: int                # spmv OUTPUT length: n_rows rounded to the
                              # level padding (2048); <= stream_rows

    @property
    def stream_rows(self) -> int:
        """Rows of the internal stream (padded so every candidate tile
        height divides evenly; >= n_pad)."""
        return (self.packed.shape[0] * self.tr * LANE) // self.k

    @property
    def n_tiles(self) -> int:
        return self.packed.shape[0]

    def window(self, t, s):
        """Decode window base s of tile t from the packed words (host)."""
        w = np.asarray(self.wwords)
        if self.wmode == 32:
            return int(w[t, s])
        return (int(w[t, s // 2]) >> (16 * (s % 2))) & 0xFFFF

    def spmv(self, x: jax.Array) -> jax.Array:
        """y = A @ x; x length >= src_pad (zero-padded), y length n_pad."""
        if x.shape[0] < self.src_pad:
            x = jnp.pad(x, (0, self.src_pad - x.shape[0]))
        # row reduction: stream is row-major, so positions of row i are
        # contiguous — a reshape + sum that XLA fuses with the gather
        # producer.  The PALLAS CHUNKED path must reduce PER CHUNK (with
        # row-aligned chunk boundaries): reducing the concatenated stream
        # breaks fusion and materializes the (n, K) minor-dim-K layout,
        # which TPU pads K -> 128 — a 25.6x temp (15.6 GB at 320^3, the
        # round-3 OOM).  A flat 1-D reduce_window avoids the padding but
        # measured 3-7x slower than the fused reshape-sum (96^3 vcycle
        # 8.3 -> 28 ms), so it stays the last-resort path only.
        if use_pallas_gell():
            y = _spmv_pallas_reduced(self, x)
        else:
            stream = _gell_gather_xla(self, x)
            y = stream.reshape(self.stream_rows, self.k).sum(
                axis=1, dtype=jnp.float32)
        if self.n_pad <= self.stream_rows:
            return y[: self.n_pad]
        return jnp.pad(y, (0, self.n_pad - self.stream_rows))


def _decode_windows_jnp(wwords, S: int, wmode: int):
    """(n_tiles, W) packed words -> (n_tiles, S) int32 absolute bases."""
    if wmode == 32:
        return wwords[:, :S]
    s = jnp.arange(S)
    words = wwords[:, s // 2]                       # (n_tiles, S)
    return (words >> (16 * (s % 2))) & 0xFFFF


def _gell_gather_xla(G: GellMatrix, x):
    """Oracle / non-TPU fallback: reconstruct absolute indices, one flat
    gather.  Same one-shot shape as the classical ELL path."""
    packed = G.packed.astype(jnp.int32)
    sel = packed >> 10
    sub = (packed >> 7) & 7
    ln = packed & 127
    windows = _decode_windows_jnp(G.wwords, G.s, G.wmode)
    base = jnp.take_along_axis(
        windows[:, :, None], sel.reshape(sel.shape[0], 1, -1), axis=1
    ).reshape(sel.shape)
    idx = base * WIN + sub * LANE + ln
    g = x.at[idx.reshape(-1)].get(mode="promise_in_bounds")
    return (G.vals.reshape(-1).astype(jnp.float32) * g).reshape(-1)


def _spmv_pallas_reduced(G: GellMatrix, x):
    """Pallas gather + row reduction, chunked so each call's prefetched
    window table fits SMEM.  Chunk boundaries are ROW-ALIGNED (chunk
    tiles a multiple of K/gcd(K, tile)) so each chunk reduces its own
    stream with a fused reshape-sum; only the reduced (rows,) pieces are
    concatenated."""
    import math

    per_tile = _smem_per_tile(G.wwords.shape[1])
    max_tiles = max(SMEM_BUDGET // per_tile, 1)
    n = G.n_tiles
    K = G.k
    tile = G.tr * LANE
    # bound the per-call f32 stream temp even when SMEM would allow one
    # call: an unchunked 64M-row P0 at 400^3 materializes a 1.28 GB
    # pallas output per apply — with the hierarchy resident that tips a
    # 16 GB chip into runtime OOM.  Chunks reduce eagerly, so the live
    # temp is one chunk's stream (<= cap slots * 4 B).
    cap_slots = int(os.environ.get("SPARSH_GELL_STREAM_CAP", 1 << 26))
    max_tiles = min(max_tiles, max(cap_slots // tile, 1))

    def reduced(stream, rows):
        return stream.reshape(rows, K).sum(axis=1, dtype=jnp.float32)

    if n <= max_tiles:
        out = gell_gather_pallas(G.wwords, G.counts, G.packed, G.vals, x,
                                 s=G.s, tr=G.tr, wmode=G.wmode)
        return reduced(out, G.stream_rows)
    step = K // math.gcd(K, tile)          # tiles per row-aligned unit
    chunk = max((max_tiles // step) * step, step)
    if chunk > max_tiles:
        # pathological (unit itself over SMEM): flat reduce_window —
        # layout-safe, measured 3-7x slower, never hit by real packings
        outs = []
        for c in range(0, n, max_tiles):
            e = min(c + max_tiles, n)
            outs.append(gell_gather_pallas(
                G.wwords[c:e], G.counts[c:e], G.packed[c:e], G.vals[c:e],
                x, s=G.s, tr=G.tr, wmode=G.wmode))
        stream = jnp.concatenate(outs)
        return jax.lax.reduce_window(stream, 0.0, jax.lax.add,
                                     (K,), (K,), "VALID")
    outs = []
    for c in range(0, n, chunk):
        e = min(c + chunk, n)
        out = gell_gather_pallas(
            G.wwords[c:e], G.counts[c:e], G.packed[c:e], G.vals[c:e], x,
            s=G.s, tr=G.tr, wmode=G.wmode)
        outs.append(reduced(out, (e - c) * tile // K))
    return jnp.concatenate(outs)


@partial(jax.jit, static_argnames=("s", "tr", "wmode", "interpret"))
def gell_gather_pallas(wwords, counts, packed, vals, x, *, s: int, tr: int,
                       wmode: int, interpret: bool = False):
    """The window-gather kernel: stream[p] = vals[p] * x[source(p)].

    x slabs are delivered by the Pallas pipeline itself: one (8, 128)
    BlockSpec per window slot, its index map decoding the scalar-prefetched
    window table (pltpu.PrefetchScalarGridSpec) — the legal TPU way to
    express a data-dependent gather schedule without manual DMA."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, TR = s, tr
    n_tiles = packed.shape[0]
    x2 = x.reshape(-1, LANE)

    def kern(w_ref, c_ref, *refs):
        x_refs = refs[:S]
        p_ref, v_ref, o_ref = refs[S], refs[S + 1], refs[S + 2]
        t = pl.program_id(0)
        pk = p_ref[0]
        if pk.dtype != jnp.int32:
            pk = pk.astype(jnp.int32)       # uint16 table: zero-extend
        sel = jax.lax.shift_right_logical(pk, 10)
        q = jax.lax.bitwise_and(jax.lax.shift_right_logical(pk, 7), 7)
        ln = jax.lax.bitwise_and(pk, 127)
        v = v_ref[0].astype(jnp.float32)

        def contrib(si):
            xw = x_refs[si]
            # gather FIRST, select by q second: the row choice must be
            # evaluated at the OUTPUT lane (select-then-gather composes
            # as x[q[r, ln], ln] — wrong row wherever q differs at ln)
            g = jnp.take_along_axis(
                jnp.broadcast_to(xw[0:1, :], (TR, LANE)), ln, axis=1)
            for m in range(1, 8):
                gm = jnp.take_along_axis(
                    jnp.broadcast_to(xw[m:m + 1, :], (TR, LANE)), ln,
                    axis=1)
                g = jnp.where(q == m, gm, g)
            return jnp.where(sel == si, v * g, 0.0)

        o_ref[0] = contrib(0)          # every tile has >= 1 window
        for si in range(1, S):
            @pl.when(si < c_ref[t])
            def _():
                o_ref[0] = o_ref[0] + contrib(si)

    def x_spec(si):
        if wmode == 32:
            return pl.BlockSpec((8, LANE),
                                lambda t, w_ref, c_ref, _s=si:
                                (w_ref[t, _s], 0))
        return pl.BlockSpec(
            (8, LANE),
            lambda t, w_ref, c_ref, _s=si:
            ((w_ref[t, _s // 2] >> (16 * (_s % 2))) & 0xFFFF, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[x_spec(si) for si in range(S)] + [
            pl.BlockSpec((1, TR, LANE), lambda t, w_ref, c_ref: (t, 0, 0)),
            pl.BlockSpec((1, TR, LANE), lambda t, w_ref, c_ref: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TR, LANE),
                               lambda t, w_ref, c_ref: (t, 0, 0)),
    )
    # propagate the union of the inputs' varying-mesh-axes sets to the
    # output aval so the kernel is legal inside a check_vma=True shard_map
    # (the distributed solver, parallel/solver.py): the vector may be
    # replicated while the tables vary (ReplSrc) or vice versa.  Outside
    # shard_map every vma is empty — no-op.
    vma = None
    for a in (x, wwords, counts, packed, vals):
        v = getattr(jax.typeof(a), "vma", None)
        if v is not None:
            vma = v if vma is None else (vma | v)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, TR, LANE), jnp.float32,
                                       vma=vma),
        interpret=interpret,
    )(wwords, counts, *([x2] * S), packed, vals)
    return out.reshape(-1)


def _row_window_pairs(wb: np.ndarray, tile: int):
    """Unique (tile, window) keys from the ROW-SORTED window table.

    wb is (n_pad, K) with each row non-decreasing (CSR sorted indices; row
    padding repeats the LAST column).  Each maximal run of equal windows
    within a row spans < K <= tile positions, so it touches at most two
    stream tiles — register the run's window under its start tile and
    (when it straddles a boundary) its end tile.  This sidesteps any
    O(n*K log) sort of the full stream: the only sort is np.unique over
    the ~n*windows_per_row pair keys (typically 5-20x smaller).
    Returns sorted unique int64 keys = tile * SHIFT + window."""
    n_pad, K = wb.shape
    assert K <= tile, "a row must fit in one tile"
    rnew = np.empty((n_pad, K), dtype=bool)
    rnew[:, 0] = True
    np.not_equal(wb[:, 1:], wb[:, :-1], out=rnew[:, 1:])
    r_idx, k_idx = np.nonzero(rnew)
    w_run = wb[r_idx, k_idx]
    start = r_idx * K + k_idx
    # run end = position before the next run start (global nonzero order
    # is row-major, so the next entry is the next run, possibly next row)
    end = np.empty_like(start)
    end[:-1] = start[1:] - 1
    end[-1] = n_pad * K - 1
    row_end = (r_idx + 1) * K - 1
    np.minimum(end, row_end, out=end)
    shift = np.int64(1) << 32
    t1 = start // tile
    t2 = end // tile
    keys = t1 * shift + w_run
    straddle = t2 != t1
    if straddle.any():
        keys = np.concatenate([keys, t2[straddle] * shift
                               + w_run[straddle]])
    return np.unique(keys)


def _keys_to_tables(keys: np.ndarray, n_tiles: int):
    """Sorted (tile,window) keys -> windows (n_tiles, S) int64, counts,
    offsets (cumulative start of each tile's run inside keys)."""
    shift = np.int64(1) << 32
    t = (keys // shift).astype(np.int64)
    w = (keys % shift).astype(np.int64)
    counts = np.bincount(t, minlength=n_tiles).astype(np.int64)
    S = int(counts.max()) if len(keys) else 1
    offsets = np.zeros(n_tiles + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    windows = np.zeros((n_tiles, S), dtype=np.int64)
    slot = np.arange(len(keys), dtype=np.int64) - offsets[t]
    windows[t, slot] = w
    # pad unused slots with the tile's last valid window (prefetch index
    # maps stay in-bounds; contributions are masked by sel/counts)
    lastw = windows[np.arange(n_tiles), np.maximum(counts - 1, 0)]
    need = counts[:, None] <= np.arange(S)[None, :]
    windows = np.where(need, lastw[:, None], windows)
    return windows, counts, offsets


def _positions_sel(wb: np.ndarray, keys: np.ndarray,
                   offsets: np.ndarray, tile: int):
    """Per-position window slot: rank of (tile(p), wb(p)) in its tile's
    sorted window list — a vectorized searchsorted (chunked to bound the
    int64 temporaries at ~100 MB), no S-wide compare."""
    n_pad, K = wb.shape
    shift = np.int64(1) << 32
    total = n_pad * K
    flat = wb.reshape(-1)
    sel = np.empty(total, dtype=np.int32)
    step = _round_up(1 << 23, tile)
    for c in range(0, total, step):
        e = min(c + step, total)
        p_tile = np.arange(c, e, dtype=np.int64) // tile
        key_pos = p_tile * shift + flat[c:e]
        sel[c:e] = np.searchsorted(keys, key_pos) - offsets[p_tile]
    return sel.reshape(n_pad, K)


def csr_to_gell(A: sp.csr_matrix, dtype=jnp.float32, s_max: int = 64,
                k_cap: int | None = None, n_pad: int | None = None,
                tr_force: int | None = None, s_force: int | None = None,
                k_force: int | None = None, as_numpy: bool = False):
    """Pack a host CSR matrix into the GELL stream layout.

    Picks the smallest tile height TR in {16,32,64,128} whose window
    table fits the SMEM budget (fewer tiles -> fewer scalars; more
    windows per tile -> more kernel passes, skipped per-tile via counts).
    Returns None when a tile would need more than `s_max` windows at
    TR=16 (too irregular — caller falls back to classical ELL; restriction
    operators from aggressive coarsening legitimately reach S~26-40, hence
    the generous default) or when row-degree padding would inflate the
    stream more than ~4x (k_cap).
    """
    A = A.tocsr()
    A.sum_duplicates()
    A.sort_indices()
    n, m = A.shape
    deg = np.diff(A.indptr)
    K = max(int(deg.max()) if n else 0, 1)
    if k_force is not None:
        assert k_force >= K, "k_force below actual max row degree"
        K = k_force
    if k_cap is None:
        k_cap = max(8, int(4 * max(A.nnz, 1) / max(n, 1)))
    if (K > k_cap and k_force is None) or K > 16 * LANE:
        return None
    src_pad = _round_up(max(m, 1), WIN)
    wmode = 16 if src_pad // WIN <= (1 << 16) else 32

    if n_pad is None:
        n_pad = _round_up(max(n, 1), 2048)
    if not os.environ.get("SPARSH_GELL_NUMPY"):
        from .._native import get_lib
        lib = get_lib()
        if lib is not None:
            return _pack_native(lib, A, n, m, K, src_pad, wmode, dtype,
                                s_max, n_pad, tr_force=tr_force,
                                s_force=s_force, k_force=k_force,
                                as_numpy=as_numpy)
    return _pack_numpy(A, n, m, K, src_pad, wmode, dtype, s_max, n_pad,
                       tr_force=tr_force, s_force=s_force, k_force=k_force,
                       as_numpy=as_numpy)


def _finish_gell(windows, counts, packed, vals_np, dtype, n, m, K, S, W,
                 TR, n_tiles, wmode, src_pad, n_pad, as_numpy=False):
    """Common tail: pack window words, host-convert vals, build the pytree.

    vals conversion happens HERE on host (ml_dtypes) — converting after
    jnp.asarray uploads fp32 and converts on device, doubling the largest
    H2D transfer of setup.

    as_numpy keeps the tables as host numpy: the distributed stackers
    pack up to four TR candidates per block and only stack/upload the
    chosen one — the per-candidate device_put + np.asarray round-trip
    through the JAX CPU runtime was ~2/3 of the blocked freeze time."""
    if vals_np.dtype != np.dtype(dtype):
        import ml_dtypes  # noqa: F401  (registers bfloat16 with numpy)
        vals_np = vals_np.astype(dtype)
    windows = windows.astype(np.int64)
    if wmode == 16:
        padded = np.zeros((n_tiles, W * 2), dtype=np.int64)
        padded[:, :S] = windows
        if S < W * 2:
            padded[:, S:] = windows[:, -1:]
        wwords = (padded[:, 0::2] | (padded[:, 1::2] << 16)).astype(
            np.uint32).view(np.int32)
    else:
        wwords = windows.astype(np.int32)
    LANE_ = LANE
    conv = (lambda a, dtype=None: np.asarray(a, dtype=dtype)) if as_numpy \
        else jnp.asarray
    packed = packed.reshape(n_tiles, TR, LANE_)
    if S <= 64:
        # sel<<10|q<<7|lane < 65536 when S <= 64: STORE uint16 on device
        # too (not just the H2D transfer) — the packed tables are the
        # largest arrays of the whole hierarchy (526 MB of the 1.24 GB
        # footprint at 192^3, round-3 audit) and the kernel zero-extends
        # per tile at no measurable cost
        packed_dev = conv(packed.astype(np.uint16))
    else:
        packed_dev = conv(packed, dtype=np.int32)
    return GellMatrix(
        wwords=conv(wwords, dtype=np.int32),
        counts=conv(counts, dtype=np.int32),
        packed=packed_dev,
        vals=conv(vals_np.reshape(n_tiles, TR, LANE_)),
        n_rows=n, n_cols=m, k=K, s=S, tr=TR, wmode=wmode,
        src_pad=src_pad, n_pad=n_pad)


def _pack_native(lib, A: sp.csr_matrix, n, m, K, src_pad, wmode, dtype,
                 s_max, n_pad, tr_force=None, s_force=None, k_force=None,
                 as_numpy=False):
    """OpenMP packer (amg_core.cpp gell_windows/gell_fill*): tile-parallel
    window discovery + table fill; ~10x the numpy packer at 192^3.

    tr_force/s_force (with csr_to_gell's k_force) pin the static table
    shape — used by the distributed stacker, where every shard's tables
    must be shape-identical inside shard_map."""
    from .._native import csr_arrays
    indptr, indices, data = csr_arrays(A)
    rows_pad = _round_up(max(n, 1), 128 * LANE)
    chosen = fallback = overflow = None
    # TR=16 runs first as the irregularity gate (its s_max cap rejects
    # matrices too scattered for GELL) but is never PICKED unless forced:
    # measured on hardware (exp_tr/exp_grp 2026-08-18), TR=16 tiles run
    # 1.2-40x slower than TR=64/128 for every operator in the hierarchy
    # (more tiles = more per-tile window passes; SMEM overflow is handled
    # by chunking either way)
    candidates = (tr_force,) if tr_force else (16, 64, 128, 32)
    for TR in candidates:
        tile = TR * LANE
        n_tiles = (rows_pad * K) // tile
        cap = s_max if TR == 16 else max(s_max * TR, 1 << 14)
        if s_force is not None:
            cap = max(cap, s_force)
        S = int(lib.gell_windows(n, K, tile, n_tiles, indptr, indices,
                                 cap))
        if S < 0:
            # TR=16's s_max cap is the irregularity policy gate; larger
            # TRs carry huge caps and only fail under tr_force
            if TR == 16 or tr_force:
                return None
            continue
        if s_force is not None:
            if s_force < S:
                return None
            S = s_force
        per_word = 2 if wmode == 16 else 1
        W = -(-S // per_word)
        smem = n_tiles * _smem_per_tile(W)
        cand = (TR, tile, n_tiles, S, W)
        if TR == 16 and not tr_force:
            if fallback is None:
                fallback = cand         # gate-only; last resort
            continue
        if smem <= SMEM_BUDGET:
            chosen = cand
            break
        if overflow is None or TR > overflow[0]:
            overflow = cand     # over-budget: larger TR = fewer chunks
    if chosen is None:
        chosen = overflow if overflow is not None else fallback
    if chosen is None:
        return None
    TR, tile, n_tiles, S, W = chosen
    windows = np.empty((n_tiles, S), dtype=np.int32)
    counts = np.empty(n_tiles, dtype=np.int32)
    packed = np.empty(n_tiles * tile, dtype=np.int32)
    if np.dtype(dtype) == np.dtype("bfloat16"):
        import ml_dtypes
        vals = np.empty(n_tiles * tile, dtype=np.uint16)
        lib.gell_fill_bf16(n, K, tile, n_tiles, S, indptr, indices, data,
                           windows, counts, packed, vals)
        vals = vals.view(ml_dtypes.bfloat16)
    else:
        vals = np.empty(n_tiles * tile, dtype=np.float32)
        lib.gell_fill(n, K, tile, n_tiles, S, indptr, indices, data,
                      windows, counts, packed, vals)
    return _finish_gell(windows, counts, packed, vals, dtype, n, m, K, S,
                        W, TR, n_tiles, wmode, src_pad, n_pad,
                        as_numpy=as_numpy)


def _pack_numpy(A: sp.csr_matrix, n, m, K, src_pad, wmode, dtype, s_max,
                n_pad, tr_force=None, s_force=None, k_force=None,
                as_numpy=False):
    """Vectorized-numpy packer: the native path's oracle (and the
    no-toolchain fallback).

    Stream tables (rows_pad, K): src index + value, rows padded by
    repeating the row's LAST column with val 0 — keeps padding inside
    an already-needed window AND keeps every row non-decreasing, which
    is what lets the packer find windows without sorting the stream;
    empty rows point at 0."""
    deg = np.diff(A.indptr)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    slot = np.arange(A.nnz, dtype=np.int64) - np.repeat(
        A.indptr[:-1].astype(np.int64), deg)
    last = np.zeros(n, dtype=np.int32)
    nz = deg > 0
    last[nz] = A.indices[A.indptr[1:][nz] - 1]

    # stream shape is TR-independent as long as its row padding covers
    # every tiling: pad to the largest tile so all candidate TRs divide
    max_tile = 128 * LANE
    rows_pad = _round_up(max(n, 1), max_tile)
    src = np.empty((rows_pad, K), dtype=np.int32)
    src[:n] = last[:, None]
    src[n:] = 0
    src[rows, slot] = A.indices                 # CSR cols are sorted
    wb = src >> 10                              # // WIN, rows sorted

    keys = None
    cands = {}
    for TR in (16, 32, 64, 128):
        tile = TR * LANE
        n_tiles = (rows_pad * K) // tile
        if keys is None:
            keys = _row_window_pairs(wb, tile)
        else:
            # merging two adjacent tiles = union of their window sets:
            # relabel tile ids and re-unique the (small) pair key list
            shift = np.int64(1) << 32
            keys = np.unique((keys // shift // 2) * shift + keys % shift)
        counts = np.bincount((keys // (np.int64(1) << 32)),
                             minlength=n_tiles)
        S = int(counts.max()) if len(keys) else 1
        if TR == 16 and S > s_max and not tr_force:
            return None
        if tr_force and TR != tr_force:
            continue
        if s_force is not None:
            if S > s_force:
                return None
            S = s_force
        per_word = 2 if wmode == 16 else 1
        W = -(-S // per_word)
        smem = n_tiles * _smem_per_tile(W)
        cands[TR] = (TR, tile, n_tiles, keys, S, W, smem)
        if tr_force:
            break

    # same preference as the native packer: TR=16 is gate-only (measured
    # 1.2-40x slower on hardware); pick the first fitting of 64/128/32,
    # else the largest over-budget TR (fewest chunks), else 16
    chosen = None
    if tr_force:
        chosen = cands.get(tr_force)
    else:
        for TR in (64, 128, 32):
            c = cands.get(TR)
            if c is not None and c[6] <= SMEM_BUDGET:
                chosen = c
                break
        if chosen is None:
            for TR in (128, 64, 16):
                if TR in cands:
                    chosen = cands[TR]
                    break
    if chosen is None:
        return None
    TR, tile, n_tiles, keys, S, W = chosen[:6]
    windows, counts, offsets = _keys_to_tables(keys, n_tiles)
    if windows.shape[1] < S:        # s_force padding: repeat last valid
        lastw = windows[np.arange(n_tiles),
                        np.maximum(np.asarray(counts) - 1, 0)]
        pad = np.repeat(lastw[:, None], S - windows.shape[1], axis=1)
        windows = np.concatenate([windows, pad], axis=1)
    sel = _positions_sel(wb, keys, offsets, tile).reshape(n_tiles, tile)
    del wb
    val = np.zeros((rows_pad, K), dtype=np.float32)
    val[rows, slot] = A.data
    src = src.reshape(n_tiles, tile)
    packed = (sel << 10) | (src & 1023)         # sub<<7|lane = c % 1024
    return _finish_gell(windows.astype(np.int32),
                        counts.astype(np.int32), packed,
                        val.reshape(-1), dtype, n, m, K, S, W, TR,
                        n_tiles, wmode, src_pad, n_pad, as_numpy=as_numpy)


# ---------------------------------------------------------------------------
# Row-split GELL: kill row-degree padding on skewed operators
# ---------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass,
         data_fields=["part", "comb"], meta_fields=["n_rows", "n_cols"])
@dataclasses.dataclass(frozen=True)
class SplitGell:
    """A = comb @ part — a row-split GELL pair.

    GELL pads every row to the matrix max degree K; restriction operators
    from aggressive coarsening are degree-skewed (96^3 R0: avg 96, max
    209 -> 2.2x slot padding).  Splitting each row into ceil(deg/kq)
    sub-rows of <= kq nonzeros bounds the padding at ~kq/2 per row, and
    the per-row partial sums are recombined by a second GELL SpMV with a
    0/1 matrix whose columns are CONTIGUOUS (comb row i sums sub-rows
    cumg[i]..cumg[i+1]-1) — perfectly window-coherent, S~1.  Both factors
    reuse the one window-gather Pallas kernel; `part` shares the original
    CSR's indices/data arrays (only a new indptr), so the split is free
    on the host."""
    part: GellMatrix          # (n_split x n_cols), <= kq nnz per row
    comb: GellMatrix          # (n_rows x n_split), 0/1 contiguous
    n_rows: int
    n_cols: int

    @property
    def n_pad(self) -> int:
        return self.comb.n_pad

    @property
    def src_pad(self) -> int:
        return self.part.src_pad

    @property
    def k(self) -> int:       # diagnostic: padded slots per logical row
        return self.part.k * self.comb.k

    def spmv(self, x: jax.Array) -> jax.Array:
        return self.comb.spmv(self.part.spmv(x))


# sub-rows are additionally cut at column GAPS wider than this, so each
# sub-row's sources stay within ~one 1024-entry window.  3-D restriction /
# coarse-operator rows intrinsically span ~2 grid planes (z+-1 neighbors:
# a ~9k-entry column jump at 96^3); without gap cuts every stream tile
# pays a window pass per plane its rows touch.  Measured on hardware
# (exp_tr 2026-08-18): GELL time ~ 0.6us*tiles + ~9ns*TR*sum(counts), so
# live window passes ARE the kernel time.
_GAP_MAX = 1024


def _segment_rows(A: sp.csr_matrix, gap_max: int = _GAP_MAX):
    """Cut every row at sorted-column gaps > gap_max.  Returns
    (seg_indptr, seg_row): nnz-aligned segment boundaries (CSR-compatible
    indptr over segments) and each segment's parent row."""
    n = A.shape[0]
    from .._native import get_lib
    lib = get_lib()
    if lib is not None and A.nnz >= (1 << 16):
        # single-pass OpenMP: the numpy version's nnz-length int64 casts
        # + nonzero cost ~11 s over the 192^3 transfers on this VM
        indptr = np.ascontiguousarray(A.indptr, dtype=np.int64)
        indices = np.ascontiguousarray(A.indices, dtype=np.int32)
        cnt = np.empty(n, dtype=np.int64)
        lib.segment_rows_count(n, indptr, indices, int(gap_max), cnt)
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cnt, out=off[1:])
        n_seg = int(off[-1])
        seg_indptr = np.empty(n_seg + 1, dtype=np.int64)
        seg_row = np.empty(n_seg, dtype=np.int32)
        lib.segment_rows_fill(n, indptr, indices, int(gap_max), off,
                              seg_indptr, seg_row)
        return seg_indptr, seg_row
    indptr = A.indptr.astype(np.int64)
    cols = A.indices
    brk = np.zeros(A.nnz, dtype=bool)
    if A.nnz:
        brk[1:] = (cols[1:].astype(np.int64)
                   - cols[:-1].astype(np.int64)) > gap_max
        rs = indptr[1:-1]
        brk[rs[rs < A.nnz]] = False     # row starts handled separately
        starts = np.zeros(A.nnz, dtype=bool)
        starts[indptr[:-1][np.diff(indptr) > 0]] = True
        first = starts | brk
        seg_start = np.nonzero(first)[0]
    else:
        seg_start = np.zeros(0, dtype=np.int64)
    seg_indptr = np.empty(len(seg_start) + 1, dtype=np.int64)
    seg_indptr[:-1] = seg_start
    seg_indptr[-1] = A.nnz
    # parent row of each segment: searchsorted into the row indptr
    seg_row = np.searchsorted(indptr, seg_start, side="right") - 1
    return seg_indptr, seg_row


def _split_plan(A: sp.csr_matrix, K: int, gap_max: int = _GAP_MAX):
    """Choose the sub-row quantum kq over the GAP-CUT segments, minimizing
    total stream slots (part + comb).  Returns (kq, seg_indptr, seg_row)
    or None when neither gap cutting nor degree splitting pays:
    - no gap segmentation happened AND K <= 8 (nothing to win), or
    - the best split costs > 0.75x the plain packing's slots AND the rows
      are window-local anyway (no gaps)."""
    n = A.shape[0]
    if n == 0:
        return None
    if K <= 8:
        # rows this short never pay for splitting: the plain packing's
        # tiles already keep S small (96^3 P0: K=5, S=5), and a split
        # adds a whole comb kernel — skip before the segmentation pass
        return None
    seg_indptr, seg_row = _segment_rows(A, gap_max)
    n_seg = len(seg_row)
    # gap MODE only when cutting is pervasive (long rows genuinely span
    # windows: 96^3 R0 cuts 6.8 segments/row).  A handful of boundary-row
    # cuts (96^3 A1: 1.008x, P0: 1.08x) must not flip the whole matrix
    # into split layout — measured, splitting those is cost-neutral at
    # best while paying an extra kernel
    has_gaps = n_seg > 1.5 * n
    seg_len = np.diff(seg_indptr)
    base = n * K
    if has_gaps:
        # window-grouped split: the cost drivers are part compute
        # (~slots) and comb size (~sub-row count), and hardware says the
        # sweet spot is kq ~= the mean segment length (96^3 R0: mean 36,
        # kq 32 -> 2.32 ms vs kq 8 -> 3.71 ms) — most segments become one
        # sub-row, the comb stays small, padding stays ~2x nnz
        mean_len = float(seg_len[seg_len > 0].mean()) if n_seg else 1.0
        # kq ~= 2x mean segment: most segments stay one sub-row (small
        # comb) at ~2x slot padding — measured best at 96^3 R0 (kq 32 for
        # mean 16: 2.32 ms vs kq 16: 2.74 ms vs kq 8: 3.71 ms)
        kq = min((8, 16, 24, 32, 48, 64, 96, 128),
                 key=lambda q: abs(q - 2.0 * mean_len))
        g = np.maximum(1, -(-seg_len // kq))
        g_row = np.bincount(seg_row, weights=g, minlength=n)
        split_total = int(g.sum()) * kq + n * int(g_row.max())
        mean_deg = A.nnz / max(n, 1)
        if mean_deg >= 32.0:
            # long multi-window rows (restrictions): window locality
            # dominates kernel time (96^3 R0 plain 7.8 ms vs split
            # 2.3 ms) — accept any split within an absolute pad bound
            if split_total > 2.6 * max(A.nnz, 1) + n * 8:
                return None
        else:
            # short rows (coarse operators): the plain packing's tiles
            # are already window-cheap, so splitting must also win the
            # stream economy (192^3 A1: split 33M slots vs plain 18.5M
            # -> plain; 96^3 A1: 1.8M vs 2.2M -> split, matching the
            # measured 0.72 vs 0.85 ms)
            if split_total > 1.25 * n * K:
                return None
        return kq, seg_indptr, seg_row, True
    best = None
    for kq in (8, 16, 24, 32, 48, 64, 96, 128):
        if kq >= K:
            break
        g = np.maximum(1, -(-seg_len // kq))
        per_row = np.bincount(seg_row, weights=g, minlength=n)
        slots = int(g.sum()) * kq + n * int(per_row.max())
        if best is None or slots < best[0]:
            best = (slots, kq)
    if best is None or best[0] > 0.75 * base:
        return None
    return best[1], seg_indptr, seg_row, False


def csr_to_gell_auto(A: sp.csr_matrix, dtype=jnp.float32, s_max: int = 64,
                     n_pad: int | None = None, kq_force: int | None = None,
                     tr_force: int | None = None, group: bool | None = None):
    """GELL packing with automatic row splitting (degree + span).

    When rows were cut at column gaps (multi-plane 3-D restriction /
    coarse-operator rows), the sub-rows are additionally SORTED by their
    first source window so every stream tile reads from ~one window
    instead of interleaving all the planes its rows touch (`group`,
    default on whenever gap cuts happened).  The comb matrix then indexes
    the permuted sub-row results — no longer contiguous, but tiny.

    Returns a GellMatrix, a SplitGell (when splitting pays), or None
    (caller falls back to classical ELL)."""
    A = A.tocsr()
    A.sort_indices()
    n, m = A.shape
    deg = np.diff(A.indptr)
    K = max(int(deg.max()) if n else 0, 1)
    plan = _split_plan(A, K)
    if plan is None:
        return csr_to_gell(A, dtype=dtype, s_max=s_max, n_pad=n_pad,
                           tr_force=tr_force)
    kq, seg_indptr, seg_row, gap_mode = plan
    comb_tr = int(os.environ.get("SPARSH_GELL_COMB_TR", 0)) or None
    if kq_force is not None:
        kq = kq_force
    elif gap_mode:
        # LARGE-scale retune (hardware, tune_gell192 2026-08-19): once
        # the split part overflows SMEM into chunked execution, tighter
        # sub-rows + a shorter comb tile + TR=64 part tiles beat the
        # small-scale defaults 23.5 vs 29.7 ms at 192^3 R0 (and save
        # 65 MB); at 96^3 (everything SMEM-resident) the small-scale
        # defaults win 2.58 vs 2.69 ms, hence the size trigger.
        seg_len0 = np.diff(seg_indptr)
        est_slots = int(np.maximum(1, -(-seg_len0 // kq)).sum()) * kq
        if est_slots * _smem_per_tile(2) > 64 * LANE * SMEM_BUDGET:
            kq = 16
            if tr_force is None:
                tr_force = 64
            if comb_tr is None:
                comb_tr = 32
    seg_len = np.diff(seg_indptr)
    g = np.maximum(1, -(-seg_len // kq)).astype(np.int64)   # sub-rows/segment
    cum_sub = np.zeros(len(g) + 1, dtype=np.int64)
    np.cumsum(g, out=cum_sub[1:])
    n_split = int(cum_sub[-1])
    seg_of = np.repeat(np.arange(len(g), dtype=np.int64), g)
    within = np.arange(n_split, dtype=np.int64) - cum_sub[seg_of]
    part_indptr = np.empty(n_split + 1, dtype=np.int64)
    part_indptr[:-1] = seg_indptr[seg_of] + within * kq
    part_indptr[-1] = A.nnz
    if group is None:
        group = gap_mode
    g_row = np.bincount(seg_row, weights=g, minlength=n).astype(np.int64)
    cumg = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(g_row, out=cumg[1:])
    if group and n_split:
        # sort sub-rows by first-source window so each part tile's rows
        # share windows (a tile of row-ordered sub-rows interleaves every
        # plane its rows touch — measured 6.5ms vs 4.9ms at 96^3 R0; the
        # grouped layout is what actually cuts live window passes).
        #
        # The sort must stay GLOBAL: each row's segments read ~one window
        # EACH (that's why they were cut), so any block-local sort mixes
        # every plane the block's rows touch back into each part tile —
        # probed round 3: blocks of 8k/32k/128k slots give part mean
        # live-windows 15.9/10.4/6.4 vs 2.58 global, far outweighing the
        # comb relief (27.5 -> ~6).  The comb pays the global scatter,
        # but it is 8x smaller.  SPARSH_GELL_GROUP_SLOTS (0 = global)
        # keeps the probe reproducible.
        key = A.indices[part_indptr[:-1]].astype(np.int64) >> 10
        group_slots = int(os.environ.get("SPARSH_GELL_GROUP_SLOTS", 0))
        if group_slots > 0:
            b_sub = max(group_slots // max(kq, 1), 1)
            blk = np.arange(n_split, dtype=np.int64) // b_sub
            key = key + blk * (np.int64(1) << 32)
        perm = np.argsort(key, kind="stable")
        lens = np.diff(part_indptr)
        new_lens = lens[perm]
        gp_indptr = np.zeros(n_split + 1, dtype=np.int64)
        np.cumsum(new_lens, out=gp_indptr[1:])
        from .._native import get_lib, empty_prefaulted
        lib = get_lib()
        if lib is not None and A.nnz >= (1 << 16):
            # single-pass OpenMP slice gather: the numpy path below
            # builds an nnz-length repeat + arange + two fancy gathers
            # (~2 s of fresh-page temporaries per operator at 192^3)
            src_start = np.ascontiguousarray(part_indptr[:-1][perm])
            g_idx = empty_prefaulted(A.nnz, np.int32)
            g_dat = empty_prefaulted(A.nnz, np.float64)
            lib.gather_subrows(n_split, src_start,
                               np.ascontiguousarray(gp_indptr[:-1]),
                               np.ascontiguousarray(new_lens),
                               np.ascontiguousarray(A.indices,
                                                    dtype=np.int32),
                               np.ascontiguousarray(A.data,
                                                    dtype=np.float64),
                               g_idx, g_dat)
            part = sp.csr_matrix((g_dat, g_idx, gp_indptr),
                                 shape=(n_split, m))
            part.has_sorted_indices = True   # sub-slices of sorted rows
            part.has_canonical_format = True
        else:
            gather = (np.repeat(part_indptr[:-1][perm] - gp_indptr[:-1],
                                new_lens)
                      + np.arange(A.nnz, dtype=np.int64))
            part = sp.csr_matrix((A.data[gather], A.indices[gather],
                                  gp_indptr), shape=(n_split, m))
        inv = np.empty(n_split, dtype=np.int64)
        inv[perm] = np.arange(n_split, dtype=np.int64)
        comb_cols = inv.astype(np.int32)
        comb = sp.csr_matrix((np.ones(n_split, dtype=np.float64),
                              comb_cols, cumg), shape=(n, n_split))
        comb.sort_indices()
    else:
        part = sp.csr_matrix((A.data, A.indices, part_indptr),
                             shape=(n_split, m))
        part.has_sorted_indices = True      # sub-ranges of sorted rows
        part.has_canonical_format = True
        # sub-rows of a row are consecutive (segments in row order), so
        # comb keeps a contiguous 0/1 structure
        comb = sp.csr_matrix((np.ones(n_split, dtype=np.float64),
                              np.arange(n_split, dtype=np.int32), cumg),
                             shape=(n, n_split))
        comb.has_sorted_indices = True
        comb.has_canonical_format = True
    # explicit k_caps: the split factors are padding-optimal by
    # construction, so the default 4x-average blowup guard must not veto
    # them (comb's max degree legitimately exceeds 4x its mean)
    Gp = csr_to_gell(part, dtype=dtype, s_max=s_max, k_cap=kq,
                     tr_force=tr_force)
    Gc = csr_to_gell(comb, dtype=dtype, s_max=s_max, n_pad=n_pad,
                     k_cap=int(g_row.max()) if n else 1, tr_force=comb_tr)
    if Gp is None or Gc is None:
        return csr_to_gell(A, dtype=dtype, s_max=s_max, n_pad=n_pad)
    return SplitGell(part=Gp, comb=Gc, n_rows=n, n_cols=m)


def csr_to_gell_stacked(blocks, dtype=jnp.float32, s_max: int = 64,
                        n_pad: int | None = None):
    """Pack nd same-shape CSR row-blocks into GELL tables with IDENTICAL
    static shapes (K, S, TR, W, n_tiles) — the shard_map stacking
    requirement for the distributed solver.  Returns a list of
    GellMatrix or None (caller falls back to DistEll)."""
    nd = len(blocks)
    assert all(B.shape == blocks[0].shape for B in blocks)
    n = blocks[0].shape[0]
    K = 1
    for B in blocks:
        d = np.diff(B.indptr)
        K = max(K, int(d.max()) if len(d) else 1)
    nnz_avg = sum(B.nnz for B in blocks) / max(nd * max(n, 1), 1)
    if K > max(8, int(4 * max(nnz_avg, 1))) or K > 16 * LANE:
        return None
    chosen = fallback = None
    # candidates stay host numpy; the caller's jnp.stack over the chosen
    # pack is the single host->device conversion
    for TR in (16, 64, 128, 32):
        Gs = [csr_to_gell(B, dtype=dtype, s_max=s_max, n_pad=n_pad,
                          tr_force=TR, k_force=K, as_numpy=True)
              for B in blocks]
        if any(G is None for G in Gs):
            if TR == 16:
                return None       # s_max policy gate (matches csr_to_gell)
            continue
        S = max(G.s for G in Gs)
        per_word = 2 if Gs[0].wmode == 16 else 1
        W = -(-S // per_word)
        smem = Gs[0].n_tiles * _smem_per_tile(W)
        if TR == 16:
            fallback = (TR, S, Gs)   # gate passed; prefer larger TRs
            continue
        if smem <= SMEM_BUDGET:
            chosen = (TR, S, Gs)
            break
        if chosen is None:
            chosen = (TR, S, Gs)     # over budget: keep first (TR=64)
    if chosen is None:
        chosen = fallback
    if chosen is None:
        return None
    TR, S, Gs = chosen
    out = []
    for B, G in zip(blocks, Gs):
        if G.s != S:
            G = csr_to_gell(B, dtype=dtype, s_max=s_max, n_pad=n_pad,
                            tr_force=TR, s_force=S, k_force=K,
                            as_numpy=True)
            if G is None:
                return None
        out.append(G)
    assert len({(G.k, G.s, G.tr, G.wmode, G.n_tiles,
                 G.wwords.shape, G.packed.shape) for G in out}) == 1
    return out
