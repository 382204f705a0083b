"""Pallas TPU stream-expand kernel: run-length pair-table expansion.

The binning expansion duplicates each gaussian's 16-column packed
feature row into its (gaussian, tile) pairs. As an XLA gather
(`packed[gid_pre]`) this runs ~10 ns/row — ~25 ms at 1M-gaussian pair
counts (bench_profile r4); a delta-scatter alternative measured worse
still (N-row scatter-add, 179 ms end-to-end), and the round-4 MXU
one-hot kernel was bit-identical but paid ~WIN=512 HIGHEST-precision
MACs per pair — 23 ms in isolation, +6.5 ms end-to-end (BASELINE.md
round-4 expansion A/B). This v2 kernel replaces the MXU selection with
Mosaic's within-128-lane dynamic gather (`take_along_axis` along lanes
— ~50 VPU ops/pair instead of ~512 MXU MACs):

  * the output (P pairs) is walked in CHUNK-pair grid steps; a step's
    pairs own a NON-DECREASING run of source rows, so ONE 128-aligned
    (16, WIN)-window DMA covers the whole step whenever its row span
    fits (the old kernel needed the span of every 128-pair SUB-BLOCK to
    fit a 512 window; v2 only needs the span of a whole 2048-pair block
    to fit a 2048 window — a strictly weaker condition, so the XLA-
    gather fallback triggers far less often);
  * window start lanes are precomputed in XLA and scalar-prefetched
    (PrefetchScalarGridSpec), so each step's window DMA is issued one
    step AHEAD and drains behind the previous step's compute;
  * within a step, each 128-pair group gathers its rows from the window
    with one `take_along_axis` per OVERLAPPING 128-lane source window
    (monotone indices: usually 1-2 of the WIN/128), selected by the
    high index bits. Dynamic lane gathers move bits verbatim — unlike
    the MXU path, arbitrary i32-in-f32 bitcasts would survive, but the
    packed-table contract (exact-in-f32 integer pieces, bin_splats
    fused path) is kept so both expansion strategies stay
    interchangeable;
  * pad pairs (gid == N) clamp to the window top; their expanded
    content is garbage and bin_splats zeroes pad columns post-sort
    (the old path's zero sentinel row, restored one level up).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output pairs per grid step / source-window rows. One aligned window
# serves a whole step; a frame falls back to the XLA gather when any
# step's row span exceeds WIN (span check via lax.cond in bin_splats).
# WIN = 2*CHUNK: a step can span at most CHUNK distinct gaussians, so
# the doubled window absorbs the 128 floor-alignment slack plus up to
# ~CHUNK culled-gaussian gaps before any fallback triggers.
CHUNK = 2048
WIN = 4096
_GRP = 128


def max_subblock_span(gid_pre: jnp.ndarray, n: int) -> jnp.ndarray:
    """Worst aligned-window row span over CHUNK-pair steps (pads
    excluded — their expanded content is zeroed post-sort, so only live
    pairs constrain the window)."""
    p = gid_pre.shape[0]
    p_pad = -(-p // CHUNK) * CHUNK
    gid_ext = jnp.concatenate(
        [gid_pre, jnp.broadcast_to(gid_pre[-1:], (p_pad - p,))]) \
        if p_pad != p else gid_pre
    g2 = gid_ext.reshape(p_pad // CHUNK, CHUNK)
    first = g2[:, 0]
    last_live = jnp.max(jnp.where(g2 >= n, -1, g2), axis=1)
    return jnp.max(last_live - (first // _GRP) * _GRP + 1)


def _kernel(los_ref, gid_ref, packed_ref, out_ref, wbuf, sems):
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def win_dma(step, buf_slot):
        lo = pl.multiple_of(los_ref[step], _GRP)
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(lo, WIN)], wbuf.at[buf_slot],
            sems.at[buf_slot])

    # Prologue (step 0 only): start this step's window; every step then
    # prefetches its successor's window before computing.
    @pl.when(i == 0)
    def _():
        win_dma(0, 0).start()

    @pl.when(i + 1 < nblocks)
    def _():
        win_dma(i + 1, 1 - slot).start()

    win_dma(i, slot).wait()
    win = wbuf[slot]                                  # (16, WIN)
    gid = gid_ref[0]                                  # (ngrp, _GRP) i32
    lo = los_ref[i]
    ngrp = CHUNK // _GRP
    nwin = WIN // _GRP
    for g in range(ngrp):
        # Monotone local rows for this group; clamp binds only for pad
        # pairs (live spans are checked upstream).
        idx = jnp.minimum(gid[g] - lo, WIN - 1)[None, :]   # (1, _GRP)
        wsel = idx >> 7
        idx_l = jnp.broadcast_to(idx & 127, (16, _GRP))
        acc = jnp.zeros((16, _GRP), jnp.float32)
        w_lo = wsel[0, 0]
        w_hi = wsel[0, _GRP - 1]
        for w in range(nwin):
            # Monotone indices: only windows intersecting
            # [idx[0], idx[-1]] contribute; the rest are skipped at
            # run time (predicated, ~1-2 active windows per group).
            cond = jnp.logical_and(w >= w_lo, w <= w_hi)
            taken = jnp.take_along_axis(
                win[:, w * _GRP:(w + 1) * _GRP], idx_l, axis=1)
            pick = jnp.logical_and(cond, wsel == w)
            acc = jnp.where(pick, taken, acc)
        out_ref[:, g * _GRP:(g + 1) * _GRP] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def expand_pairs(packed_t: jnp.ndarray, gid_pre: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """Expand a (16, N_pad) feature-major table to (16, P) pair columns.

    packed_t columns must be padded so any aligned WIN-window starting
    at or below the largest gid stays in bounds (pad_packed_cols).
    gid_pre: (P,) i32 non-decreasing owning row per pair; every live
    CHUNK-block's aligned span must fit the window
    (max_subblock_span <= WIN, checked by the caller).
    """
    p = gid_pre.shape[0]
    p_pad = -(-p // CHUNK) * CHUNK
    if p_pad != p:
        gid_pre = jnp.concatenate(
            [gid_pre, jnp.broadcast_to(gid_pre[-1:], (p_pad - p,))])
    nblocks = p_pad // CHUNK
    # 128-aligned window start per step, scalar-prefetched so step i can
    # issue step i+1's window DMA.
    los = (gid_pre[::CHUNK] // _GRP) * _GRP
    # (G, ngrp, _GRP): each group is one natural (8, 128)-tileable row.
    gid2d = gid_pre.reshape(nblocks, CHUNK // _GRP, _GRP)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, CHUNK // _GRP, _GRP), lambda i, los: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((16, CHUNK), lambda i, los: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 16, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, p_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * p_pad * 16 * 2,
            bytes_accessed=nblocks * 16 * WIN * 4 + p_pad * 68,
            transcendentals=0),
        interpret=interpret,
    )(los, gid2d, packed_t)
    return out[:, :p]


def pad_packed_cols(packed: jnp.ndarray, win: int = WIN) -> jnp.ndarray:
    """(N+1, F<=16) row-major packed table -> (16, N_pad) feature-major,
    zero-padded so every aligned win-window up to column N stays in
    bounds."""
    n1, f = packed.shape
    n_pad = (-(-n1 // _GRP) * _GRP) + win
    out = jnp.zeros((16, n_pad), packed.dtype)
    return out.at[:f, :n1].set(packed.T)


# ---------------------------------------------------------------------------
# The stream binning front-end (v4, carry-free). Replaces the ENTIRE XLA
# expansion stage: the N-point scatter of segment-start ids (~8 ns/point
# serialized on TPU — 7-8 ms at N=1M, the round-5 piece profile's hidden
# wall), the P-wide cummax/rank scans (12.33 ms at P=3.9M, bench_profile
# r4), and the P-row expansion gather (~25 ms). Each chunk-pair step
# DMAs the 128-aligned window of the monotone per-gaussian slot-offset
# array plus the matching packed-table window, binary-searches every
# slot's owning gaussian IN REGISTER (log2(win) windowed within-128
# dynamic-gather steps over the whole step at once; sorted queries keep
# the searched mids monotone), derives rank = slot - offset[gid] in
# closed form, and gathers the 16 feature columns. No sequential carry:
# blocks are independent, every input byte is read once.
#
# chunk/win are parameters: the TPU path uses 2048 (one aligned window
# covers a whole step; falls back on span violation), the CPU interpret
# path (tests) uses 256 so the interpreter's per-op dispatch cost stays
# bounded. Loops are lax.fori_loop, not Python unrolls, so the traced
# body stays a few hundred ops at any size (Mosaic compile time).
# ---------------------------------------------------------------------------


def _gather_win128(arr, idx, win):
    """Windowed within-128 dynamic gather: arr (rows, win) -> values at
    idx (rows, 128) (window-local indices in [0, win); each row gathers
    within its own lanes). Sweeps win/128 source windows, selecting by
    the index high bits."""
    rows = idx.shape[0]
    acc = jnp.zeros(idx.shape, arr.dtype)
    idx_l = idx & 127
    wsel = idx >> 7
    for w in range(win // _GRP):
        taken = jnp.take_along_axis(arr[:, w * _GRP:(w + 1) * _GRP],
                                    idx_l, axis=1)
        acc = jnp.where(wsel == w, taken, acc)
    return acc


def _make_kernel_v4(chunk, win, two_offs=False):
    ngrp = chunk // _GRP

    def kernel(los_ref, rows_ref, pads_ref, meta_ref, offs_ref,
               *rest):
        if two_offs:
            (offs2_ref, packed_ref, out_ref, gid_ref, rank_ref, wbuf,
             obuf, o2buf, gbuf, sems) = rest
        else:
            (packed_ref, out_ref, gid_ref, rank_ref, wbuf, obuf,
             gbuf, sems) = rest
        i = pl.program_id(0)
        nblocks = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)

        def dmas(step, buf_slot):
            lo = pl.multiple_of(los_ref[step], _GRP)
            # Offsets are (R, 1, W): the bucket dim is UNTILED (scalar
            # indexed), the (1, W) tail is the tiled payload — Mosaic
            # rejects size-1 sublane slices of a sublane-tiled (R, W).
            row = rows_ref[step]
            ds = [pltpu.make_async_copy(
                      packed_ref.at[:, pl.ds(lo, win)],
                      wbuf.at[buf_slot], sems.at[buf_slot]),
                  pltpu.make_async_copy(
                      offs_ref.at[row, :, pl.ds(lo, win)],
                      obuf.at[buf_slot], sems.at[2 + buf_slot])]
            if two_offs:
                ds.append(pltpu.make_async_copy(
                    offs2_ref.at[row, :, pl.ds(lo, win)],
                    o2buf.at[buf_slot], sems.at[4 + buf_slot]))
            return ds

        @pl.when(i == 0)
        def _():
            for d in dmas(0, 0):
                d.start()

        @pl.when(i + 1 < nblocks)
        def _():
            for d in dmas(i + 1, 1 - slot):
                d.start()

        for d in dmas(i, slot):
            d.wait()
        # Broadcast the offsets row across the ngrp sublanes via an
        # arith add: a plain vector.broadcast of this dynamically
        # slot-indexed scratch read fails Mosaic layout inference at
        # wide lane counts ("Invalid input layout").
        offs_b = pltpu.repeat(obuf[slot][:1, :win], chunk // _GRP,
                              axis=0)
        lo = los_ref[i]
        total = pads_ref[i]                # pad-slot start of this block
        n_real = meta_ref[0]
        base = i * chunk

        # Whole-step binary search, all ngrp x _GRP slots at once:
        # rightmost window-local g with offs[g] <= slot. offs rows are
        # broadcast across the group (sublane) axis.
        s = base + (jax.lax.broadcasted_iota(
            jnp.int32, (ngrp, _GRP), 0) * _GRP
            + jax.lax.broadcasted_iota(jnp.int32, (ngrp, _GRP), 1))

        def search_step(_, lo_hi):
            lo_b, hi_b = lo_hi
            mid = (lo_b + hi_b) >> 1
            a = _gather_win128(offs_b, mid, win)
            go = a <= s
            return (jnp.where(go, mid, lo_b), jnp.where(go, hi_b, mid))

        lo0 = jnp.zeros((ngrp, _GRP), jnp.int32)
        hi0 = jnp.full((ngrp, _GRP), win, jnp.int32)
        steps = max(1, (win - 1).bit_length())
        gid_l, _ = jax.lax.fori_loop(0, steps, search_step, (lo0, hi0))
        if two_offs:
            # Segmented rank: offs2[r, g] = offs[r, g] - (g's pair count
            # in buckets before r), so s - offs2[gid] is the rank within
            # the gaussian's WHOLE footprint (row-major decode space),
            # not just within this bucket.
            offs2_b = pltpu.repeat(o2buf[slot][:1, :win],
                                   chunk // _GRP, axis=0)
            start = _gather_win128(offs2_b, gid_l, win)
        else:
            start = _gather_win128(offs_b, gid_l, win)  # offs[gid]
        is_pad = s >= total
        gid_ref[0] = jnp.where(is_pad, n_real, gid_l + lo)
        rank_ref[0] = jnp.where(is_pad, s - total, s - start)
        # Stage the window-local gids in scratch, PRE-broadcast over the
        # 16 feature rows: the feature loop reads one group per step
        # (dynamic slicing needs a ref, and Mosaic cannot broadcast a
        # dynamically-sliced (1, 128) row across sublanes).
        gbuf[:, :, :] = jnp.broadcast_to(
            jnp.minimum(gid_l, win - 1)[:, None, :], (ngrp, 16, _GRP))

        # Feature expansion, one group of 128 slots per fori step (the
        # win/128-window sweep inside is a short Python unroll).
        win_f = wbuf[slot]                             # (16, win)

        def feat_step(g, _):
            idx16 = gbuf[g]                            # (16, _GRP)
            wsel = idx16 >> 7
            idx_l = idx16 & 127
            acc = jnp.zeros((16, _GRP), jnp.float32)
            for w in range(win // _GRP):
                taken = jnp.take_along_axis(
                    win_f[:, w * _GRP:(w + 1) * _GRP], idx_l, axis=1)
                acc = jnp.where(wsel == w, taken, acc)
            out_ref[:, pl.ds(pl.multiple_of(g * _GRP, _GRP), _GRP)] = acc
            return 0

        jax.lax.fori_loop(0, ngrp, feat_step, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("p", "chunk", "win", "interpret"))
def stream_expand(packed_t: jnp.ndarray, offs_pad: jnp.ndarray,
                  los: jnp.ndarray, rows: jnp.ndarray,
                  pad_starts: jnp.ndarray, meta: jnp.ndarray, p: int,
                  chunk: int = CHUNK, win: int = WIN,
                  interpret: bool = False,
                  offs2_pad: jnp.ndarray | None = None):
    """Carry-free fused search + expansion (optionally row-segmented).

    packed_t: (16, N_pad) feature-major table padded so any aligned
    win-window at or below column N stays in bounds.
    offs_pad: (R, N + 1 + win + 2*_GRP) i32 non-decreasing ABSOLUTE
    slot offsets per segment row — offs_pad[r, g] = first pair slot of
    gaussian g within segment r's slot range, offs_pad[r, n] = the
    segment's pad start, then 0x7FFFFFFF padding. The flat path is
    R = 1. Empty gaussians repeat their successor's offset; the
    rightmost-match search then never selects them (matching the
    scatter-max semantics of the XLA path).
    los: (ceil(p/chunk),) i32 128-aligned per-step window starts
    (= floor128 of the first slot's owning gid). rows: (nblocks,) i32
    segment row per step (blocks must not straddle segments: segment
    capacities are chunk-aligned). pad_starts: (nblocks,) i32 absolute
    slot where the step's segment becomes padding. meta: (1,) i32 [n].
    Every step's live span must fit `win` (caller-checked).

    offs2_pad, when given, is a second (R, N_pad) array gathered at the
    found gid to produce the rank instead of offs_pad (the segmented
    path passes offs - cells_in_earlier_buckets so ranks address the
    full row-major footprint).

    Returns (cols (16, p), gid (p,), rank (p,)).
    """
    p_pad = -(-p // chunk) * chunk
    nblocks = p_pad // chunk
    two_offs = offs2_pad is not None

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 + two_offs),
        out_specs=[
            pl.BlockSpec((16, chunk), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk // _GRP, _GRP),
                         lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk // _GRP, _GRP),
                         lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16, win), jnp.float32),
            pltpu.VMEM((2, 1, win), jnp.int32),
        ] + ([pltpu.VMEM((2, 1, win), jnp.int32)] if two_offs else [])
        + [
            pltpu.VMEM((chunk // _GRP, 16, _GRP), jnp.int32),
            pltpu.SemaphoreType.DMA((6 if two_offs else 4,)),
        ],
    )
    operands = [los, rows, pad_starts, meta, offs_pad[:, None, :]]
    if two_offs:
        operands.append(offs2_pad[:, None, :])
    operands.append(packed_t)
    cols, gid, rank = pl.pallas_call(
        _make_kernel_v4(chunk, win, two_offs=two_offs),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((16, p_pad), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, chunk // _GRP, _GRP),
                                 jnp.int32),
            jax.ShapeDtypeStruct((nblocks, chunk // _GRP, _GRP),
                                 jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=((win - 1).bit_length() + 16) * 4 * p_pad,
            bytes_accessed=nblocks * 16 * win * 4 + p_pad * 76,
            transcendentals=0),
        interpret=interpret,
    )(*operands)
    return (cols[:, :p], gid.reshape(p_pad)[:p],
            rank.reshape(p_pad)[:p])


def window_starts_from_offsets_seg(offs_rows: jnp.ndarray, cap: int,
                                   n: int, chunk: int = CHUNK):
    """Segmented analogue of window_starts_from_offsets.

    offs_rows: (R, >= n + 1) non-decreasing ABSOLUTE slot offsets per
    bucket row — offs_rows[r, g] = first slot of gaussian g's pairs in
    bucket r (= r*cap + local exclusive count), offs_rows[r, n] = the
    bucket's live end (r*cap + min(demand_r, cap)), then monotone
    padding. cap must be chunk-aligned so no block straddles buckets.

    Returns (los (R*bps,), rows (R*bps,), pad_starts (R*bps,),
    span ()) with bps = cap // chunk, all in block-grid order
    (bucket-major).
    """
    r_buckets = offs_rows.shape[0]
    assert cap % chunk == 0
    bps = cap // chunk
    base = jnp.arange(r_buckets, dtype=jnp.int32)[:, None] * cap
    grid = base + jnp.arange(bps + 1, dtype=jnp.int32)[None, :] * chunk
    srch = jax.vmap(lambda o, g: jnp.searchsorted(o, g, side="right"))
    g_at = srch(offs_rows, grid).astype(jnp.int32) - 1
    first = g_at[:, :-1]
    pad_start = offs_rows[:, n]
    last_slot = jnp.minimum(grid[:, 1:] - 1,
                            jnp.maximum(pad_start - 1, 0)[:, None])
    last = srch(offs_rows, last_slot).astype(jnp.int32) - 1
    last = jnp.minimum(last, n - 1)
    los = (first // _GRP) * _GRP
    span = jnp.max(jnp.maximum(last, first) - los + 1)
    rows = jnp.broadcast_to(
        jnp.arange(r_buckets, dtype=jnp.int32)[:, None],
        (r_buckets, bps)).reshape(-1)
    pads = jnp.broadcast_to(pad_start[:, None],
                            (r_buckets, bps)).reshape(-1)
    return los.reshape(-1), rows, pads, span


def window_starts_from_offsets(offs: jnp.ndarray, p: int, n: int,
                               chunk: int = CHUNK):
    """Per-step 128-aligned window starts + live span check from the
    offset array alone (no scatter, no P-wide scan): gid at slot s =
    rightmost g with offs[g] <= s, evaluated only at the chunk grid =
    one small searchsorted.

    offs: (N+1,) non-decreasing first-slot offsets (offs[n] = total).
    Returns (los (nblocks,) i32, span () i32) where span is the worst
    live aligned window span over steps (compare against `win`).
    """
    p_pad = -(-p // chunk) * chunk
    nblocks = p_pad // chunk
    grid = jnp.arange(nblocks + 1, dtype=jnp.int32) * chunk
    # rightmost g with offs[g] <= s  ==  searchsorted(offs, s, 'right')-1
    g_at = jnp.searchsorted(offs, grid, side="right").astype(
        jnp.int32) - 1
    first = g_at[:-1]
    # Last LIVE gid of each step: the gaussian owning slot
    # min(step_end, total) - 1; all-pad steps clamp to the last live
    # gaussian overall, whose span contribution is <= _GRP.
    total = offs[n]
    last_slot = jnp.minimum(grid[1:] - 1, jnp.maximum(total - 1, 0))
    last = jnp.searchsorted(offs, last_slot,
                            side="right").astype(jnp.int32) - 1
    last = jnp.minimum(last, n - 1)
    los = (first // _GRP) * _GRP
    span = jnp.max(jnp.maximum(last, first) - los + 1)
    return los, span
