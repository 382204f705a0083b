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

# Output pairs per grid step == source-window rows. One aligned window
# serves a whole step; the 128 slack absorbs window alignment. A frame
# falls back to the XLA gather when any step's row span exceeds WIN
# (max_subblock_span, checked by bin_splats via lax.cond).
CHUNK = 2048
WIN = 2048
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


def pad_packed_cols(packed: jnp.ndarray) -> jnp.ndarray:
    """(N+1, F<=16) row-major packed table -> (16, N_pad) feature-major,
    zero-padded so every aligned WIN-window up to column N stays in
    bounds."""
    n1, f = packed.shape
    n_pad = (-(-n1 // _GRP) * _GRP) + WIN
    out = jnp.zeros((16, n_pad), packed.dtype)
    return out.at[:f, :n1].set(packed.T)


# ---------------------------------------------------------------------------
# v3: the stream binning front-end. Fuses the P-wide expansion SCANS
# (cummax of the scattered gaussian ids, segment-start cummax, rank) into
# the expansion kernel itself. XLA's cumulative ops run ~100x off
# streaming speed-of-light on TPU (the scatter+cummax+rank stage measured
# 12.33 ms at P=3.9M, bench_profile r4 — ~0.8 ns/elem where the VPU
# streams 8x128/cycle); in-kernel the same scans are log-shift networks
# over VMEM-resident blocks with scalar SMEM carries across the
# (sequential) grid, fused with the row-window gather so the pair table
# is produced in ONE pass over HBM.
# ---------------------------------------------------------------------------


def _lane_cummax(x, width):
    """Inclusive cummax along the lane (last) axis via log-shift rolls.
    Rolls are circular; wrapped lanes are masked off."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = 1
    while s < width:
        shifted = pltpu.roll(x, s, axis=x.ndim - 1)
        x = jnp.where(lane >= s, jnp.maximum(x, shifted), x)
        s *= 2
    return x


def _kernel_v3(los_ref, gat_ref, packed_ref, out_ref, gid_ref, rank_ref,
               wbuf, sems, carry):
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    ngrp = CHUNK // _GRP
    nwin = WIN // _GRP

    def win_dma(step, buf_slot):
        lo = pl.multiple_of(los_ref[step], _GRP)
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(lo, WIN)], wbuf.at[buf_slot],
            sems.at[buf_slot])

    @pl.when(i == 0)
    def _():
        win_dma(0, 0).start()
        carry[0] = 0   # last gid of the previous block
        carry[1] = 0   # last segment start (global slot)

    @pl.when(i + 1 < nblocks)
    def _():
        win_dma(i + 1, 1 - slot).start()

    # ---- fused scans over this block's (ngrp, _GRP) slots ----
    gat = gat_ref[0]                                   # (ngrp, _GRP) i32
    # Inclusive cummax along lanes, then propagate row carries (rows are
    # consecutive 128-slot runs of the flat slot order).
    cm = _lane_cummax(gat, _GRP)
    row_end = cm[:, _GRP - 1:]                         # (ngrp, 1)
    # exclusive cummax over rows via log sublane shifts
    sub = jax.lax.broadcasted_iota(jnp.int32, (ngrp, 1), 0)
    rprev = jnp.where(sub >= 1, pltpu.roll(row_end, 1, axis=0), 0)
    s = 1
    while s < ngrp:
        shifted = pltpu.roll(rprev, s, axis=0)
        rprev = jnp.where(sub >= s + 1, jnp.maximum(rprev, shifted),
                          rprev)
        s *= 2
    cgid = carry[0]
    gid = jnp.maximum(cm, jnp.maximum(rprev, cgid))    # (ngrp, _GRP)

    # Segment starts: slot index where gid changes, forward-filled.
    base = i * CHUNK
    lane = jax.lax.broadcasted_iota(jnp.int32, (ngrp, _GRP), 1)
    srow = jax.lax.broadcasted_iota(jnp.int32, (ngrp, _GRP), 0)
    gslot = base + srow * _GRP + lane                  # global slot id
    # Previous slot's gid in the flat order: within-row roll handles
    # lanes >= 1; lane 0 of row r takes row r-1's last lane (carry-in
    # for the very first slot). No flat reshape: that would be a
    # Mosaic relayout.
    rolled = pltpu.roll(gid, 1, axis=1)
    prev_rowend = pltpu.roll(gid[:, _GRP - 1:], 1, axis=0)  # (ngrp, 1)
    prev_gid = jnp.where(
        lane == 0,
        jnp.where(srow == 0, cgid, prev_rowend),
        rolled)
    tr = jnp.where(gid != prev_gid, gslot, 0)
    tm = _lane_cummax(tr, _GRP)
    trow_end = tm[:, _GRP - 1:]
    tprev = jnp.where(sub >= 1, pltpu.roll(trow_end, 1, axis=0), 0)
    s = 1
    while s < ngrp:
        shifted = pltpu.roll(tprev, s, axis=0)
        tprev = jnp.where(sub >= s + 1, jnp.maximum(tprev, shifted),
                          tprev)
        s *= 2
    seg_start = jnp.maximum(tm, jnp.maximum(tprev, carry[1]))
    rank = gslot - seg_start

    carry[0] = gid[ngrp - 1, _GRP - 1]
    carry[1] = seg_start[ngrp - 1, _GRP - 1]

    gid_ref[0] = gid
    rank_ref[0] = rank

    # ---- feature gather (as v2) ----
    win_dma(i, slot).wait()
    win = wbuf[slot]                                   # (16, WIN)
    lo = los_ref[i]
    for g in range(ngrp):
        idx = jnp.minimum(gid[g] - lo, WIN - 1)[None, :]   # (1, _GRP)
        wsel = idx >> 7
        idx_l = jnp.broadcast_to(idx & 127, (16, _GRP))
        acc = jnp.zeros((16, _GRP), jnp.float32)
        w_lo = wsel[0, 0]
        w_hi = wsel[0, _GRP - 1]
        for w in range(nwin):
            cond = jnp.logical_and(w >= w_lo, w <= w_hi)
            taken = jnp.take_along_axis(
                win[:, w * _GRP:(w + 1) * _GRP], idx_l, axis=1)
            pick = jnp.logical_and(cond, wsel == w)
            acc = jnp.where(pick, taken, acc)
        out_ref[:, g * _GRP:(g + 1) * _GRP] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def stream_expand(packed_t: jnp.ndarray, gid_at: jnp.ndarray,
                  los: jnp.ndarray, interpret: bool = False):
    """Fused scans + expansion: (16, N_pad) table + scattered ids ->
    (cols (16, P), gid (P,), rank (P,)).

    gid_at: (P,) i32, gaussian id scattered at each segment's first slot
    (zero elsewhere) — the pre-cummax array of the XLA scan path.
    los: (ceil(P/CHUNK),) i32 128-aligned source-window start per step
    (= floor128 of the first slot's owning gid), computed in XLA from
    block maxima of gid_at — no P-wide scan needed.
    Every live step's aligned span must fit WIN (caller-checked).
    """
    p = gid_at.shape[0]
    p_pad = -(-p // CHUNK) * CHUNK
    if p_pad != p:
        # Pad slots continue the last segment (gid_at zeros): harmless,
        # dropped on return.
        gid_at = jnp.concatenate(
            [gid_at, jnp.zeros((p_pad - p,), jnp.int32)])
    nblocks = p_pad // CHUNK
    gat2d = gid_at.reshape(nblocks, CHUNK // _GRP, _GRP)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, CHUNK // _GRP, _GRP),
                         lambda i, los: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((16, CHUNK), lambda i, los: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK // _GRP, _GRP),
                         lambda i, los: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK // _GRP, _GRP),
                         lambda i, los: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    cols, gid, rank = pl.pallas_call(
        _kernel_v3,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((16, p_pad), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, CHUNK // _GRP, _GRP),
                                 jnp.int32),
            jax.ShapeDtypeStruct((nblocks, CHUNK // _GRP, _GRP),
                                 jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * p_pad * 16 * 2,
            bytes_accessed=nblocks * 16 * WIN * 4 + p_pad * 76,
            transcendentals=0),
        interpret=interpret,
    )(los, gat2d, packed_t)
    return (cols[:, :p], gid.reshape(p_pad)[:p],
            rank.reshape(p_pad)[:p])


def window_starts(gid_at: jnp.ndarray, p_pad: int, n: int):
    """128-aligned per-step source-window starts + per-step LIVE gid
    bounds, all from block reductions (no P-wide scan).

    The pad sentinel (id n at the first pad slot) is masked out: pad
    pairs clamp to the window top inside the kernel and their junk is
    zeroed post-sort, so only live pairs constrain the window. Returns
    (los (nblocks,), first (nblocks,), last (nblocks,)); the caller's
    span check is `max(last - floor128(first) + 1) <= WIN`.
    """
    p = gid_at.shape[0]
    if p_pad != p:
        gid_at = jnp.concatenate(
            [gid_at, jnp.zeros((p_pad - p,), jnp.int32)])
    nblocks = p_pad // CHUNK
    g2 = gid_at.reshape(nblocks, CHUNK)
    g2 = jnp.where(g2 >= n, 0, g2)
    bmax = jnp.max(g2, axis=1)
    # gid at each block's first slot = max over all scatter points in
    # earlier blocks and this block's slot 0.
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jax.lax.cummax(bmax)[:-1]])
    first = jnp.maximum(prev, g2[:, 0])
    last = jnp.maximum(jax.lax.cummax(bmax), g2[:, 0])
    los = (first // _GRP) * _GRP
    return los, first, last
