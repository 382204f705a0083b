"""Pallas TPU stream-expand kernel: run-length pair-table expansion.

The binning expansion duplicates each gaussian's 16-column packed
feature row into its (gaussian, tile) pairs. As an XLA gather
(`packed[gid_pre]`) this runs ~10 ns/row — ~42 ms at 1M-gaussian pair
counts, over HALF the frame (bench_sort 'rgatherasc'; BASELINE.md
round-4); a delta-scatter alternative measured worse still (N-row
scatter-add, 179 ms end-to-end). This kernel streams it:

  * the output (P pairs) is walked in CHUNK=1024-pair grid steps of
    eight 128-pair sub-blocks;
  * a sub-block's pairs own a NON-DECREASING run of source rows, so ONE
    aligned (16, WIN)-window DMA starting at the sub-block's first row
    covers it whenever the row span fits the window. bin_splats checks
    the worst sub-block span per frame (a cheap strided reduction over
    gid_pre) and falls back to the XLA gather via lax.cond when a frame
    violates it — long culled runs in spatially-coherent scenes can
    exceed any fixed window;
  * within a sub-block the expansion is a one-hot selection evaluated
    on the MXU: onehot(128, WIN) @ window(WIN, 16) — exactly one 1.0
    per row reproduces each f32 value exactly. Integer payloads ride as
    exact-in-f32 pieces (< 2^24), never raw bitcasts: arbitrary i32 bit
    patterns viewed as f32 can be NaNs that an MXU pass would
    canonicalise (bin_splats packs/unpacks, see its fused path);
  * pad pairs (gid == N) clamp to the window top; their expanded
    content is garbage and bin_splats zeroes pad columns post-sort
    (the old path's zero sentinel row, restored one level up).

Cost: per pair ~2xWIN VPU ops + WIN MXU MACs + 1/128 of a 32 KB DMA —
measured ~6x cheaper than the gather at 1M scale (BENCH r4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output pairs per grid step / per sub-block / source-window rows.
# WIN - SUB - 127 rows of slack absorb culled-gaussian runs between a
# sub-block's pairs (the 127 is window alignment); bin_splats falls back
# to the gather when a frame's worst span exceeds it. A large CHUNK
# amortises the one unavoidable DMA-latency stall per grid step.
CHUNK = 4096
SUB = 128
WIN = 512


def max_subblock_span(gid_pre: jnp.ndarray, n: int) -> jnp.ndarray:
    """Worst aligned-window row span over 128-pair sub-blocks (pads
    excluded — their expanded content is zeroed post-sort, so only live
    pairs constrain the window)."""
    p = gid_pre.shape[0]
    p_pad = -(-p // SUB) * SUB
    gid_ext = jnp.concatenate(
        [gid_pre, jnp.broadcast_to(gid_pre[-1:], (p_pad - p,))]) \
        if p_pad != p else gid_pre
    g2 = gid_ext.reshape(p_pad // SUB, SUB)
    first = g2[:, 0]
    last_live = jnp.max(jnp.where(g2 >= n, -1, g2), axis=1)
    return jnp.max(last_live - (first // SUB) * SUB + 1)


def _kernel(gid_ref, packed_ref, out_ref, wbuf, sems):
    nsub = CHUNK // SUB
    gid = gid_ref[0]                                  # (nsub, SUB) i32

    # Start every sub-block window DMA up front (window starts are all
    # readable from gid; copies drain while earlier sub-blocks compute).
    los = []
    for s in range(nsub):
        lo_al = (gid[s, 0] // SUB) * SUB              # 128-aligned
        los.append(lo_al)
        pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(pl.multiple_of(lo_al, SUB), WIN)],
            wbuf.at[s], sems.at[s]).start()

    iota_win = jax.lax.broadcasted_iota(jnp.int32, (SUB, WIN), 1)
    for s in range(nsub):
        pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(pl.multiple_of(los[s], SUB), WIN)],
            wbuf.at[s], sems.at[s]).wait()
        # Clamp binds only for pad pairs (span-checked upstream); their
        # junk content is zeroed post-sort.
        idx = jnp.minimum(gid[s] - los[s], WIN - 1)   # (SUB,)
        onehot = (idx[:, None] == iota_win).astype(jnp.float32)
        # NT contraction over the window dim: no (16, WIN) transpose.
        sub = jax.lax.dot_general(
            onehot, wbuf[s], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # (SUB, 16)
        acc_ref = out_ref  # alias for clarity; written feature-major
        acc_ref[:, s * SUB:(s + 1) * SUB] = sub.T


@functools.partial(jax.jit, static_argnames=("interpret",))
def expand_pairs(packed_t: jnp.ndarray, gid_pre: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """Expand a (16, N_pad) feature-major table to (16, P) pair columns.

    packed_t columns must be padded so any aligned WIN-window starting
    at or below the largest gid stays in bounds (pad_packed_cols).
    gid_pre: (P,) i32 non-decreasing owning row per pair; every live
    sub-block's span must fit the window (max_subblock_span < WIN - 127,
    checked by the caller).
    """
    p = gid_pre.shape[0]
    p_pad = -(-p // CHUNK) * CHUNK
    if p_pad != p:
        gid_pre = jnp.concatenate(
            [gid_pre, jnp.broadcast_to(gid_pre[-1:], (p_pad - p,))])
    # (G, nsub, SUB): each sub-block is one natural (8, 128)-tileable
    # row (Mosaic requires the trailing block dims be (8k, 128)).
    gid2d = gid_pre.reshape(p_pad // CHUNK, CHUNK // SUB, SUB)

    out = pl.pallas_call(
        _kernel,
        grid=(p_pad // CHUNK,),
        in_specs=[
            pl.BlockSpec((1, CHUNK // SUB, SUB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((16, CHUNK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, p_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((CHUNK // SUB, 16, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((CHUNK // SUB,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * WIN * 16,
            bytes_accessed=(p_pad // SUB) * 16 * WIN * 4 + p_pad * 68,
            transcendentals=0),
        interpret=interpret,
    )(gid2d, packed_t)
    return out[:, :p]


def pad_packed_cols(packed: jnp.ndarray) -> jnp.ndarray:
    """(N+1, F<=16) row-major packed table -> (16, N_pad) feature-major,
    zero-padded so every aligned WIN-window up to column N stays in
    bounds."""
    n1, f = packed.shape
    n_pad = (-(-n1 // SUB) * SUB) + WIN
    out = jnp.zeros((16, n_pad), packed.dtype)
    return out.at[:f, :n1].set(packed.T)
