"""Pallas TPU blocked multi-row cumulative sum.

XLA's cumulative ops on TPU run ~0.8 ns/element (bench_profile r4) —
two orders of magnitude off VPU streaming rate — because every log-step
round-trips HBM. The segmented binning needs an EXCLUSIVE per-row scan
of an (R, N) count matrix (one row per tile-row bucket); this kernel
runs the whole scan in VMEM blocks: per (R, BLK) block a lane log-shift
inclusive cumsum (log2(BLK) rolls), plus a running per-row carry in
scratch (the grid is sequential on TPU, so the carry is exact).
Traffic: every element read once, written once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 2048


def _kernel(x_ref, out_ref, carry):
    i = pl.program_id(0)
    r = x_ref.shape[0]

    @pl.when(i == 0)
    def _():
        carry[:, :] = jnp.zeros((r, 128), jnp.int32)

    x = x_ref[:, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, BLK), 1)
    inc = x
    s = 1
    while s < BLK:
        shifted = pltpu.roll(inc, s, axis=1)
        inc = jnp.where(lane >= s, inc + shifted, inc)
        s *= 2
    c = carry[:, :1]
    out_ref[:, :] = inc - x + c          # exclusive + carry-in
    # Carry out: the inclusive total of this block, broadcast over the
    # 128 carry lanes (pltpu.repeat handles the sublane-safe broadcast;
    # lane extraction via a static tail slice).
    tail = inc[:, BLK - 1:] + c          # (r, 1)
    carry[:, :] = pltpu.repeat(tail, 128, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_cumsum_exclusive(x: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """(R, N) i32 -> (R, N) exclusive cumsum along axis 1."""
    r, n = x.shape
    n_pad = -(-n // BLK) * BLK
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)))
    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // BLK,),
        in_specs=[pl.BlockSpec((r, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((r, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((r, 128), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * r * n_pad * 11,
            bytes_accessed=2 * r * n_pad * 4,
            transcendentals=0),
        interpret=interpret,
    )(x)
    return out[:, :n]
