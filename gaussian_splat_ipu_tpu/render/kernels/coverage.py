"""Pallas TPU kernel for the exact cell-coverage masks.

binning._coverage_masks evaluates, per gaussian, the conic quadratic's
constrained minimum over each of 64 candidate cells (an 8x8 window) to
decide which cells of the bounding rectangle can clear alpha_min. As an
XLA fori_loop that is 64 sequential (N,)-wide kernel launches whose
(mlo, mhi, count) carry round-trips HBM every iteration — ~2.6 GB of
carry traffic at N=1M, a hidden multi-ms cost of exact_tile_test
(round-5 stage profile). Here the whole window loop runs in-register
per block: geometry is read ONCE (N x 44 B) and the three mask words
are written ONCE (N x 12 B).

The arithmetic is kept line-for-line identical to the XLA reference
(same clamps, same slack) so the discrete mask bits agree; the 1e-4
slack on q absorbs transcendental rounding differences between
backends (see binning._coverage_masks).

Cell rows (dy) beyond every gaussian's ny in a block are skipped
(predicated on the block max) — clustered scenes with small footprints
pay only for the rows they use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_SPAN = 8  # 8x8 cell window == binning.MASK_SPAN (import would cycle)

_C = 4096  # gaussians per grid step (lanes)


def _kernel(geomf_ref, geomi_ref, out_ref, *, tw, th, alpha_min):
    gx = geomf_ref[0, :]
    gy = geomf_ref[1, :]
    ca = geomf_ref[2, :]
    cb = geomf_ref[3, :]
    cc = geomf_ref[4, :]
    op = geomf_ref[5, :]
    x0f = geomi_ref[0, :].astype(jnp.float32)
    y0f = geomi_ref[1, :].astype(jnp.float32)
    nxf = geomi_ref[2, :].astype(jnp.float32)
    nyf = geomi_ref[3, :].astype(jnp.float32)
    testable = geomi_ref[4, :] != 0

    q = 2.0 * jnp.log(jnp.maximum(op, 1e-12) / alpha_min)
    q = q * (1.0 + 1e-4) + 1e-4
    ca_s = jnp.maximum(ca, 1e-12)
    cc_s = jnp.maximum(cc, 1e-12)

    def edge_u(e, v0, v1):
        v = jnp.clip(-cb * e / cc_s, v0, v1)
        return ca * e * e + 2.0 * cb * e * v + cc * v * v

    def edge_v(f, u0, u1):
        u = jnp.clip(-cb * f / ca_s, u0, u1)
        return ca * u * u + 2.0 * cb * u * f + cc * f * f

    # Skip whole dy rows no gaussian in this block reaches.
    max_ny = jnp.max(jnp.where(testable, geomi_ref[3, :], 0))

    zeros = jnp.zeros_like(geomi_ref[0, :])
    out_ref[0, :] = zeros
    out_ref[1, :] = zeros
    out_ref[2, :] = zeros
    for dy in range(MASK_SPAN):
        @pl.when(dy < max_ny)
        def _(dy=dy):
            mlo = out_ref[0, :]
            mhi = out_ref[1, :]
            count = out_ref[2, :]
            v0 = (y0f + dy) * th - gy
            v1 = v0 + (th - 1.0)
            v_in = (v0 <= 0.0) & (0.0 <= v1)
            in_row = dy < nyf
            for dx in range(MASK_SPAN):
                k = dy * MASK_SPAN + dx
                u0 = (x0f + dx) * tw - gx
                u1 = u0 + (tw - 1.0)
                inside = (u0 <= 0.0) & (0.0 <= u1) & v_in
                fmin = jnp.minimum(
                    jnp.minimum(edge_u(u0, v0, v1),
                                edge_u(u1, v0, v1)),
                    jnp.minimum(edge_v(v0, u0, u1),
                                edge_v(v1, u0, u1)))
                fmin = jnp.where(inside, 0.0, fmin)
                in_rect = (dx < nxf) & in_row
                keep = testable & in_rect & (fmin <= q)
                bit = jnp.where(keep, jnp.int32(1) << (k & 31), 0)
                if k < 32:
                    mlo = mlo | bit
                else:
                    mhi = mhi | bit
                count = count + keep.astype(jnp.int32)
            out_ref[0, :] = mlo
            out_ref[1, :] = mhi
            out_ref[2, :] = count


@functools.partial(jax.jit,
                   static_argnames=("tw", "th", "alpha_min", "interpret"))
def coverage_masks_tpu(geomf: jnp.ndarray, geomi: jnp.ndarray, *,
                       tw: float, th: float, alpha_min: float,
                       interpret: bool = False):
    """(mlo, mhi, count) each (N,) i32 from per-gaussian geometry.

    geomf: (6, N) f32 rows [gx, gy, conic_a, conic_b, conic_c, opacity];
    geomi: (5, N) i32 rows [x0, y0, nx, ny, testable] in CELL units.
    tw/th: cell pixel size (tile_group * tile size); static.
    """
    n = geomf.shape[1]
    n_pad = -(-n // _C) * _C
    if n_pad != n:
        geomf = jnp.pad(geomf, ((0, 0), (0, n_pad - n)))
        geomi = jnp.pad(geomi, ((0, 0), (0, n_pad - n)))
    out = pl.pallas_call(
        functools.partial(_kernel, tw=tw, th=th, alpha_min=alpha_min),
        grid=(n_pad // _C,),
        in_specs=[
            pl.BlockSpec((6, _C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, _C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, _C), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=40 * MASK_SPAN * MASK_SPAN * n_pad,
            bytes_accessed=n_pad * 56,
            transcendentals=n_pad),
        interpret=interpret,
    )(geomf, geomi)
    return out[0, :n], out[1, :n], out[2, :n]
