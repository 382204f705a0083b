"""Row-bucket segmented binning (rowseg_buckets): parity vs the flat
stream path, per-bucket truncation accounting, and the span fallback.

The segmented path places pairs directly into R row-bucket segments and
sorts them as a batched (R, cap) 2D sort; buckets are whole group rows
in ascending order, so every tile's [start, end) slice of the table
must be EXACTLY the flat path's slice (same pairs, same order, same
bits). Rendered images agree to compositing-reassociation ulp (tile
ranges land at different offsets mod the rasterizer chunk, which
re-brackets the transmittance scan — the same accepted residual as the
sharded-vs-single comparison, tests/test_distributed.py).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.render import binning
from gaussian_splat_ipu_tpu.render.projection import project_gaussians
from gaussian_splat_ipu_tpu.utils.config import RasterConfig


@pytest.fixture(autouse=True)
def _force_kernel():
    binning.FORCE_EXPAND_KERNEL = True
    yield
    binning.FORCE_EXPAND_KERNEL = False


def _scene(n=3000, seed=0):
    m = GaussianModel.random(jax.random.PRNGKey(seed), n)
    cam = Camera.orbit(jnp.array([-1.0, -1.0, -1.0]),
                       jnp.array([1.0, 1.0, 1.0]), 60.0, 640 / 360,
                       rot_y_deg=30.0)
    return m, cam


def _tile_slices(b):
    starts = np.asarray(b.tile_starts)
    ends = np.asarray(b.tile_ends)
    feats = np.asarray(b.features)
    gid = np.asarray(b.pair_gid)
    return [(feats[:, s:e], gid[s:e]) for s, e in zip(starts, ends)]


@pytest.mark.parametrize("g,tt,r", [(1, False, 4), (2, True, 4),
                                    (2, True, 3)])
def test_rowseg_tables_match_flat(g, tt, r):
    m, cam = _scene()
    cfg = RasterConfig(image_width=640, image_height=360,
                       pair_capacity=16384, tile_group=g,
                       exact_tile_test=tt)
    sp = jax.jit(lambda mm: project_gaussians(mm, cam, cfg))(m)
    b1 = jax.jit(lambda s: binning.bin_splats(s, cfg))(sp)
    cfg2 = dataclasses.replace(cfg, rowseg_buckets=r)
    b2 = jax.jit(lambda s: binning.bin_splats(s, cfg2))(sp)
    assert int(b1.num_pairs) == int(b2.num_pairs)
    assert int(b1.overflow) == int(b2.overflow) == 0
    for (f1, g1), (f2, g2) in zip(_tile_slices(b1), _tile_slices(b2)):
        assert np.array_equal(g1, g2)
        assert np.array_equal(f1, f2)


def test_rowseg_balanced_bounds_match_flat():
    """Demand-balanced boundaries (the production path on skewed
    scenes): probe per-row demand, balance, bin — per-tile slices must
    still be exactly the flat path's."""
    m, cam = _scene()
    cfg = RasterConfig(image_width=640, image_height=360,
                       pair_capacity=16384, tile_group=2,
                       exact_tile_test=True)
    sp = jax.jit(lambda mm: project_gaussians(mm, cam, cfg))(m)
    b1 = jax.jit(lambda s: binning.bin_splats(s, cfg))(sp)
    rd = np.asarray(jax.jit(
        lambda s: binning.bucket_demands(s, cfg))(sp))
    assert int(rd.sum()) == int(b1.num_pairs)
    bounds = binning.balance_bounds(rd, 4)
    assert bounds[0] == 0 and bounds[-1] == len(rd)
    cfg2 = dataclasses.replace(cfg, rowseg_buckets=4,
                               rowseg_bounds=bounds)
    b2 = jax.jit(lambda s: binning.bin_splats(s, cfg2))(sp)
    assert int(b2.overflow) == 0
    for (f1, g1), (f2, g2) in zip(_tile_slices(b1), _tile_slices(b2)):
        assert np.array_equal(g1, g2)
        assert np.array_equal(f1, f2)


def test_balance_bounds_properties():
    d = [10, 200, 250, 240, 30, 5, 5, 260, 0, 0, 0, 0]
    for r in (2, 3, 4, 6):
        b = binning.balance_bounds(d, r)
        assert len(b) == r + 1 and b[0] == 0 and b[-1] == len(d)
        assert all(y > x for x, y in zip(b, b[1:]))
    b = binning.balance_bounds(d, 4)
    buckets = [sum(d[b[i]:b[i + 1]]) for i in range(4)]
    assert max(buckets) <= sum(d) / 4 * 2.0   # roughly balanced


def test_rowseg_image_and_grads_close():
    from gaussian_splat_ipu_tpu.render.pipeline import render

    m, cam = _scene()
    cfg = RasterConfig(image_width=640, image_height=360,
                       pair_capacity=16384, tile_group=2,
                       exact_tile_test=True)
    cfg2 = dataclasses.replace(cfg, rowseg_buckets=4)

    def loss(mm, c):
        img = render(mm, cam, c).image
        return jnp.mean(img ** 2)

    l1, grad1 = jax.value_and_grad(lambda mm: loss(mm, cfg))(m)
    l2, grad2 = jax.value_and_grad(lambda mm: loss(mm, cfg2))(m)
    assert np.allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grad1), jax.tree.leaves(grad2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_rowseg_bucket_truncation_counted():
    # Capacity far below demand: every bucket truncates independently;
    # pairs + overflow must still account for the full demand.
    m, cam = _scene(n=6000)
    cfg = RasterConfig(image_width=640, image_height=360,
                       pair_capacity=16384, tile_group=1)
    sp = jax.jit(lambda mm: project_gaussians(mm, cam, cfg))(m)
    demand = int(jax.jit(
        lambda s: binning.bin_splats(s, cfg).num_pairs)(sp))
    assert demand > 4096
    cfg_small = dataclasses.replace(cfg, pair_capacity=4096,
                                    rowseg_buckets=4)
    b = jax.jit(lambda s: binning.bin_splats(s, cfg_small))(sp)
    assert int(b.num_pairs) + int(b.overflow) == demand
    assert int(b.overflow) > 0
    # Every reported tile range stays inside its bucket's live slots.
    starts = np.asarray(b.tile_starts)
    ends = np.asarray(b.tile_ends)
    gid = np.asarray(b.pair_gid)
    n = 6000
    for s, e in zip(starts, ends):
        assert np.all(gid[s:e] < n)


def test_rowseg_span_fallback_matches_flat():
    # A scene whose visible gaussians are sparse in index space: a
    # 2048-slot step then spans more source rows than the window and
    # the lax.cond falls back to the flat path. Build it by making only
    # every 40th gaussian visible (the rest behind the camera).
    m, cam = _scene(n=20000, seed=1)
    means = np.asarray(m.means).copy()
    keep = np.arange(20000) % 40 == 0
    means[~keep] = np.array([0.0, 0.0, 1e6], np.float32)  # culled
    m = GaussianModel(jnp.asarray(means), m.log_scales, m.quats,
                      m.opacities, m.sh)
    cfg = RasterConfig(image_width=640, image_height=360,
                       pair_capacity=16384, tile_group=1)
    sp = jax.jit(lambda mm: project_gaussians(mm, cam, cfg))(m)
    b1 = jax.jit(lambda s: binning.bin_splats(s, cfg))(sp)
    cfg2 = dataclasses.replace(cfg, rowseg_buckets=4)
    b2 = jax.jit(lambda s: binning.bin_splats(s, cfg2))(sp)
    # Fallback produces the FLAT layout: identical tables end to end.
    assert int(b1.num_pairs) == int(b2.num_pairs)
    assert np.array_equal(np.asarray(b1.tile_starts),
                          np.asarray(b2.tile_starts))
    assert np.array_equal(np.asarray(b1.features),
                          np.asarray(b2.features))


def test_bucket_counts_sum_to_ncov():
    m, cam = _scene()
    cfg = RasterConfig(image_width=640, image_height=360,
                       pair_capacity=16384, tile_group=2,
                       exact_tile_test=True)
    sp = jax.jit(lambda mm: project_gaussians(mm, cam, cfg))(m)
    g = cfg.tile_group
    x0, y0, nx, ny = binning.tile_ranges_of(sp, cfg)
    x1 = x0 + jnp.maximum(nx - 1, 0)
    y1 = y0 + jnp.maximum(ny - 1, 0)
    gx0, gy0 = x0 // g, y0 // g
    nxg = jnp.where(nx > 0, x1 // g - gx0 + 1, 0)
    nyg = jnp.where(ny > 0, y1 // g - gy0 + 1, 0)
    testable, mlo, mhi, ncov_x = binning._coverage_masks(
        sp, cfg, gx0, gy0, nxg, nyg, cell_w=g * cfg.tile_width,
        cell_h=g * cfg.tile_height)
    ncov = jnp.where(testable, ncov_x, nxg * nyg)
    flag01 = jnp.where(testable, 1, 0)  # bin_splats flags testable alone
    nrows_g = -(-cfg.tiles_y // g)
    for r_seg in (3, 4):
        rows_pb = -(-nrows_g // r_seg)
        bounds = tuple(r * rows_pb for r in range(r_seg + 1))
        counts = binning._bucket_counts(
            gy0, nxg, nyg, flag01, mlo, mhi, jnp.int32(0), bounds)
        np.testing.assert_array_equal(
            np.asarray(counts.sum(axis=0)), np.asarray(ncov))
    # uneven demand-balanced boundaries cover the rows exactly too
    bounds = (0, 1, 4, nrows_g)
    counts = binning._bucket_counts(
        gy0, nxg, nyg, flag01, mlo, mhi, jnp.int32(0), bounds)
    np.testing.assert_array_equal(
        np.asarray(counts.sum(axis=0)), np.asarray(ncov))
