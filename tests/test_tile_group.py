"""Tile-group binning parity tests (RasterConfig.tile_group).

Grouped binning keys pairs by super-tile; the compositor's alpha_min
skip makes the image pixel-identical under alpha-aware extents
(extent_sigma=0), and within tolerance with capped extents (the group
range includes just-outside-bbox splats the per-tile enumeration cuts).
"""

import dataclasses

import jax
import numpy as np
import pytest

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.render.pipeline import render
from gaussian_splat_ipu_tpu.utils.config import RasterConfig


def _scene(n=160, seed=0):
    model = GaussianModel.random(jax.random.PRNGKey(seed), n, extent=0.6)
    cam = Camera.look_at([0.2, -0.1, 2.6], [0.0, 0.0, 0.0],
                         [0.0, 1.0, 0.0], np.radians(55.0), 1.0)
    return model, cam


BASE = RasterConfig(image_width=96, image_height=96,
                    pair_capacity=1 << 13, max_chunks_per_tile=16,
                    tile_width=16, tile_height=16)


@pytest.mark.parametrize("g", [2, 3])
@pytest.mark.slow
def test_pixel_exact_with_alpha_aware_extents(g):
    """Same composited set and order (alpha_min skips the extras the
    group range adds); only chunk-boundary summation order shifts, so
    agreement is to float rounding (~1 ULP), not bitwise."""
    model, cam = _scene()
    exact = dataclasses.replace(BASE, extent_sigma=0.0)
    ref = render(model, cam, exact, use_pallas=False)
    got = render(model, cam,
                 dataclasses.replace(exact, tile_group=g),
                 use_pallas=False)
    np.testing.assert_allclose(np.asarray(got.image),
                               np.asarray(ref.image), atol=1e-6)
    # Grouping must never create MORE pairs.
    assert int(got.num_pairs) <= int(ref.num_pairs)
    assert int(got.overflow) == 0


@pytest.mark.slow
def test_pair_reduction_and_close_with_capped_extents():
    model, cam = _scene(seed=1)
    ref = render(model, cam, BASE, use_pallas=False)
    got = render(model, cam, dataclasses.replace(BASE, tile_group=2),
                 use_pallas=False)
    # Capped 3-sigma extents: the group range composites a handful of
    # just-outside-bbox splats the per-tile enumeration truncates; both
    # are approximations of the oracle, so allow a small tolerance.
    np.testing.assert_allclose(np.asarray(got.image),
                               np.asarray(ref.image), atol=5e-2)
    assert int(got.num_pairs) < int(ref.num_pairs)


@pytest.mark.parametrize("presort", [False, True])
@pytest.mark.slow
def test_pallas_matches_spec_grouped(presort):
    model, cam = _scene(seed=2, n=96)
    cfg = dataclasses.replace(BASE, tile_group=2, extent_sigma=0.0,
                              presort_depth=presort)
    a = render(model, cam, cfg, use_pallas=False)
    b = render(model, cam, cfg, use_pallas=True)
    np.testing.assert_allclose(np.asarray(b.image), np.asarray(a.image),
                               atol=1e-5)


@pytest.mark.slow
def test_gradients_flow_grouped():
    import jax.numpy as jnp

    model, cam = _scene(seed=3, n=64)
    cfg = dataclasses.replace(BASE, tile_group=2)

    def loss(m):
        return jnp.sum(render(m, cam, cfg, use_pallas=False).image ** 2)

    grads = jax.grad(loss)(model)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


@pytest.mark.parametrize("g", [2, 3])
@pytest.mark.slow
def test_group_composes_with_exact_tiles(g):
    """VERDICT r3 #8: the coverage mask evaluated over g x g GROUP cells
    composes with super-tile binning — pixel-identical to grouped-only
    binning (a masked-out group contributes no pixel above alpha_min by
    construction) at equal-or-fewer pairs."""
    model, cam = _scene(seed=5)
    grouped = dataclasses.replace(BASE, extent_sigma=0.0, tile_group=g)
    both = dataclasses.replace(grouped, exact_tile_test=True)
    ref = render(model, cam, grouped, use_pallas=False)
    got = render(model, cam, both, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got.image),
                               np.asarray(ref.image), atol=1e-6)
    assert int(got.num_pairs) <= int(ref.num_pairs)
    assert int(got.overflow) == 0


@pytest.mark.slow
def test_group_mask_composed_cuts_pairs_on_elongated_splats():
    """Elongated splats miss many corner cells of their bounding box:
    the composed mode must show a real pair reduction, and the Pallas
    kernel must agree with the spec on the composed config."""
    model, cam = _scene(seed=6, n=128)
    # Stretch scales anisotropically so footprints are long ellipses.
    import jax.numpy as jnp
    model = GaussianModel(means=model.means,
                          log_scales=model.log_scales
                          + jnp.array([1.2, -0.8, 0.0]),
                          quats=model.quats, opacities=model.opacities,
                          sh=model.sh)
    grouped = dataclasses.replace(BASE, extent_sigma=0.0, tile_group=2)
    both = dataclasses.replace(grouped, exact_tile_test=True)
    ref = render(model, cam, grouped, use_pallas=False)
    got = render(model, cam, both, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got.image),
                               np.asarray(ref.image), atol=1e-6)
    assert int(got.num_pairs) < int(ref.num_pairs)
    pal = render(model, cam, both, use_pallas=True)
    np.testing.assert_allclose(np.asarray(pal.image),
                               np.asarray(got.image), atol=1e-5)


@pytest.mark.slow
def test_work_cap_scales_and_truncated_dedupes():
    """The per-range work cap scales by g^2 (same effective per-tile
    capacity as ungrouped) and the truncated counter dedupes to one
    count per group."""
    model, cam = _scene(seed=4)
    tight = dataclasses.replace(BASE, max_chunks_per_tile=1)
    ref = render(model, cam, tight, use_pallas=False)
    grouped = dataclasses.replace(tight, tile_group=2)
    assert grouped.max_chunks_per_range == 4
    got = render(model, cam, grouped, use_pallas=False)
    # Group ranges (~the 4 tiles' pairs) against a 4x cap truncate in
    # the same regime as per-tile ranges against a 1x cap; the deduped
    # tally must stay comparable, not ~4x the per-tile number.
    assert int(got.truncated) <= 2 * max(int(ref.truncated), 1)
