"""Backward Pallas kernel vs autodiff of the jnp spec.

The north-star correctness bar is "gradients allclose vs the reference
renderer" (BASELINE.json); the jnp chunked formulation
(render/tile_raster.py) is our pixel-exact spec, so its autodiff is the
gradient oracle. The Pallas backward (render/kernels/rasterize.py
_bwd_kernel) reconstructs intermediates back-to-front and must match it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.render import binning, tile_raster
from gaussian_splat_ipu_tpu.render.kernels import rasterize
from gaussian_splat_ipu_tpu.render.pipeline import render_image
from gaussian_splat_ipu_tpu.render.projection import project_gaussians
from gaussian_splat_ipu_tpu.utils.config import RasterConfig

CFG = RasterConfig(image_width=64, image_height=64, pair_capacity=1 << 12,
                   max_chunks_per_tile=4)


def _binned(seed=0, n=192, cfg=CFG, opacity_boost=0.0):
    model = GaussianModel.random(jax.random.PRNGKey(seed), n)
    model = GaussianModel(model.means, model.log_scales, model.quats,
                          model.opacities + opacity_boost, model.sh)
    camera = Camera.orbit(np.array([-1.0, -1.0, -1.0], np.float32),
                          np.array([1.0, 1.0, 1.0], np.float32),
                          fov_radians=np.radians(40.0), aspect=1.0)
    splats = project_gaussians(model, camera, cfg)
    return binning.bin_splats(splats, cfg)


def _grads(binned, cfg, use_pallas, cotangent):
    def f(features):
        b = binned._replace(features=features)
        if use_pallas:
            tiles = rasterize.rasterize_tiles(b, cfg)
        else:
            tiles = tile_raster.rasterize_tiles_jnp(b, cfg)
        return jnp.sum(tiles * cotangent)

    return jax.grad(f)(binned.features)


class TestBackwardKernel:
    @pytest.mark.parametrize("seed", [0, 3])
    @pytest.mark.slow
    def test_matches_spec_autodiff(self, seed):
        b = _binned(seed=seed)
        key = jax.random.PRNGKey(100 + seed)
        shape = (CFG.num_tiles, CFG.pixels_per_tile, 4)
        cot = jax.random.normal(key, shape, jnp.float32)
        g_ref = _grads(b, CFG, False, cot)
        g_pal = _grads(b, CFG, True, cot)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   atol=2e-4, rtol=1e-3)

    @pytest.mark.slow
    def test_tile_group_multichunk_ranges_match_spec(self):
        """Regression (round-5 bug): with tile_group > 1 every member
        tile replays the SAME group range; when that range spans more
        than one 128-pair chunk, the backward's fresh-interior-chunk
        write used to erase the earlier members' contributions (only the
        group's first grid-order member may skip the read-modify-write).
        Needs >128 pairs per group to trigger — small scenes never did.
        """
        cfg = RasterConfig(image_width=64, image_height=64,
                           pair_capacity=1 << 12, max_chunks_per_tile=16,
                           tile_group=2)
        b = _binned(seed=4, n=700, cfg=cfg)
        counts = np.asarray(b.tile_ends) - np.asarray(b.tile_starts)
        assert counts.max() > 128, "scene must produce multi-chunk ranges"
        shape = (cfg.num_tiles, cfg.pixels_per_tile, 4)
        cot = jax.random.normal(jax.random.PRNGKey(11), shape,
                                jnp.float32)
        g_ref = _grads(b, cfg, False, cot)
        g_pal = _grads(b, cfg, True, cot)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   atol=5e-4, rtol=2e-3)

    @pytest.mark.slow
    def test_matches_with_early_termination(self):
        """High opacities force the T<eps break: the contributor-count path
        (trigger excluded from gradients) must match the spec's masking."""
        b = _binned(seed=1, opacity_boost=6.0)
        assert int(b.num_pairs) > 0
        shape = (CFG.num_tiles, CFG.pixels_per_tile, 4)
        cot = jnp.ones(shape, jnp.float32)
        g_ref = _grads(b, CFG, False, cot)
        g_pal = _grads(b, CFG, True, cot)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   atol=2e-4, rtol=1e-3)

    @pytest.mark.slow
    def test_background_and_alpha_cotangents(self):
        """Nonzero background routes dL/dT through both the colour and the
        alpha output channel."""
        cfg = RasterConfig(image_width=64, image_height=64,
                           pair_capacity=1 << 12, max_chunks_per_tile=4,
                           background=(0.2, 0.5, 0.9))
        b = _binned(seed=2, cfg=cfg)
        shape = (cfg.num_tiles, cfg.pixels_per_tile, 4)
        cot = jax.random.normal(jax.random.PRNGKey(7), shape, jnp.float32)
        g_ref = _grads(b, cfg, False, cot)
        g_pal = _grads(b, cfg, True, cot)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   atol=2e-4, rtol=1e-3)

    @pytest.mark.slow
    def test_end_to_end_model_grads(self):
        """Full chain: loss -> image -> rasterize bwd -> binning vjp ->
        projection vjp -> model parameter grads, pallas vs jnp path."""
        model = GaussianModel.random(jax.random.PRNGKey(5), 128)
        camera = Camera.orbit(np.array([-1.0, -1.0, -1.0], np.float32),
                              np.array([1.0, 1.0, 1.0], np.float32),
                              fov_radians=np.radians(40.0), aspect=1.0)

        def loss(m, use_pallas):
            img = render_image(m, camera, CFG, use_pallas)
            return jnp.mean(jnp.abs(img))

        g_ref = jax.grad(loss)(model, False)
        g_pal = jax.grad(loss)(model, True)
        for name in ("means", "log_scales", "quats", "opacities", "sh"):
            np.testing.assert_allclose(
                np.asarray(getattr(g_pal, name)),
                np.asarray(getattr(g_ref, name)), atol=2e-4, rtol=1e-3,
                err_msg=name)

    @pytest.mark.slow
    def test_finite_difference(self):
        """Directional derivative check of the Pallas path against central
        differences on the features table."""
        b = _binned(seed=6, n=64)
        shape = (CFG.num_tiles, CFG.pixels_per_tile, 4)
        cot = jnp.ones(shape, jnp.float32) * 0.5

        def f(features):
            tiles = rasterize.rasterize_tiles(
                b._replace(features=features), CFG)
            return jnp.sum(tiles * cot)

        g = jax.grad(f)(b.features)
        v = jax.random.normal(jax.random.PRNGKey(8), b.features.shape,
                              jnp.float32)
        # Perturb only the colour rows: the output is linear in colour, so
        # central differences are exact there; geometry rows cross skip /
        # clamp / termination thresholds and have no stable FD estimate.
        mask = jnp.zeros_like(v).at[5:8].set(1.0)  # colour rows
        v = v * mask
        eps = 1e-2
        fd = (float(f(b.features + eps * v))
              - float(f(b.features - eps * v))) / (2 * eps)
        an = float(jnp.vdot(g, v))
        assert fd == pytest.approx(an, rel=1e-3, abs=1e-3)
