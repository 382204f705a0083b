"""Tiled renderer vs the dense oracle: pixel-exact agreement.

The integration oracle the reference never had (SURVEY.md §4): the binned,
chunked, tiled pipeline must reproduce the dense sequential compositor to
float tolerance on random scenes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.ops import transforms
from gaussian_splat_ipu_tpu.render.oracle import render_oracle
from gaussian_splat_ipu_tpu.render.pipeline import render
from gaussian_splat_ipu_tpu.utils.config import RasterConfig


def random_scene(n=200, seed=0):
    return GaussianModel.random(jax.random.PRNGKey(seed), n, extent=1.0)


def camera(w, h):
    view = transforms.look_at([0.0, 0.5, 4.0], [0.0, 0.0, 0.0],
                              [0.0, 1.0, 0.0])
    proj = transforms.perspective(np.radians(50.0), w / h, 0.1, 100.0)
    return Camera(view, proj)


@pytest.mark.parametrize("tile", [(32, 32), (16, 64)])
@pytest.mark.slow
def test_tiled_matches_oracle(tile):
    th, tw = tile
    cfg = RasterConfig(image_width=128, image_height=96, tile_width=tw,
                       tile_height=th, chunk_size=32, pair_capacity=8192,
                       max_chunks_per_tile=16)
    model = random_scene(200)
    cam = camera(128, 96)
    ref = np.asarray(render_oracle(model, cam, cfg))
    out = render(model, cam, cfg, use_pallas=False)
    assert int(out.overflow) == 0
    got = np.asarray(out.image)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_tile_counts_histogram():
    cfg = RasterConfig(image_width=64, image_height=64, tile_width=32,
                       tile_height=32, chunk_size=16, pair_capacity=4096)
    model = random_scene(100, seed=3)
    out = render(model, camera(64, 64), cfg, use_pallas=False)
    counts = np.asarray(out.tile_counts)
    assert counts.shape == (4,)
    assert counts.sum() == int(out.num_pairs)


@pytest.mark.slow
def test_truncated_counter_reports_dropped_tail():
    # One big gaussian covering everything -> every tile holds ~n pairs.
    # With max_chunks_per_tile=2 (work bound 2*16=32) a 100-splat scene
    # overruns every tile; the dropped tail must be COUNTED, not silent
    # (VERDICT r1 weak #3; reference guarded-overflow discipline,
    # codelets.cpp:487-490).
    cfg = RasterConfig(image_width=64, image_height=64, tile_width=32,
                       tile_height=32, chunk_size=16, pair_capacity=4096,
                       max_chunks_per_tile=2)
    model = random_scene(100, seed=3)
    out = render(model, camera(64, 64), cfg, use_pallas=False)
    counts = np.asarray(out.tile_counts)
    expect = np.maximum(counts - 2 * 16, 0).sum()
    assert expect > 0, "scene too small to trigger truncation"
    assert int(out.truncated) == expect

    # A roomy bound reports zero.
    cfg_ok = RasterConfig(image_width=64, image_height=64, tile_width=32,
                          tile_height=32, chunk_size=16, pair_capacity=4096,
                          max_chunks_per_tile=64)
    out_ok = render(model, camera(64, 64), cfg_ok, use_pallas=False)
    assert int(out_ok.truncated) == 0


@pytest.mark.slow
def test_unaligned_image_padding_cropped():
    # 100x70 image with 32x32 tiles: padded to 128x96 internally.
    cfg = RasterConfig(image_width=100, image_height=70, tile_width=32,
                       tile_height=32, chunk_size=16, pair_capacity=8192)
    model = random_scene(150, seed=5)
    cam = camera(100, 70)
    ref = np.asarray(render_oracle(model, cam, cfg))
    got = np.asarray(render(model, cam, cfg, use_pallas=False).image)
    assert got.shape == (70, 100, 4)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_jit_and_grad_through_pipeline():
    cfg = RasterConfig(image_width=64, image_height=64, tile_width=32,
                       tile_height=32, chunk_size=16, pair_capacity=4096,
                       max_chunks_per_tile=8)
    model = random_scene(50, seed=7)
    cam = camera(64, 64)

    def loss(m):
        img = render(m, cam, cfg, use_pallas=False).image
        return jnp.sum(img[..., :3] ** 2)

    val, grads = jax.jit(jax.value_and_grad(loss))(model)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # Means must receive nonzero gradient (the pipeline is differentiable
    # end-to-end through binning gathers).
    assert float(jnp.abs(grads.means).sum()) > 0.0
    assert float(jnp.abs(grads.opacities).sum()) > 0.0
    assert float(jnp.abs(grads.sh).sum()) > 0.0


@pytest.mark.slow
def test_alpha_aware_extents_exact_mode_matches_oracle():
    # extent_sigma=0: footprints reach the full alpha_min radius, so the
    # tiled pipeline reproduces the dense oracle to fp noise even for
    # near-opaque splats (whose alpha_min radius is ~3.33 sigma > 3).
    cfg = RasterConfig(image_width=128, image_height=96, chunk_size=32,
                       pair_capacity=1 << 14, extent_sigma=0.0)
    model = random_scene(300, seed=5)
    cam = camera(128, 96)
    ref = np.asarray(render_oracle(model, cam, cfg))
    out = render(model, cam, cfg, use_pallas=False)
    assert int(out.overflow) == 0
    np.testing.assert_allclose(np.asarray(out.image), ref,
                               atol=1e-5, rtol=1e-4)


def test_alpha_aware_extents_shrink_dim_splats():
    from gaussian_splat_ipu_tpu.ops import covariance

    a = jnp.full((4,), 25.0)   # sigma_x = 5 px
    c = jnp.full((4,), 25.0)
    op = jnp.array([1.0, 0.35, 0.01, 1.0 / 255.0])
    rx, _ = covariance.splat_extent(a, c, op, max_sigma=3.0)
    # opaque: capped at 3 sigma = 15 px; mid: just under the cap;
    # dim (0.01): sqrt(2 ln(2.55)) ~ 1.37 sigma ~ 7 px; at alpha_min: 0.
    assert float(rx[0]) == 15.0
    assert 14.0 <= float(rx[1]) <= 15.0
    assert float(rx[2]) <= 7.0
    assert float(rx[3]) == 0.0
    # uncapped: opaque reaches ~3.33 sigma
    rx0, _ = covariance.splat_extent(a, c, op, max_sigma=0.0)
    assert 16.0 <= float(rx0[0]) <= 17.0


@pytest.mark.slow
def test_render_depth_single_and_mixture():
    import dataclasses

    from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
    from gaussian_splat_ipu_tpu.models.camera import Camera
    from gaussian_splat_ipu_tpu.render.pipeline import render_depth

    # One opaque splat at z = -2 seen from z = +3: view depth = 5.
    def one(z, op=8.0):
        return GaussianModel.create(
            means=np.array([[0.0, 0.0, z]], np.float32),
            log_scales=np.full((1, 3), -2.0, np.float32),
            quats=np.array([[1.0, 0, 0, 0]], np.float32),
            opacities=np.array([op], np.float32),
            f_dc=np.ones((1, 3), np.float32))

    cam = Camera.look_at([0.0, 0.0, 3.0], [0.0, 0.0, 0.0],
                         [0.0, 1.0, 0.0], np.radians(50.0), 1.0)
    cfg = RasterConfig(image_width=64, image_height=64, chunk_size=32,
                       pair_capacity=1 << 10)
    mean, var, alpha = render_depth(one(-2.0), cam, cfg, use_pallas=False)
    cy, cx = 32, 32
    assert float(alpha[cy, cx]) > 0.9
    np.testing.assert_allclose(float(mean[cy, cx]), 5.0, rtol=1e-5)
    assert float(var[cy, cx]) < 1e-4
    # Uncovered pixels report zero depth.
    assert float(mean[0, 0]) == 0.0

    # Two half-transparent splats at depths 2 and 5: the mean lies
    # between them and the variance is positive.
    both = GaussianModel(
        means=jnp.concatenate([one(1.0).means, one(-2.0).means]),
        log_scales=jnp.concatenate([one(1.0).log_scales] * 2),
        quats=jnp.concatenate([one(1.0).quats] * 2),
        opacities=jnp.zeros((2,), jnp.float32),  # sigmoid(0) = 0.5
        sh=jnp.concatenate([one(1.0).sh] * 2))
    mean, var, alpha = render_depth(both, cam, cfg, use_pallas=False)
    assert 2.0 < float(mean[cy, cx]) < 5.0
    assert float(var[cy, cx]) > 0.5

    # Pallas interpret path agrees with the jnp spec.
    m2, v2, a2 = render_depth(both, cam, cfg, use_pallas=True)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(mean), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(var), atol=1e-4)

    # A nonzero configured background must not leak into depth.
    cfg_bg = dataclasses.replace(cfg, background=(1.0, 1.0, 1.0))
    m3, _, _ = render_depth(both, cam, cfg_bg, use_pallas=False)
    np.testing.assert_allclose(np.asarray(m3), np.asarray(mean),
                               atol=1e-6)
