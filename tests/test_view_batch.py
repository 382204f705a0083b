"""2D (view, shard) mesh tests: data parallelism over camera views on top
of gaussian/tile-row sharding (parallel/distributed.py view-batch path).

Runs on the virtual 8-device CPU mesh as 2 view groups x 4 shards.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.parallel import distributed, mesh as meshlib
from gaussian_splat_ipu_tpu.render.pipeline import render_image
from gaussian_splat_ipu_tpu.train import trainer
from gaussian_splat_ipu_tpu.utils.config import RasterConfig

import pytest

# Heavy mesh/CLI integration tests: the fast tier is `pytest -m 'not slow'`
# (VERDICT r3 #7).
pytestmark = pytest.mark.slow

CFG = RasterConfig(image_width=64, image_height=128, pair_capacity=1 << 12,
                   max_chunks_per_tile=4)  # 2x4 tiles -> 1 row per shard


def _scene(n=128, seed=0):
    model = GaussianModel.random(jax.random.PRNGKey(seed), n)
    cams = [Camera.orbit(np.array([-1.0, -1.0, -1.0], np.float32),
                         np.array([1.0, 1.0, 1.0], np.float32),
                         fov_radians=np.radians(40.0), aspect=0.5,
                         rot_y_deg=90.0 * i) for i in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    return model, cams, batch


def test_view_batch_matches_per_view_render():
    model, cams, batch = _scene()
    mesh = meshlib.make_mesh_2d(num_views=2, num_shards=4)
    sharded = meshlib.shard_model(model, mesh)
    images = distributed.render_views_sharded(
        sharded, batch, CFG, mesh, use_pallas=False,
        pair_capacity=1 << 12)
    assert images.shape == (4, 128, 64, 4)
    for i, cam in enumerate(cams):
        ref = render_image(model, cam, CFG, use_pallas=False)
        np.testing.assert_allclose(np.asarray(images[i]), np.asarray(ref),
                                   atol=1e-5, err_msg=f"view {i}")


def test_view_batch_train_step():
    model, cams, batch = _scene()
    mesh = meshlib.make_mesh_2d(num_views=2, num_shards=4)
    sharded = meshlib.shard_model(model, mesh)
    means_before = np.asarray(sharded.means).copy()
    tc = trainer.TrainConfig(ssim_weight=0.0)
    state = trainer.init_state(sharded, tc)
    targets = jnp.zeros((4, 128, 64, 4), jnp.float32)
    step = distributed.make_view_batch_train_step(
        mesh, CFG, tc, use_pallas=False, pair_capacity=1 << 12)
    new_state, loss, stats = step(state, batch, targets)
    assert np.isfinite(float(loss))
    # Drop counters surface through the step (counted-never-silent).
    assert int(stats["exchange_overflow"]) == 0
    assert int(stats["overflow"]) == 0
    delta = np.abs(np.asarray(new_state.params.means) - means_before).max()
    assert delta > 0.0


def test_view_batch_grads_match_mean_of_per_view():
    """Batched-view gradient == mean of per-view single-device gradients
    (the view-axis psum transpose is exact)."""
    from gaussian_splat_ipu_tpu.train import losses

    model, cams, batch = _scene(n=64, seed=3)
    targets = jnp.zeros((4, 128, 64, 4), jnp.float32)

    def single_loss(m, cam, tgt):
        img = render_image(m, cam, CFG, use_pallas=False)
        return losses.render_loss(img, tgt, 0.0)

    gs = [jax.grad(single_loss)(model, cams[i], targets[i])
          for i in range(4)]
    g_mean = jax.tree.map(lambda *xs: sum(xs) / 4.0, *gs)

    mesh = meshlib.make_mesh_2d(num_views=2, num_shards=4)
    sharded = meshlib.shard_model(model, mesh)

    def batch_loss(m):
        images = distributed.render_views_sharded(
            m, batch, CFG, mesh, use_pallas=False, pair_capacity=1 << 12)
        return jnp.mean(jax.vmap(
            lambda im, tg: losses.render_loss(im, tg, 0.0))(images,
                                                            targets))

    g_batch = jax.grad(batch_loss)(sharded)
    for name in ("means", "log_scales", "quats", "opacities", "sh"):
        np.testing.assert_allclose(
            np.asarray(getattr(g_batch, name)),
            np.asarray(getattr(g_mean, name)), atol=1e-5, err_msg=name)
