"""Sparse SfM depth supervision tests (io/colmap.py with_depth,
train/depth.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splat_ipu_tpu.io import colmap
from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.train import depth as depth_lib
from gaussian_splat_ipu_tpu.train import trainer
from gaussian_splat_ipu_tpu.utils.config import RasterConfig

from tests.test_colmap import _make_dataset

import pytest

# Heavy mesh/CLI integration tests: the fast tier is `pytest -m 'not slow'`
# (VERDICT r3 #7).
pytestmark = pytest.mark.slow


class TestLoaderDepth:
    def test_binary_observations(self, tmp_path):
        root, _, _ = _make_dataset(str(tmp_path), binary=True)
        fs, xyz, rgb, obs = colmap.load_colmap(root, with_depth=True)
        assert len(obs) == 2
        # Frame 0 = a.png (image 7): observes point 11 at world origin
        # from an identity-rotation camera at t=(0,0,4) -> z = 4.0;
        # its pid=-1 observation is filtered.
        assert obs[0].shape == (1, 3)
        np.testing.assert_allclose(obs[0][0], [1.0, 2.0, 4.0], atol=1e-5)
        # Frame 1 = b.png: no 2D points recorded.
        assert obs[1].shape == (0, 3)

    def test_text_matches_binary(self, tmp_path):
        rb, _, _ = _make_dataset(str(tmp_path / "b"), binary=True)
        rt, _, _ = _make_dataset(str(tmp_path / "t"), binary=False)
        _, _, _, ob = colmap.load_colmap(rb, with_depth=True)
        _, _, _, ot = colmap.load_colmap(rt, with_depth=True)
        for a, b in zip(ob, ot):
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_downscale_scales_uv_not_z(self, tmp_path):
        root, _, _ = _make_dataset(str(tmp_path), binary=True)
        _, _, _, obs = colmap.load_colmap(root, downscale=2,
                                          with_depth=True)
        np.testing.assert_allclose(obs[0][0], [0.5, 1.0, 4.0], atol=1e-5)


def test_pack_observations():
    obs = [np.array([[1.0, 2.0, 3.0]], np.float32),
           np.arange(30, dtype=np.float32).reshape(10, 3)]
    o, m = depth_lib.pack_observations(obs, max_per_view=4)
    assert o.shape == (2, 4, 3) and m.shape == (2, 4)
    assert bool(m[0, 0]) and not bool(m[0, 1])
    assert int(m[1].sum()) == 4          # subsampled to K
    np.testing.assert_allclose(np.asarray(o[1, 0]), [0.0, 1.0, 2.0])


def _opaque_scene():
    """One big opaque gaussian at the origin, camera 3 units away."""
    model = GaussianModel(
        means=jnp.zeros((1, 3)),
        log_scales=jnp.full((1, 3), np.log(0.4)),
        quats=jnp.array([[1.0, 0, 0, 0]]),
        opacities=jnp.full((1,), 10.0),
        sh=jnp.full((1, 1, 3), 1.0),
    )
    cam = Camera.look_at([0, 0, 3.0], [0, 0, 0], [0, 1, 0],
                         np.radians(50.0), 1.0)
    cfg = RasterConfig(image_width=32, image_height=32,
                       pair_capacity=1 << 10, max_chunks_per_tile=4)
    return model, cam, cfg


def test_sparse_depth_loss_values():
    model, cam, cfg = _opaque_scene()
    # The gaussian's front surface composites around z ~ 3 - O(scale) at
    # the image centre; correct-z observations must score much lower
    # than off-by-1m observations.
    obs_good = jnp.array([[16.0, 16.0, 2.8]], jnp.float32)
    obs_bad = jnp.array([[16.0, 16.0, 1.5]], jnp.float32)
    mask = jnp.array([True])
    lg = float(depth_lib.sparse_depth_loss(model, cam, obs_good, mask,
                                           cfg, use_pallas=False))
    lb = float(depth_lib.sparse_depth_loss(model, cam, obs_bad, mask,
                                           cfg, use_pallas=False))
    assert lg < 0.15 and lb > 0.5, (lg, lb)
    # Fully-masked input returns exactly zero (no NaN from 0/0).
    lz = float(depth_lib.sparse_depth_loss(model, cam, obs_good,
                                           jnp.array([False]), cfg,
                                           use_pallas=False))
    assert lz == 0.0


def test_depth_step_pulls_geometry_toward_observation():
    """Photometric loss is ambiguous along the view ray; the depth term
    must pull the (frozen-colour) gaussian toward the observed z."""
    model, cam, cfg = _opaque_scene()
    target = jnp.zeros((32, 32, 4))     # don't care: weight the depth
    tc = trainer.TrainConfig(ssim_weight=0.0, lr_means=5e-2,
                             lr_means_final=5e-2, lr_log_scales=0.0,
                             lr_quats=0.0, lr_opacities=0.0, lr_sh=0.0)
    obs = jnp.array([[16.0, 16.0, 2.0]], jnp.float32)  # want it closer
    mask = jnp.array([True])
    step = depth_lib.make_depth_train_step(cfg, tc, depth_weight=50.0,
                                           use_pallas=False, jit=True)
    state = trainer.init_state(model, tc)
    d0 = None
    for _ in range(30):
        state, loss = step(state, cam, target, obs, mask)
        if d0 is None:
            d0 = float(depth_lib.sparse_depth_loss(
                state.params, cam, obs, mask, cfg, use_pallas=False))
    d1 = float(depth_lib.sparse_depth_loss(state.params, cam, obs, mask,
                                           cfg, use_pallas=False))
    assert np.isfinite(float(loss))
    assert d1 < 0.5 * d0, (d0, d1)


def test_pack_observations_fills_budget():
    """n slightly above k must still fill all k slots (a ceil-strided
    slice kept only ~k/2)."""
    o = [np.arange(4097 * 3, dtype=np.float32).reshape(4097, 3)]
    obs, m = depth_lib.pack_observations(o, max_per_view=4096)
    assert int(np.asarray(m).sum()) == 4096
    # First and last observations are retained by the even spacing.
    np.testing.assert_allclose(np.asarray(obs[0, 0]), o[0][0])
    np.testing.assert_allclose(np.asarray(obs[0, -1]), o[0][-1])
