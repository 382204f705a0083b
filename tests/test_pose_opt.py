"""Camera pose refinement tests (train/pose_opt.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.render.pipeline import render_image
from gaussian_splat_ipu_tpu.train import pose_opt, trainer
from gaussian_splat_ipu_tpu.utils.config import RasterConfig

import pytest


class TestSE3Exp:
    def test_zero_is_identity(self):
        np.testing.assert_allclose(
            np.asarray(pose_opt.se3_exp(jnp.zeros(6))), np.eye(4),
            atol=1e-7)

    def test_pure_rotation_matches_rodrigues(self):
        w = jnp.array([0.3, -0.2, 0.5, 0.0, 0.0, 0.0])
        m = np.asarray(pose_opt.se3_exp(w))
        th = float(jnp.linalg.norm(w[:3]))
        k = np.asarray(pose_opt._hat(w[:3])) / th
        expected = (np.eye(3) + np.sin(th) * k
                    + (1 - np.cos(th)) * (k @ k))
        np.testing.assert_allclose(m[:3, :3], expected, atol=1e-6)
        np.testing.assert_allclose(m[:3, 3], 0.0, atol=1e-7)
        np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3),
                                   atol=1e-6)

    def test_pure_translation(self):
        d = jnp.array([0.0, 0.0, 0.0, 1.0, -2.0, 3.0])
        m = np.asarray(pose_opt.se3_exp(d))
        np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-7)
        np.testing.assert_allclose(m[:3, 3], [1.0, -2.0, 3.0], atol=1e-6)

    def test_inverse(self):
        rng = np.random.default_rng(0)
        d = jnp.asarray(rng.normal(0, 0.4, 6).astype(np.float32))
        prod = (np.asarray(pose_opt.se3_exp(d))
                @ np.asarray(pose_opt.se3_exp(-d)))
        np.testing.assert_allclose(prod, np.eye(4), atol=1e-5)

    def test_small_angle_smooth(self):
        # Taylor branch: tiny rotations stay finite and differentiable.
        d = jnp.array([1e-6, -1e-6, 1e-6, 0.1, 0.0, 0.0])
        g = jax.jacobian(pose_opt.se3_exp)(d)
        assert np.isfinite(np.asarray(g)).all()


def _setup(seed=0, n=48):
    model = GaussianModel.random(jax.random.PRNGKey(seed), n, extent=0.5)
    cam = Camera.look_at([0.0, 0.0, 3.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                         np.radians(50.0), 1.0)
    cfg = RasterConfig(image_width=32, image_height=32,
                       pair_capacity=1 << 10, max_chunks_per_tile=4)
    return model, cam, cfg


@pytest.mark.slow
def test_recovers_known_perturbation():
    """Freeze the scene (zero LRs); the pose delta must learn to invert a
    known SE(3) perturbation of the camera."""
    model, cam_true, cfg = _setup()
    target = render_image(model, cam_true, cfg, use_pallas=False)

    d0 = jnp.array([0.02, -0.015, 0.01, 0.03, -0.02, 0.02], jnp.float32)
    cam_bad = pose_opt.apply_delta(cam_true, d0)

    frozen = trainer.TrainConfig(lr_means=0.0, lr_means_final=0.0,
                                 lr_log_scales=0.0, lr_quats=0.0,
                                 lr_opacities=0.0, lr_sh=0.0,
                                 ssim_weight=0.0)
    state = trainer.init_state(model, frozen)
    pstate = pose_opt.init_pose_state(1, lr=5e-3)
    step = jax.jit(pose_opt.joint_step, static_argnums=(5, 6, 7, 8))

    first = None
    for _ in range(60):
        state, pstate, loss = step(state, pstate, jnp.int32(0), cam_bad,
                                   target, cfg, frozen, 5e-3, False)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.35 * first, (first, float(loss))
    # The learned correction composes with the perturbation to ~identity.
    comp = (np.asarray(pose_opt.se3_exp(pstate.deltas[0]))
            @ np.asarray(pose_opt.se3_exp(d0)))
    angle_err = np.arccos(np.clip((np.trace(comp[:3, :3]) - 1) / 2, -1, 1))
    assert angle_err < 0.02, angle_err
    assert np.linalg.norm(comp[:3, 3]) < 0.03


@pytest.mark.slow
def test_joint_step_updates_both():
    model, cam, cfg = _setup()
    target = render_image(model, cam, cfg, use_pallas=False) * 0.8
    tc = trainer.TrainConfig(ssim_weight=0.0)
    state = trainer.init_state(model, tc)
    pstate = pose_opt.init_pose_state(3, lr=1e-3)
    step = jax.jit(pose_opt.joint_step, static_argnums=(5, 6, 7, 8))
    s2, p2, loss = step(state, pstate, jnp.int32(1), cam, target, cfg,
                        tc, 1e-3, False)
    assert np.isfinite(float(loss))
    # Scene moved, and ONLY the selected view's delta row moved.
    assert not np.allclose(np.asarray(s2.params.means),
                           np.asarray(state.params.means))
    d = np.asarray(p2.deltas)
    assert np.abs(d[1]).max() > 0.0
    np.testing.assert_allclose(d[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(d[2], 0.0, atol=1e-12)
    assert int(s2.step) == 1


def test_corrected_cameras_roundtrip():
    _, cam, _ = _setup()
    cams = pose_opt.corrected_cameras([cam, cam],
                                      jnp.zeros((2, 6), jnp.float32))
    np.testing.assert_allclose(np.asarray(cams[0].view),
                               np.asarray(cam.view), atol=1e-7)
