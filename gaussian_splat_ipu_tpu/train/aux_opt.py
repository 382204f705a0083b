"""Composable auxiliary training objectives: pose + exposure + depth.

train/pose_opt.py, train/appearance.py and train/depth.py each define a
standalone joint step; real captures need them TOGETHER (COLMAP pose
error AND auto-exposure drift AND sparse depth anchors in one run). This
module builds ONE step program over any static subset of the three — the
pose delta corrects the camera first, the corrected camera drives both
the photometric render and the depth residuals, and the exposure affine
sits on the loss side only (it must soak up nuisance, never leak into
exports). No reference counterpart (forward-only viewer,
src/main/splat.cpp); north-star training extension.

Differentiation runs over a dict of the active leaf groups, so inactive
modules cost nothing (the branch is static per compiled program).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.render.pipeline import render_image
from gaussian_splat_ipu_tpu.train import appearance, depth, losses, pose_opt
from gaussian_splat_ipu_tpu.train import trainer
from gaussian_splat_ipu_tpu.utils.config import RasterConfig


class AuxState(NamedTuple):
    """Optional per-module states (None = module off; None is an empty
    pytree subtree, so the tuple rides jit/scan carries unchanged)."""

    pose: Optional[pose_opt.PoseState]
    exposure: Optional[appearance.ExposureState]


def init_aux_state(num_views: int, pose_lr: float = 0.0,
                   exposure_lr: float = 0.0) -> AuxState:
    return AuxState(
        pose=(pose_opt.init_pose_state(num_views, pose_lr)
              if pose_lr > 0 else None),
        exposure=(appearance.init_exposure_state(num_views, exposure_lr)
                  if exposure_lr > 0 else None))


def make_aux_step(raster_cfg: RasterConfig, train_cfg: trainer.TrainConfig,
                  pose_lr: float = 0.0, exposure_lr: float = 0.0,
                  depth_weight: float = 0.0, use_pallas: bool = True):
    """Build step(state, aux, view_idx, camera, target, obs, mask) ->
    (state, aux, loss) optimising the scene plus every ACTIVE module.

    obs/mask are the packed sparse-depth observations of THIS view
    (depth.pack_observations rows); pass 1-row dummies when
    depth_weight == 0 (statically unused). Returned raw (un-jitted) so it
    can ride an epoch lax.scan; jit at the call site.
    """
    tx = trainer.make_optimizer(train_cfg)
    ptx = (pose_opt.make_pose_optimizer(pose_lr)
           if pose_lr > 0 else None)
    etx = (appearance.make_exposure_optimizer(exposure_lr)
           if exposure_lr > 0 else None)

    def loss_fn(diff, view_idx, camera, target, obs, mask):
        params = diff["params"]
        cam = camera
        if ptx is not None:
            cam = pose_opt.apply_delta(camera, diff["deltas"][view_idx])
        image = render_image(params, cam, raster_cfg, use_pallas)
        if etx is not None:
            image = appearance.apply_exposure(image,
                                              diff["mats"][view_idx])
        loss = losses.render_loss(image, target, train_cfg.ssim_weight)
        if depth_weight > 0.0:
            # Depth residuals use the POSE-CORRECTED camera: the depth
            # anchors must pull geometry toward the refined poses, not
            # the raw COLMAP ones.
            loss = loss + depth_weight * depth.sparse_depth_loss(
                params, cam, obs, mask, raster_cfg, use_pallas)
        return loss

    def step(state: trainer.TrainState, aux: AuxState,
             view_idx: jnp.ndarray, camera: Camera, target: jnp.ndarray,
             obs: jnp.ndarray, mask: jnp.ndarray
             ) -> Tuple[trainer.TrainState, AuxState, jnp.ndarray]:
        diff = {"params": state.params}
        if ptx is not None:
            diff["deltas"] = aux.pose.deltas
        if etx is not None:
            diff["mats"] = aux.exposure.mats
        loss, g = jax.value_and_grad(loss_fn)(diff, view_idx, camera,
                                              target, obs, mask)
        params, opt_state = trainer.apply_param_updates(
            tx, state.params, g["params"], state.opt_state)
        pose = aux.pose
        if ptx is not None:
            dupd, popt = ptx.update(g["deltas"], pose.opt_state,
                                    pose.deltas)
            pose = pose_opt.PoseState(
                deltas=optax.apply_updates(pose.deltas, dupd),
                opt_state=popt)
        expo = aux.exposure
        if etx is not None:
            mupd, eopt = etx.update(g["mats"], expo.opt_state, expo.mats)
            expo = appearance.ExposureState(
                mats=optax.apply_updates(expo.mats, mupd), opt_state=eopt)
        return (trainer.TrainState(params=params, opt_state=opt_state,
                                   step=state.step + 1),
                AuxState(pose=pose, exposure=expo), loss)

    return step


def dummy_depth_obs() -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1-row placeholders for the obs/mask operands when depth is off."""
    return (jnp.zeros((1, 3), jnp.float32), jnp.zeros((1,), bool))
