"""Sparse-depth supervision from SfM track observations.

COLMAP triangulates a sparse depth measurement everywhere a track is
observed (images.bin 2D points x their points3D); supervising the
rendered depth (render_depth, the alpha-composited mean-depth map) at
those pixels anchors geometry where photometric loss is ambiguous —
the standard depth-regularised-3DGS recipe. No reference counterpart
(forward-only viewer); north-star training extension.

The loss is a masked relative-L1 over the view's observations:

    mean over valid obs of  |D(u, v) - z| / z

gated on rendered alpha > 0.5 at the pixel (no gradient pressure to
hallucinate where nothing renders yet). Observations ride the epoch
scan as a fixed-size (V, K, 3) [u, v, z] tensor + (V, K) mask.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.render.pipeline import render_depth, render_image
from gaussian_splat_ipu_tpu.train import losses, trainer
from gaussian_splat_ipu_tpu.utils.config import RasterConfig


def pack_observations(depth_obs: List[np.ndarray],
                      max_per_view: int = 4096
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-view (K_i, 3) arrays -> ((V, K, 3) f32, (V, K) bool mask).

    K = min(max observed count, max_per_view); oversubscribed views keep
    a deterministic every-Nth subsample (observations are spatially
    interleaved in track order, so striding stays spread out).
    """
    if not depth_obs:
        raise ValueError("no depth observations")
    k = min(max((o.shape[0] for o in depth_obs), default=0), max_per_view)
    k = max(k, 1)
    obs = np.zeros((len(depth_obs), k, 3), np.float32)
    mask = np.zeros((len(depth_obs), k), bool)
    for i, o in enumerate(depth_obs):
        if o.shape[0] > k:
            # Evenly-spaced EXACTLY-k subsample (a ceil-strided slice
            # underfills by up to ~50% when n is just above a multiple
            # of k).
            o = o[np.linspace(0, o.shape[0] - 1, k).round().astype(int)]
        obs[i, :o.shape[0]] = o
        mask[i, :o.shape[0]] = True
    return jnp.asarray(obs), jnp.asarray(mask)


def sparse_depth_loss(params: GaussianModel, camera: Camera,
                      obs: jnp.ndarray, mask: jnp.ndarray,
                      cfg: RasterConfig,
                      use_pallas: bool = True) -> jnp.ndarray:
    """Masked relative-L1 between rendered mean depth and SfM depth.

    obs: (K, 3) [u_px, v_px, z_cam]; mask: (K,) valid flags.
    """
    mean_d, _, alpha = render_depth(params, camera, cfg, use_pallas)
    u = jnp.clip(obs[:, 0].astype(jnp.int32), 0, cfg.image_width - 1)
    v = jnp.clip(obs[:, 1].astype(jnp.int32), 0, cfg.image_height - 1)
    pred = mean_d[v, u]
    a = alpha[v, u]
    z = jnp.maximum(obs[:, 2], 1e-6)
    valid = mask & (a > 0.5)
    err = jnp.abs(pred - z) / z
    return (jnp.sum(jnp.where(valid, err, 0.0))
            / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0))


def make_depth_train_step(raster_cfg: RasterConfig,
                          train_cfg: trainer.TrainConfig,
                          depth_weight: float,
                          use_pallas: bool = True, jit: bool = True):
    """step(state, camera, target, obs, mask) -> (state, loss).

    Photometric loss + depth_weight * sparse depth loss; one extra
    render_depth pass per step (same binning machinery, depth moments in
    the colour channels).
    """
    tx = trainer.make_optimizer(train_cfg)

    def loss_fn(params, camera, target, obs, mask):
        image = render_image(params, camera, raster_cfg, use_pallas)
        loss = losses.render_loss(image, target, train_cfg.ssim_weight)
        return loss + depth_weight * sparse_depth_loss(
            params, camera, obs, mask, raster_cfg, use_pallas)

    def step(state: trainer.TrainState, camera: Camera,
             target: jnp.ndarray, obs: jnp.ndarray, mask: jnp.ndarray):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, camera, target, obs, mask)
        params, opt_state = trainer.apply_param_updates(
            tx, state.params, grads, state.opt_state)
        return trainer.TrainState(params=params, opt_state=opt_state,
                                  step=state.step + 1), loss

    if jit:
        return jax.jit(step, donate_argnums=(0,))
    return step
