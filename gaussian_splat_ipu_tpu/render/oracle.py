"""Reference renderer: dense, pixel-exact, pure jnp.

The test oracle for every kernel in the framework — the role the reference's
CPU rasteriser could not fill (it draws 1-px points, not EWA gaussians;
src/splat/cpu_rasteriser.cpp:20-63). This implements the exact sequential
front-to-back semantics of the device blend loop
(codelets/splat/codelets.cpp:358-421): global depth sort, then per pixel
walk gaussians near-to-far with

    power = -0.5*(A dx^2 + C dy^2) - B dx dy        (skip if power > 0)
    alpha = min(alpha_clamp, opacity * exp(power))   (skip if < alpha_min)
    break when T*(1-alpha) < transmittance_eps       (before blending)
    color += rgb * alpha * T;  T *= (1-alpha)

O(N * pixels): use small scenes. Differentiable (a lax.scan), so it also
provides oracle gradients for gradcheck tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.render.projection import (ProjectedSplats,
                                                      project_gaussians)
from gaussian_splat_ipu_tpu.utils.config import RasterConfig


def composite_dense(splats: ProjectedSplats, cfg: RasterConfig,
                    width: int = None, height: int = None) -> jnp.ndarray:
    """Sequentially composite depth-sorted splats over every pixel.

    Returns (H, W, 4) image: RGB premultiplied-composited over the
    configured background, alpha channel = 1 - final transmittance.
    """
    width = cfg.image_width if width is None else width
    height = cfg.image_height if height is None else height

    order = jnp.argsort(splats.depth)
    xy = splats.xy[order]
    conic = splats.conic[order]
    color = splats.color[order]
    opacity = jnp.where(splats.radius[order, 0] > 0.0,
                        splats.opacity[order], 0.0)

    px = jnp.arange(width, dtype=jnp.float32)[None, :]   # (1, W)
    py = jnp.arange(height, dtype=jnp.float32)[:, None]  # (H, 1)

    def step(carry, g):
        t, rgb, stopped = carry
        gxy, gconic, gcolor, gop = g
        dx = gxy[0] - px  # (H, W) via broadcast
        dy = gxy[1] - py
        power = (-0.5 * (gconic[0] * dx * dx + gconic[2] * dy * dy)
                 - gconic[1] * dx * dy)
        alpha = jnp.minimum(cfg.alpha_clamp, gop * jnp.exp(power))
        skip = (power > 0.0) | (alpha < cfg.alpha_min)
        alpha = jnp.where(skip, 0.0, alpha)
        test_t = t * (1.0 - alpha)
        # Reference break semantics (codelets.cpp:405-408): once the would-be
        # transmittance dips below eps, that gaussian and all later ones are
        # dropped for this pixel.
        stopped = stopped | (test_t < cfg.transmittance_eps)
        alpha = jnp.where(stopped, 0.0, alpha)
        rgb = rgb + gcolor[None, None, :] * (alpha * t)[..., None]
        t = t * (1.0 - alpha)
        return (t, rgb, stopped), None

    t0 = jnp.ones((height, width), jnp.float32)
    rgb0 = jnp.zeros((height, width, 3), jnp.float32)
    stopped0 = jnp.zeros((height, width), jnp.bool_)
    (t, rgb, _), _ = jax.lax.scan(step, (t0, rgb0, stopped0),
                                  (xy, conic, color, opacity))

    bg = jnp.asarray(cfg.background, jnp.float32)
    rgb = rgb + t[..., None] * bg[None, None, :]
    return jnp.concatenate([rgb, (1.0 - t)[..., None]], -1)


def render_oracle(model: GaussianModel, camera: Camera,
                  cfg: RasterConfig) -> jnp.ndarray:
    """Full oracle render: project + dense composite. (H, W, 4) f32."""
    splats = project_gaussians(model, camera, cfg)
    return composite_dense(splats, cfg)
