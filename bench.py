"""Headline benchmark: forward render fps at 1280x720 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md): its only implied target is
interactive rendering of its demo scenes on one IPU. We therefore benchmark
the reference's own headline workload — point_cloud_12.ply (37,941
gaussians; the largest checked-in scene) at the reference's fixed 1280x720
framebuffer (tile_config.hpp:5-6) — and report vs_baseline against a 30 fps
interactive-rate bar. Falls back to an equally-sized synthetic scene when
the reference data mount is absent.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_PLY = "/root/reference/data/point_cloud_12.ply"
BASELINE_FPS = 30.0
WIDTH, HEIGHT = 1280, 720
WARMUP, FRAMES = 3, 30


def load_model_and_bounds():
    import jax
    from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel

    try:
        from gaussian_splat_ipu_tpu.io.scene import load_scene
        scene = load_scene(REFERENCE_PLY)
        return scene.model, scene.bb_min, scene.bb_max
    except (OSError, ValueError):
        model = GaussianModel.random(jax.random.PRNGKey(0), 37_941,
                                     extent=1.0)
        bb = np.array([1.0, 1.0, 1.0], np.float32)
        return model, -bb, bb


def main():
    import jax

    from gaussian_splat_ipu_tpu.models.camera import Camera
    from gaussian_splat_ipu_tpu.render.pipeline import render
    from gaussian_splat_ipu_tpu.utils.config import RasterConfig

    model, bb_min, bb_max = load_model_and_bounds()
    n = model.num_gaussians
    cfg = RasterConfig(image_width=WIDTH, image_height=HEIGHT)
    fov = float(np.radians(40.0))
    aspect = WIDTH / HEIGHT

    jit_render = jax.jit(render, static_argnums=(2, 3))

    def frame(angle):
        cam = Camera.orbit(bb_min, bb_max, fov, aspect, rot_y_deg=angle)
        return jit_render(model, cam, cfg, True)

    for i in range(WARMUP):
        out = frame(i * 5.0)
    jax.block_until_ready(out.image)

    t0 = time.perf_counter()
    for i in range(FRAMES):
        out = frame(i * 360.0 / FRAMES)
        jax.block_until_ready(out.image)
    dt = time.perf_counter() - t0

    fps = FRAMES / dt
    print(json.dumps({
        "metric": f"forward_fps_1280x720_{n}g",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
