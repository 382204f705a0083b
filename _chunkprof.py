"""A/B: raster chunk_size 128 vs 256 at 720p on the real TPU."""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gsplat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussian_splat_ipu_tpu.io.scene import load_scene
from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.render.pipeline import render
from gaussian_splat_ipu_tpu.utils.config import RasterConfig
from gaussian_splat_ipu_tpu.utils.profiling import two_point_time

scene = load_scene("/root/reference/data/point_cloud_12.ply")
fov = float(np.radians(40.0))


def bench_cfg(cfg, label):
    def frames(m, angles):
        def body(acc, a):
            cam = Camera.orbit(scene.bb_min, scene.bb_max, fov, 16 / 9,
                               rot_y_deg=a)
            return acc + render(m, cam, cfg, True).image.mean(), None
        return jax.lax.scan(body, jnp.float32(0.0), angles)[0]

    jf = jax.jit(frames)

    def run_k(k):
        float(jf(scene.model, jnp.linspace(0.0, 360.0, k,
                                           dtype=jnp.float32)))

    dt = two_point_time(run_k, 1, 31)
    print(f"{label}: {dt*1e3:.2f} ms/frame ({1.0/dt:.1f} fps)", flush=True)


base = RasterConfig(image_width=1280, image_height=720,
                    pair_capacity=1 << 17)
for rep in range(2):
    bench_cfg(base, f"chunk128 rep{rep}")
    bench_cfg(dataclasses.replace(base, chunk_size=256),
              f"chunk256 rep{rep}")
