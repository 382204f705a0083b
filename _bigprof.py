"""Config-5 single-chip: 1M synthetic gaussians at 1280x720."""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gsplat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.render.pipeline import render
from gaussian_splat_ipu_tpu.utils.config import RasterConfig
from gaussian_splat_ipu_tpu.utils.profiling import two_point_time

N = 1_000_000
model = GaussianModel.random(jax.random.PRNGKey(0), N, extent=1.0)
bb = np.array([1.0, 1.0, 1.0], np.float32)
fov = float(np.radians(40.0))
cfg = RasterConfig(image_width=1280, image_height=720,
                   pair_capacity=1 << 23)

probe = jax.jit(lambda m, a: (lambda o: o.num_pairs + o.overflow)(
    render(m, Camera.orbit(-bb, bb, fov, 16 / 9, rot_y_deg=a), cfg, True)))
demand = max(int(probe(model, jnp.float32(a)))
             for a in np.linspace(0.0, 360.0, 8))
print("max pair demand:", demand, flush=True)

import dataclasses
cap = 1 << 22
cfg = dataclasses.replace(cfg, pair_capacity=cap)
print("capacity:", cap, flush=True)


def frames(m, angles):
    def body(acc, a):
        cam = Camera.orbit(-bb, bb, fov, 16 / 9, rot_y_deg=a)
        out = render(m, cam, cfg, True)
        return acc + out.image.mean(), None
    acc, _ = jax.lax.scan(body, jnp.float32(0.0), angles)
    return acc


jf = jax.jit(frames)


def run_k(k):
    a = jnp.linspace(0.0, 360.0, k, dtype=jnp.float32)
    float(jf(model, a))


dt = two_point_time(run_k, 1, 9)
print(f"1M gaussians @720p: {dt*1e3:.1f} ms/frame ({1.0/dt:.1f} fps, "
      f"{N/dt/1e6:.0f} Msplats/s)", flush=True)
