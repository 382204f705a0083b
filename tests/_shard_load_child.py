"""Child for the 2-process sharded scene-loading test (test_multihost.py).

Each process parses ONLY its half of the PLY (seek-based vertex_range),
exchanges raw bboxes for consistent centring, assembles one global sharded
model, renders it with the shard_map renderer, and prints the replicated
image mean plus the bytes it actually read from the scene file.
Usage: python _shard_load_child.py <pid> <nproc> <coordinator> <ply>.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

pid, nproc, coord, ply_path = (int(sys.argv[1]), int(sys.argv[2]),
                               sys.argv[3], sys.argv[4])

from gaussian_splat_ipu_tpu.parallel import multihost  # noqa: E402

try:
    ok = multihost.initialize(coord, nproc, pid)
except Exception as e:  # pragma: no cover - environment dependent
    print(f"SKIP init failed: {e}", flush=True)
    sys.exit(0)
assert ok

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if len(jax.devices()) != 8:
    print(f"SKIP expected 8 global devices, got {len(jax.devices())}",
          flush=True)
    sys.exit(0)

from jax.sharding import Mesh  # noqa: E402
from gaussian_splat_ipu_tpu.io import ply as ply_io  # noqa: E402
from gaussian_splat_ipu_tpu.models.camera import Camera  # noqa: E402
from gaussian_splat_ipu_tpu.parallel import distributed  # noqa: E402
from gaussian_splat_ipu_tpu.utils.config import RasterConfig  # noqa: E402

# Count every byte read from the scene file: the whole point of sharded
# loading is that each process touches only its slice.
bytes_read = [0]
_real_open = open


class _Spy:
    def __init__(self, f):
        self._f = f

    def read(self, *a):
        buf = self._f.read(*a)
        bytes_read[0] += len(buf)
        return buf

    def __getattr__(self, name):
        return getattr(self._f, name)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return self._f.__exit__(*a)


ply_io.open = lambda p, mode="r", **kw: _Spy(_real_open(p, mode, **kw))

CFG = RasterConfig(image_width=64, image_height=256,
                   pair_capacity=1 << 12, max_chunks_per_tile=4)
mesh = Mesh(np.asarray(jax.devices()), ("shard",))
scene = multihost.load_scene_sharded(ply_path, mesh)
cam = Camera.orbit(scene.bb_min, scene.bb_max,
                   fov_radians=np.radians(45.0), aspect=0.25)


@jax.jit
def mean_of_render(m):
    img = distributed.render_image_sharded(m, cam, CFG, mesh,
                                           use_pallas=False,
                                           pair_capacity=1 << 12)
    return jnp.mean(img)


val = float(mean_of_render(scene.model))
print(f"MEAN {val:.9f} BYTES {bytes_read[0]} N {scene.model.num_gaussians}",
      flush=True)
jax.distributed.shutdown()
