"""Child for the 2-process training-CLI test (test_multihost.py).

Runs the REAL `gaussian_splat_ipu_tpu.app.train` CLI under
jax.distributed (4 virtual CPU devices per process, gloo collectives):
scene loading is sharded per process, the train step is the sharded SPMD
program, and the primary process writes the exported PLY.
Usage: python _train_cli_child.py <pid> <nproc> <coordinator> <ply> <out>.
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

pid, nproc, coord, ply_path, out_ply = (int(sys.argv[1]), int(sys.argv[2]),
                                        sys.argv[3], sys.argv[4],
                                        sys.argv[5])

os.environ["GSPLAT_COORDINATOR"] = coord
os.environ["GSPLAT_NUM_PROCESSES"] = str(nproc)
os.environ["GSPLAT_PROCESS_ID"] = str(pid)

from gaussian_splat_ipu_tpu.app import train as train_app  # noqa: E402

try:
    rc = train_app.main([
        "--input", ply_path, "--width", "64", "--height", "64",
        "--steps", "4", "--views", "2", "--mode", "self",
        "--ssim-weight", "0.0", "--pair-capacity", str(1 << 12),
        "--distributed", "--export-ply", out_ply, "--log-level", "off",
    ])
except Exception as e:  # pragma: no cover - environment dependent
    print(f"SKIP cli failed to init: {e}", flush=True)
    sys.exit(0)
assert rc == 0
jax.distributed.shutdown()
