"""On-hardware Pallas parity smoke (VERDICT r1 next-step #7).

The rest of the suite runs on a CPU-forced virtual mesh (conftest.py), so
compiled-TPU behaviour was previously asserted only in BASELINE.md prose.
This test spawns a child process WITHOUT the CPU override so the box's
real TPU backend loads, and asserts compiled-Pallas forward/backward match
the jnp spec on device (tests/_tpu_smoke_child.py).

Opt-in via GSPLAT_TPU_TEST=1: the TPU on this box is a single tunneled
chip shared with benchmarking, and two concurrent TPU jobs contend and
corrupt each other's timing — so the default `pytest tests/` run (CPU CI)
skips it. On the bench box run:

    GSPLAT_TPU_TEST=1 python -m pytest tests/test_tpu_smoke.py -v
"""

import os
import subprocess
import sys

import pytest

# Heavy mesh/CLI integration tests: the fast tier is `pytest -m 'not slow'`
# (VERDICT r3 #7).
pytestmark = pytest.mark.slow


@pytest.mark.tpu
@pytest.mark.skipif(os.environ.get("GSPLAT_TPU_TEST", "") != "1",
                    reason="set GSPLAT_TPU_TEST=1 on a box with an idle "
                           "TPU (single shared chip; avoids contending "
                           "with concurrent bench runs)")
def test_compiled_pallas_parity_on_tpu():
    env = dict(os.environ)
    # Drop the harness's virtual-device flag so the child sees the real
    # backend topology.
    env.pop("XLA_FLAGS", None)
    # `python tests/_tpu_smoke_child.py` puts tests/ (not the repo root)
    # on sys.path; make the package importable regardless of install.
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    child = os.path.join(os.path.dirname(__file__), "_tpu_smoke_child.py")
    proc = subprocess.run(
        [sys.executable, child], env=env, capture_output=True, text=True,
        timeout=1200, cwd=os.path.dirname(os.path.dirname(child)))
    if proc.returncode == 42:
        pytest.skip("no TPU on this box")
    assert proc.returncode == 0, (
        f"on-TPU parity failed:\n{proc.stdout}\n{proc.stderr[-3000:]}")
    assert "tpu parity:" in proc.stdout
