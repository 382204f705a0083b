"""Web-viewer .splat format (io/splat.py): write/read round trip within
the format's u8 quantisation, loader dispatch, sharded row ranges, and
train-CLI export."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussian_splat_ipu_tpu.io import splat as splat_io
from gaussian_splat_ipu_tpu.io.scene import load_scene
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel

import pytest


def _model(n=64, seed=0):
    m = GaussianModel.random(jax.random.PRNGKey(seed), n, extent=0.7)
    # keep opacities in the representable u8 band (|logit| < ~6)
    return GaussianModel(m.means, m.log_scales, m.quats,
                         jnp.clip(m.opacities, -4.0, 4.0), m.sh)


def test_round_trip_within_quantisation(tmp_path):
    m = _model()
    path = str(tmp_path / "scene.splat")
    splat_io.write_splat(path, m, sort_by_importance=False)
    assert splat_io.count_records(path) == 64

    f = splat_io.read_splat(path)
    np.testing.assert_allclose(f["means"], np.asarray(m.means),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(f["log_scales"],
                               np.asarray(m.log_scales), atol=1e-5)
    # u8-quantised channels: half-step tolerances.
    q = np.asarray(m.quats)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    np.testing.assert_allclose(f["quats"], q, atol=1.0 / 128.0)
    alpha = 1.0 / (1.0 + np.exp(-np.asarray(m.opacities)))
    alpha_rt = 1.0 / (1.0 + np.exp(-f["opacity"]))
    np.testing.assert_allclose(alpha_rt, alpha, atol=1.0 / 255.0)
    from gaussian_splat_ipu_tpu.ops.sh import SH_C0
    rgb = np.clip(SH_C0 * np.asarray(m.sh)[:, 0] + 0.5, 0.0, 1.0)
    rgb_rt = SH_C0 * f["f_dc"] + 0.5
    np.testing.assert_allclose(rgb_rt, rgb, atol=1.0 / 255.0)


def test_importance_sort_puts_big_splats_first(tmp_path):
    m = _model(seed=2)
    path = str(tmp_path / "scene.splat")
    splat_io.write_splat(path, m)  # default: sorted
    f = splat_io.read_splat(path)
    alpha = 1.0 / (1.0 + np.exp(-f["opacity"]))
    imp = alpha * np.exp(f["log_scales"]).prod(-1)
    # quantisation can perturb near-ties; require a globally decreasing
    # trend (every prefix mean >= suffix mean at the midpoint).
    assert imp[:32].mean() > imp[32:].mean()


def test_load_scene_dispatch_and_row_range(tmp_path):
    m = _model(seed=3)
    path = str(tmp_path / "scene.splat")
    splat_io.write_splat(path, m, sort_by_importance=False)
    scene = load_scene(path, center=False, flip_z=False)
    assert scene.model.num_gaussians == 64
    np.testing.assert_allclose(np.asarray(scene.model.means),
                               np.asarray(m.means), atol=1e-6)
    # Sharded read: rows [16, 48) only, via one seek.
    f = splat_io.read_splat(path, row_range=(16, 48))
    np.testing.assert_allclose(f["means"],
                               np.asarray(m.means)[16:48], atol=1e-6)
    # Degenerate / clamped ranges.
    assert splat_io.read_splat(path, row_range=(64, 64))["means"].shape \
        == (0, 3)
    assert splat_io.read_splat(path, row_range=(60, 999))["means"].shape \
        == (4, 3)


@pytest.mark.slow
def test_train_cli_export_splat(tmp_path, capsys):
    from gaussian_splat_ipu_tpu.app import train as train_app
    from gaussian_splat_ipu_tpu.train import checkpoint

    src = _model(seed=4, n=40)
    scene_ply = str(tmp_path / "scene.ply")
    out = str(tmp_path / "trained.splat")
    checkpoint.export_ply(scene_ply, src)
    rc = train_app.main([
        "--input", scene_ply, "--width", "48", "--height", "32",
        "--steps", "2", "--views", "2", "--mode", "self",
        "--ssim-weight", "0.0", "--pair-capacity", str(1 << 11),
        "--export-splat", out, "--log-level", "off",
    ])
    assert rc == 0
    assert splat_io.count_records(out) == 40
    # and it loads back as a scene
    scene = load_scene(out)
    assert scene.model.num_gaussians == 40
