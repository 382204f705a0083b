"""SH capacity resize + progressive-activation schedule tests
(models/gaussians.py::with_sh_degree, RasterConfig.active_sh_degree,
app/train.py --sh-degree/--sh-step-every)."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.render import pipeline
from gaussian_splat_ipu_tpu.utils.config import RasterConfig

import pytest

# Heavy mesh/CLI integration tests: the fast tier is `pytest -m 'not slow'`
# (VERDICT r3 #7).
pytestmark = pytest.mark.slow


def _model_and_camera(n=48, degree=2):
    model = GaussianModel.random(jax.random.PRNGKey(0), n,
                                 sh_degree=degree, extent=0.8)
    cam = Camera.look_at([0.0, 0.0, 3.0], [0.0, 0.0, 0.0],
                         [0.0, 1.0, 0.0], np.radians(50.0), 4 / 3)
    return model, cam


def test_with_sh_degree_expand_zero_init_and_truncate():
    model, _ = _model_and_camera(degree=1)
    up = model.with_sh_degree(3)
    assert up.sh.shape == (48, 16, 3)
    np.testing.assert_array_equal(np.asarray(up.sh[:, :4]),
                                  np.asarray(model.sh))
    assert float(jnp.abs(up.sh[:, 4:]).max()) == 0.0
    down = up.with_sh_degree(1)
    np.testing.assert_array_equal(np.asarray(down.sh),
                                  np.asarray(model.sh))
    assert model.with_sh_degree(1) is model  # no-op fast path


def test_active_sh_degree_matches_truncated_model():
    model, cam = _model_and_camera(degree=2)
    cfg = RasterConfig(image_width=64, image_height=48,
                       pair_capacity=1 << 12)
    for d in (0, 1, 2):
        capped = pipeline.render_image(
            model, cam, dataclasses.replace(cfg, active_sh_degree=d),
            use_pallas=False)
        trunc = pipeline.render_image(model.with_sh_degree(d), cam, cfg,
                                      use_pallas=False)
        np.testing.assert_allclose(np.asarray(capped), np.asarray(trunc),
                                   rtol=1e-6, atol=1e-6)
    # -1 (default) = full degree
    full = pipeline.render_image(model, cam, cfg, use_pallas=False)
    capped = pipeline.render_image(
        model, cam, dataclasses.replace(cfg, active_sh_degree=5),
        use_pallas=False)
    np.testing.assert_allclose(np.asarray(capped), np.asarray(full),
                               rtol=1e-6, atol=1e-6)


def test_inactive_bands_get_zero_gradient():
    model, cam = _model_and_camera(degree=2)
    cfg = RasterConfig(image_width=32, image_height=32,
                       pair_capacity=1 << 11, active_sh_degree=1)

    def loss(m):
        return jnp.sum(pipeline.render_image(m, cam, cfg,
                                             use_pallas=False))

    g = jax.grad(loss)(model)
    # Bands 0..3 (degree <= 1) learn; bands 4..8 (degree 2) are inactive.
    assert float(jnp.abs(g.sh[:, :4]).max()) > 0.0
    assert float(jnp.abs(g.sh[:, 4:]).max()) == 0.0


def test_train_cli_progressive_sh(tmp_path, capsys):
    from gaussian_splat_ipu_tpu.app import train as train_app
    from gaussian_splat_ipu_tpu.train import checkpoint
    from gaussian_splat_ipu_tpu.io import ply as ply_io

    src = GaussianModel.random(jax.random.PRNGKey(1), 40, extent=0.6)
    scene_ply = str(tmp_path / "scene.ply")
    out_ply = str(tmp_path / "trained.ply")
    checkpoint.export_ply(scene_ply, src)

    rc = train_app.main([
        "--input", scene_ply, "--width", "48", "--height", "32",
        "--steps", "6", "--views", "2", "--mode", "self",
        "--ssim-weight", "0.0", "--pair-capacity", str(1 << 11),
        "--sh-degree", "1", "--sh-step-every", "2",
        "--export-ply", out_ply, "--log-level", "off",
    ])
    assert rc == 0
    assert "final_loss=" in capsys.readouterr().out
    vertex = ply_io.read_ply(out_ply)["vertex"]
    # degree 1 = 3 rest bands x 3 channels
    assert "f_rest_8" in vertex.data.dtype.names
    assert os.path.exists(out_ply)
