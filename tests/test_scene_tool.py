"""Scene utility CLI tests (app/scene_tool.py)."""

import json

import jax
import numpy as np

from gaussian_splat_ipu_tpu.app import scene_tool
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.train import checkpoint

import pytest


def _model(n=64, sh_degree=2, seed=0):
    return GaussianModel.random(jax.random.PRNGKey(seed), n,
                                sh_degree=sh_degree)


def test_process_prune_opacity():
    m = _model()
    opac = 1.0 / (1.0 + np.exp(-np.asarray(m.opacities)))
    thresh = float(np.median(opac))
    out, report = scene_tool.process(m, prune_opacity=thresh)
    expect = int((opac >= thresh).sum())
    assert out.num_gaussians == expect
    assert report["pruned"] == 64 - expect
    # Survivors keep their fields (first survivor matches).
    idx = int(np.flatnonzero(opac >= thresh)[0])
    np.testing.assert_allclose(np.asarray(out.means[0]),
                               np.asarray(m.means[idx]))


def test_process_prune_scale_and_sh_cap():
    m = _model()
    big = np.array(np.asarray(m.log_scales))   # writable copy
    big[3] = 10.0                       # one giant floater
    import jax.numpy as jnp
    m = GaussianModel(m.means, jnp.asarray(big), m.quats, m.opacities,
                      m.sh)
    out, report = scene_tool.process(m, prune_scale=1.0, max_sh=0)
    assert out.num_gaussians == 63
    assert report["pruned"] == 1
    assert out.sh_degree == 0 and out.sh.shape[1] == 1


def test_cli_roundtrip(tmp_path, capsys):
    src = str(tmp_path / "in.ply")
    dst = str(tmp_path / "out.ply")
    splat = str(tmp_path / "out.splat")
    checkpoint.export_ply(src, _model())
    rc = scene_tool.main([
        "--input", src, "--output", dst, "--output-splat", splat,
        "--max-sh", "1", "--stats", "--log-level", "off",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["gaussians"] == 64 and stats["sh_degree"] == 1

    back = checkpoint.import_ply(dst)
    assert back.num_gaussians == 64 and back.sh_degree == 1
    from gaussian_splat_ipu_tpu.io import splat as splat_io
    assert splat_io.count_records(splat) == 64


def test_center_flip():
    # center_and_flip centres the bounding box (not the centroid) and
    # negates z (reference preprocessing, splat.cpp:92-100).
    m = _model()
    out, _ = scene_tool.process(m, center_flip=True)
    pts = np.asarray(out.means)
    np.testing.assert_allclose((pts.min(0) + pts.max(0)) * 0.5, 0.0,
                               atol=1e-5)
    src = np.asarray(m.means)
    centred = src - (src.min(0) + src.max(0)) * 0.5
    np.testing.assert_allclose(pts[:, 2], -centred[:, 2], atol=1e-6)


def test_cli_does_not_recentre_input(tmp_path):
    """The file tool must load raw: outputs stay in the input's frame."""
    import jax.numpy as jnp

    m = _model()
    shifted = GaussianModel(m.means + jnp.asarray([10.0, 0.0, 5.0]),
                            m.log_scales, m.quats, m.opacities, m.sh)
    src = str(tmp_path / "in.ply")
    dst = str(tmp_path / "out.ply")
    checkpoint.export_ply(src, shifted)
    rc = scene_tool.main(["--input", src, "--output", dst,
                          "--log-level", "off"])
    assert rc == 0
    back = checkpoint.import_ply(dst)
    np.testing.assert_allclose(np.asarray(back.means),
                               np.asarray(shifted.means), atol=1e-5)


@pytest.mark.slow
def test_center_flip_preserves_appearance():
    """Mirroring the scene through z (means + quats + SH) and viewing it
    with a correspondingly mirrored camera reproduces the original image
    exactly — this fails if quats or SH bands are left untransformed."""
    import jax.numpy as jnp

    from gaussian_splat_ipu_tpu.models.camera import Camera
    from gaussian_splat_ipu_tpu.render.pipeline import render_image
    from gaussian_splat_ipu_tpu.utils.config import RasterConfig

    m = _model(n=48, sh_degree=2, seed=3)
    cam = Camera.look_at([0.4, 0.3, 3.0], [0.0, 0.0, 0.0],
                         [0.0, 1.0, 0.0], np.radians(50.0), 1.0)
    cfg = RasterConfig(image_width=32, image_height=32,
                       pair_capacity=1 << 11, max_chunks_per_tile=4,
                       sigmoid_opacity=True)
    ref = np.asarray(render_image(m, cam, cfg, use_pallas=False))

    out, _ = scene_tool.process(m, center_flip=True)
    # World map applied by the tool: x' = F (x - c) with F = diag(1,1,-1)
    # and c the bbox midpoint. View the mirrored scene through
    # V' = V @ [[F, c], [0, 1]] (the inverse map composed with the view).
    src = np.asarray(m.means)
    c = (src.min(0) + src.max(0)) * 0.5
    minv = np.eye(4, dtype=np.float32)
    minv[:3, :3] = np.diag([1.0, 1.0, -1.0])
    minv[:3, 3] = c
    cam2 = Camera(view=jnp.asarray(np.asarray(cam.view) @ minv),
                  proj=cam.proj)
    got = np.asarray(render_image(out, cam2, cfg, use_pallas=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_stats_empty_after_prune(tmp_path, capsys):
    import jax.numpy as jnp

    m = _model()
    dead = GaussianModel(m.means, m.log_scales, m.quats,
                         jnp.full((64,), -20.0), m.sh)  # sigmoid ~ 0
    src = str(tmp_path / "in.ply")
    checkpoint.export_ply(src, dead)
    rc = scene_tool.main(["--input", src, "--prune-opacity", "0.5",
                          "--stats", "--log-level", "off"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["gaussians"] == 0
