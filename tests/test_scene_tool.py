"""Scene utility CLI tests (app/scene_tool.py)."""

import json

import jax
import numpy as np

from gaussian_splat_ipu_tpu.app import scene_tool
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.train import checkpoint


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
