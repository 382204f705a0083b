"""Scene IO tests: PLY parse/write roundtrip, xyz, reference-data load."""

import os

import numpy as np
import pytest

from gaussian_splat_ipu_tpu.io import ply as ply_io
from gaussian_splat_ipu_tpu.io.scene import load_scene

REF_PLY = "/root/reference/data/point_cloud_12.ply"


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    cols = {
        "x": rng.normal(size=100), "y": rng.normal(size=100),
        "z": rng.normal(size=100),
        "f_dc_0": rng.normal(size=100), "f_dc_1": rng.normal(size=100),
        "f_dc_2": rng.normal(size=100),
        "opacity": rng.normal(size=100),
        "scale_0": rng.normal(size=100), "scale_1": rng.normal(size=100),
        "scale_2": rng.normal(size=100),
        "rot_0": rng.normal(size=100), "rot_1": rng.normal(size=100),
        "rot_2": rng.normal(size=100), "rot_3": rng.normal(size=100),
    }
    path = str(tmp_path / "t.ply")
    ply_io.write_ply(path, cols)
    back = ply_io.read_ply(path)
    assert back["vertex"].count == 100
    for name, vals in cols.items():
        np.testing.assert_allclose(back["vertex"].column(name),
                                   vals.astype(np.float32), rtol=1e-6)
    fields = ply_io.gaussian_fields_from_ply(back)
    assert fields["means"].shape == (100, 3)
    assert fields["quats"].shape == (100, 4)


def test_ascii_ply(tmp_path):
    path = tmp_path / "a.ply"
    path.write_text(
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n1 2 3\n4 5 6\n")
    data = ply_io.read_ply(str(path))
    np.testing.assert_allclose(data["vertex"].column("x"), [1, 4])
    np.testing.assert_allclose(data["vertex"].column("z"), [3, 6])


def test_xyz(tmp_path):
    path = tmp_path / "p.xyz"
    path.write_text("0 0 0\n1.5 2.5 -3\n")
    pts = ply_io.read_xyz(str(path))
    assert pts.shape == (2, 3)
    np.testing.assert_allclose(pts[1], [1.5, 2.5, -3])


def test_xyz_scene_gets_default_gaussians(tmp_path):
    path = tmp_path / "p.xyz"
    path.write_text("0 0 0\n1 1 1\n2 2 2\n")
    scene = load_scene(str(path))
    assert scene.model.num_gaussians == 3
    assert scene.model.quats.shape == (3, 4)


@pytest.mark.skipif(not os.path.exists(REF_PLY),
                    reason="reference data not mounted")
def test_load_reference_scene():
    scene = load_scene(REF_PLY)
    # Header says 37941 vertices.
    assert scene.num_gaussians == 37941
    m = scene.model
    assert np.isfinite(np.asarray(m.means)).all()
    assert np.isfinite(np.asarray(m.quats)).all()
    # Centred: centroid of bounds ~ 0 per preprocessing
    # (src/main/splat.cpp:92-100).
    mid = (np.asarray(m.means).min(0) + np.asarray(m.means).max(0)) * 0.5
    np.testing.assert_allclose(mid, 0.0, atol=1e-2)
