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


def test_ascii_ply_with_face_list_element(tmp_path):
    # A mesh-style PLY whose face element carries a list property must
    # still load (reference happly generality); vertices parse unchanged.
    path = tmp_path / "m.ply"
    path.write_text(
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 2\nproperty list uchar int vertex_indices\n"
        "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n3 2 1 0\n")
    data = ply_io.read_ply(str(path))
    np.testing.assert_allclose(data["vertex"].column("x"), [0, 1, 0])
    faces = data["face"].lists["vertex_indices"]
    assert len(faces) == 2
    np.testing.assert_array_equal(faces[0], [0, 1, 2])
    np.testing.assert_array_equal(faces[1], [2, 1, 0])


def test_binary_ply_with_face_list_element(tmp_path):
    import struct
    path = tmp_path / "m.ply"
    header = (
        "ply\nformat binary_little_endian 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "property float quality\nend_header\n")
    body = struct.pack("<3f", 1.0, 2.0, 3.0)
    body += struct.pack("<3f", 4.0, 5.0, 6.0)
    body += struct.pack("<B3if", 3, 0, 1, 0, 0.5)  # mixed list + scalar row
    path.write_bytes(header.encode() + body)
    data = ply_io.read_ply(str(path))
    np.testing.assert_allclose(data["vertex"].column("y"), [2, 5])
    np.testing.assert_array_equal(
        data["face"].lists["vertex_indices"][0], [0, 1, 0])
    np.testing.assert_allclose(data["face"].column("quality"), [0.5])


def test_vertex_range_reads_only_the_slice(tmp_path):
    # Sharded loading (VERDICT r1 #6): the binary reader must SEEK past
    # rows outside [lo, hi), not read them — asserted by counting bytes
    # through a spy file object.
    n = 1000
    cols = {k: np.arange(n, dtype=np.float32) * (i + 1)
            for i, k in enumerate(["x", "y", "z", "opacity"])}
    path = tmp_path / "big.ply"
    ply_io.write_ply(str(path), cols)
    full_size = path.stat().st_size

    bytes_read = [0]
    real_open = open

    class SpyFile:
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

    def spy_open(p, mode="r", **kw):
        return SpyFile(real_open(p, mode, **kw))

    ply_io.open = spy_open  # module-global shadow of builtins.open
    try:
        data = ply_io.read_ply(str(path), vertex_range=(250, 500))
    finally:
        del ply_io.open
    # 250 rows of 16 bytes + header << full file (16250 bytes).
    assert bytes_read[0] < 250 * 16 + 2048
    assert bytes_read[0] < full_size // 2
    np.testing.assert_allclose(data["vertex"].column("x"),
                               np.arange(250, 500, dtype=np.float32))
    np.testing.assert_allclose(data["vertex"].column("opacity"),
                               np.arange(250, 500, dtype=np.float32) * 4)

    # A range load must equal the corresponding slice of a full load.
    full = ply_io.read_ply(str(path))
    np.testing.assert_array_equal(
        np.asarray(full["vertex"].data[250:500]),
        np.asarray(data["vertex"].data))


def test_vertex_range_ascii(tmp_path):
    path = tmp_path / "a.ply"
    path.write_text(
        "ply\nformat ascii 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n0 0 0\n1 1 1\n2 2 2\n3 3 3\n")
    data = ply_io.read_ply(str(path), vertex_range=(1, 3))
    np.testing.assert_allclose(data["vertex"].column("x"), [1, 2])
    assert data["vertex"].count == 2


def test_count_vertices(tmp_path):
    cols = {"x": np.zeros(7, np.float32), "y": np.zeros(7, np.float32),
            "z": np.zeros(7, np.float32)}
    path = tmp_path / "c.ply"
    ply_io.write_ply(str(path), cols)
    assert ply_io.count_vertices(str(path)) == 7


def test_load_scene_row_range_matches_slice(tmp_path):
    from gaussian_splat_ipu_tpu.io.scene import load_scene

    rng = np.random.default_rng(7)
    n = 64
    cols = {"x": rng.normal(size=n).astype(np.float32),
            "y": rng.normal(size=n).astype(np.float32),
            "z": rng.normal(size=n).astype(np.float32)}
    path = tmp_path / "s.ply"
    ply_io.write_ply(str(path), cols)
    whole = load_scene(str(path))
    c = (np.stack([cols["x"], cols["y"], cols["z"]], -1).min(0)
         + np.stack([cols["x"], cols["y"], cols["z"]], -1).max(0)) * 0.5
    part = load_scene(str(path), row_range=(16, 48), center_point=c)
    np.testing.assert_allclose(np.asarray(part.model.means),
                               np.asarray(whole.model.means)[16:48],
                               atol=1e-6)


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
