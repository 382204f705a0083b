"""COLMAP sparse-model loading + SfM-point initialisation tests
(io/colmap.py, GaussianModel.from_points)."""

import os
import struct

import numpy as np
import jax.numpy as jnp

from gaussian_splat_ipu_tpu.io import colmap
from gaussian_splat_ipu_tpu.models.gaussians import (GaussianModel,
                                                     mean_knn_distance)
from gaussian_splat_ipu_tpu.ops import transforms
from gaussian_splat_ipu_tpu.ops.sh import SH_C0

import pytest


# -- synthetic COLMAP model writers (binary + text) ---------------------------

def _qvec(r):
    """Rotation matrix -> COLMAP (w, x, y, z) quaternion (w >= 0)."""
    w = np.sqrt(max(0.0, 1.0 + r[0, 0] + r[1, 1] + r[2, 2])) / 2.0
    x = (r[2, 1] - r[1, 2]) / (4 * w)
    y = (r[0, 2] - r[2, 0]) / (4 * w)
    z = (r[1, 0] - r[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


def _write_binary_model(d, cams, images, points):
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cam_id, (model_id, w, h, params) in cams.items():
            f.write(struct.pack("<iiQQ", cam_id, model_id, w, h))
            f.write(struct.pack("<" + "d" * len(params), *params))
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for img_id, (name, q, t, cam_id, pts2d) in images.items():
            f.write(struct.pack("<idddddddi", img_id, *q, *t, cam_id))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", len(pts2d)))
            for (x, y, pid) in pts2d:
                f.write(struct.pack("<ddq", x, y, pid))
    with open(os.path.join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for pid, (xyz, rgb, track) in points.items():
            f.write(struct.pack("<qdddBBBd", pid, *xyz, *rgb, 0.5))
            f.write(struct.pack("<Q", len(track)))
            for (im, p2) in track:
                f.write(struct.pack("<ii", im, p2))


def _write_text_model(d, cams, images, points):
    names = {0: "SIMPLE_PINHOLE", 1: "PINHOLE", 2: "SIMPLE_RADIAL"}
    with open(os.path.join(d, "cameras.txt"), "w") as f:
        f.write("# Camera list\n")
        for cam_id, (model_id, w, h, params) in cams.items():
            f.write(f"{cam_id} {names[model_id]} {w} {h} "
                    + " ".join(str(p) for p in params) + "\n")
    with open(os.path.join(d, "images.txt"), "w") as f:
        f.write("# Image list: two lines per image\n")
        for img_id, (name, q, t, cam_id, pts2d) in images.items():
            f.write(f"{img_id} " + " ".join(repr(float(v)) for v in q) + " "
                    + " ".join(repr(float(v)) for v in t)
                    + f" {cam_id} {name}\n")
            f.write(" ".join(f"{float(x)!r} {float(y)!r} {pid}"
                             for (x, y, pid) in pts2d) + "\n")
    with open(os.path.join(d, "points3D.txt"), "w") as f:
        f.write("# 3D points\n")
        for pid, (xyz, rgb, track) in points.items():
            f.write(f"{pid} " + " ".join(repr(float(v)) for v in xyz) + " "
                    + " ".join(str(int(v)) for v in rgb) + " 0.5 "
                    + " ".join(f"{im} {p2}" for (im, p2) in track) + "\n")


def _make_dataset(root, binary=True, w=16, h=12, layout="sparse0"):
    """Two-camera, two-image, three-point capture with PNGs on disk."""
    from PIL import Image

    sub = {"sparse0": os.path.join("sparse", "0"),
           "sparse": "sparse", "flat": "."}[layout]
    sparse = os.path.join(root, sub)
    os.makedirs(sparse, exist_ok=True)
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)

    rng = np.random.default_rng(0)
    for name in ("a.png", "b.png"):
        arr = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(imgdir, name))

    cams = {
        1: (1, w, h, [20.0, 21.0, 9.0, 5.0]),          # PINHOLE
        2: (2, w, h, [19.0, 8.0, 6.0, 0.0]),           # SIMPLE_RADIAL k=0
    }
    # Camera a: identity rotation, pushed back so origin is in front.
    qa, ta = np.array([1.0, 0.0, 0.0, 0.0]), np.array([0.0, 0.0, 4.0])
    # Camera b: 90-degree yaw.
    rb = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]])
    qb, tb = _qvec(rb), np.array([0.1, -0.2, 5.0])
    images = {
        7: ("a.png", qa, ta, 1, [(1.0, 2.0, 11), (3.0, 4.0, -1)]),
        3: ("b.png", qb, tb, 2, []),
    }
    points = {
        11: ((0.0, 0.0, 0.0), (255, 0, 0), [(7, 0)]),
        12: ((1.0, 0.5, -0.5), (0, 128, 0), []),
        13: ((-1.0, 2.0, 3.0), (10, 20, 30), [(7, 1), (3, 0)]),
    }
    (_write_binary_model if binary else _write_text_model)(
        sparse, cams, images, points)
    return root, (qa, ta), (rb, tb)


class TestLoadColmap:
    def test_binary_end_to_end(self, tmp_path):
        root, (qa, ta), (rb, tb) = _make_dataset(str(tmp_path), binary=True)
        fs, xyz, rgb = colmap.load_colmap(root)
        assert len(fs) == 2 and fs.width == 16 and fs.height == 12
        assert xyz.shape == (3, 3) and rgb.shape == (3, 3)
        np.testing.assert_allclose(xyz[0], [0, 0, 0])
        np.testing.assert_allclose(rgb[0], [1.0, 0.0, 0.0])
        np.testing.assert_allclose(rgb[1], [0.0, 128 / 255.0, 0.0])

        # Frames sort by name: a.png (camera 1) first. A world point maps
        # through the loaded Camera exactly as the OpenCV pinhole model.
        cam = fs.cameras[0]
        pt = np.array([[0.3, -0.2, 0.5]], np.float32)
        pc = pt[0] + ta                        # identity rotation
        expected = [20.0 * pc[0] / pc[2] + 9.0,
                    21.0 * pc[1] / pc[2] + 5.0]
        view_h = transforms.transform_points(cam.view, pt)
        clip = transforms.transform_points(cam.proj, view_h)
        uv = np.asarray(transforms.clip_to_screen(clip, 16, 12))[0]
        np.testing.assert_allclose(uv, expected, rtol=1e-4, atol=1e-3)

        # Second frame (b.png, SIMPLE_RADIAL camera 2): fx == fy == 19.
        fx = float(fs.cameras[1].proj[0, 0]) * 16 / 2
        np.testing.assert_allclose(fx, 19.0, rtol=1e-5)

    def test_text_matches_binary(self, tmp_path):
        rb_root, _, _ = _make_dataset(str(tmp_path / "bin"), binary=True)
        rt_root, _, _ = _make_dataset(str(tmp_path / "txt"), binary=False)
        fb, xb, cb = colmap.load_colmap(rb_root)
        ft, xt, ct = colmap.load_colmap(rt_root)
        np.testing.assert_allclose(xb, xt, atol=1e-12)
        np.testing.assert_allclose(cb, ct, atol=1e-12)
        for a, b in zip(fb.cameras, ft.cameras):
            np.testing.assert_allclose(np.asarray(a.view),
                                       np.asarray(b.view), atol=1e-6)
            np.testing.assert_allclose(np.asarray(a.proj),
                                       np.asarray(b.proj), atol=1e-6)

    def test_layouts_and_detection(self, tmp_path):
        for layout in ("sparse0", "sparse", "flat"):
            root, _, _ = _make_dataset(str(tmp_path / layout),
                                       layout=layout)
            assert colmap.is_colmap_dir(root)
            fs, xyz, _ = colmap.load_colmap(root)
            assert len(fs) == 2 and xyz.shape[0] == 3
        # Pointing straight at the sparse dir also works.
        root, _, _ = _make_dataset(str(tmp_path / "direct"))
        fs, _, _ = colmap.load_colmap(os.path.join(root, "sparse", "0"))
        assert len(fs) == 2
        assert not colmap.is_colmap_dir(str(tmp_path))  # no cameras file

    def test_downscale_scales_intrinsics(self, tmp_path):
        root, _, _ = _make_dataset(str(tmp_path), w=16, h=12)
        fs, _, _ = colmap.load_colmap(root, downscale=2)
        assert fs.width == 8 and fs.height == 6
        fx = float(fs.cameras[0].proj[0, 0]) * 8 / 2
        np.testing.assert_allclose(fx, 10.0, rtol=1e-5)  # 20 / 2

    def test_predownscaled_dir_wins(self, tmp_path):
        from PIL import Image

        root, _, _ = _make_dataset(str(tmp_path), w=16, h=12)
        pre = os.path.join(root, "images_2")
        os.makedirs(pre)
        for name in ("a.png", "b.png"):
            Image.fromarray(np.full((6, 8, 3), 200, np.uint8)).save(
                os.path.join(pre, name))
        fs, _, _ = colmap.load_colmap(root, downscale=2)
        assert fs.width == 8 and fs.height == 6
        np.testing.assert_allclose(fs.images[0], 200 / 255.0, atol=1e-6)

    def test_qvec_roundtrip(self):
        rng = np.random.default_rng(3)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        q *= np.sign(q[0])
        r = colmap.qvec_to_rotmat(q)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(_qvec(r), q, atol=1e-9)


class TestFromPoints:
    def test_knn_distance_exact(self):
        # Four collinear points, spacing 1: each point's 2 nearest are at
        # distances {1, 1} (middle) or {1, 2} (ends).
        xyz = jnp.array([[0., 0, 0], [1., 0, 0], [2., 0, 0], [3., 0, 0]])
        d = np.asarray(mean_knn_distance(xyz, k=2, chunk=2))
        np.testing.assert_allclose(d, [1.5, 1.0, 1.0, 1.5], atol=1e-6)

    def test_knn_brute_force_parity(self):
        rng = np.random.default_rng(5)
        xyz = rng.normal(size=(70, 3)).astype(np.float32)
        d = np.asarray(mean_knn_distance(jnp.asarray(xyz), k=3, chunk=32))
        full = np.linalg.norm(xyz[:, None] - xyz[None, :], axis=-1)
        np.fill_diagonal(full, np.inf)
        expected = np.sort(full, axis=1)[:, :3].mean(axis=1)
        np.testing.assert_allclose(d, expected, rtol=1e-4, atol=1e-5)

    def test_init_fields(self):
        rng = np.random.default_rng(7)
        xyz = rng.normal(size=(50, 3)).astype(np.float32)
        rgb = rng.uniform(0, 1, (50, 3)).astype(np.float32)
        m = GaussianModel.from_points(xyz, rgb, sh_degree=2, opacity=0.1)
        assert m.num_gaussians == 50 and m.sh_degree == 2
        np.testing.assert_allclose(np.asarray(m.means), xyz)
        # dc band inverts colour_from_dc: SH_C0 * dc + 0.5 == rgb.
        np.testing.assert_allclose(
            SH_C0 * np.asarray(m.sh[:, 0]) + 0.5, rgb, atol=1e-6)
        assert np.allclose(np.asarray(m.sh[:, 1:]), 0.0)
        sig = 1.0 / (1.0 + np.exp(-np.asarray(m.opacities)))
        np.testing.assert_allclose(sig, 0.1, atol=1e-6)
        # Isotropic scales equal to the mean 3-nn distance.
        d = np.asarray(mean_knn_distance(jnp.asarray(xyz), k=3))
        np.testing.assert_allclose(
            np.exp(np.asarray(m.log_scales)),
            np.tile(np.maximum(d, 1e-7)[:, None], (1, 3)), rtol=1e-5)

    @pytest.mark.slow
    def test_renders(self):
        from gaussian_splat_ipu_tpu.models.camera import Camera
        from gaussian_splat_ipu_tpu.render.pipeline import render_image
        from gaussian_splat_ipu_tpu.utils.config import RasterConfig

        rng = np.random.default_rng(9)
        xyz = rng.uniform(-0.5, 0.5, (32, 3)).astype(np.float32)
        rgb = rng.uniform(0.2, 1.0, (32, 3)).astype(np.float32)
        m = GaussianModel.from_points(xyz, rgb)
        cam = Camera.look_at([0, 0, 3.0], [0, 0, 0], [0, 1, 0],
                             np.radians(50.0), 1.0)
        cfg = RasterConfig(image_width=32, image_height=32,
                           pair_capacity=1 << 10, max_chunks_per_tile=4,
                           sigmoid_opacity=True)
        img = np.asarray(render_image(m, cam, cfg, use_pallas=False))
        assert np.isfinite(img).all() and np.abs(img).max() > 0.0


def test_fov_camera_model_params():
    """FOV (model id 7) params are (fx, fy, cx, cy, omega) — not the
    single-focal layout."""
    c = colmap._pinhole("FOV", np.array([100.0, 110.0, 32.0, 24.0, 0.9]))
    assert (c.fx, c.fy, c.cx, c.cy) == (100.0, 110.0, 32.0, 24.0)
    assert c.has_distortion  # omega is unapplied -> warn path


def test_mixed_resolutions_rejected(tmp_path):
    from PIL import Image
    import pytest

    root, _, _ = _make_dataset(str(tmp_path), w=16, h=12)
    # Overwrite the second image at a different size.
    Image.fromarray(np.zeros((24, 32, 3), np.uint8)).save(
        os.path.join(root, "images", "b.png"))
    with pytest.raises(ValueError, match="mixed image resolutions"):
        colmap.load_colmap(root)


def test_from_points_single_point_finite():
    m = GaussianModel.from_points(np.zeros((1, 3), np.float32),
                                  np.full((1, 3), 0.5, np.float32))
    assert np.isfinite(np.asarray(m.log_scales)).all()
