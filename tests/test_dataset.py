"""Dataset loading + intrinsics-camera tests (io/dataset.py,
Camera.from_intrinsics / Camera.look_at)."""

import json
import os

import numpy as np
import jax.numpy as jnp

from gaussian_splat_ipu_tpu.io import dataset
from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.ops import transforms

import pytest


def _project(cam: Camera, pts: np.ndarray, w: int, h: int) -> np.ndarray:
    view_h = transforms.transform_points(cam.view, pts)
    clip = transforms.transform_points(cam.proj, view_h)
    return np.asarray(transforms.clip_to_screen(clip, w, h))


class TestFromIntrinsics:
    def test_matches_opencv_projection(self):
        rng = np.random.default_rng(0)
        w, h = 320, 240
        fx, fy, cx, cy = 260.0, 255.0, 148.0, 131.0  # off-centre principal
        # Random world->camera with a proper rotation.
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        ww, x, y, z = q
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - ww * z),
             2 * (x * z + ww * y)],
            [2 * (x * y + ww * z), 1 - 2 * (x * x + z * z),
             2 * (y * z - ww * x)],
            [2 * (x * z - ww * y), 2 * (y * z + ww * x),
             1 - 2 * (x * x + y * y)]])
        t = rng.normal(size=3)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3], w2c[:3, 3] = r, t
        cam = Camera.from_intrinsics(fx, fy, cx, cy, w, h, w2c)

        pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
        pc = (r @ pts.T).T + t                       # OpenCV camera coords
        infront = pc[:, 2] > 0.3
        pts, pc = pts[infront], pc[infront]
        assert pts.shape[0] > 10
        expected = np.stack([fx * pc[:, 0] / pc[:, 2] + cx,
                             fy * pc[:, 1] / pc[:, 2] + cy], -1)
        got = _project(cam, pts, w, h)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=2e-3)

    def test_orientation_top_row_is_up(self):
        # GL camera at origin looking down -z world, y up (identity c2w ->
        # OpenCV w2c flips y/z). A point ABOVE the axis must land in the
        # TOP half of the image (v < cy), matching top-row-first loading.
        w2c_cv = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
        cam = Camera.from_intrinsics(100.0, 100.0, 50.0, 50.0, 100, 100,
                                     w2c_cv)
        uv = _project(cam, np.array([[0.0, 0.5, -2.0]], np.float32),
                      100, 100)[0]
        assert uv[1] < 50.0
        assert abs(uv[0] - 50.0) < 1e-3
        # Positive depth in the renderer's convention.
        view_h = transforms.transform_points(
            cam.view, np.array([[0.0, 0.0, -2.0]], np.float32))
        assert float(-view_h[0, 2]) > 0


def test_look_at_projects_center_to_center():
    cam = Camera.look_at([0.0, 0.0, 3.0], [0.0, 0.0, 0.0],
                         [0.0, 1.0, 0.0], np.radians(60.0), 1.0)
    uv = _project(cam, np.zeros((1, 3), np.float32), 128, 128)[0]
    np.testing.assert_allclose(uv, [64.0, 64.0], atol=1e-3)


def _write_dataset(root, n_frames=2, w=16, h=12):
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    frames = []
    rng = np.random.default_rng(1)
    for i in range(n_frames):
        arr = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"r_{i}.png"))
        c2w = np.eye(4)
        c2w[2, 3] = 3.0 + i                    # pull back along +z
        frames.append({"file_path": f"r_{i}",
                       "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": float(np.radians(50.0)),
                   "frames": frames}, f)


def test_load_transforms_blender_style(tmp_path):
    root = str(tmp_path / "scene")
    _write_dataset(root)
    fs = dataset.load_transforms(root)
    assert len(fs) == 2
    assert fs.width == 16 and fs.height == 12
    assert fs.images[0].shape == (12, 16, 3)
    assert 0.0 <= fs.images[0].min() and fs.images[0].max() <= 1.0
    # Scene origin is in front of both cameras and near the centre.
    for cam in fs.cameras:
        uv = _project(cam, np.zeros((1, 3), np.float32), 16, 12)[0]
        np.testing.assert_allclose(uv, [8.0, 6.0], atol=1e-3)
    cams, imgs = fs.stacked()
    assert imgs.shape == (2, 12, 16, 3)
    assert cams.view.shape == (2, 4, 4)


def test_load_transforms_nerfstudio_intrinsics(tmp_path):
    from PIL import Image

    root = str(tmp_path / "ns")
    os.makedirs(root)
    Image.fromarray(np.zeros((12, 16, 3), np.uint8)).save(
        os.path.join(root, "f0.png"))
    meta = {"fl_x": 20.0, "fl_y": 21.0, "cx": 9.0, "cy": 5.0,
            "w": 16, "h": 12,
            "frames": [{"file_path": "f0.png",
                        "transform_matrix": np.eye(4).tolist()}]}
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump(meta, f)
    fs = dataset.load_transforms(root)
    assert len(fs) == 1
    fx = float(fs.cameras[0].proj[0, 0]) * 16 / 2
    np.testing.assert_allclose(fx, 20.0, rtol=1e-6)


@pytest.mark.slow
def test_render_with_dataset_camera(tmp_path):
    import jax

    from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
    from gaussian_splat_ipu_tpu.render.pipeline import render_image
    from gaussian_splat_ipu_tpu.utils.config import RasterConfig

    root = str(tmp_path / "scene")
    _write_dataset(root, w=32, h=32)
    fs = dataset.load_transforms(root)
    model = GaussianModel.random(jax.random.PRNGKey(0), 64, extent=0.5)
    cfg = RasterConfig(image_width=32, image_height=32,
                       pair_capacity=1 << 10, max_chunks_per_tile=4)
    img = render_image(model, fs.cameras[0], cfg, use_pallas=False)
    assert np.isfinite(np.asarray(img)).all()
    assert float(jnp.abs(img).max()) > 0.0
