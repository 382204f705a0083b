"""End-to-end test of the evaluation CLI (app/eval.py): export a random
scene to PLY, render ground-truth views of THAT scene into a dataset, and
check eval reports near-lossless PSNR (only PNG u8 quantisation between
render and target) with the right split arithmetic."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_splat_ipu_tpu.app import eval as eval_app
from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.render import pipeline
from gaussian_splat_ipu_tpu.train import checkpoint
from gaussian_splat_ipu_tpu.utils import image as image_util
from gaussian_splat_ipu_tpu.utils.config import RasterConfig

# Heavy mesh/CLI integration tests: the fast tier is `pytest -m 'not slow'`
# (VERDICT r3 #7).
pytestmark = pytest.mark.slow

W, H = 32, 24


def _make_scene_and_dataset(tmp_path, n_views=4):
    model = GaussianModel.random(jax.random.PRNGKey(3), 64, extent=0.8)
    ply = str(tmp_path / "scene.ply")
    checkpoint.export_ply(ply, model)

    cfg = RasterConfig(image_width=W, image_height=H,
                       pair_capacity=1 << 12)
    root = str(tmp_path / "data")
    os.makedirs(root)
    gl_to_cv = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    frames = []
    for i in range(n_views):
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 3.0 + 0.2 * i
        w2c_cv = np.linalg.inv(c2w @ gl_to_cv)
        cax = float(np.radians(50.0))
        fx = 0.5 * W / np.tan(0.5 * cax)
        cam = Camera.from_intrinsics(fx, fx, W / 2, H / 2, W, H, w2c_cv)
        img = np.asarray(pipeline.render_image(model, cam, cfg,
                                               use_pallas=False))
        rgb = img[..., :3]  # over-black composite == raw premultiplied rgb
        image_util.write_png(os.path.join(root, f"r_{i}.png"), rgb)
        frames.append({"file_path": f"r_{i}",
                       "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump({"camera_angle_x": cax, "frames": frames}, f)
    return ply, root


def test_select_split():
    assert eval_app.select_split(10, "all", 8) == list(range(10))
    assert eval_app.select_split(10, "holdout", 4) == [0, 4, 8]
    assert eval_app.select_split(10, "train", 4) == [1, 2, 3, 5, 6, 7, 9]
    # holdout + train partition every index
    hold = eval_app.select_split(23, "holdout", 8)
    train = eval_app.select_split(23, "train", 8)
    assert sorted(hold + train) == list(range(23))


def test_eval_cli_end_to_end(tmp_path, capsys):
    ply, root = _make_scene_and_dataset(tmp_path)
    rc = eval_app.main([
        "--input", ply, "--dataset", root, "--split", "all",
        "--device", "jnp", "--pair-capacity", str(1 << 12),
        "--dump", str(tmp_path / "out"), "--dump-depth",
        "--log-level", "off",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["views"] == 4
    # Target images are PNG-quantised renders of the same scene: the only
    # error is u8 rounding -> PSNR must be near-lossless.
    assert summary["mean_psnr"] > 40.0
    assert summary["mean_ssim"] > 0.98
    assert os.path.exists(tmp_path / "out" / "eval_00003.png")
    assert os.path.exists(tmp_path / "out" / "depth_00003.png")


def test_eval_cli_holdout_split(tmp_path, capsys):
    ply, root = _make_scene_and_dataset(tmp_path)
    rc = eval_app.main([
        "--input", ply, "--dataset", root, "--split", "holdout",
        "--holdout-every", "2", "--device", "jnp",
        "--pair-capacity", str(1 << 12), "--log-level", "off",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["views"] == 2  # views 0 and 2 of 4


def test_eval_prefers_transforms_test_json(tmp_path, capsys):
    ply, root = _make_scene_and_dataset(tmp_path, n_views=3)
    # Rename to the NeRF-synthetic test-split layout: eval must pick the
    # test json and score ALL of its frames regardless of --split.
    os.rename(os.path.join(root, "transforms.json"),
              os.path.join(root, "transforms_test.json"))
    # load_transforms requires a train json to exist for dir resolution of
    # the non-eval path; eval resolves the test json itself.
    rc = eval_app.main([
        "--input", ply, "--dataset", root, "--split", "holdout",
        "--holdout-every", "8", "--device", "jnp",
        "--pair-capacity", str(1 << 12), "--log-level", "off",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["views"] == 3
    assert summary["split"] == "all"
