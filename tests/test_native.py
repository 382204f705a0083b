"""Native library (csrc/) tests: correctness vs the numpy fallbacks.

The reference's host runtime is C++ (happly PLY extraction, frame readback
conversion); ours lives in csrc/gsplat_native.cpp behind ctypes with numpy
fallbacks. These tests only assert native == fallback; they skip when the
library isn't built (make -C csrc).
"""

import numpy as np
import pytest

from gaussian_splat_ipu_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libgsplat_native.so not built")


def test_stack_f32_columns_matches_numpy():
    dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("pad", "<u1"),
                   ("z", "<f4")])
    rng = np.random.default_rng(0)
    rec = np.zeros(10_000, dt)
    for name in ("x", "y", "z"):
        rec[name] = rng.normal(size=10_000).astype(np.float32)
    out = native.stack_f32_columns(rec, ["z", "x"])
    np.testing.assert_array_equal(out, np.stack([rec["z"], rec["x"]], -1))


def test_stack_rejects_non_f32():
    dt = np.dtype([("x", "<f4"), ("i", "<i4")])
    rec = np.zeros(8, dt)
    assert native.stack_f32_columns(rec, ["x", "i"]) is None


def test_center_flip_matches_reference_preprocessing():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-5, 3, (5_000, 3)).astype(np.float32)
    got = pts.copy()
    bb = native.center_flip(got)
    c = (pts.min(0) + pts.max(0)) * 0.5
    want = pts - c
    want[:, 2] = -want[:, 2]
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(bb, np.stack([pts.min(0), pts.max(0)]),
                               atol=1e-6)


def test_to_uint8_matches_numpy():
    rng = np.random.default_rng(2)
    img = (rng.random((37, 53, 4)).astype(np.float32) * 1.5 - 0.2)
    for exposure, gamma in [(1.0, 1.0), (2.0, 1.0), (0.7, 2.2)]:
        a = native.to_uint8(img, exposure, gamma)
        scaled = img * exposure
        if gamma != 1.0:
            scaled = np.power(np.clip(scaled, 0, None), 1.0 / gamma)
        b = (np.clip(scaled, 0, 1) * 255 + 0.5).astype(np.uint8)
        # pow() rounding may differ by 1 ulp at bin edges.
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_ply_load_uses_native_and_matches(tmp_path):
    """End-to-end: write a binary PLY, load with and without the fast path."""
    from gaussian_splat_ipu_tpu.io import ply as ply_io

    rng = np.random.default_rng(3)
    n = 500
    cols = {}
    for name in ("x", "y", "z", "f_dc_0", "f_dc_1", "f_dc_2", "opacity",
                 "scale_0", "scale_1", "scale_2", "rot_0", "rot_1",
                 "rot_2", "rot_3"):
        cols[name] = rng.normal(size=n).astype(np.float32)
    path = str(tmp_path / "t.ply")
    ply_io.write_ply(path, cols)

    fields = ply_io.load_points(path)
    np.testing.assert_array_equal(
        fields["means"], np.stack([cols["x"], cols["y"], cols["z"]], -1))
    np.testing.assert_array_equal(
        fields["quats"],
        np.stack([cols[f"rot_{i}"] for i in range(4)], -1))


def test_image_prefetcher_matches_pil(tmp_path):
    # Native PNG decode (csrc/dataloader.cpp) vs PIL, exact at
    # downscale=1 for every supported colour type.
    from PIL import Image

    from gaussian_splat_ipu_tpu.utils import image as image_util

    rng = np.random.default_rng(4)
    cases = {
        "rgb.png": rng.integers(0, 255, (40, 56, 3), dtype=np.uint8),
        "rgba.png": rng.integers(0, 255, (33, 48, 4), dtype=np.uint8),
        "gray.png": rng.integers(0, 255, (25, 31), dtype=np.uint8),
    }
    for name, arr in cases.items():
        # Write through PIL so the files exercise filters our own
        # encode_png never emits.
        Image.fromarray(arr).save(str(tmp_path / name))

    pf = native.ImagePrefetcher(nthreads=2)
    jobs = {n: pf.submit(str(tmp_path / n)) for n in cases}
    for name, arr in cases.items():
        got = pf.fetch(jobs[name])
        assert got is not None, f"native decode failed for {name}"
        img, (w0, h0) = got
        assert (w0, h0) == (arr.shape[1], arr.shape[0])
        want = arr.astype(np.float32) / 255.0
        if want.ndim == 2:
            want = want[:, :, None]
        np.testing.assert_allclose(img, want, atol=1e-6)
    pf.close()


def test_image_prefetcher_downscale_antialiased(tmp_path):
    from PIL import Image

    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    smooth = np.stack([xx * 4, yy * 4, (xx + yy) * 2], -1).astype(np.uint8)
    p = str(tmp_path / "s.png")
    Image.fromarray(smooth).save(p)

    pf = native.ImagePrefetcher(nthreads=1)
    got = pf.fetch(pf.submit(p, downscale=2))
    pf.close()
    assert got is not None
    img, _ = got
    assert img.shape == (32, 32, 3)
    # Area-average reduction: within a hair of PIL's antialiased resize
    # on smooth content.
    pil = np.asarray(Image.open(p).resize((32, 32), Image.BILINEAR),
                     dtype=np.float32) / 255.0
    assert np.abs(img - pil).mean() < 0.02


def test_image_prefetcher_rejects_unsupported(tmp_path):
    # A palette PNG must return None (PIL fallback), not garbage.
    from PIL import Image

    arr = np.random.default_rng(5).integers(0, 255, (16, 16, 3),
                                            dtype=np.uint8)
    img = Image.fromarray(arr).convert("P")
    p = str(tmp_path / "pal.png")
    img.save(p)
    pf = native.ImagePrefetcher(nthreads=1)
    assert pf.fetch(pf.submit(p)) is None
    assert pf.fetch(pf.submit(str(tmp_path / "missing.png"))) is None
    pf.close()


def test_dataset_prefetch_end_to_end(tmp_path):
    # load_transforms through the native prefetcher matches the PIL path.
    import json
    import os

    from PIL import Image

    from gaussian_splat_ipu_tpu.io import dataset as dataset_lib

    root = str(tmp_path / "ds")
    os.makedirs(root)
    rng = np.random.default_rng(6)
    frames = []
    for i in range(3):
        arr = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"r_{i}.png"))
        c2w = np.eye(4)
        c2w[2, 3] = 3.0 + i
        frames.append({"file_path": f"r_{i}",
                       "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

    fs = dataset_lib.load_transforms(root)
    assert len(fs) == 3
    for i in range(3):
        pil = np.asarray(Image.open(os.path.join(root, f"r_{i}.png")),
                         dtype=np.float32) / 255.0
        np.testing.assert_allclose(np.asarray(fs.images[i]), pil,
                                   atol=1e-6)
