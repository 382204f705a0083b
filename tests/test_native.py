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
