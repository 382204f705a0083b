"""The web-viewer `.splat` format (antimatter15/splat convention).

The de-facto interchange format of browser gaussian viewers: a flat
array of 32-byte records —

    position  3 x f32   world-space mean
    scale     3 x f32   LINEAR per-axis scale (exp of our log_scales)
    color     4 x u8    RGB = SH_C0 * f_dc + 0.5 in [0,1] -> u8,
                        A = sigmoid(opacity) -> u8
    rotation  4 x u8    normalised quaternion (w, x, y, z), each
                        component mapped q*128 + 128

The reference only speaks PLY/XYZ (/root/reference/src/splat/
file_io.cpp:44-55); this closes the loop with the web ecosystem: export
a trained scene straight into any browser viewer, or load a .splat
someone published. Quantisation note: color/rotation are u8 in the
format, so a PLY -> .splat -> PLY round trip is lossy by design
(~1/255 in color and ~1/128 per quaternion component); higher-order SH
does not exist in the format and is dropped on write.
"""

from __future__ import annotations

import numpy as np

from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.ops.sh import SH_C0

RECORD_BYTES = 32
_DTYPE = np.dtype([
    ("position", "<f4", (3,)),
    ("scale", "<f4", (3,)),
    ("color", "u1", (4,)),
    ("rot", "u1", (4,)),
])
assert _DTYPE.itemsize == RECORD_BYTES


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def write_splat(path: str, model: GaussianModel,
                sort_by_importance: bool = True) -> None:
    """Serialise a GaussianModel as .splat records.

    sort_by_importance orders records by opacity * volume descending —
    the convention web viewers expect so progressive loading shows the
    big splats first (antimatter15's converter does the same).
    """
    n = model.num_gaussians
    rec = np.empty(n, _DTYPE)
    rec["position"] = np.asarray(model.means, np.float32)
    scales = np.exp(np.asarray(model.log_scales, np.float32))
    rec["scale"] = scales
    rgb = np.clip(SH_C0 * np.asarray(model.sh)[:, 0] + 0.5, 0.0, 1.0)
    alpha = _sigmoid(np.asarray(model.opacities, np.float32))
    rec["color"] = (np.concatenate([rgb, alpha[:, None]], -1)
                    * 255.0 + 0.5).astype(np.uint8)
    q = np.asarray(model.quats, np.float32)
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    rec["rot"] = np.clip(q * 128.0 + 128.0, 0.0, 255.0).astype(np.uint8)
    if sort_by_importance and n:
        importance = alpha * scales.prod(-1)
        rec = rec[np.argsort(-importance, kind="stable")]
    with open(path, "wb") as f:
        f.write(rec.tobytes())


def read_splat(path: str, row_range=None):
    """Parse .splat records into the loader field dict (io/ply.load_points
    contract: means / log_scales / quats / opacity / f_dc), so
    assemble_scene and the sharded loader work unchanged.

    row_range=(lo, hi): seek-read only those records (the file is a flat
    fixed-stride array, so sharded loading is a single seek)."""
    import os

    size = os.path.getsize(path)
    if size % RECORD_BYTES:
        raise ValueError(
            f"{path}: size {size} is not a multiple of {RECORD_BYTES} — "
            "not a .splat file?")
    count = size // RECORD_BYTES
    lo, hi = (0, count) if row_range is None else row_range
    if lo < 0 or hi < lo:
        raise ValueError(f"bad row_range {row_range}")
    hi = min(hi, count)
    lo = min(lo, hi)
    with open(path, "rb") as f:
        f.seek(lo * RECORD_BYTES)
        rec = np.frombuffer(f.read((hi - lo) * RECORD_BYTES), _DTYPE)

    color = rec["color"].astype(np.float32) / 255.0
    eps = 1.0 / 510.0  # half a quantisation step keeps the logit finite
    alpha = np.clip(color[:, 3], eps, 1.0 - eps)
    return {
        "means": rec["position"].astype(np.float32),
        "log_scales": np.log(np.maximum(rec["scale"], 1e-12)),
        "quats": (rec["rot"].astype(np.float32) - 128.0) / 128.0,
        "opacity": np.log(alpha / (1.0 - alpha)),
        "f_dc": (color[:, :3] - 0.5) / SH_C0,
    }


def count_records(path: str) -> int:
    import os

    return os.path.getsize(path) // RECORD_BYTES
