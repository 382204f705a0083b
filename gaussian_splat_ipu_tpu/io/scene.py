"""Scene assembly: file -> GaussianModel + world bounds.

Rebuilds the reference's host-side scene construction
(src/main/splat.cpp:86-163): load, centre on the centroid, flip z, then
assemble gaussian parameters (SH DC colour handled at render time via
ops/sh.py, exactly SH_C0*f_dc+0.5 clamped — src/main/splat.cpp:136-148).
Plain xyz point clouds (no gaussian fields) get isotropic default gaussians
so the point-renderer path has something to draw, mirroring splat.cpp:155-158.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from gaussian_splat_ipu_tpu.io import ply as ply_io
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel


@dataclasses.dataclass
class Scene:
    model: GaussianModel
    bb_min: np.ndarray
    bb_max: np.ndarray

    @property
    def num_gaussians(self) -> int:
        return self.model.num_gaussians


def assemble_scene(fields, center: bool = True, flip_z: bool = True,
                   sh_degree: int = 0, default_log_scale: float = -4.0,
                   center_point=None) -> Scene:
    """Build a Scene from a parsed field dict (io/ply.load_points).

    center_point: world centre computed elsewhere (e.g. the global bbox
    midpoint a multi-host loader exchanges across processes,
    parallel/multihost.py) — required for consistent centring when the
    fields cover only this process's row slice."""
    means = fields["means"].astype(np.float32)
    if center:
        if center_point is None:
            bb_min, bb_max = means.min(0), means.max(0)
            center_point = (bb_min + bb_max) * 0.5
        means = means - np.asarray(center_point, np.float32)
    if flip_z:
        means = means.copy()
        means[:, 2] = -means[:, 2]
    n = means.shape[0]

    if "f_dc" in fields:
        f_dc = fields["f_dc"]
        opacity = fields["opacity"]
        log_scales = fields["log_scales"]
        quats = fields["quats"]
    else:
        # xyz clouds: dim grey points, parity with splat.cpp:155-158.
        f_dc = np.full((n, 3), (0.05 - 0.5) / 0.28209479177387814, np.float32)
        opacity = np.full((n,), 6.0, np.float32)  # sigmoid(6) ~ 1.0
        log_scales = np.full((n, 3), default_log_scale, np.float32)
        quats = np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (n, 1))

    f_rest = fields.get("f_rest")
    if f_rest is not None and sh_degree == 0:
        # Infer degree from the file when higher-order terms exist.
        k = f_rest.shape[1] + 1
        sh_degree = int(np.sqrt(k)) - 1

    model = GaussianModel.create(means, log_scales, quats, opacity, f_dc,
                                 f_rest, sh_degree)
    if n == 0:  # a pure-padding shard slice (multi-host, tiny scene)
        return Scene(model, np.full(3, np.inf, np.float32),
                     np.full(3, -np.inf, np.float32))
    return Scene(model, means.min(0), means.max(0))


def load_scene(path: str, center: bool = True, flip_z: bool = True,
               sh_degree: int = 0, default_log_scale: float = -4.0,
               row_range=None, center_point=None) -> Scene:
    """Load + assemble in one step. row_range=(lo, hi): parse only those
    vertex rows (sharded loading — see assemble_scene for the centring
    contract)."""
    fields = ply_io.load_points(path, row_range=row_range)
    return assemble_scene(fields, center, flip_z, sh_degree,
                          default_log_scale, center_point)
