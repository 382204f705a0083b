"""Checkpoint/resume for training state + PLY scene export.

The reference checkpoints only its compiled executable (saveExe/loadExe,
include/ipu/ipu_utils.hpp:59-76) — model state never changes because it
never trains. Here model + optimizer state checkpointing is first-class:

  * save/restore_checkpoint — the full TrainState pytree as an .npz
    (restore takes a template state for the tree structure, so arbitrary
    optax states round-trip without pickling).
  * export_ply / import_ply — the gaussian parameters in the standard 3DGS
    PLY field layout (x/y/z, f_dc_*, f_rest_*, opacity, scale_*, rot_*),
    byte-compatible with the reference's own loader field set
    (src/splat/file_io.cpp:62-77) and the wider 3DGS ecosystem.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splat_ipu_tpu.io import ply as ply_io
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel


def save_checkpoint(path: str, state) -> None:
    """Serialise any pytree of arrays (e.g. TrainState) to an .npz."""
    leaves = jax.tree_util.tree_leaves(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: a crash never truncates a checkpoint


def restore_checkpoint(path: str, template):
    """Restore a pytree saved by save_checkpoint.

    `template` supplies the tree structure (e.g. a freshly-built TrainState
    with the right shapes); leaf values are replaced from the file.
    """
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as data:
        if len(data.files) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(data.files)} leaves, template has "
                f"{len(leaves)} — structure mismatch")
        restored = [jnp.asarray(data[f"leaf_{i}"])
                    for i in range(len(leaves))]
    for got, want in zip(restored, leaves):
        if got.shape != jnp.shape(want):
            raise ValueError(
                f"leaf shape {got.shape} != template {jnp.shape(want)}")
    return jax.tree_util.tree_unflatten(treedef, restored)


def gaussian_columns(model: GaussianModel):
    """The standard 3DGS PLY column set, in canonical property order —
    shared by the single-file exporter below and the per-process sharded
    exporter (parallel/multihost.py::export_ply_sharded)."""
    sh = np.asarray(model.sh)
    n, k, _ = sh.shape
    cols = {
        "x": np.asarray(model.means[:, 0]),
        "y": np.asarray(model.means[:, 1]),
        "z": np.asarray(model.means[:, 2]),
        "f_dc_0": sh[:, 0, 0], "f_dc_1": sh[:, 0, 1],
        "f_dc_2": sh[:, 0, 2],
    }
    # f_rest is channel-major in 3DGS files: all R coeffs, all G, all B.
    rest = sh[:, 1:]  # (N, K-1, 3)
    for ch in range(3):
        for j in range(k - 1):
            cols[f"f_rest_{ch * (k - 1) + j}"] = rest[:, j, ch]
    cols["opacity"] = np.asarray(model.opacities)
    for j in range(3):
        cols[f"scale_{j}"] = np.asarray(model.log_scales[:, j])
    for j in range(4):
        cols[f"rot_{j}"] = np.asarray(model.quats[:, j])
    return cols


def export_ply(path: str, model: GaussianModel) -> None:
    """Write gaussian params as a standard 3DGS PLY (reference-loadable)."""
    ply_io.write_ply(path, gaussian_columns(model))


def import_ply(path: str) -> GaussianModel:
    """Load a 3DGS PLY back into a GaussianModel (no preprocessing)."""
    fields = ply_io.gaussian_fields_from_ply(ply_io.read_ply(path))
    f_rest = fields.get("f_rest")
    degree = 0
    if f_rest is not None:
        degree = int(np.sqrt(f_rest.shape[1] + 1)) - 1
    return GaussianModel.create(
        fields["means"], fields["log_scales"], fields["quats"],
        fields["opacity"], fields["f_dc"], f_rest, degree)
