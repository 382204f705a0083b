"""Scene post-processing utility: inspect / prune / convert trained scenes.

The 3DGS ecosystem expects a model-surgery tool next to the trainer
(prune dead splats before shipping, cap SH degree for lightweight
viewers, convert between formats). The reference has no equivalent (it
only consumes PLYs, src/splat/file_io.cpp); this rounds out the
framework's IO story:

    python -m gaussian_splat_ipu_tpu.app.scene_tool --input in.ply \
        --prune-opacity 0.005 --prune-scale 5.0 --max-sh 1 \
        --center-flip --output out.ply [--output-splat out.splat] [--stats]

All operations are pure numpy on the host (no device round-trip): this
is a file tool, not a render path.
"""

from __future__ import annotations

import argparse
import json
import logging

import numpy as np

log = logging.getLogger("gsplat")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="3DGS scene utility")
    p.add_argument("--input", required=True,
                   help="scene file (.ply / .xyz / .splat)")
    p.add_argument("--output", default="", help="write result as PLY")
    p.add_argument("--output-splat", default="",
                   help="write result as web-viewer .splat")
    p.add_argument("--prune-opacity", type=float, default=0.0,
                   help="drop gaussians with post-sigmoid opacity below "
                        "this (3DGS ships ~0.005)")
    p.add_argument("--prune-scale", type=float, default=0.0,
                   help="drop gaussians whose max axis scale exceeds "
                        "this many scene-extent units (floaters)")
    p.add_argument("--max-sh", type=int, default=-1,
                   help="cap the SH degree (-1 = keep)")
    p.add_argument("--center-flip", action="store_true",
                   help="centre on the centroid and flip y/z (the "
                        "reference's preprocessing, splat.cpp:92-100)")
    p.add_argument("--stats", action="store_true",
                   help="print a JSON stats line for the (processed) "
                        "scene")
    p.add_argument("--log-level", default="info")
    return p.parse_args(argv)


def scene_stats(model) -> dict:
    """Host-side summary statistics of a GaussianModel."""
    if model.num_gaussians == 0:
        return {"gaussians": 0, "sh_degree": int(model.sh_degree)}
    means = np.asarray(model.means)
    scales = np.exp(np.asarray(model.log_scales))
    opac = 1.0 / (1.0 + np.exp(-np.asarray(model.opacities)))
    return {
        "gaussians": int(model.num_gaussians),
        "sh_degree": int(model.sh_degree),
        "bb_min": [round(float(v), 4) for v in means.min(0)],
        "bb_max": [round(float(v), 4) for v in means.max(0)],
        "mean_opacity": round(float(opac.mean()), 4),
        "frac_opacity_below_0.005": round(float((opac < 0.005).mean()), 4),
        "median_scale": round(float(np.median(scales)), 6),
        "p99_scale": round(float(np.quantile(scales, 0.99)), 6),
    }


def _select(model, keep: np.ndarray):
    from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
    import jax.numpy as jnp
    idx = np.flatnonzero(keep)
    return GaussianModel(
        means=jnp.asarray(np.asarray(model.means)[idx]),
        log_scales=jnp.asarray(np.asarray(model.log_scales)[idx]),
        quats=jnp.asarray(np.asarray(model.quats)[idx]),
        opacities=jnp.asarray(np.asarray(model.opacities)[idx]),
        sh=jnp.asarray(np.asarray(model.sh)[idx]),
    )


def process(model, prune_opacity: float = 0.0, prune_scale: float = 0.0,
            max_sh: int = -1, center_flip: bool = False):
    """Apply the requested surgeries; returns (model, report dict)."""
    from gaussian_splat_ipu_tpu.models import gaussians as gmod
    import jax.numpy as jnp

    report = {"input_gaussians": int(model.num_gaussians)}
    keep = np.ones(model.num_gaussians, bool)
    if prune_opacity > 0.0:
        opac = 1.0 / (1.0 + np.exp(-np.asarray(model.opacities)))
        keep &= opac >= prune_opacity
    if prune_scale > 0.0:
        means = np.asarray(model.means)
        extent = float(np.linalg.norm(means.max(0) - means.min(0)) * 0.5)
        smax = np.exp(np.asarray(model.log_scales)).max(axis=1)
        keep &= smax <= prune_scale * max(extent, 1e-12)
    if not keep.all():
        model = _select(model, keep)
    report["pruned"] = report["input_gaussians"] - int(keep.sum())

    if max_sh >= 0 and max_sh != model.sh_degree:
        model = model.with_sh_degree(max_sh)
    if center_flip and model.num_gaussians > 0:
        # Full rigid mirror through z (not the reference's means-only
        # display flip): Sigma' = F Sigma F^T with F = diag(1,1,-1)
        # conjugates the rotation — quat (w,x,y,z) -> (w,-x,-y,z) — and
        # real SH bands transform as Y_l^m(x,y,-z) = (-1)^(l+m) Y_l^m.
        means = np.asarray(model.means)
        quats = np.asarray(model.quats) * np.array([1, -1, -1, 1],
                                                   np.float32)
        sh = np.asarray(model.sh).copy()
        k = sh.shape[1]
        signs = np.ones(k, np.float32)
        idx = 0
        for l in range(int(np.sqrt(k))):
            for m in range(-l, l + 1):
                signs[idx] = (-1.0) ** (l + m)
                idx += 1
        sh *= signs[None, :, None]
        model = type(model)(
            means=jnp.asarray(gmod.center_and_flip(means)),
            log_scales=model.log_scales, quats=jnp.asarray(quats),
            opacities=model.opacities, sh=jnp.asarray(sh))
    report["output_gaussians"] = int(model.num_gaussians)
    report["sh_degree"] = int(model.sh_degree)
    return model, report


def main(argv=None) -> int:
    args = parse_args(argv)
    from gaussian_splat_ipu_tpu.runtime.engine import setup_logging
    setup_logging(args.log_level)
    from gaussian_splat_ipu_tpu.io.scene import load_scene
    from gaussian_splat_ipu_tpu.train import checkpoint

    # Load RAW: a file tool must not re-centre / mirror its input (the
    # render CLI's display preprocessing would silently change the
    # coordinate frame of every output artifact).
    scene = load_scene(args.input, center=False, flip_z=False)
    model, report = process(scene.model,
                            prune_opacity=args.prune_opacity,
                            prune_scale=args.prune_scale,
                            max_sh=args.max_sh,
                            center_flip=args.center_flip)
    if model.num_gaussians == 0:
        log.warning("0 gaussians survive the requested pruning — "
                    "nothing useful to write")
    log.info("%s: %d -> %d gaussians (pruned %d), SH degree %d",
             args.input, report["input_gaussians"],
             report["output_gaussians"], report["pruned"],
             report["sh_degree"])
    if args.output:
        checkpoint.export_ply(args.output, model)
        log.info("scene -> %s", args.output)
    if args.output_splat:
        from gaussian_splat_ipu_tpu.io import splat as splat_io
        splat_io.write_splat(args.output_splat, model)
        log.info("scene -> %s (.splat)", args.output_splat)
    if args.stats:
        print(json.dumps(scene_stats(model)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
