"""Child process for the on-hardware parity smoke (test_tpu_smoke.py).

Runs OUTSIDE the CPU-forced test harness so the default backend (the real
TPU on this box, reached via the axon tunnel) is used. Compiled-Pallas
forward and gradients are checked against the jnp spec ON DEVICE — the
central correctness claim of BASELINE.md, made regression-proof
(VERDICT r1 next-step #7; test-strategy gap SURVEY.md §4).

Exit codes: 0 = parity holds, 42 = no TPU available (caller skips),
anything else = failure.
"""

import sys

import numpy as np


def main() -> int:
    import jax

    if jax.devices()[0].platform == "cpu":
        return 42

    import jax.numpy as jnp

    # Warm persistent cache: repeat runs skip the minutes-scale compile.
    jax.config.update("jax_compilation_cache_dir", "/tmp/gsplat_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussian_splat_ipu_tpu.models.camera import Camera
    from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
    from gaussian_splat_ipu_tpu.render.pipeline import render_image
    from gaussian_splat_ipu_tpu.utils.config import RasterConfig

    cfg = RasterConfig(image_width=256, image_height=256,
                       pair_capacity=1 << 14, max_chunks_per_tile=32)
    model = GaussianModel.random(jax.random.PRNGKey(0), 512, extent=1.0)
    camera = Camera.orbit(np.array([-1.0, -1.0, -1.0], np.float32),
                          np.array([1.0, 1.0, 1.0], np.float32),
                          fov_radians=float(np.radians(40.0)), aspect=1.0)
    target = jnp.zeros((256, 256, 4), jnp.float32)

    def loss(m, use_pallas):
        img = render_image(m, camera, cfg, use_pallas)
        return jnp.mean((img - target) ** 2)

    fwd = jax.jit(loss, static_argnums=(1,))
    img_pallas = np.asarray(jax.jit(
        render_image, static_argnums=(2, 3))(model, camera, cfg, True))
    img_spec = np.asarray(jax.jit(
        render_image, static_argnums=(2, 3))(model, camera, cfg, False))
    fwd_err = float(np.abs(img_pallas - img_spec).max())

    g_pallas = jax.jit(jax.grad(lambda m: loss(m, True)))(model)
    g_spec = jax.jit(jax.grad(lambda m: loss(m, False)))(model)
    grad_err = 0.0
    for a, b in zip(jax.tree.leaves(g_pallas), jax.tree.leaves(g_spec)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(b).max()), 1e-8)
        grad_err = max(grad_err, float(np.abs(a - b).max()) / scale)

    print(f"tpu parity: fwd_max_err={fwd_err:.3e} "
          f"grad_rel_err={grad_err:.3e}", flush=True)
    # BASELINE.md bounds: <=1e-5 forward, <=1e-6 relative gradient error
    # was measured at 3.7e-8; allow margin while still catching real
    # regressions (a broken kernel is orders of magnitude off).
    assert fwd_err <= 1e-5, f"forward parity broken: {fwd_err}"
    assert grad_err <= 1e-5, f"gradient parity broken: {grad_err}"
    assert float(fwd(model, True)) >= 0.0

    # Grouped binning (RasterConfig.tile_group) on hardware: compiled
    # Pallas over super-tile ranges must match the ungrouped compiled
    # image to float rounding (alpha-aware extents -> same composited
    # set; see tests/test_tile_group.py for the CPU-side version).
    import dataclasses
    gcfg = dataclasses.replace(cfg, tile_group=2, extent_sigma=0.0)
    ucfg = dataclasses.replace(cfg, extent_sigma=0.0)
    img_g = np.asarray(jax.jit(
        render_image, static_argnums=(2, 3))(model, camera, gcfg, True))
    img_u = np.asarray(jax.jit(
        render_image, static_argnums=(2, 3))(model, camera, ucfg, True))
    group_err = float(np.abs(img_g - img_u).max())
    print(f"tpu tile_group parity: max_err={group_err:.3e}", flush=True)
    assert group_err <= 1e-5, f"tile_group parity broken: {group_err}"

    # Relaxed-termination inference kernel COMPILED on TPU (the interpret-
    # mode test only covers CPU; VERDICT r3 weak #7): colour channels must
    # match the strict kernel bit-for-bit on the default black background,
    # alpha bounded by transmittance_eps/(1 - alpha_clamp).
    rcfg = dataclasses.replace(cfg, strict_termination=False)
    img_r = np.asarray(jax.jit(
        render_image, static_argnums=(2, 3))(model, camera, rcfg, True))
    colour_err = float(np.abs(img_r[..., :3] - img_pallas[..., :3]).max())
    alpha_excess = float((img_r[..., 3] - img_pallas[..., 3]).max())
    alpha_bound = cfg.transmittance_eps / (1.0 - cfg.alpha_clamp)
    print(f"tpu relaxed-termination: colour_err={colour_err:.3e} "
          f"alpha_excess={alpha_excess:.3e} (bound {alpha_bound:.3e})",
          flush=True)
    assert colour_err <= 1e-6, f"relaxed colour drift: {colour_err}"
    assert alpha_excess <= alpha_bound * (1.0 + 1e-3), \
        f"relaxed alpha excess {alpha_excess} > bound {alpha_bound}"
    # Relaxed must never UNDERSHOOT strict alpha (monotone transmittance).
    assert float((img_pallas[..., 3] - img_r[..., 3]).max()) <= 1e-6
    return 0


if __name__ == "__main__":
    sys.exit(main())
