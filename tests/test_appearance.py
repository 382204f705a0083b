"""Per-view exposure compensation tests (train/appearance.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.render.pipeline import render_image
from gaussian_splat_ipu_tpu.train import appearance, trainer
from gaussian_splat_ipu_tpu.utils.config import RasterConfig

import pytest

# Heavy mesh/CLI integration tests: the fast tier is `pytest -m 'not slow'`
# (VERDICT r3 #7).
pytestmark = pytest.mark.slow


def _setup(seed=0, n=48):
    model = GaussianModel.random(jax.random.PRNGKey(seed), n, extent=0.5)
    cam = Camera.look_at([0.0, 0.0, 3.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                         np.radians(50.0), 1.0)
    cfg = RasterConfig(image_width=32, image_height=32,
                       pair_capacity=1 << 10, max_chunks_per_tile=4)
    return model, cam, cfg


def test_apply_exposure_identity_and_affine():
    img = jnp.asarray(np.random.default_rng(0)
                      .uniform(0, 1, (8, 8, 4)).astype(np.float32))
    ident = appearance.identity_mats(1)[0]
    np.testing.assert_allclose(np.asarray(appearance.apply_exposure(
        img, ident)), np.asarray(img), atol=1e-6)

    mat = jnp.asarray(np.array([[2.0, 0, 0, 0.1],
                                [0, 0.5, 0, 0.0],
                                [0, 0, 1.0, -0.2]], np.float32))
    out = np.asarray(appearance.apply_exposure(img, mat))
    np.testing.assert_allclose(out[..., 0],
                               2.0 * np.asarray(img)[..., 0] + 0.1,
                               atol=1e-6)
    np.testing.assert_allclose(out[..., 1],
                               0.5 * np.asarray(img)[..., 1], atol=1e-6)
    np.testing.assert_allclose(out[..., 3], np.asarray(img)[..., 3],
                               atol=1e-7)  # alpha untouched


def test_recovers_exposure_error():
    """Frozen scene; the per-view affine must learn the synthetic gain
    and offset applied to the target."""
    model, cam, cfg = _setup()
    base = render_image(model, cam, cfg, use_pallas=False)
    # Target is the true render through a known exposure distortion.
    gain = jnp.array([1.3, 0.8, 1.1], jnp.float32)
    bias = jnp.array([0.05, -0.02, 0.01], jnp.float32)
    target = jnp.concatenate([base[..., :3] * gain + bias, base[..., 3:]],
                             axis=-1)

    frozen = trainer.TrainConfig(lr_means=0.0, lr_means_final=0.0,
                                 lr_log_scales=0.0, lr_quats=0.0,
                                 lr_opacities=0.0, lr_sh=0.0,
                                 ssim_weight=0.0)
    state = trainer.init_state(model, frozen)
    estate = appearance.init_exposure_state(1, lr=2e-2)
    step = jax.jit(appearance.joint_step, static_argnums=(5, 6, 7, 8))
    first = None
    for _ in range(80):
        state, estate, loss = step(state, estate, jnp.int32(0), cam,
                                   target, cfg, frozen, 2e-2, False)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.15 * first, (first, float(loss))
    m = np.asarray(estate.mats[0])
    # Diagonal gains move toward the synthetic distortion (loose: pixels
    # only constrain the transform where the render has energy).
    assert np.all(np.abs(np.diag(m[:, :3]) - 1.0) > 1e-3)


def test_joint_step_updates_selected_row_only():
    model, cam, cfg = _setup()
    target = render_image(model, cam, cfg, use_pallas=False) * 0.7
    tc = trainer.TrainConfig(ssim_weight=0.0)
    state = trainer.init_state(model, tc)
    estate = appearance.init_exposure_state(3, lr=1e-2)
    step = jax.jit(appearance.joint_step, static_argnums=(5, 6, 7, 8))
    s2, e2, loss = step(state, estate, jnp.int32(2), cam, target, cfg,
                        tc, 1e-2, False)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(s2.params.means),
                           np.asarray(state.params.means))
    d = np.asarray(e2.mats) - np.asarray(estate.mats)
    assert np.abs(d[2]).max() > 0.0
    np.testing.assert_allclose(d[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(d[1], 0.0, atol=1e-12)
