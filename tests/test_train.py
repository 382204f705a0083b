"""Training subsystem tests: losses + single-device train step.

The reference has no training loop (forward-only render server); these
tests cover the north-star extension (BASELINE.json configs 3-4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.render.pipeline import render_image
from gaussian_splat_ipu_tpu.train import losses, trainer
from gaussian_splat_ipu_tpu.utils.config import RasterConfig

# Heavy mesh/CLI integration tests: the fast tier is `pytest -m 'not slow'`
# (VERDICT r3 #7).
pytestmark = pytest.mark.slow

CFG = RasterConfig(image_width=64, image_height=64, pair_capacity=1 << 12,
                   max_chunks_per_tile=4)


def _scene(seed=0, n=128):
    model = GaussianModel.random(jax.random.PRNGKey(seed), n)
    camera = Camera.orbit(np.array([-1.0, -1.0, -1.0], np.float32),
                          np.array([1.0, 1.0, 1.0], np.float32),
                          fov_radians=np.radians(40.0), aspect=1.0)
    return model, camera


class TestLosses:
    def test_l1_zero_on_equal(self):
        x = jnp.ones((8, 8, 3))
        assert float(losses.l1(x, x)) == 0.0

    def test_ssim_identity(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        assert float(losses.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_detects_noise(self):
        key = jax.random.PRNGKey(1)
        img = jax.random.uniform(key, (32, 32, 3))
        noisy = img + 0.3 * jax.random.normal(jax.random.PRNGKey(2),
                                              img.shape)
        assert float(losses.ssim(img, noisy)) < 0.9

    def test_psnr(self):
        x = jnp.zeros((8, 8, 3))
        y = jnp.full((8, 8, 3), 0.1)
        assert float(losses.psnr(x, y)) == pytest.approx(20.0, abs=1e-3)

    def test_render_loss_differentiable(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        tgt = jnp.zeros((32, 32, 3))
        g = jax.grad(lambda p: losses.render_loss(p, tgt))(img)
        assert np.all(np.isfinite(np.asarray(g)))


class TestTrainStep:
    def test_loss_decreases(self):
        model, camera = _scene()
        # Target: a render of a different (perturbed) scene.
        target_model, _ = _scene(seed=7)
        target = render_image(target_model, camera, CFG, use_pallas=False)
        tc = trainer.TrainConfig(ssim_weight=0.0)  # L1 only: fast on CPU

        state = trainer.init_state(model, tc)
        step = jax.jit(trainer.train_step, static_argnums=(3, 4, 5))
        losses_seen = []
        for _ in range(5):
            state, loss = step(state, camera, target, CFG, tc, False)
            losses_seen.append(float(loss))
        assert all(np.isfinite(losses_seen))
        assert losses_seen[-1] < losses_seen[0]
        assert int(state.step) == 5

    def test_grads_nonzero_all_params(self):
        model, camera = _scene()
        target = jnp.zeros((CFG.image_height, CFG.image_width, 4))
        tc = trainer.TrainConfig(ssim_weight=0.0)
        grads = jax.grad(trainer.loss_fn)(model, camera, target, CFG, tc,
                                          False)
        for name in ("means", "log_scales", "quats", "opacities", "sh"):
            g = np.asarray(getattr(grads, name))
            assert np.all(np.isfinite(g)), name
            assert np.abs(g).max() > 0.0, name

    def test_quats_stay_normalised(self):
        model, camera = _scene()
        target = jnp.zeros((CFG.image_height, CFG.image_width, 4))
        tc = trainer.TrainConfig(ssim_weight=0.0)
        state = trainer.init_state(model, tc)
        step = jax.jit(trainer.train_step, static_argnums=(3, 4, 5))
        state, _ = step(state, camera, target, CFG, tc, False)
        norms = np.linalg.norm(np.asarray(state.params.quats), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_fit_smoke(self):
        model, camera = _scene(n=64)
        target = render_image(_scene(seed=3, n=64)[0], camera, CFG,
                              use_pallas=False)
        tc = trainer.TrainConfig(ssim_weight=0.0)
        trained, history = trainer.fit(model, [camera], [target], CFG, tc,
                                       num_steps=3, use_pallas=False)
        assert len(history) == 3
        assert trained.num_gaussians == model.num_gaussians


def test_sh_rest_lr_scale():
    """Higher-order SH bands step at lr_sh * sh_rest_lr_scale (the 3DGS
    f_rest/20 convention); the dc band at lr_sh."""
    import jax
    import jax.numpy as jnp

    from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
    from gaussian_splat_ipu_tpu.train import trainer

    m = GaussianModel.random(jax.random.PRNGKey(0), 16, sh_degree=2)
    cfg = trainer.TrainConfig()
    tx = trainer.make_optimizer(cfg)
    g = jax.tree.map(jnp.ones_like, m)
    upd, _ = tx.update(g, tx.init(m), m)
    u = np.asarray(upd.sh)
    ratio = np.abs(u[:, 1:]).mean() / np.abs(u[:, 0]).mean()
    np.testing.assert_allclose(ratio, cfg.sh_rest_lr_scale, rtol=1e-4)
