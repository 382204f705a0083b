"""View-dependent colour (SH degree > 0) through the full pipeline.

The reference only evaluates the SH DC term (SH_C0*f_dc+0.5,
src/main/splat.cpp:136-148); higher-order SH is a north-star extension.
These tests pin the pipeline's SH behaviour against the oracle renderer
and check view dependence end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.ops import sh as sh_ops
from gaussian_splat_ipu_tpu.render.pipeline import render_image
from gaussian_splat_ipu_tpu.utils.config import RasterConfig

import pytest

CFG = RasterConfig(image_width=64, image_height=64, pair_capacity=1 << 12,
                   max_chunks_per_tile=4)


def _cam(rot_y=0.0):
    return Camera.orbit(np.array([-1.0, -1.0, -1.0], np.float32),
                        np.array([1.0, 1.0, 1.0], np.float32),
                        fov_radians=np.radians(40.0), aspect=1.0,
                        rot_y_deg=rot_y)


@pytest.mark.slow
def test_degree0_equals_expanded_degree2_with_zero_rest():
    """Zero higher-order coefficients must not change the image."""
    m0 = GaussianModel.random(jax.random.PRNGKey(0), 96, sh_degree=0)
    sh2 = jnp.zeros((96, 9, 3), jnp.float32).at[:, 0].set(m0.sh[:, 0])
    m2 = GaussianModel(m0.means, m0.log_scales, m0.quats, m0.opacities,
                       sh2)
    img0 = render_image(m0, _cam(), CFG, use_pallas=False)
    img2 = render_image(m2, _cam(), CFG, use_pallas=False)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img0),
                               atol=1e-5)


def test_view_dependent_color_changes_with_view():
    """Nonzero degree-1 coefficients make colour view-dependent."""
    model = GaussianModel.random(jax.random.PRNGKey(1), 96, sh_degree=1)
    img_a = render_image(model, _cam(0.0), CFG, use_pallas=False)
    img_b = render_image(model, _cam(40.0), CFG, use_pallas=False)
    assert float(jnp.abs(img_a - img_b).mean()) > 1e-4


def test_eval_sh_matches_closed_form_degree1():
    """eval_sh degree 1 == dc + c1 * (−y, z, −x) convention check."""
    key = jax.random.PRNGKey(2)
    sh = jax.random.normal(key, (7, 4, 3), jnp.float32)
    dirs = jax.random.normal(jax.random.PRNGKey(3), (7, 3), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    got = sh_ops.eval_sh(sh, dirs, 1)
    c0 = 0.28209479177387814
    c1 = 0.4886025119029199
    x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
    want = jnp.maximum((c0 * sh[:, 0] - c1 * y * sh[:, 1]
                        + c1 * z * sh[:, 2] - c1 * x * sh[:, 3]) + 0.5,
                       0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


@pytest.mark.slow
def test_sh_grads_flow_at_degree2():
    model = GaussianModel.random(jax.random.PRNGKey(4), 64, sh_degree=2)

    def loss(m):
        return jnp.mean(render_image(m, _cam(), CFG, use_pallas=False))

    g = jax.grad(loss)(model)
    g_sh = np.asarray(g.sh)
    assert g_sh.shape == (64, 9, 3)
    assert np.all(np.isfinite(g_sh))
    # Higher-order coefficient grads are nonzero somewhere.
    assert np.abs(g_sh[:, 1:]).max() > 0.0


@pytest.mark.slow
def test_env_rotation_spins_directional_appearance():
    # env_rotation plumb (reference env_rotation packets,
    # InterfaceServer.hpp:24-43 -> env light shader): rotating the
    # environment changes view-dependent (SH>=1) colour, is identity at
    # zero, and leaves DC-only scenes untouched (an isotropic emitter
    # has no directional appearance to spin).
    model = GaussianModel.random(jax.random.PRNGKey(5), 64, sh_degree=1)
    base = _cam()
    rotated = Camera(base.view, base.proj,
                     env_rot=jnp.array([0.0, np.radians(90.0)]))
    img0 = np.asarray(render_image(model, base, CFG, use_pallas=False))
    img0b = np.asarray(render_image(
        model, Camera(base.view, base.proj, env_rot=jnp.zeros(2)),
        CFG, use_pallas=False))
    img1 = np.asarray(render_image(model, rotated, CFG, use_pallas=False))
    np.testing.assert_array_equal(img0, img0b)
    assert np.abs(img1 - img0).max() > 1e-3

    dc = GaussianModel.random(jax.random.PRNGKey(6), 64, sh_degree=0)
    d0 = np.asarray(render_image(dc, base, CFG, use_pallas=False))
    d1 = np.asarray(render_image(
        dc, Camera(base.view, base.proj,
                   env_rot=jnp.array([0.3, 0.7])), CFG, use_pallas=False))
    np.testing.assert_array_equal(d0, d1)
