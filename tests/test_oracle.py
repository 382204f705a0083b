"""Oracle renderer semantics tests.

Validates the exact front-to-back blend semantics of the reference device
loop (codelets/splat/codelets.cpp:358-421) on hand-analysable scenes.
"""

import numpy as np
import jax.numpy as jnp

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.ops import transforms
from gaussian_splat_ipu_tpu.render.oracle import render_oracle
from gaussian_splat_ipu_tpu.utils.config import RasterConfig

import pytest

CFG = RasterConfig(image_width=64, image_height=64)


def simple_camera(width=64, height=64):
    view = transforms.look_at([0.0, 0.0, 5.0], [0.0, 0.0, 0.0],
                              [0.0, 1.0, 0.0])
    proj = transforms.perspective(np.radians(45.0), width / height, 0.1,
                                  100.0)
    return Camera(view, proj)


def single_gaussian(pos=(0.0, 0.0, 0.0), color=(1.0, 0.0, 0.0),
                    opacity=8.0, log_scale=-1.5):
    f_dc = (np.array(color, np.float32) - 0.5) / 0.28209479177387814
    return GaussianModel.create(
        means=np.array([pos], np.float32),
        log_scales=np.full((1, 3), log_scale, np.float32),
        quats=np.array([[1.0, 0, 0, 0]], np.float32),
        opacities=np.array([opacity], np.float32),
        f_dc=f_dc[None, :])


def merge(*models):
    return GaussianModel(
        means=jnp.concatenate([m.means for m in models]),
        log_scales=jnp.concatenate([m.log_scales for m in models]),
        quats=jnp.concatenate([m.quats for m in models]),
        opacities=jnp.concatenate([m.opacities for m in models]),
        sh=jnp.concatenate([m.sh for m in models]))


def test_single_gaussian_peaks_at_centre():
    img = np.asarray(render_oracle(single_gaussian(), simple_camera(), CFG))
    assert img.shape == (64, 64, 4)
    alpha = img[..., 3]
    # Peak at the projected centre (image centre for an on-axis gaussian).
    iy, ix = np.unravel_index(alpha.argmax(), alpha.shape)
    assert abs(ix - 32) <= 1 and abs(iy - 32) <= 1
    # Red gaussian on black background.
    assert img[iy, ix, 0] > 0.9
    assert img[iy, ix, 1] < 0.05
    # Falls off radially.
    assert alpha[0, 0] < alpha[iy, ix] * 0.1


@pytest.mark.slow
def test_depth_order_front_wins():
    near = single_gaussian((0.0, 0.0, 1.0), color=(0.0, 1.0, 0.0),
                           opacity=10.0, log_scale=-1.0)
    far = single_gaussian((0.0, 0.0, -1.0), color=(1.0, 0.0, 0.0),
                          opacity=10.0, log_scale=-1.0)
    # Order in the array must not matter: depth sort decides.
    img1 = np.asarray(render_oracle(merge(near, far), simple_camera(), CFG))
    img2 = np.asarray(render_oracle(merge(far, near), simple_camera(), CFG))
    np.testing.assert_allclose(img1, img2, atol=1e-6)
    centre = img1[32, 32]
    assert centre[1] > 0.9  # green (near) occludes
    assert centre[0] < 0.1


def test_alpha_saturation_early_out():
    # A near-opaque gaussian in front: transmittance collapses and the back
    # gaussian contributes ~nothing (codelets.cpp:405-408 break).
    g = single_gaussian((0.0, 0.0, 1.0), color=(0.0, 0.0, 1.0), opacity=30.0,
                        log_scale=-0.5)
    back = single_gaussian((0.0, 0.0, -2.0), color=(1.0, 0.0, 0.0),
                           opacity=30.0, log_scale=-0.5)
    img = np.asarray(render_oracle(merge(g, back), simple_camera(), CFG))
    assert img[32, 32, 2] > 0.98
    assert img[32, 32, 0] < 0.01


def test_background_composited():
    cfg = RasterConfig(image_width=32, image_height=32,
                       background=(0.2, 0.4, 0.6))
    img = np.asarray(render_oracle(
        single_gaussian(log_scale=-3.0), simple_camera(32, 32), cfg))
    # Far corner is pure background.
    np.testing.assert_allclose(img[0, 0, :3], [0.2, 0.4, 0.6], atol=1e-3)


def test_behind_camera_culled():
    g = single_gaussian((0.0, 0.0, 50.0))  # behind the camera at z=+5
    img = np.asarray(render_oracle(g, simple_camera(), CFG))
    np.testing.assert_allclose(img[..., 3], 0.0, atol=1e-6)
