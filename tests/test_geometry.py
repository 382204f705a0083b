"""Math-layer tests: transforms, covariance, SH.

Mirrors the reference's on-device math assertions (codelets/tests/
codelets.cpp:34-69 GlmMat4/GlmTransform) with numpy dense-matrix oracles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_splat_ipu_tpu.ops import covariance, sh, transforms


def test_look_at_maps_eye_to_origin():
    eye = np.array([1.0, 2.0, 3.0])
    center = np.array([0.0, 0.0, 0.0])
    m = np.asarray(transforms.look_at(eye, center, [0.0, 1.0, 0.0]))
    p = m @ np.append(eye, 1.0)
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-6)
    # The look target lies on the -z axis in view space.
    q = m @ np.array([0.0, 0.0, 0.0, 1.0])
    assert q[2] < 0
    np.testing.assert_allclose(q[:2], 0.0, atol=1e-6)


def test_frustum_matches_gl_reference():
    # glm::frustum(-1, 1, -1, 1, 1, 10) known values.
    m = np.asarray(transforms.frustum(-1, 1, -1, 1, 1, 10))
    expect = np.array([
        [1, 0, 0, 0],
        [0, 1, 0, 0],
        [0, 0, -11 / 9, -20 / 9],
        [0, 0, -1, 0],
    ], np.float32)
    np.testing.assert_allclose(m, expect, rtol=1e-6)


def test_clip_to_screen_center_and_corner():
    # NDC origin -> image centre; no y flip (viewport.hpp:21-35).
    clip = jnp.array([[0.0, 0.0, 0.0, 1.0], [1.0, 1.0, 0.0, 1.0]])
    px = np.asarray(transforms.clip_to_screen(clip, 640, 480))
    np.testing.assert_allclose(px[0], [320, 240], atol=1e-4)
    np.testing.assert_allclose(px[1], [640, 480], atol=1e-4)


def test_transform_points_matches_numpy():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(4, 4)).astype(np.float32)
    pts = rng.normal(size=(17, 3)).astype(np.float32)
    got = np.asarray(transforms.transform_points(jnp.asarray(m),
                                                 jnp.asarray(pts)))
    hom = np.concatenate([pts, np.ones((17, 1), np.float32)], -1)
    np.testing.assert_allclose(got, hom @ m.T, rtol=1e-5, atol=1e-5)


def test_quat_to_rotmat_is_rotation():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    r = np.asarray(transforms.quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_quat_identity():
    r = np.asarray(transforms.quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]])))
    np.testing.assert_allclose(r[0], np.eye(3), atol=1e-7)


def test_covariance_3d_matches_dense():
    rng = np.random.default_rng(2)
    log_s = rng.uniform(-2, 0, size=(8, 3)).astype(np.float32)
    q = rng.normal(size=(8, 4)).astype(np.float32)
    xx, xy, xz, yy, yz, zz = [np.asarray(v) for v in covariance.covariance_3d(
        jnp.asarray(log_s), jnp.asarray(q))]
    r = np.asarray(transforms.quat_to_rotmat(jnp.asarray(q)))
    s = np.exp(log_s)
    for i in range(8):
        sig = r[i] @ np.diag(s[i] ** 2) @ r[i].T
        np.testing.assert_allclose(
            [xx[i], xy[i], xz[i], yy[i], yz[i], zz[i]],
            [sig[0, 0], sig[0, 1], sig[0, 2], sig[1, 1], sig[1, 2],
             sig[2, 2]], rtol=2e-4, atol=1e-5)


def test_ewa_project_matches_dense_jacobian():
    rng = np.random.default_rng(3)
    view = np.asarray(transforms.look_at([0.1, -0.2, 3.0], [0, 0, 0],
                                         [0, 1, 0]))
    log_s = rng.uniform(-3, -1, size=(5, 3)).astype(np.float32)
    q = rng.normal(size=(5, 4)).astype(np.float32)
    means = rng.uniform(-0.3, 0.3, size=(5, 3)).astype(np.float32)
    t_view = (np.concatenate([means, np.ones((5, 1), np.float32)], -1)
              @ view.T)[:, :3]
    fx = fy = 500.0
    cov3d = covariance.covariance_3d(jnp.asarray(log_s), jnp.asarray(q))
    a, b, c = [np.asarray(v) for v in covariance.ewa_project(
        jnp.asarray(t_view), cov3d, jnp.asarray(view), fx, fy, 10.0, 10.0,
        lowpass=0.3)]

    r = np.asarray(transforms.quat_to_rotmat(jnp.asarray(q)))
    s = np.exp(log_s)
    w = view[:3, :3]
    for i in range(5):
        sig = r[i] @ np.diag(s[i] ** 2) @ r[i].T
        tx, ty, tz = t_view[i]
        j = np.array([[fx / tz, 0, -fx * tx / tz ** 2],
                      [0, fy / tz, -fy * ty / tz ** 2]])
        cov2 = j @ w @ sig @ w.T @ j.T + 0.3 * np.eye(2)
        np.testing.assert_allclose([a[i], b[i], c[i]],
                                   [cov2[0, 0], cov2[0, 1], cov2[1, 1]],
                                   rtol=5e-4, atol=1e-4)


def test_conic_inverts_covariance():
    a, b, c = jnp.float32(4.0), jnp.float32(1.0), jnp.float32(2.0)
    ca, cb, cc, valid = covariance.conic(a, b, c)
    m = np.array([[4.0, 1.0], [1.0, 2.0]])
    inv = np.linalg.inv(m)
    assert bool(valid)
    np.testing.assert_allclose([ca, cb, cc],
                               [inv[0, 0], inv[0, 1], inv[1, 1]], rtol=1e-6)


def test_conic_degenerate_flagged_invalid():
    _, _, _, valid = covariance.conic(jnp.float32(1.0), jnp.float32(1.0),
                                      jnp.float32(1.0))
    assert not bool(valid)


def test_splat_radius_isotropic():
    # Isotropic cov sigma^2=4: lambda_max = mid + sqrt(max(0.1, 0)) carries
    # the reference's 0.1 discriminant floor (ipu_geometry.hpp:250-251), so
    # radius = ceil(3*sqrt(4+sqrt(0.1))) = 7.
    r = covariance.splat_radius(jnp.float32(4.0), jnp.float32(0.0),
                                jnp.float32(4.0))
    assert float(r) == np.ceil(3.0 * np.sqrt(4.0 + np.sqrt(0.1)))
    # Anisotropic case away from the floor: exact 3-sigma.
    r2 = covariance.splat_radius(jnp.float32(9.0), jnp.float32(0.0),
                                 jnp.float32(1.0))
    assert float(r2) == 9.0


def test_sh_dc_parity_with_reference():
    f_dc = jnp.array([[0.5, -0.2, 1.4]])
    rgb = np.asarray(sh.dc_to_rgb(f_dc))
    expect = np.maximum(0.28209479177387814 * np.array([0.5, -0.2, 1.4])
                        + 0.5, 0.0)
    np.testing.assert_allclose(rgb[0], expect, rtol=1e-6)
    # eval_sh degree 0 must agree exactly with the DC fast path.
    shc = jnp.zeros((1, 1, 3)).at[0, 0].set(f_dc[0])
    got = np.asarray(sh.eval_sh(shc, jnp.array([[0.0, 0.0, 1.0]]), 0))
    np.testing.assert_allclose(got[0], expect, rtol=1e-6)


def test_sh_higher_degree_runs_and_differs_by_direction():
    rng = np.random.default_rng(4)
    coeffs = jnp.asarray(rng.normal(size=(3, 16, 3)).astype(np.float32))
    d1 = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (3, 1))
    d2 = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (3, 1))
    c1 = np.asarray(sh.eval_sh(coeffs, d1, 3))
    c2 = np.asarray(sh.eval_sh(coeffs, d2, 3))
    assert c1.shape == (3, 3)
    assert not np.allclose(c1, c2)


def test_aa_opacity_compensation():
    from gaussian_splat_ipu_tpu.ops import covariance

    lp = 0.3
    # Huge splat: dilation negligible -> factor ~ 1.
    big = covariance.aa_opacity_compensation(
        jnp.array([100.0 + lp]), jnp.array([0.0]),
        jnp.array([100.0 + lp]), lp)
    assert 0.99 < float(big[0]) <= 1.0
    # Sub-pixel splat (pre-dilation sigma^2 = 0.01): energy conservation
    # sqrt(det0/det1) = 0.01 / sqrt((0.01+0.3)^2) ~ 0.032.
    small = covariance.aa_opacity_compensation(
        jnp.array([0.01 + lp]), jnp.array([0.0]),
        jnp.array([0.01 + lp]), lp)
    np.testing.assert_allclose(float(small[0]), 0.01 / (0.01 + lp),
                               rtol=1e-5)
    # Degenerate pre-dilation covariance clamps to 0, never NaN.
    z = covariance.aa_opacity_compensation(
        jnp.array([lp]), jnp.array([0.0]), jnp.array([lp]), lp)
    assert float(z[0]) == 0.0


@pytest.mark.slow
def test_antialias_fades_subpixel_splats():
    import dataclasses

    from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
    from gaussian_splat_ipu_tpu.models.camera import Camera
    from gaussian_splat_ipu_tpu.render.pipeline import render_image
    from gaussian_splat_ipu_tpu.utils.config import RasterConfig

    # One tiny splat dead ahead: with antialias its dilated footprint
    # must carry LESS total energy than the plain lowpass render.
    model = GaussianModel.create(
        means=np.array([[0.0, 0.0, 0.0]], np.float32),
        log_scales=np.full((1, 3), -6.0, np.float32),   # ~sub-pixel
        quats=np.array([[1.0, 0, 0, 0]], np.float32),
        opacities=np.array([4.0], np.float32),
        f_dc=np.array([[1.0, 1.0, 1.0]], np.float32))
    cam = Camera.look_at([0.0, 0.0, 3.0], [0.0, 0.0, 0.0],
                         [0.0, 1.0, 0.0], np.radians(50.0), 1.0)
    cfg = RasterConfig(image_width=64, image_height=64,
                       pair_capacity=1 << 10)
    plain = np.asarray(render_image(model, cam, cfg, use_pallas=False))
    aa = np.asarray(render_image(
        model, cam, dataclasses.replace(cfg, antialias=True),
        use_pallas=False))
    assert plain[..., 3].sum() > 0.0
    assert aa[..., 3].sum() < 0.25 * plain[..., 3].sum()

    # Oracle consistency is automatic (opacity computed in projection):
    from gaussian_splat_ipu_tpu.render.oracle import render_oracle
    cfg_aa = dataclasses.replace(cfg, antialias=True)
    ref = np.asarray(render_oracle(model, cam, cfg_aa))
    np.testing.assert_allclose(aa, ref, atol=1e-6)
