"""Geometry-layer tests: ray generation, NDC, grad_rescale, 2D warps.

Conventions under test are the reference's (camera.py:231-340, warp.py,
util.py:235-239); each test checks against an independent closed-form or
torch-autograd computation, not against our own implementation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from joint_tensorf_tpu.geometry import ndc as ndc_lib
from joint_tensorf_tpu.geometry import rays as rays_lib
from joint_tensorf_tpu.geometry import warp2d


def _random_pose(rng, batch=2):
    """Random [B,3,4] world->cam with orthonormal R."""
    A = rng.standard_normal((batch, 3, 3))
    Q = np.stack([np.linalg.qr(a)[0] for a in A])
    det = np.linalg.det(Q)
    Q[:, :, 0] *= det[:, None]  # proper rotations
    t = rng.standard_normal((batch, 3, 1)) * 0.3
    return np.concatenate([Q, t], axis=-1).astype(np.float32)


def _intr(f, cx, cy, batch=2):
    K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], dtype=np.float32)
    return np.broadcast_to(K, (batch, 3, 3)).copy()


def test_pixel_grid_centers():
    g = np.asarray(rays_lib.pixel_grid(2, 3))
    # row-major over (y, x); +0.5 pixel centers (camera.py:234)
    assert np.allclose(g[0], [0.5, 0.5])
    assert np.allclose(g[1], [1.5, 0.5])
    assert np.allclose(g[3], [0.5, 1.5])


def test_get_center_and_ray_matches_closed_form():
    rng = np.random.default_rng(0)
    H, W = 4, 5
    pose = _random_pose(rng)
    K = _intr(3.0, W / 2, H / 2)
    K_inv = np.linalg.inv(K)

    centers, dirs = rays_lib.get_center_and_ray(H, W, jnp.asarray(pose),
                                                jnp.asarray(K_inv))
    centers, dirs = np.asarray(centers), np.asarray(dirs)

    R, t = pose[..., :3], pose[..., 3]
    # camera center: -R^T t, broadcast over rays
    c_ref = -np.einsum("bij,bi->bj", R, t)
    assert np.allclose(centers, c_ref[:, None, :], atol=1e-6)

    # ray through pixel (x=1, y=2) => grid index n = 2*W + 1
    n = 2 * W + 1
    pix = np.array([1.5, 2.5, 1.0], dtype=np.float32)
    d_ref = np.einsum("bij,i->bj", R, K_inv[0] @ pix)  # R^T (K^-1 p)
    assert np.allclose(dirs[:, n], d_ref, atol=1e-6)


def test_ray_idx_subsetting():
    rng = np.random.default_rng(1)
    H, W = 6, 6
    pose = _random_pose(rng, batch=1)
    K_inv = np.linalg.inv(_intr(2.0, 3.0, 3.0, batch=1))
    idx = jnp.asarray([0, 7, 35])
    c_all, d_all = rays_lib.get_center_and_ray(H, W, jnp.asarray(pose),
                                               jnp.asarray(K_inv))
    c_sub, d_sub = rays_lib.get_center_and_ray(H, W, jnp.asarray(pose),
                                               jnp.asarray(K_inv), ray_idx=idx)
    assert np.allclose(np.asarray(d_all)[:, np.asarray(idx)], d_sub)
    assert np.allclose(np.asarray(c_sub), np.asarray(c_all)[:, :3])


def test_pose_gradient_flows_pixel_grid_does_not():
    """camera.py:234/248-253: grid is no-grad, pose stays differentiable."""
    rng = np.random.default_rng(2)
    pose = jnp.asarray(_random_pose(rng, batch=1))
    K_inv = jnp.asarray(np.linalg.inv(_intr(2.0, 2.0, 2.0, batch=1)))

    def f(p):
        c, d = rays_lib.get_center_and_ray(4, 4, p, K_inv)
        return jnp.sum(c * d)

    g = jax.grad(f)(pose)
    assert np.abs(np.asarray(g)).max() > 0
    assert np.isfinite(np.asarray(g)).all()


def test_convert_ndc_depth_range():
    """After the near-plane origin shift, s=0 maps to z=-1 and s=1 (the
    point at infinity) to z=+1 (camera.py:303-340, +z convention)."""
    rng = np.random.default_rng(3)
    B, N, near = 2, 8, 1.0
    center = np.concatenate(
        [rng.standard_normal((B, N, 2)) * 0.1,
         rng.uniform(0.2, 0.8, (B, N, 1))], -1).astype(np.float32)
    ray = np.concatenate(
        [rng.standard_normal((B, N, 2)) * 0.2,
         rng.uniform(0.5, 2.0, (B, N, 1))], -1).astype(np.float32)
    K = _intr(400.0, 200.0, 150.0)

    c_ndc, r_ndc = ndc_lib.convert_ndc(jnp.asarray(center), jnp.asarray(ray),
                                       jnp.asarray(K), near=near)
    c_ndc, r_ndc = np.asarray(c_ndc), np.asarray(r_ndc)
    assert np.allclose(c_ndc[..., 2], -1.0, atol=1e-5)          # s=0
    assert np.allclose(c_ndc[..., 2] + r_ndc[..., 2], 1.0, atol=1e-5)  # s=1

    # x/y at s=1 equal the projected direction (the vanishing point)
    sx = K[:, 0, 0] / K[:, 0, 2]
    vx = sx[:, None] * ray[..., 0] / ray[..., 2]
    assert np.allclose(c_ndc[..., 0] + r_ndc[..., 0], vx, atol=1e-4)


def test_grad_rescale_matches_torch_reference():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(4)
    src = rng.standard_normal(32).astype(np.float32)
    tgt = rng.standard_normal(32).astype(np.float32) * 3.0

    def torch_grad():
        s = torch.tensor(src, requires_grad=True)
        t = torch.tensor(tgt)
        w = torch.abs(t) / torch.clamp(torch.abs(s), min=0.1)
        scaled = s * w
        out = scaled + (s - scaled).detach()
        out.sum().backward()
        return out.detach().numpy(), s.grad.numpy()

    out_ref, g_ref = torch_grad()
    out = ndc_lib.grad_rescale(jnp.asarray(src), jnp.asarray(tgt))
    g = jax.grad(lambda s: jnp.sum(ndc_lib.grad_rescale(s, jnp.asarray(tgt))))(
        jnp.asarray(src))
    assert np.allclose(np.asarray(out), src, atol=1e-6)      # forward = source
    assert np.allclose(np.asarray(out), out_ref, atol=1e-6)
    assert np.allclose(np.asarray(g), g_ref, atol=1e-5)


# ------------------------------------------------------------------ 2D warps
def test_se2_matches_closed_form():
    delta = jnp.asarray([[0.3, -0.2, 0.7]], dtype=jnp.float32)
    M = np.asarray(warp2d.se2_to_SE2(delta))[0]
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    V = np.array([[np.sin(th) / th, -(1 - np.cos(th)) / th],
                  [(1 - np.cos(th)) / th, np.sin(th) / th]])
    assert np.allclose(M[:, :2], R, atol=1e-6)
    assert np.allclose(M[:, 2], V @ np.array([0.3, -0.2]), atol=1e-6)


def test_sl3_is_unimodular():
    rng = np.random.default_rng(5)
    h = jnp.asarray(rng.standard_normal((3, 8)) * 0.2, dtype=jnp.float32)
    M = np.asarray(warp2d.sl3_to_SL3(h))
    assert np.allclose(np.linalg.det(M), 1.0, atol=1e-4)
    # zero params -> identity homography
    I = np.asarray(warp2d.sl3_to_SL3(jnp.zeros((1, 8))))
    assert np.allclose(I[0], np.eye(3), atol=1e-6)


def test_warp_grid_identity_and_translation():
    grid = warp2d.normalized_pixel_grid(8, 8)[None]
    out = warp2d.warp_grid(grid, jnp.zeros((1, 8)), "homography")
    assert np.allclose(np.asarray(out), np.asarray(grid), atol=1e-5)
    out_t = warp2d.warp_grid(grid, jnp.asarray([[0.1, -0.2]]), "translation")
    assert np.allclose(np.asarray(out_t - grid),
                       np.broadcast_to([0.1, -0.2], out_t.shape), atol=1e-6)


def test_corner_range_check():
    # identity warp on a center crop stays in range; a huge shift does not
    assert warp2d.check_corners_in_range(jnp.zeros((1, 3)), "rigid",
                                         64, 64, 32, 32)
    big = jnp.asarray([[5.0, 5.0, 0.0]])
    assert not warp2d.check_corners_in_range(big, "rigid", 64, 64, 32, 32)
