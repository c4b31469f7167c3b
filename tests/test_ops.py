import jax
import jax.numpy as jnp
import numpy as np
import pytest

from joint_tensorf_tpu.ops import blur, composite, kernels, resample, sampling, sobel


# ---------------------------------------------------------------- kernels
def test_gaussian_kernel_impulse_at_zero():
    k = np.asarray(kernels.gaussian_kernel(0.0, 64))
    assert k.shape == (65,)
    assert k[32] == 1.0  # clamped peak
    assert k[:32].max() < 1e-6


def test_gaussian_kernel_matches_formula():
    k = np.asarray(kernels.gaussian_kernel(3.0, 25))
    ns = np.arange(-12, 13)
    ref = np.minimum(1.0, np.exp(-0.5 * (ns / 3.0) ** 2) / (3.0 * np.sqrt(2 * np.pi)))
    np.testing.assert_allclose(k, ref, atol=1e-6)


def test_average_kernel():
    k = np.asarray(kernels.average_kernel(2.0, 9))
    ref = np.zeros(9)
    ref[4 - 2:4 + 3] = 1 / 5
    np.testing.assert_allclose(k, ref, atol=1e-6)
    # impulse at 0
    k0 = np.asarray(kernels.average_kernel(0.0, 9))
    assert k0[4] == 1.0 and k0.sum() == 1.0


def test_batch_gaussian_kernel():
    k = np.asarray(kernels.batch_gaussian_kernel(jnp.array([1.0, 2.0]), 11))
    assert k.shape == (2, 11)
    np.testing.assert_allclose(k[0], np.asarray(kernels.gaussian_kernel(1.0, 11)))


# ---------------------------------------------------------------- blur
def _conv1d_replicate(sig, kernel):
    """Direct numpy replicate-pad convolution (the reference's conv semantics)."""
    half = len(kernel) // 2
    padded = np.pad(sig, (half, half), mode="edge")
    # torch conv1d is cross-correlation; the kernel is symmetric anyway
    return np.array(
        [np.dot(padded[i:i + len(kernel)], kernel) for i in range(len(sig))]
    )


def test_blur_matrix_matches_direct_convolution():
    rng = np.random.default_rng(0)
    sig = rng.standard_normal(37).astype(np.float32)
    k = np.asarray(kernels.gaussian_kernel(2.5, 15))
    B = np.asarray(blur.blur_matrix(jnp.asarray(k), 37))
    ours = B @ sig
    ref = _conv1d_replicate(sig, k)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_blur_matrix_impulse_is_identity():
    k = kernels.gaussian_kernel(0.0, 31)
    B = np.asarray(blur.blur_matrix(k, 20))
    np.testing.assert_allclose(B, np.eye(20), atol=1e-6)


def test_blur_plane_matches_torch_grouped_conv():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    H, W, R = 19, 23, 4
    plane = rng.standard_normal((H, W, R)).astype(np.float32)
    k = np.asarray(kernels.gaussian_kernel(1.7, 9))

    B_h = blur.blur_matrix(jnp.asarray(k), H)
    B_w = blur.blur_matrix(jnp.asarray(k), W)
    ours = np.asarray(blur.blur_plane(jnp.asarray(plane), B_h, B_w))

    # reference-style separable grouped conv (bateRF.py:21-39)
    p = torch.tensor(plane).permute(2, 0, 1)  # [R,H,W]
    kt = torch.tensor(k).view(1, 1, -1)
    pad = (len(k) // 2, len(k) // 2)
    x = F.pad(p, pad, mode="replicate")
    x = F.conv1d(x, kt.expand(H, 1, -1), groups=H)
    x = x.permute(0, 2, 1)
    x = F.pad(x, pad, mode="replicate")
    x = F.conv1d(x, kt.expand(W, 1, -1), groups=W)
    ref = x.permute(0, 2, 1).permute(1, 2, 0).numpy()  # back to [H,W,R]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


# ---------------------------------------------------------------- resample
def test_resize_matches_torch_align_corners():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    plane = rng.standard_normal((13, 17, 3)).astype(np.float32)
    ours = np.asarray(resample.resize_plane(jnp.asarray(plane), 29, 31))
    t = torch.tensor(plane).permute(2, 0, 1)[None]  # [1,3,H,W]
    ref = F.interpolate(t, size=(29, 31), mode="bilinear", align_corners=True)
    ref = ref[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    line = rng.standard_normal((11, 3)).astype(np.float32)
    ours_l = np.asarray(resample.resize_line(jnp.asarray(line), 23))
    t = torch.tensor(line).permute(1, 0)[None, :, :, None]  # [1,3,D,1]
    ref_l = F.interpolate(t, size=(23, 1), mode="bilinear", align_corners=True)
    ref_l = ref_l[0, :, :, 0].permute(1, 0).numpy()
    np.testing.assert_allclose(ours_l, ref_l, atol=1e-5)


# ---------------------------------------------------------------- sampling
def test_sample_plane_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    H, W, R = 11, 13, 5
    plane = rng.standard_normal((H, W, R)).astype(np.float32)
    N = 200
    u = rng.uniform(-0.99, 0.99, N).astype(np.float32)
    v = rng.uniform(-0.99, 0.99, N).astype(np.float32)

    ours = np.asarray(sampling.sample_plane(jnp.asarray(plane), jnp.asarray(u),
                                            jnp.asarray(v)))
    t = torch.tensor(plane).permute(2, 0, 1)[None]  # [1,R,H,W]
    grid = torch.tensor(np.stack([u, v], -1)).view(1, N, 1, 2)
    ref = F.grid_sample(t, grid, align_corners=True)[0, :, :, 0].T.numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sample_line_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(4)
    D, R = 17, 4
    line = rng.standard_normal((D, R)).astype(np.float32)
    N = 100
    w = rng.uniform(-0.99, 0.99, N).astype(np.float32)
    ours = np.asarray(sampling.sample_line(jnp.asarray(line), jnp.asarray(w)))
    t = torch.tensor(line).permute(1, 0)[None, :, :, None]  # [1,R,D,1]
    grid = torch.tensor(np.stack([np.zeros_like(w), w], -1)).view(1, N, 1, 2)
    ref = F.grid_sample(t, grid, align_corners=True)[0, :, :, 0].T.numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sample_plane_coordinate_gradients():
    # pose gradients flow through the bilinear coordinate derivative
    plane = jnp.arange(12.0).reshape(3, 4, 1)  # gradient along W is constant 1
    def f(u):
        return sampling.sample_plane(plane, u[None], jnp.zeros(1))[0, 0]
    g = jax.grad(f)(jnp.asarray(0.1))
    # d pix/d u = (W-1)/2 = 1.5; feature step along W is 1.0
    np.testing.assert_allclose(float(g), 1.5, atol=1e-5)


def test_sample_grid3d_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(5)
    X, Y, Z = 7, 9, 11
    grid = rng.standard_normal((X, Y, Z)).astype(np.float32)
    N = 64
    xyz = rng.uniform(-0.95, 0.95, (N, 3)).astype(np.float32)
    ours = np.asarray(sampling.sample_grid3d(jnp.asarray(grid), jnp.asarray(xyz)))
    # torch: volume [1,1,D,H,W] with D=Z... grid_sample coords (x,y,z) index (W,H,D)
    vol = torch.tensor(grid).permute(2, 1, 0)[None, None]  # [1,1,Z,Y,X]
    g = torch.tensor(xyz).view(1, N, 1, 1, 3)
    ref = F.grid_sample(vol, g, align_corners=True).view(N).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


# ---------------------------------------------------------------- composite
def test_raw2alpha_matches_reference_formula():
    rng = np.random.default_rng(6)
    sigma = jnp.asarray(rng.uniform(0, 3, (4, 7)).astype(np.float32))
    dists = jnp.asarray(rng.uniform(0.01, 0.1, (4, 7)).astype(np.float32))
    alpha, weights, bg = composite.raw2alpha(sigma, dists)

    a = 1 - np.exp(-np.asarray(sigma) * np.asarray(dists))
    T = np.cumprod(np.concatenate([np.ones((4, 1)), 1 - a + 1e-10], -1), -1)
    np.testing.assert_allclose(np.asarray(alpha), a, atol=3e-5)
    np.testing.assert_allclose(np.asarray(weights), a * T[:, :-1], atol=3e-5)
    np.testing.assert_allclose(np.asarray(bg), T[:, -1:], atol=3e-5)
    # weights + bg sum to 1
    total = np.asarray(weights).sum(-1) + np.asarray(bg)[:, 0]
    np.testing.assert_allclose(total, 1.0, atol=1e-5)


# ---------------------------------------------------------------- sobel
def test_sobel_edge_mask():
    img = np.zeros((1, 3, 16, 16), dtype=np.float32)
    img[:, :, :, 8:] = 1.0  # vertical edge
    mask = np.asarray(sobel.hard_edge_mask(jnp.asarray(img))).reshape(16, 16)
    assert mask[:, 7:9].all()           # edge columns are marked
    assert not mask[:, :6].any() and not mask[:, 10:].any()


def test_packed_sampling_matches_naive():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from joint_tensorf_tpu.ops.sampling import (
        sample_line, sample_line_packed, sample_plane, sample_plane_packed)

    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    plane = jax.random.normal(k1, (37, 53, 16))
    line = jax.random.normal(k2, (41, 16))
    u = jax.random.uniform(k3, (500,), minval=-1.3, maxval=1.3)
    v = jax.random.uniform(k4, (500,), minval=-1.3, maxval=1.3)
    np.testing.assert_array_equal(np.asarray(sample_plane_packed(plane, u, v)),
                                  np.asarray(sample_plane(plane, u, v)))
    np.testing.assert_array_equal(np.asarray(sample_line_packed(line, u)),
                                  np.asarray(sample_line(line, u)))

    # gradients agree (field + coords)
    g = jax.random.normal(key, (500, 16))

    def loss(fn, p, uu, vv):
        return jnp.sum(fn(p, uu, vv) * g)

    for fn_pair in [(sample_plane, sample_plane_packed)]:
        d_ref = jax.grad(lambda p, uu, vv: loss(fn_pair[0], p, uu, vv),
                         argnums=(0, 1, 2))(plane, u, v)
        d_new = jax.grad(lambda p, uu, vv: loss(fn_pair[1], p, uu, vv),
                         argnums=(0, 1, 2))(plane, u, v)
        for a, b in zip(d_new, d_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


def test_planeline_prod_matches_naive():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from joint_tensorf_tpu.ops.sampling import (
        sample_line, sample_plane, sample_planeline_prod)

    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 6)
    plane = jax.random.normal(ks[0], (29, 41, 12))
    line = jax.random.normal(ks[1], (23, 12))
    u = jax.random.uniform(ks[2], (700,), minval=-1.2, maxval=1.2)
    v = jax.random.uniform(ks[3], (700,), minval=-1.2, maxval=1.2)
    w = jax.random.uniform(ks[4], (700,), minval=-1.2, maxval=1.2)
    g = jax.random.normal(ks[5], (700, 12))

    def naive(p, l, uu, vv, ww):
        return sample_plane(p, uu, vv) * sample_line(l, ww)

    np.testing.assert_allclose(
        np.asarray(sample_planeline_prod(plane, line, u, v, w)),
        np.asarray(naive(plane, line, u, v, w)), rtol=1e-6, atol=1e-6)

    def loss(fn, *a):
        return jnp.sum(fn(*a) * g)

    d_ref = jax.grad(lambda *a: loss(naive, *a),
                     argnums=(0, 1, 2, 3, 4))(plane, line, u, v, w)
    d_new = jax.grad(lambda *a: loss(sample_planeline_prod, *a),
                     argnums=(0, 1, 2, 3, 4))(plane, line, u, v, w)
    for a, b in zip(d_new, d_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_discrete_gaussian_kernel():
    """Exact discrete Gaussian exp(-t)*I_n(t) (reference kernels.py:6-14):
    impulse at t=0, unit mass, symmetric."""
    import numpy as np

    from joint_tensorf_tpu.ops.kernels import discrete_gaussian_kernel

    k0 = np.asarray(discrete_gaussian_kernel(0.0, 9))
    np.testing.assert_allclose(k0, np.eye(9)[4], atol=1e-7)
    k = np.asarray(discrete_gaussian_kernel(2.0, 65))
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-6)
    np.testing.assert_allclose(k, k[::-1], atol=1e-7)


def test_exclusive_cumprod_analytic_vjp_matches_autodiff():
    """ops/composite.exclusive_cumprod: values equal the cumprod
    formulation and its analytic VJP equals autodiff, including saturated
    rays (one_minus -> 1e-10) and fully transparent rays."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from joint_tensorf_tpu.ops import composite as C

    rng = np.random.default_rng(0)
    alpha = rng.random((16, 64)).astype(np.float32)
    alpha[0] = 0.9999999     # near-saturated
    alpha[1] = 0.0           # transparent
    alpha[2] = 1.0           # EXACTLY saturated: one_minus == 1e-10
    alpha[3, ::3] = 1.0      # repeated exact saturation (T underflows to 0)
    om = jnp.asarray(1.0 - alpha + 1e-10)

    def ref(om):
        T = jnp.cumprod(om, axis=-1)
        return jnp.concatenate([jnp.ones_like(T[:, :1]), T[:, :-1]], -1)

    np.testing.assert_allclose(np.asarray(C.exclusive_cumprod(om)),
                               np.asarray(ref(om)), rtol=1e-6, atol=1e-7)

    d_out = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    g_ref = jax.grad(lambda x: jnp.sum(ref(x) * d_out))(om)
    g_new = jax.grad(lambda x: jnp.sum(C.exclusive_cumprod(x) * d_out))(om)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)
