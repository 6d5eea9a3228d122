"""Finite-difference gradient checks (SURVEY §4 item 3).

An independent ground truth for the end-to-end pose gradient: central
differences of the rendering loss vs ``jax.grad``, per renderer, at a
generic pose (away from grid-aligned kinks, where the subgradient choice
is arbitrary — CLAUDE.md). Complements the autodiff-vs-analytic kernel
parity and the torch-reference parity suites with a derivative-free check.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct


@pytest.fixture(scope="module")
def subject():
    return load_example_ct(shape=(32, 32, 16))


ROT0 = np.array([0.021, np.pi / 2 + 0.033, -0.017], np.float32)
TRANS0 = np.array([2.3, 301.0, -1.7], np.float32)


def _loss_fn(drr, **kw):
    def loss(rot, trans):
        img = drr(rot[None], trans[None], parameterization="euler_angles",
                  convention="ZXY", **kw)
        return jnp.mean(img ** 2)

    return loss


def _central_diff(f, x, i, h):
    e = np.zeros_like(x)
    e[i] = h
    return (float(f(jnp.asarray(x + e))) - float(f(jnp.asarray(x - e)))) / (
        2.0 * h)


@pytest.mark.parametrize("renderer,kw", [
    ("siddon", {}),
    ("trilinear", {"n_points": 128}),
    ("joseph", {}),
])
def test_pose_gradient_matches_finite_differences(subject, renderer, kw):
    drr = DRR(subject, sdd=600.0, height=16, delx=4.0, renderer=renderer)
    loss = _loss_fn(drr, **kw)
    rot = jnp.asarray(ROT0)
    trans = jnp.asarray(TRANS0)
    g_rot, g_trans = jax.grad(loss, argnums=(0, 1))(rot, trans)
    g_rot, g_trans = np.asarray(g_rot), np.asarray(g_trans)

    # Steps must stay SMALL: the loss is only piecewise smooth (tent-weight
    # kinks, slab boundaries), and at h ~ 1e-3 rad the difference quotient
    # straddles real curvature (measured: FD converges to jax.grad within
    # 0.2-0.7% at h = 1e-4..3e-4, then departs by 2x at h = 3e-3).
    fd_rot = np.array([
        _central_diff(lambda r: loss(r, trans), ROT0, i, 3e-4)
        for i in range(3)
    ])
    fd_trans = np.array([
        _central_diff(lambda t: loss(rot, t), TRANS0, i, 3e-3)
        for i in range(3)
    ])
    # f32 FD noise floor: scale tolerances by the gradient magnitude.
    np.testing.assert_allclose(
        g_rot, fd_rot, rtol=5e-2, atol=5e-3 * max(np.abs(fd_rot).max(), 1.0))
    np.testing.assert_allclose(
        g_trans, fd_trans, rtol=5e-2,
        atol=5e-3 * max(np.abs(fd_trans).max(), 1e-3))


def test_density_gradient_matches_finite_differences(subject):
    """Reconstruction seam: d(loss)/d(density) at a few random voxels."""
    from diffdrr_tpu.pose import convert

    drr = DRR(subject, sdd=600.0, height=12, delx=5.0, renderer="trilinear")
    pose = convert(jnp.asarray(ROT0)[None], jnp.asarray(TRANS0)[None],
                   parameterization="euler_angles", convention="ZXY")
    source, target = drr.detector(pose, None)

    def loss(density):
        return jnp.mean(drr.render(density, source, target, n_points=64) ** 2)

    g = np.asarray(jax.grad(loss)(drr.density))
    rng = np.random.default_rng(0)
    # Check the highest-|gradient| voxels (clear signal over the FD noise).
    flat = np.argsort(np.abs(g).ravel())[-5:]
    base = np.asarray(drr.density)
    h = 1e-2
    for idx in flat:
        iii = np.unravel_index(idx, g.shape)
        d_plus = base.copy()
        d_plus[iii] += h
        d_minus = base.copy()
        d_minus[iii] -= h
        fd = (float(loss(jnp.asarray(d_plus)))
              - float(loss(jnp.asarray(d_minus)))) / (2 * h)
        np.testing.assert_allclose(g[iii], fd, rtol=5e-2,
                                   atol=2e-2 * abs(fd) + 1e-7)
