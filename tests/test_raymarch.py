"""Pallas trilinear ray-march kernel tests (interpret mode on CPU).

Covers the fractional-stride (plane-pair lerp) kernel mode and its routing:
the production ``trilinear`` renderer on TPU (ops/pallas/raymarch.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from functools import partial

from diffdrr_tpu import DRR, load_example_ct, convert
from diffdrr_tpu.ops.joseph import joseph_raycast, choose_march_axis
from diffdrr_tpu.ops.siddon import siddon_raycast
from diffdrr_tpu.ops.trilinear import trilinear_raycast
from diffdrr_tpu.ops.pallas.raymarch import raymarch_pallas_raycast


@pytest.fixture(scope="module")
def scene():
    subject = load_example_ct(shape=(64, 64, 32))
    drr = DRR(subject, sdd=800.0, height=32, delx=2.0)
    rot = jnp.array([[0.013, np.pi / 2 + 0.017, -0.011]], jnp.float32)
    trans = jnp.array([[3.0, 401.0, -2.0]], jnp.float32)
    pose = convert(rot, trans, parameterization="euler_angles", convention="ZXY")
    source, target = drr.detector(pose, None)
    weights = jnp.linalg.norm(target - source, axis=-1)[:, None, :]
    sv, tv = drr.affine_inverse(source), drr.affine_inverse(target)
    ax = choose_march_axis(np.asarray(sv), np.asarray(tv))
    return drr, sv, tv, weights, ax


def _pallas(ax, n_points, **kw):
    return partial(
        raymarch_pallas_raycast, image_shape=(32, 32), axis=ax,
        n_points=n_points, tile=16, ky=64, zw=256, interpret=True, **kw,
    )


def test_fractional_stride_matches_xla_oracle(scene):
    """Blend-mode kernel == XLA joseph_raycast at the same fractional h."""
    drr, sv, tv, weights, ax = scene
    X = drr.density.shape[ax]
    n_points = X // 2 + 3  # fractional h > 1
    h = (X - 1) / (n_points - 1)
    ref = np.asarray(joseph_raycast(
        drr.density, sv, tv, weights, axis=ax, step=h, n_steps=n_points))
    got = np.asarray(_pallas(ax, n_points)(drr.density, sv, tv, weights))
    np.testing.assert_allclose(got, ref, atol=2e-3 * np.abs(ref).max())


def test_oversample_cap_and_escape(scene):
    """n_points > X is capped at one sample per plane by default; the
    allow_oversample escape honors it literally (h < 1)."""
    drr, sv, tv, weights, ax = scene
    X = drr.density.shape[ax]
    capped = np.asarray(_pallas(ax, 4 * X)(drr.density, sv, tv, weights))
    at_cap = np.asarray(_pallas(ax, X)(drr.density, sv, tv, weights))
    np.testing.assert_allclose(capped, at_cap, atol=1e-6)

    n_over = X + X // 2
    h = (X - 1) / (n_over - 1)
    ref = np.asarray(joseph_raycast(
        drr.density, sv, tv, weights, axis=ax, step=h, n_steps=n_over))
    got = np.asarray(
        _pallas(ax, n_over, allow_oversample=True)(drr.density, sv, tv, weights)
    )
    np.testing.assert_allclose(got, ref, atol=2e-3 * np.abs(ref).max())


def test_gradients_match_xla_autodiff(scene):
    drr, sv, tv, weights, ax = scene
    X = drr.density.shape[ax]
    n_points = X // 2 + 3
    h = (X - 1) / (n_points - 1)
    reffn = partial(joseph_raycast, axis=ax, step=h, n_steps=n_points)
    palfn = _pallas(ax, n_points)

    def loss(fn, vol, s, t, w):
        return jnp.sum(jnp.sin(fn(vol, s, t, w) * 0.1))

    for argnum in range(4):
        g_ref = jax.grad(partial(loss, reffn), argnums=argnum)(
            drr.density, sv, tv, weights
        )
        g_got = jax.grad(partial(loss, palfn), argnums=argnum)(
            drr.density, sv, tv, weights
        )
        g_ref, g_got = np.asarray(g_ref), np.asarray(g_got)
        np.testing.assert_allclose(
            g_got, g_ref, atol=2e-3 * (np.abs(g_ref).max() + 1e-9)
        ), argnum


def test_plane_aligned_quality_not_worse_than_reference_placement(scene):
    """At equal sample count, plane-aligned placement approximates the exact
    (Siddon) integral at least as well as the reference's global-alpha
    equispaced placement — evidence for the documented sampling deviation."""
    drr, sv, tv, weights, ax = scene
    X = drr.density.shape[ax]
    exact = np.asarray(siddon_raycast(drr.density, sv, tv, weights))
    n_points = X  # equal budget for both placements
    ref_style = np.asarray(trilinear_raycast(
        drr.density, sv, tv, weights, n_points=n_points))
    h = (X - 1) / (n_points - 1)
    ours = np.asarray(joseph_raycast(
        drr.density, sv, tv, weights, axis=ax, step=h, n_steps=n_points))
    scale = np.abs(exact).max()
    err_ref = np.abs(ref_style - exact).mean() / scale
    err_ours = np.abs(ours - exact).mean() / scale
    assert err_ours <= err_ref * 1.05, (err_ours, err_ref)


def test_nonuniform_tile_padding_neutral():
    """Detectors not divisible by the kernel tile render correctly (edge
    tiles contain padding rays, which must not clip the window placement)."""
    subject = load_example_ct(shape=(64, 64, 32))
    drr = DRR(subject, sdd=800.0, height=24, delx=2.5)  # 24 % 16 != 0
    rot = jnp.array([[0.01, np.pi / 2 - 0.02, 0.015]], jnp.float32)
    trans = jnp.array([[1.0, 399.0, -4.0]], jnp.float32)
    pose = convert(rot, trans, parameterization="euler_angles", convention="ZXY")
    source, target = drr.detector(pose, None)
    weights = jnp.linalg.norm(target - source, axis=-1)[:, None, :]
    sv, tv = drr.affine_inverse(source), drr.affine_inverse(target)
    ax = choose_march_axis(np.asarray(sv), np.asarray(tv))
    X = drr.density.shape[ax]
    ref = np.asarray(joseph_raycast(
        drr.density, sv, tv, weights, axis=ax, step=1.0, n_steps=X))
    got = np.asarray(partial(
        raymarch_pallas_raycast, image_shape=(24, 24), axis=ax, n_points=X,
        tile=16, ky=64, zw=256, interpret=True,
    )(drr.density, sv, tv, weights))
    np.testing.assert_allclose(got, ref, atol=2e-3 * np.abs(ref).max())


def test_drr_trilinear_dispatch_cpu_stays_xla():
    """On CPU the trilinear renderer uses the XLA oracle (no Pallas)."""
    subject = load_example_ct(shape=(32, 32, 16))
    drr = DRR(subject, sdd=600.0, height=16, delx=3.0, renderer="trilinear")
    rot = jnp.array([[0.0, np.pi / 2, 0.0]], jnp.float32)
    trans = jnp.array([[0.0, 300.0, 0.0]], jnp.float32)
    img = drr(rot, trans, parameterization="euler_angles", convention="ZXY",
              n_points=64)
    assert np.isfinite(np.asarray(img)).all()
    assert img.shape == (1, 1, 16, 16)
