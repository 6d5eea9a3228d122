"""Renderer correctness: independent brute-force oracle + analytic phantoms.

Per SURVEY §4: (1) golden tests against analytically checkable phantoms,
(4) Siddon-vs-trilinear consistency at high n_points, plus a per-ray
scalar-loop Siddon oracle implemented independently of the vectorized code.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffdrr_tpu.ops.siddon import siddon_raycast
from diffdrr_tpu.ops.trilinear import trilinear_raycast


def _oracle_siddon(volume, source, target, voxel_shift=0.5, eps=1e-8):
    """Scalar per-ray Siddon in float64 — independent of the vectorized impl."""
    volume = np.asarray(volume, np.float64)
    dims = volume.shape
    B, N, _ = target.shape
    out = np.zeros((B, N))
    for b in range(B):
        s = source[b, 0].astype(np.float64)
        for n in range(N):
            t = target[b, n].astype(np.float64)
            length = np.linalg.norm(t - s)
            alphas = []
            for d in range(3):
                planes = np.arange(dims[d] + 1) - voxel_shift
                alphas.append((planes - s[d]) / (t[d] - s[d] + eps))
            alphas = np.sort(np.concatenate(alphas))
            mids = (alphas[:-1] + alphas[1:]) / 2
            seglen = np.diff(alphas)
            acc = 0.0
            for m, dl in zip(mids, seglen):
                p = s + m * (t - s + eps)
                idx = np.round(p + voxel_shift - 0.5).astype(int)
                if np.all(idx >= 0) and np.all(idx < dims):
                    acc += volume[tuple(idx)] * dl
            out[b, n] = acc * length
    return out


def _rays(seed=0, B=2, N=6, dims=(11, 9, 7)):
    rng = np.random.default_rng(seed)
    # Source outside the volume, targets on the far side.
    source = np.stack(
        [
            np.array([[-15.0, dims[1] / 2 + o, dims[2] / 2 - o]], np.float32)
            for o in rng.uniform(-1, 1, B)
        ]
    )
    target = rng.uniform(
        [dims[0] + 4, -2, -2], [dims[0] + 8, dims[1] + 2, dims[2] + 2], (B, N, 3)
    ).astype(np.float32)
    return source, target


@pytest.mark.parametrize("voxel_shift", [0.0, 0.5])
def test_siddon_matches_scalar_oracle(voxel_shift):
    dims = (11, 9, 7)
    rng = np.random.default_rng(1)
    volume = rng.uniform(0, 1, dims).astype(np.float32)
    source, target = _rays(dims=dims)
    weights = np.linalg.norm(target - source, axis=-1)[:, None, :].astype(np.float32)

    got = np.asarray(
        siddon_raycast(
            jnp.asarray(volume),
            jnp.asarray(source),
            jnp.asarray(target),
            jnp.asarray(weights),
            voxel_shift=voxel_shift,
        )
    )[:, 0]
    expect = _oracle_siddon(volume, source, target, voxel_shift)
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-3)


def test_uniform_cube_chord_length():
    """Line integral through a unit-density cube == chord length (exact)."""
    dims = (16, 16, 16)
    volume = np.ones(dims, np.float32)
    source = np.array([[[-20.0, 8.0, 8.0]]], np.float32)
    target = np.array([[[40.0, 8.0, 8.0], [40.0, 20.0, 8.0]]], np.float32)
    weights = np.linalg.norm(target - source, axis=-1)[:, None, :].astype(np.float32)

    got = np.asarray(
        siddon_raycast(
            jnp.asarray(volume), jnp.asarray(source), jnp.asarray(target),
            jnp.asarray(weights), voxel_shift=0.5,
        )
    )[0, 0]

    # Independent geometric chord computation (slab clipping, voxel_shift=0.5
    # puts the volume extent at [-0.5, 15.5]^3).
    lo, hi = -0.5, 15.5
    s, ts = source[0, 0], target[0]
    for i, t in enumerate(ts):
        d = t - s
        t0, t1 = 0.0, 1.0
        for ax in range(3):
            a = (lo - s[ax]) / d[ax] if d[ax] != 0 else -np.inf
            b = (hi - s[ax]) / d[ax] if d[ax] != 0 else np.inf
            a, b = min(a, b), max(a, b)
            t0, t1 = max(t0, a), min(t1, b)
        chord = max(0.0, t1 - t0) * np.linalg.norm(d)
        np.testing.assert_allclose(got[i], chord, rtol=1e-4)


def test_trilinear_converges_to_siddon():
    """At high n_points on a smooth volume the two renderers agree closely."""
    dims = (24, 24, 24)
    x, y, z = np.meshgrid(*[np.linspace(0, 1, d) for d in dims], indexing="ij")
    volume = np.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2) / 0.08).astype(
        np.float32
    )
    source, target = _rays(seed=2, B=1, N=12, dims=dims)
    weights = np.linalg.norm(target - source, axis=-1)[:, None, :].astype(np.float32)
    args = (jnp.asarray(volume), jnp.asarray(source), jnp.asarray(target),
            jnp.asarray(weights))

    sid = np.asarray(siddon_raycast(*args))
    tri = np.asarray(trilinear_raycast(*args, n_points=4000))
    np.testing.assert_allclose(tri, sid, rtol=0.03, atol=0.05)


def test_reducefn_max():
    dims = (8, 8, 8)
    rng = np.random.default_rng(3)
    volume = rng.uniform(0, 1, dims).astype(np.float32)
    source, target = _rays(seed=3, B=1, N=4, dims=dims)
    args = (jnp.asarray(volume), jnp.asarray(source), jnp.asarray(target))
    out_sum = np.asarray(siddon_raycast(*args, reducefn="sum"))
    out_max = np.asarray(siddon_raycast(*args, reducefn="max"))
    assert (out_max <= out_sum + 1e-6).all()
    assert (out_max > 0).any()


def test_mask_channels_sum_to_total():
    """Per-structure channels must sum to the unmasked image."""
    dims = (10, 10, 10)
    rng = np.random.default_rng(4)
    volume = rng.uniform(0, 1, dims).astype(np.float32)
    mask = rng.integers(0, 4, dims).astype(np.float32)
    source, target = _rays(seed=4, B=2, N=5, dims=dims)
    weights = np.linalg.norm(target - source, axis=-1)[:, None, :].astype(np.float32)

    for fn in (siddon_raycast, trilinear_raycast):
        total = np.asarray(
            fn(jnp.asarray(volume), jnp.asarray(source), jnp.asarray(target),
               jnp.asarray(weights))
        )
        chans = np.asarray(
            fn(jnp.asarray(volume), jnp.asarray(source), jnp.asarray(target),
               jnp.asarray(weights), mask=jnp.asarray(mask), n_channels=4)
        )
        assert chans.shape == (2, 4, 5)
        np.testing.assert_allclose(chans.sum(axis=1, keepdims=True), total,
                                   rtol=1e-4, atol=1e-4)


def test_filter_intersections_outside_volume():
    """Clamped crossings must not change the integral (outside samples are 0)."""
    dims = (9, 9, 9)
    rng = np.random.default_rng(5)
    volume = rng.uniform(0, 1, dims).astype(np.float32)
    source, target = _rays(seed=5, B=1, N=6, dims=dims)
    args = (jnp.asarray(volume), jnp.asarray(source), jnp.asarray(target))
    a = np.asarray(siddon_raycast(*args, filter_intersections_outside_volume=False))
    b = np.asarray(siddon_raycast(*args, filter_intersections_outside_volume=True))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_stop_gradients_through_grid_sample():
    """With the flag, no gradient flows into the volume (reference
    renderers.py:18,63-65); ray-endpoint gradients still flow."""
    dims = (8, 8, 8)
    x, y, z = np.meshgrid(*[np.linspace(0, 1, d) for d in dims], indexing="ij")
    volume = jnp.asarray((x + y + z).astype(np.float32))
    source, target = _rays(seed=6, B=1, N=3, dims=dims)
    source, target = jnp.asarray(source), jnp.asarray(target)

    def loss(volume, target, stop):
        img = siddon_raycast(
            volume, source, target, mode="trilinear",
            stop_gradients_through_grid_sample=stop,
        )
        return jnp.sum(img)

    gv_stop = jax.grad(loss, argnums=0)(volume, target, True)
    np.testing.assert_allclose(np.asarray(gv_stop), 0.0)
    gv = jax.grad(loss, argnums=0)(volume, target, False)
    assert np.abs(np.asarray(gv)).sum() > 0
    gt = jax.grad(loss, argnums=1)(volume, target, True)
    assert np.isfinite(np.asarray(gt)).all()
    assert np.abs(np.asarray(gt)).sum() > 0
