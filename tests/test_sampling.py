"""Parity tests: our samplers vs torch.nn.functional.grid_sample.

The reference's entire compute path funnels through grid_sample
(diffdrr/renderers.py:156-169); these tests pin our voxel-space sampling to
the true torch kernel, including the (z, y, x) permute and [-1, 1]
normalization the reference applies.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from diffdrr_tpu.ops.sampling import sample_volume


def _torch_reference(volume, pts, voxel_shift, mode, align_corners):
    """The reference's sampling pipeline, verbatim semantics, in torch."""
    vol = torch.from_numpy(volume)
    xyzs = torch.from_numpy(pts)  # (B, N, S, 3) voxel-space points
    dims = torch.tensor(volume.shape, dtype=torch.float32)
    grid = 2 * (xyzs + voxel_shift) / dims - 1
    out = torch.nn.functional.grid_sample(
        input=vol.permute(2, 1, 0)[None, None].expand(xyzs.shape[0], -1, -1, -1, -1),
        grid=grid.unsqueeze(1),
        mode=mode,
        align_corners=align_corners,
    )[:, 0, 0]
    return out.numpy()


@pytest.mark.parametrize("mode", ["nearest", "bilinear"])
@pytest.mark.parametrize("voxel_shift", [0.0, 0.5])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_parity(mode, voxel_shift, align_corners):
    rng = np.random.default_rng(0)
    volume = rng.normal(size=(9, 13, 7)).astype(np.float32)
    # Points spanning inside and outside the volume.
    pts = rng.uniform(-3.0, 15.0, size=(2, 20, 11, 3)).astype(np.float32)
    # Keep fractional parts away from exact .5 boundaries where nearest
    # rounding is tie-broken differently in fp32 arithmetic orders.
    frac = pts - np.floor(pts)
    pts = np.where(np.abs(frac - 0.5) < 0.05, pts + 0.07, pts).astype(np.float32)

    expect = _torch_reference(volume, pts, voxel_shift, mode, align_corners)
    ours_mode = "trilinear" if mode == "bilinear" else "nearest"
    got = np.asarray(
        sample_volume(
            jnp.asarray(volume),
            jnp.asarray(pts),
            mode=ours_mode,
            voxel_shift=voxel_shift,
            align_corners=align_corners,
        )
    )
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_gradients_flow_trilinear():
    import jax

    volume = jnp.asarray(np.random.default_rng(1).normal(size=(5, 5, 5)), jnp.float32)
    pts = jnp.asarray([[1.2, 2.7, 3.1], [0.4, 4.2, 2.2]], jnp.float32)

    def f(volume, pts):
        return jnp.sum(sample_volume(volume, pts, mode="trilinear"))

    gv, gp = jax.grad(f, argnums=(0, 1))(volume, pts)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.isfinite(np.asarray(gp)).all()
    assert np.abs(np.asarray(gp)).sum() > 0

    # finite-difference check on points
    eps = 1e-3

    def f_pts(p):
        return f(volume, p)

    for i in range(2):
        for j in range(3):
            dp = np.zeros((2, 3), np.float32)
            dp[i, j] = eps
            fd = (f_pts(pts + dp) - f_pts(pts - dp)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(gp)[i, j], fd, atol=1e-2)


def test_nearest_has_zero_point_gradient():
    import jax

    volume = jnp.asarray(np.random.default_rng(2).normal(size=(5, 5, 5)), jnp.float32)
    pts = jnp.asarray([[1.2, 2.7, 3.1]], jnp.float32)
    g = jax.grad(lambda p: jnp.sum(sample_volume(volume, p, mode="nearest")))(pts)
    np.testing.assert_allclose(np.asarray(g), 0.0)
