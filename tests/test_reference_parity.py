"""Direct allclose parity vs the ACTUAL reference renderers.

BASELINE.json gates correctness on allclose vs the reference DiffDRR
renderer for rendered images and gradients. This suite imports the real
``diffdrr.renderers`` (torch) from the read-only reference checkout and
compares it against our XLA oracles on identical voxel-space rays —
values, pose gradients, reducefn="max", and per-structure channels.

The reference package's other modules need uninstalled deps (fastcore,
roma, torchio); ``renderers`` — the compute core — depends only on torch.
The whole module skips cleanly when the checkout or torch is unavailable.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
try:
    from diffdrr.renderers import Siddon as RefSiddon, Trilinear as RefTrilinear
except Exception:  # checkout absent (e.g. external CI)
    pytest.skip("reference checkout unavailable", allow_module_level=True)

import jax
import jax.numpy as jnp

from diffdrr_tpu.ops.siddon import siddon_raycast
from diffdrr_tpu.ops.trilinear import trilinear_raycast


@pytest.fixture(scope="module")
def scene():
    """Random volume + generic voxel-space ray bundle crossing it."""
    rng = np.random.default_rng(0)
    vol = rng.random((16, 18, 14)).astype(np.float32)  # distinct dims: axis-order guard
    B, n = 2, 48
    src = np.stack(
        [
            np.full((B, n), -20.0) + rng.normal(0, 0.3, (B, n)),
            rng.uniform(2.0, 16.0, (B, n)),
            rng.uniform(2.0, 12.0, (B, n)),
        ],
        -1,
    ).astype(np.float32)
    tgt = np.stack(
        [
            np.full((B, n), 35.0) + rng.normal(0, 0.3, (B, n)),
            rng.uniform(1.0, 17.0, (B, n)),
            rng.uniform(1.0, 13.0, (B, n)),
        ],
        -1,
    ).astype(np.float32)
    weights = np.linalg.norm(tgt - src, axis=-1)[:, None, :].astype(np.float32)
    return vol, src, tgt, weights


def _ref_siddon(vol, src, tgt, w, **kw):
    mask = kw.pop("mask", None)
    r = RefSiddon(**kw)
    out = r(
        torch.from_numpy(vol), torch.from_numpy(src), torch.from_numpy(tgt),
        torch.from_numpy(w), mask=None if mask is None else torch.from_numpy(mask),
    )
    return out.detach().numpy()


@pytest.mark.parametrize("voxel_shift", [0.5, 0.0])
def test_siddon_forward_matches_reference(scene, voxel_shift):
    vol, src, tgt, w = scene
    ref = _ref_siddon(vol, src, tgt, w, voxel_shift=voxel_shift)
    got = np.asarray(siddon_raycast(
        jnp.asarray(vol), jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w),
        voxel_shift=voxel_shift,
    ))
    np.testing.assert_allclose(got, ref, atol=2e-4 * np.abs(ref).max())


def test_siddon_max_reduce_matches_reference(scene):
    vol, src, tgt, w = scene
    ref = _ref_siddon(vol, src, tgt, w, reducefn="max")
    got = np.asarray(siddon_raycast(
        jnp.asarray(vol), jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w),
        reducefn="max",
    ))
    np.testing.assert_allclose(got, ref, atol=2e-5 * np.abs(ref).max())


def test_siddon_gradients_match_reference(scene):
    """Pose gradients (d/d source, target) through the exact renderer."""
    vol, src, tgt, w = scene
    ts, tt = torch.from_numpy(src), torch.from_numpy(tgt)
    ts.requires_grad_(True)
    tt.requires_grad_(True)
    r = RefSiddon()
    out = r(torch.from_numpy(vol), ts, tt, torch.from_numpy(w))
    (out ** 2).sum().backward()
    g_ref = (ts.grad.numpy(), tt.grad.numpy())

    def loss(s, t):
        return jnp.sum(siddon_raycast(
            jnp.asarray(vol), s, t, jnp.asarray(w)) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(jnp.asarray(src), jnp.asarray(tgt))
    for a, b in zip(g_ref, g):
        np.testing.assert_allclose(
            np.asarray(b), a, atol=5e-4 * max(np.abs(a).max(), 1.0))


def test_siddon_mask_channels_match_reference(scene):
    vol, src, tgt, w = scene
    rng = np.random.default_rng(3)
    mask = rng.integers(0, 4, vol.shape).astype(np.float32)
    ref = _ref_siddon(vol, src, tgt, w, mask=mask)
    got = np.asarray(siddon_raycast(
        jnp.asarray(vol), jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w),
        mask=jnp.asarray(mask), n_channels=4,
    ))
    np.testing.assert_allclose(got, ref, atol=2e-4 * np.abs(ref).max())


@pytest.mark.parametrize("n_points", [32, 150])
def test_trilinear_forward_matches_reference(scene, n_points):
    vol, src, tgt, w = scene
    r = RefTrilinear()
    ref = r(
        torch.from_numpy(vol), torch.from_numpy(src), torch.from_numpy(tgt),
        torch.from_numpy(w), n_points=n_points,
    ).detach().numpy()
    got = np.asarray(trilinear_raycast(
        jnp.asarray(vol), jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w),
        n_points=n_points,
    ))
    np.testing.assert_allclose(got, ref, atol=2e-4 * np.abs(ref).max())


def test_trilinear_gradients_match_reference(scene):
    vol, src, tgt, w = scene
    ts, tt = torch.from_numpy(src), torch.from_numpy(tgt)
    ts.requires_grad_(True)
    tt.requires_grad_(True)
    r = RefTrilinear()
    out = r(torch.from_numpy(vol), ts, tt, torch.from_numpy(w), n_points=64)
    (out ** 2).sum().backward()
    g_ref = (ts.grad.numpy(), tt.grad.numpy())

    def loss(s, t):
        return jnp.sum(trilinear_raycast(
            jnp.asarray(vol), s, t, jnp.asarray(w), n_points=64) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(jnp.asarray(src), jnp.asarray(tgt))
    for a, b in zip(g_ref, g):
        np.testing.assert_allclose(
            np.asarray(b), a, atol=5e-4 * max(np.abs(a).max(), 1.0))


def test_trilinear_density_gradients_match_reference(scene):
    """d/d volume — the reconstruction seam (SURVEY §3.4)."""
    vol, src, tgt, w = scene
    tv = torch.from_numpy(vol)
    tv.requires_grad_(True)
    r = RefTrilinear()
    out = r(tv, torch.from_numpy(src), torch.from_numpy(tgt),
            torch.from_numpy(w), n_points=64)
    (out ** 2).sum().backward()
    g_ref = tv.grad.numpy()

    def loss(v):
        return jnp.sum(trilinear_raycast(
            v, jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w),
            n_points=64) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(vol)))
    np.testing.assert_allclose(g, g_ref, atol=5e-4 * np.abs(g_ref).max())
