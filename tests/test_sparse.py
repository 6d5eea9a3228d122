"""True sparse rendering (p_subsample) on the kernel path.

The reference renders ONLY the subsampled rays (detector.py:134-137). The
kernel path picks one of three strategies statically (DRR._sparse_strategy):

  * "tiles" — pack and render only the detector tiles containing sampled
    rays (the kernel grid shrinks to the occupied tiles);
  * "full"  — every tile occupied (uniform sampling fills all tiles once
    p * tile^2 >~ 3): render the full frame and gather, as before;
  * "xla"   — very sparse: the XLA oracle renders only the sampled rays.

Kernel-level parity runs in interpret mode; DRR-level dispatch tests use
the poisoned-core pattern from test_drr.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct
from diffdrr_tpu.ops.pallas.joseph import (
    _subset_perm,
    joseph_pallas_raycast,
)
from diffdrr_tpu.ops.pallas.siddon import siddon_pallas_raycast


@pytest.fixture(scope="module")
def subject():
    return load_example_ct(shape=(48, 48, 24))


@pytest.fixture(scope="module")
def pose_args():
    rot = jnp.array([[0.0, np.pi / 2, 0.0]], jnp.float32)
    trans = jnp.array([[0.0, 400.0, 0.0]], jnp.float32)
    return rot, trans


def _render(drr, pose_args, **kwargs):
    rot, trans = pose_args
    return drr(rot, trans, parameterization="euler_angles",
               convention="ZXY", **kwargs)


# ---------------------------------------------------------------- kernel level


@pytest.fixture(scope="module")
def ray_setup():
    rng = np.random.default_rng(0)
    dims = (48, 40, 40)
    vol = jnp.asarray(rng.random(dims, np.float32))
    H = W = 32
    N = H * W
    src = jnp.asarray([[60.0, 20.0, 20.0]], jnp.float32)
    u, v = np.meshgrid(np.linspace(8, 32, H), np.linspace(8, 32, W),
                       indexing="ij")
    tgt = jnp.asarray(
        np.stack([-20 * np.ones_like(u), u, v], -1).reshape(1, N, 3),
        jnp.float32)
    w = jnp.ones((1, 1, N), jnp.float32)
    kw = dict(image_shape=(H, W), axis=0, tile=16, ky=48, zw=128, zc=128,
              interpret=True)
    return vol, src, tgt, w, kw


@pytest.mark.parametrize("raycast", [joseph_pallas_raycast,
                                     siddon_pallas_raycast],
                         ids=["joseph", "siddon"])
def test_tile_subset_kernel_parity(ray_setup, raycast):
    """Subset render == dense render on active rays, 0 elsewhere; exact
    gradient parity (pose and volume) through the packed-ray VJP."""
    vol, src, tgt, w, kw = ray_setup
    subset = (0, 3)
    perm, _ = _subset_perm(32, 32, 16, subset)
    act = perm[perm >= 0]
    inact = np.setdiff1d(np.arange(32 * 32), act)

    dense = raycast(vol, src, tgt, w, **kw)
    sparse = raycast(vol, src, tgt, w, tile_subset=subset, **kw)
    np.testing.assert_array_equal(np.asarray(dense[:, :, act]),
                                  np.asarray(sparse[:, :, act]))
    assert float(jnp.max(jnp.abs(sparse[:, :, inact]))) == 0.0

    def loss(t, sub):
        img = raycast(vol, src, t, w, tile_subset=sub, **kw)
        return jnp.sum(img[:, :, act] ** 2)

    gd = jax.grad(lambda t: loss(t, None))(tgt)
    gs = jax.grad(lambda t: loss(t, subset))(tgt)
    np.testing.assert_array_equal(np.asarray(gd), np.asarray(gs))
    assert float(jnp.max(jnp.abs(gs[:, inact]))) == 0.0

    gvd = jax.grad(lambda V: jnp.sum(
        raycast(V, src, tgt, w, **kw)[:, :, act] ** 2))(vol)
    gvs = jax.grad(lambda V: jnp.sum(
        raycast(V, src, tgt, w, tile_subset=subset, **kw)[:, :, act] ** 2))(
            vol)
    np.testing.assert_array_equal(np.asarray(gvd), np.asarray(gvs))


def test_tile_subset_channels(ray_setup):
    """Per-structure channel rendering composes with tile subsets."""
    vol, src, tgt, w, kw = ray_setup
    mask = jnp.asarray(
        (np.asarray(vol) > 0.5).astype(np.float32) * 2.0)
    subset = (1, 2)
    perm, _ = _subset_perm(32, 32, 16, subset)
    act = perm[perm >= 0]
    dense = joseph_pallas_raycast(vol, src, tgt, w, mask=mask, n_channels=3,
                                  **kw)
    sparse = joseph_pallas_raycast(vol, src, tgt, w, mask=mask, n_channels=3,
                                   tile_subset=subset, **kw)
    assert sparse.shape == dense.shape  # (B, 3, N)
    np.testing.assert_array_equal(np.asarray(dense[:, :, act]),
                                  np.asarray(sparse[:, :, act]))


# ------------------------------------------------------------- strategy picker


def _clustered_drr(subject, monkeypatch=None, cluster_tile=0, n=64,
                   renderer="joseph", **extra):
    """DRR with p_subsample whose samples all land in ONE 16x16 tile."""
    drr = DRR(subject, sdd=800.0, height=32, delx=2.0, renderer=renderer,
              p_subsample=n / (32 * 32), pallas_tile=16, **extra)
    th = tw = 2
    bi, bj = divmod(cluster_tile, tw)
    rng = np.random.default_rng(7)
    rr = rng.integers(0, 16, n) + bi * 16
    cc = rng.integers(0, 16, n) + bj * 16
    idx = rr * 32 + cc
    drr.detector.subsamples[-1] = idx.tolist()
    # Keep the canonical subsampled plane consistent with the new indices
    # (the XLA path renders detector.target directly).
    drr.detector.target = drr.detector.target_full[:, idx, :]
    return drr


def test_sparse_strategy_tiles(subject):
    drr = _clustered_drr(subject, cluster_tile=3)
    strategy, subsets = drr._sparse_strategy()
    assert strategy == "tiles"
    for s in subsets:
        assert s == (3,)


def test_sparse_strategy_full(subject):
    """Uniform sampling at moderate p occupies every tile -> full frame."""
    drr = DRR(subject, sdd=800.0, height=32, delx=2.0, renderer="joseph",
              p_subsample=0.25, pallas_tile=16)
    strategy, subsets = drr._sparse_strategy()
    assert strategy == "full"
    assert all(s is None for s in subsets)


def test_sparse_strategy_xla(subject, monkeypatch):
    """When the oracle on n_sub rays is cheaper than the occupied tiles,
    dispatch skips the kernel entirely."""
    import diffdrr_tpu.drr as drr_mod

    monkeypatch.setitem(drr_mod._SPARSE_XLA_RAY_COST, "joseph", 1.0)
    drr = _clustered_drr(subject, n=16)
    strategy, _ = drr._sparse_strategy()
    assert strategy == "xla"


# ------------------------------------------------------------ DRR-level wiring


def test_forward_tiles_strategy_uses_subset(subject, pose_args, monkeypatch):
    """The "tiles" strategy reaches the kernel core with a SHRUNK ray pack
    (only the occupied tile), and forward returns the sampled rays."""
    import diffdrr_tpu.drr as drr_mod
    import diffdrr_tpu.ops.pallas.joseph as pjos

    seen = []
    real_make = pjos._make_joseph

    def spying_make(*args, **kw):
        core = real_make(*args, **kw)
        seen.append(kw.get("tile_subset"))
        return core

    monkeypatch.setattr(pjos, "_make_joseph", spying_make)
    monkeypatch.setattr(
        drr_mod.DRR, "_pallas_capable",
        lambda self, m, o: (self.renderer_name == "joseph"
                            and self.pallas_ok
                            and not o.get("force_xla", False)),
    )

    # precision="highest" keeps f32 storage: exact parity vs the oracle
    drr = _clustered_drr(subject, cluster_tile=2, precision="highest")
    strategy, subsets = drr._sparse_strategy()
    assert strategy == "tiles" and subsets[0] == (2,)

    # Run via interpret-mode kernels: patch the raycast wrapper's default.
    real_raycast = pjos.joseph_pallas_raycast

    def interp_raycast(*a, **k):
        k.setdefault("interpret", True)
        return real_raycast(*a, **k)

    monkeypatch.setattr(pjos, "joseph_pallas_raycast", interp_raycast)

    img = _render(drr, pose_args)
    # forward gathered the sampled rays and scattered into the full frame
    assert img.shape == (1, 1, 32, 32)
    assert any(s == (2,) for s in seen), f"subset never reached core: {seen}"

    # Parity: the same sampled rays via the XLA oracle
    ref = _render(drr, pose_args, force_xla=True)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_forward_xla_strategy_skips_kernel(subject, pose_args, monkeypatch):
    """The "xla" strategy renders ONLY the sampled rays on the oracle: the
    kernel core must never run (poisoned), output matches force_xla."""
    import diffdrr_tpu.drr as drr_mod
    import diffdrr_tpu.ops.pallas.joseph as pjos

    def poison_make(*args, **kw):  # pragma: no cover - must not be called
        raise AssertionError("kernel core built under xla sparse strategy")

    monkeypatch.setattr(pjos, "_make_joseph", poison_make)
    monkeypatch.setattr(
        drr_mod.DRR, "_pallas_capable",
        lambda self, m, o: (self.renderer_name == "joseph"
                            and self.pallas_ok
                            and not o.get("force_xla", False)),
    )
    monkeypatch.setitem(drr_mod._SPARSE_XLA_RAY_COST, "joseph", 1.0)

    drr = _clustered_drr(subject, n=16)
    assert drr._sparse_strategy()[0] == "xla"
    img = _render(drr, pose_args)
    ref = _render(drr, pose_args, force_xla=True)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-6)
