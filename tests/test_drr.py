"""DRR orchestrator tests: shapes, options, projections, jit, gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct, convert
from diffdrr_tpu.pose import RigidTransform


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
    return drr(rot, trans, parameterization="euler_angles", convention="ZXY", **kwargs)


def test_shapes_and_nonempty(subject, pose_args):
    drr = DRR(subject, sdd=800.0, height=24, delx=4.0, width=16, dely=5.0)
    img = _render(drr, pose_args)
    assert img.shape == (1, 1, 24, 16)
    assert float(jnp.abs(img).sum()) > 0


def test_reshape_false(subject, pose_args):
    drr = DRR(subject, sdd=800.0, height=16, delx=4.0, reshape=False)
    img = _render(drr, pose_args)
    assert img.shape == (1, 1, 256)


def test_batched_poses(subject):
    drr = DRR(subject, sdd=800.0, height=16, delx=4.0)
    rot = jnp.asarray(np.random.default_rng(0).normal(0, 0.1, (3, 3)), jnp.float32)
    trans = jnp.asarray([[0.0, 400.0, 0.0]] * 3, jnp.float32)
    img = drr(rot + jnp.asarray([0.0, np.pi / 2, 0.0]), trans,
              parameterization="euler_angles", convention="ZXY")
    assert img.shape == (3, 1, 16, 16)
    # Different poses give different images.
    assert not np.allclose(np.asarray(img[0]), np.asarray(img[1]))


def test_pose_object_input(subject, pose_args):
    drr = DRR(subject, sdd=800.0, height=16, delx=4.0)
    rot, trans = pose_args
    pose = convert(rot, trans, parameterization="euler_angles", convention="ZXY")
    img1 = drr(pose)
    img2 = _render(drr, pose_args)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-5)


def test_patch_rendering_matches(subject, pose_args):
    kw = dict(sdd=800.0, height=16, delx=4.0)
    full = _render(DRR(subject, **kw), pose_args)
    patched = _render(DRR(subject, patch_size=8, **kw), pose_args)
    np.testing.assert_allclose(np.asarray(patched), np.asarray(full), atol=1e-4)


def test_p_subsample(subject, pose_args):
    drr = DRR(subject, sdd=800.0, height=16, delx=4.0, p_subsample=0.25)
    img = _render(drr, pose_args)
    assert img.shape == (1, 1, 16, 16)
    # Exactly 25% of pixels are filled (the rest are zero).
    filled = (np.asarray(img) != 0).sum()
    assert filled <= 64


def test_mask_to_channels(subject, pose_args):
    drr = DRR(subject, sdd=800.0, height=16, delx=4.0)
    chans = _render(drr, pose_args, mask_to_channels=True)
    total = _render(drr, pose_args)
    assert chans.shape == (1, drr.n_channels, 16, 16)
    np.testing.assert_allclose(
        np.asarray(chans.sum(axis=1, keepdims=True)), np.asarray(total),
        rtol=1e-3, atol=1e-3,
    )


def test_checkpoint_gradients_same_values_and_grads(subject, pose_args):
    kw = dict(sdd=800.0, height=16, delx=4.0, renderer="trilinear")
    rot, trans = pose_args
    drr_a = DRR(subject, **kw)
    drr_b = DRR(subject, checkpoint_gradients=True, **kw)

    def loss(drr, rot):
        return jnp.sum(
            drr(rot, trans, parameterization="euler_angles", convention="ZXY") ** 2
        )

    va, ga = jax.value_and_grad(lambda r: loss(drr_a, r))(rot)
    vb, gb = jax.value_and_grad(lambda r: loss(drr_b, r))(rot)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-6)


def test_jit_through_pytree(subject, pose_args):
    drr = DRR(subject, sdd=800.0, height=16, delx=4.0)
    rot, trans = pose_args

    @jax.jit
    def render(drr, rot, trans):
        return drr(rot, trans, parameterization="euler_angles", convention="ZXY")

    img_jit = render(drr, rot, trans)
    img_eager = _render(drr, pose_args)
    np.testing.assert_allclose(np.asarray(img_jit), np.asarray(img_eager),
                               rtol=1e-4, atol=1e-5)


def test_density_gradient_for_reconstruction(subject, pose_args):
    """The render seam: gradients w.r.t. an explicit density volume."""
    drr = DRR(subject, sdd=800.0, height=12, delx=5.0, renderer="trilinear")
    rot, trans = pose_args
    pose = convert(rot, trans, parameterization="euler_angles", convention="ZXY")
    source, target = drr.detector(pose, None)

    def loss(density):
        img = drr.render(density, source, target)
        return jnp.sum(img**2)

    g = jax.grad(loss)(drr.density)
    assert g.shape == drr.density.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_projection_roundtrip(subject, pose_args):
    drr = DRR(subject, sdd=800.0, height=32, delx=2.0)
    rot, trans = pose_args
    pose = convert(rot, trans, parameterization="euler_angles", convention="ZXY")

    # Backproject pixel points to world, then reproject: must round trip.
    pts2d = jnp.asarray([[[4.0, 7.0], [20.0, 11.0], [16.0, 16.0]]], jnp.float32)
    world = drr.inverse_projection(pose, pts2d)
    back = drr.perspective_projection(pose, world)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts2d), atol=1e-2)


def test_set_intrinsics_and_rescale(subject, pose_args):
    drr = DRR(subject, sdd=800.0, height=16, delx=4.0)
    drr.set_intrinsics_(height=20, width=24)
    img = _render(drr, pose_args)
    assert img.shape == (1, 1, 20, 24)
    assert drr.detector.sdd == 800.0

    drr2 = DRR(subject, sdd=800.0, height=16, delx=4.0)
    drr2.rescale_detector_(2.0)
    assert drr2.detector.height == 32
    assert drr2.detector.delx == 2.0
    img2 = _render(drr2, pose_args)
    assert img2.shape == (1, 1, 32, 32)


def test_renderer_kwargs_flow(subject, pose_args):
    drr = DRR(subject, sdd=800.0, height=16, delx=4.0, renderer="trilinear")
    img_100 = _render(drr, pose_args, n_points=100)
    img_500 = _render(drr, pose_args, n_points=500)
    # Finer sampling changes the integral slightly but not wildly.
    a, b = np.asarray(img_100), np.asarray(img_500)
    assert not np.allclose(a, b)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99



def _poison_siddon_core(monkeypatch, psid, value):
    """Poison the siddon KERNEL CORE (post-refactor the guard cond lives in
    siddon_pallas_raycast itself, so the observable kernel-vs-fallback seam
    is the _make_siddon factory)."""
    def poison_make(dims, image_shape, axis, voxel_shift, eps, tile, *rest,
                    **kw):
        H, W = image_shape
        padded = (-(-H // tile)) * (-(-W // tile)) * tile * tile

        def core(volume, rays_tiled, starts, prepped):
            B = rays_tiled.shape[1] // padded
            return jnp.full((B, 1, H * W), value, jnp.float32)

        return core

    monkeypatch.setattr(psid, "_make_siddon", poison_make)


def _poison_joseph_core(monkeypatch, pjos, value):
    """Joseph/raymarch analog of _poison_siddon_core (raymarch delegates to
    joseph_pallas_raycast, so this poisons both)."""
    def poison_make(dims, image_shape, axis, h, n_steps, voxel_shift, eps,
                    tile, ky, zw, zc, precision, storage, interpret,
                    use_prepped=False, n_ch=None, resident=False,
                    reduce="sum"):
        H, W = image_shape
        padded = (-(-H // tile)) * (-(-W // tile)) * tile * tile

        def core(volume, rays_tiled, starts, prepped, mask):
            B = rays_tiled.shape[1] // padded
            return jnp.full((B, n_ch or 1, H * W), value, jnp.float32)

        return core

    monkeypatch.setattr(pjos, "_make_joseph", poison_make)


def test_siddon_slab_guard(subject, pose_args, monkeypatch):
    """Wide cone-beam rays violate the Siddon slab bound -> XLA fallback.

    The Pallas slab decomposition is only valid when every ray's transverse
    slope at the march axis is <= 1; rays beyond that would integrate
    silently wrong. The dispatch wraps the kernel call in a lax.cond on the
    worst-ray alignment ratio. Poison the kernel entry point to observe
    which branch executed.
    """
    import diffdrr_tpu.ops.pallas.siddon as psid
    import diffdrr_tpu.drr as drr_mod

    POISON = 12345.0
    _poison_siddon_core(monkeypatch, psid, POISON)
    monkeypatch.setattr(
        drr_mod.DRR, "_pallas_capable",
        lambda self, m, o: (self.renderer_name == "siddon"
                            and self.pallas_ok
                            and not o.get("force_xla", False)),
    )

    # Narrow cone at an AP pose: every ray is axis-aligned -> Pallas branch.
    narrow = DRR(subject, sdd=800.0, height=16, delx=1.0)
    img = _render(narrow, pose_args)
    assert np.allclose(np.asarray(img), POISON)

    # Wide cone (detector half-diagonal >> sdd): worst-ray ratio > 1 at any
    # axis -> the guard must route to the exact XLA oracle.
    wide = DRR(subject, sdd=8.0, height=16, delx=1.0)
    guarded = _render(wide, pose_args)
    oracle = _render(wide, pose_args, force_xla=True)
    np.testing.assert_allclose(
        np.asarray(guarded), np.asarray(oracle), atol=1e-5)
    assert not np.allclose(np.asarray(guarded), POISON)

    # Opting out of BOTH guards runs the Pallas branch unconditionally
    # (the footprint guard is free and on by default, so it must be
    # disabled too to observe the raw kernel).
    unguarded = _render(wide, pose_args, slab_guard=False,
                        footprint_guard=False)
    assert np.allclose(np.asarray(unguarded), POISON)


def test_footprint_guard(subject, pose_args, monkeypatch):
    """Poses whose tile footprints exceed the planned windows fall back to
    the XLA oracle instead of silently clipping peripheral samples.

    With pallas_fp_scale=0.35 and a magnifying pose (volume close to the
    detector) the interpret-mode kernel integral is ~42% wrong vs the
    oracle — the guard (auto-enabled when fp_scale < 1) must take the
    fallback branch there and the kernel branch for a modest pose.
    """
    import diffdrr_tpu.ops.pallas.siddon as psid
    import diffdrr_tpu.drr as drr_mod
    from diffdrr_tpu import load_example_ct

    POISON = 54321.0
    _poison_siddon_core(monkeypatch, psid, POISON)
    monkeypatch.setattr(
        drr_mod.DRR, "_pallas_capable",
        lambda self, m, o: (self.renderer_name == "siddon"
                            and self.pallas_ok
                            and not o.get("force_xla", False)),
    )

    big = load_example_ct(shape=(128, 128, 64))
    drr = DRR(big, sdd=800.0, height=16, delx=6.0, pallas_fp_scale=0.35)
    rot = jnp.array([[0.0, np.pi / 2, 0.0]], jnp.float32)

    # Modest magnification: footprint fits -> Pallas branch.
    near = drr(rot, jnp.array([[0.0, 250.0, 0.0]]),
               parameterization="euler_angles", convention="ZXY")
    assert np.allclose(np.asarray(near), POISON)

    # Magnifying pose: footprint exceeds the shrunken windows -> oracle.
    trans = jnp.array([[0.0, 600.0, 0.0]])
    guarded = drr(rot, trans, parameterization="euler_angles",
                  convention="ZXY")
    oracle = drr(rot, trans, parameterization="euler_angles",
                 convention="ZXY", force_xla=True)
    np.testing.assert_allclose(np.asarray(guarded), np.asarray(oracle),
                               atol=1e-5)

    # Explicit opt-out runs the kernel branch unconditionally.
    unguarded = drr(rot, trans, parameterization="euler_angles",
                    convention="ZXY", footprint_guard=False)
    assert np.allclose(np.asarray(unguarded), POISON)


def test_footprint_guard_joseph_fallback(subject, pose_args, monkeypatch):
    """The footprint guard's fallback uses the matching oracle per renderer
    (joseph fallback = XLA joseph, axis-switched)."""
    import diffdrr_tpu.ops.pallas.joseph as pjos
    import diffdrr_tpu.drr as drr_mod
    from diffdrr_tpu import load_example_ct

    POISON = 99999.0
    _poison_joseph_core(monkeypatch, pjos, POISON)
    monkeypatch.setattr(
        drr_mod.DRR, "_pallas_capable",
        lambda self, m, o: (self.renderer_name == "joseph"
                            and self.pallas_ok
                            and not o.get("force_xla", False)),
    )

    big = load_example_ct(shape=(128, 128, 64))
    drr = DRR(big, sdd=800.0, height=16, delx=6.0, renderer="joseph",
              pallas_fp_scale=0.35)
    rot = jnp.array([[0.0, np.pi / 2, 0.0]], jnp.float32)
    trans = jnp.array([[0.0, 600.0, 0.0]])
    guarded = drr(rot, trans, parameterization="euler_angles",
                  convention="ZXY")
    oracle = drr(rot, trans, parameterization="euler_angles",
                 convention="ZXY", force_xla=True)
    np.testing.assert_allclose(np.asarray(guarded), np.asarray(oracle),
                               atol=1e-4 * float(jnp.abs(oracle).max()))
    assert not np.allclose(np.asarray(guarded), POISON)


def test_diagnose_pose(subject, pose_args):
    """diagnose_pose surfaces the guard decisions (slab ratio, window fit)."""
    from diffdrr_tpu import load_example_ct, convert

    big = load_example_ct(shape=(128, 128, 64))
    drr = DRR(big, sdd=800.0, height=16, delx=6.0, pallas_fp_scale=0.35)
    rot = jnp.array([[0.0, np.pi / 2, 0.0]], jnp.float32)

    far = convert(rot, jnp.array([[0.0, 250.0, 0.0]]),
                  parameterization="euler_angles", convention="ZXY")
    near = convert(rot, jnp.array([[0.0, 600.0, 0.0]]),
                   parameterization="euler_angles", convention="ZXY")
    d_far = drr.diagnose_pose(far)
    d_near = drr.diagnose_pose(near)
    assert d_far["fp_guard_active"] and d_near["fp_guard_active"]
    assert d_far["footprint_fits"][2] is True
    assert d_near["footprint_fits"][2] is False
    assert d_far["slab_valid"]


def test_footprint_guard_channels_fallback(subject, pose_args, monkeypatch):
    """Footprint-guard fallback composes with per-structure channels: both
    cond branches produce (B, n_ch, H, W), fallback matches the oracle."""
    import diffdrr_tpu.ops.pallas.joseph as pjos
    import diffdrr_tpu.drr as drr_mod
    from diffdrr_tpu import load_example_ct

    _poison_joseph_core(monkeypatch, pjos, 7.0)
    monkeypatch.setattr(
        drr_mod.DRR, "_pallas_capable",
        lambda self, m, o: (self.renderer_name == "joseph"
                            and self.pallas_ok
                            and not o.get("force_xla", False)),
    )

    big = load_example_ct(shape=(128, 128, 64))
    drr = DRR(big, sdd=800.0, height=16, delx=6.0, renderer="joseph",
              pallas_fp_scale=0.35)
    rot = jnp.array([[0.0, np.pi / 2, 0.0]], jnp.float32)
    trans = jnp.array([[0.0, 600.0, 0.0]])  # exceeds shrunken windows
    guarded = drr(rot, trans, parameterization="euler_angles",
                  convention="ZXY", mask_to_channels=True)
    oracle = drr(rot, trans, parameterization="euler_angles",
                 convention="ZXY", mask_to_channels=True, force_xla=True)
    assert guarded.shape == oracle.shape and guarded.shape[1] > 1
    np.testing.assert_allclose(np.asarray(guarded), np.asarray(oracle),
                               atol=1e-4 * float(jnp.abs(oracle).max()))


def test_sparse_capability_judged_on_merged_kwargs(subject, pose_args, monkeypatch):
    """forward's sparse full-frame swap must judge Pallas capability on the
    constructor renderer_kwargs merged with per-call kwargs: a disqualifying
    option set at construction (mode="bilinear") must keep the subsampled
    ray set instead of silently rendering every full-frame ray via XLA."""
    drr = DRR(subject, sdd=800.0, height=16, delx=4.0, renderer="siddon",
              p_subsample=0.25, mode="bilinear")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    seen = {}
    orig = type(drr).render

    def spy(self, density, source, target, **kw):
        seen["n_rays"] = target.shape[1]
        return orig(self, density, source, target, **kw)

    monkeypatch.setattr(type(drr), "render", spy)
    img = _render(drr, pose_args)
    assert seen["n_rays"] == drr.detector.n_subsample
    # Sparse renders scatter back into the full frame (zeros elsewhere).
    assert img.shape == (1, 1, 16, 16)


def test_diagnose_pose_subsampled_matches_full(subject):
    """diagnose_pose must probe the FULL detector plane regardless of
    p_subsample (the kernels always see full frames)."""
    rot = jnp.array([[0.02, np.pi / 2 + 0.01, -0.015]], jnp.float32)
    trans = jnp.array([[2.0, 390.0, -3.0]], jnp.float32)
    pose = convert(rot, trans, parameterization="euler_angles",
                   convention="ZXY")
    d_full = DRR(subject, sdd=800.0, height=16, delx=4.0).diagnose_pose(pose)
    d_sub = DRR(subject, sdd=800.0, height=16, delx=4.0,
                p_subsample=0.5).diagnose_pose(pose)
    assert d_sub["best_axis"] == d_full["best_axis"]
    assert d_sub["footprint_fits"] == d_full["footprint_fits"]
    np.testing.assert_allclose(d_sub["worst_ratio"], d_full["worst_ratio"],
                               rtol=1e-6)


def test_subsample_with_mask_channels(subject, pose_args):
    """p_subsample x mask_to_channels: the sparse scatter-reshape must keep
    every channel (regression: it assumed C=1 and crashed on shape)."""
    drr = DRR(subject, sdd=800.0, height=16, delx=4.0, p_subsample=0.5,
              renderer="trilinear")
    img = _render(drr, pose_args, mask_to_channels=True, n_points=64)
    C = drr.n_channels
    assert C > 1
    assert img.shape == (1, C, 16, 16)
    full = DRR(subject, sdd=800.0, height=16, delx=4.0, renderer="trilinear")
    ref = _render(full, pose_args, mask_to_channels=True, n_points=64)
    # Sampled pixels agree with the dense render; unsampled are zero.
    sampled = np.zeros(256, bool)
    sampled[np.asarray(drr.detector.subsamples[-1])] = True
    got = np.asarray(img).reshape(1, C, 256)
    want = np.asarray(ref).reshape(1, C, 256)
    np.testing.assert_allclose(got[..., sampled], want[..., sampled],
                               rtol=1e-4, atol=1e-5)
    assert np.all(got[..., ~sampled] == 0)


def test_joseph_patch_size_auto_axis(subject, pose_args):
    """patch_size must chunk the joseph XLA path under AUTO axis selection
    too (regression: the lax.switch early return bypassed the patch loop
    and the patched/unpatched results came from different code paths)."""
    drr_p = DRR(subject, sdd=800.0, height=16, delx=4.0, renderer="joseph",
                patch_size=8)
    drr_f = DRR(subject, sdd=800.0, height=16, delx=4.0, renderer="joseph")
    got = _render(drr_p, pose_args)
    ref = _render(drr_f, pose_args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_ray_compatibility_subsampled_matches_full(subject):
    rot = jnp.array([[0.3, np.pi / 2 + 0.2, -0.1]], jnp.float32)
    trans = jnp.array([[5.0, 390.0, -8.0]], jnp.float32)
    pose = convert(rot, trans, parameterization="euler_angles",
                   convention="ZXY")
    full = DRR(subject, sdd=800.0, height=16, delx=4.0)
    sub = DRR(subject, sdd=800.0, height=16, delx=4.0, p_subsample=0.3)
    bf, rf = full.pallas_ray_compatibility(pose)
    bs, rs = sub.pallas_ray_compatibility(pose)
    assert bf == bs
    np.testing.assert_allclose(rs, rf, rtol=1e-6)


def test_slab_guard_fallback_honors_reducefn(subject, pose_args, monkeypatch):
    """A guard-triggered fallback during a MIP render must return the MAX
    image (regression: reducefn was popped before the fallback captured its
    options, silently rendering the line integral instead)."""
    import diffdrr_tpu.ops.pallas.siddon as psid
    import diffdrr_tpu.drr as drr_mod

    POISON = 12345.0
    _poison_siddon_core(monkeypatch, psid, POISON)
    monkeypatch.setattr(
        drr_mod.DRR, "_pallas_capable",
        lambda self, m, o: (self.renderer_name == "siddon"
                            and self.pallas_ok
                            and not o.get("force_xla", False)
                            and o.get("reducefn", "sum") in ("sum", "max")),
    )

    # Wide cone (half-width 160 > sdd 100 -> worst-ray ratio > 1: the guard
    # always fires) at a translation that keeps the volume in the beam.
    wide = DRR(subject, sdd=100.0, height=16, delx=20.0)
    pose_args = (pose_args[0], jnp.array([[0.0, 50.0, 0.0]], jnp.float32))
    mip = _render(wide, pose_args, reducefn="max")
    assert float(jnp.abs(jnp.asarray(mip)).max()) > 0
    mip_oracle = _render(wide, pose_args, reducefn="max", force_xla=True)
    total_oracle = _render(wide, pose_args, force_xla=True)
    np.testing.assert_allclose(np.asarray(mip), np.asarray(mip_oracle),
                               atol=1e-5)
    assert not np.allclose(np.asarray(mip), np.asarray(total_oracle))
    assert not np.allclose(np.asarray(mip), POISON)


def test_kernel_path_rejects_unknown_kwargs(subject, pose_args, monkeypatch):
    """Typo'd renderer options must raise on the KERNEL path too (the XLA
    path raises from the renderer signature; the kernel dispatch used to
    silently drop leftovers)."""
    drr = DRR(subject, sdd=800.0, height=16, delx=4.0, renderer="joseph")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(TypeError, match="n_poitns"):
        _render(drr, pose_args, n_poitns=99)
