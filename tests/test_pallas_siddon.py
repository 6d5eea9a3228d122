"""Exact-Siddon Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from functools import partial

from diffdrr_tpu import DRR, load_example_ct, convert
from diffdrr_tpu.ops.siddon import siddon_raycast
from diffdrr_tpu.ops.joseph import choose_march_axis
from diffdrr_tpu.ops.pallas.siddon import siddon_pallas_raycast


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


def _pallas(scene_ax, **kw):
    return partial(
        siddon_pallas_raycast, image_shape=(32, 32), axis=scene_ax, tile=16,
        ky=64, zw=256, interpret=True, **kw,
    )


@pytest.mark.parametrize("resident", [True, False])
def test_forward_matches_sort_based_siddon(scene, resident):
    """The slab decomposition reproduces the sorted-crossings integral
    in both window modes (VMEM-resident slices and streaming DMAs)."""
    drr, sv, tv, weights, ax = scene
    ref = np.asarray(siddon_raycast(drr.density, sv, tv, weights))
    got = np.asarray(
        _pallas(ax, resident=resident)(drr.density, sv, tv, weights))
    np.testing.assert_allclose(got, ref, atol=1e-3 * np.abs(ref).max())


def test_gradients_match_xla_autodiff(scene):
    drr, sv, tv, weights, ax = scene
    pal = _pallas(ax)

    def loss(fn, vol, s, t, w):
        return jnp.sum(jnp.sin(fn(vol, s, t, w) * 0.1))

    for argnum in range(4):
        g_ref = jax.grad(partial(loss, siddon_raycast), argnums=argnum)(
            drr.density, sv, tv, weights
        )
        g_got = jax.grad(partial(loss, pal), argnums=argnum)(
            drr.density, sv, tv, weights
        )
        g_ref, g_got = np.asarray(g_ref), np.asarray(g_got)
        np.testing.assert_allclose(
            g_got, g_ref, atol=1e-3 * (np.abs(g_ref).max() + 1e-9)
        ), argnum


def test_nearest_zero_value_gradient_semantics(scene):
    """Pose gradients flow only through segment lengths, like the reference
    (nearest-neighbor sampling has zero gradient through values)."""
    drr, sv, tv, weights, ax = scene
    pal = _pallas(ax)

    def loss(vol):
        return jnp.sum(pal(jax.lax.stop_gradient(vol) * 0 + vol, sv, tv, weights))

    g = jax.grad(loss)(drr.density)
    assert np.isfinite(np.asarray(g)).all()


def test_wide_tile_parity(scene):
    """tile=64 (TR=4096 lanes) reproduces the oracle — the cost model may
    pick wide tiles for large, finely-pitched detectors."""
    drr, sv, tv, weights, ax = scene
    ref = np.asarray(siddon_raycast(drr.density, sv, tv, weights))
    got = np.asarray(siddon_pallas_raycast(
        drr.density, sv, tv, weights, image_shape=(32, 32), axis=ax,
        tile=64, ky=96, zw=256, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-3 * np.abs(ref).max())


def test_drr_siddon_dispatch_fallbacks():
    """Non-default options route to the XLA renderer (CPU always does)."""
    subject = load_example_ct(shape=(32, 32, 16))
    drr = DRR(subject, sdd=600.0, height=16, delx=3.0)  # siddon default
    rot = jnp.array([[0.0, np.pi / 2, 0.0]], jnp.float32)
    trans = jnp.array([[0.0, 300.0, 0.0]], jnp.float32)
    img = drr(rot, trans, parameterization="euler_angles", convention="ZXY")
    img_max = drr(rot, trans, parameterization="euler_angles", convention="ZXY",
                  reducefn="max")
    assert (np.asarray(img_max) <= np.asarray(img) + 1e-5).all()


def test_footprint_probe_soundness_fuzz():
    """Soundness of the fit probe: whenever it says a pose fits the planned
    windows, the interpret-mode kernel must match the oracle. (Completeness
    — flagging every non-fitting pose — is exercised in test_drr.py.)"""
    from diffdrr_tpu.ops.pallas.joseph import footprint_fits

    subject = load_example_ct(shape=(64, 64, 32))
    # Small windows on purpose so some random poses genuinely don't fit.
    drr = DRR(subject, sdd=500.0, height=16, delx=5.0, pallas_fp_scale=0.5)
    rng = np.random.default_rng(7)
    n_fit = n_nofit = 0
    for _ in range(10):
        rot = jnp.asarray(rng.normal([0.0, np.pi / 2, 0.0], 0.25)[None],
                          jnp.float32)
        trans = jnp.asarray(rng.normal([0.0, 280.0, 0.0], [20, 90, 20])[None],
                            jnp.float32)
        pose = convert(rot, trans, parameterization="euler_angles",
                       convention="ZXY")
        source, target = drr.detector(pose, None)
        sv, tv = drr.affine_inverse(source), drr.affine_inverse(target)
        w = jnp.linalg.norm(target - source, axis=-1)[:, None, :]
        ax = choose_march_axis(np.asarray(sv), np.asarray(tv))
        cfg = drr.pallas_cfg[ax]
        if cfg is None:
            continue
        # Exact parity additionally requires slab validity (the dispatch's
        # OTHER guard): rays with transverse/axial slope > 1 integrate
        # approximately under the rank-2 slab decomposition.
        d = np.abs(np.asarray(tv - sv))
        other = [a for a in range(3) if a != ax]
        ratio = np.max(np.maximum(d[..., other[0]], d[..., other[1]])
                       / np.maximum(d[..., ax], 1e-12))
        if ratio > 1.0:
            continue
        tile, ky, zw, zc = cfg
        fits = bool(footprint_fits(
            sv, tv, w, dims=drr.density.shape, image_shape=(16, 16),
            axis=ax, tile=tile, ky=ky, zw=zw, zc=zc))
        if not fits:
            n_nofit += 1
            continue
        n_fit += 1
        ref = np.asarray(siddon_raycast(drr.density, sv, tv, w))
        got = np.asarray(siddon_pallas_raycast(
            drr.density, sv, tv, w, image_shape=(16, 16), axis=ax,
            tile=tile, ky=ky, zw=zw, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-3 * np.abs(ref).max())
    assert n_fit >= 3  # the fuzz must actually exercise the parity claim


def test_boundary_gradient_parity_dense_volume():
    """Pose gradients with NON-AIR volume boundaries: the integral's
    boundary terms (-V(entry) d(amin) + V(exit) d(amax)) must match the
    oracle (regression: the kernel stop-gradiented amin/amax, biasing
    d/dsource by 218% on a dense-boundary volume)."""
    rng = np.random.default_rng(1)
    vol = jnp.asarray(1.0 + 0.5 * rng.random((32, 32, 32)).astype(np.float32))
    H = W = 16
    ys, zs = np.meshgrid(np.linspace(-4.0, 36.0, H),
                         np.linspace(-4.0, 36.0, W), indexing="ij")
    tv = jnp.asarray(np.stack(
        [np.full(ys.size, 70.0), ys.ravel(), zs.ravel()], 1), jnp.float32)[None]
    sv = jnp.asarray([[-70.0, 10.0, 12.0]], jnp.float32)[None]
    w = jnp.ones((1, 1, H * W), jnp.float32)

    def loss_ref(sv, tv, w):
        return jnp.sum(siddon_raycast(vol, sv, tv, w) ** 2)

    def loss_pal(sv, tv, w):
        return jnp.sum(siddon_pallas_raycast(
            vol, sv, tv, w, image_shape=(H, W), axis=0,
            tile=16, ky=64, zw=256, interpret=True) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(sv, tv, w)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(sv, tv, w)
    for a, b in zip(gr, gp):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(b, a, atol=2e-5 * max(np.abs(a).max(), 1.0))


def test_partial_entry_slab_not_dropped():
    """Rays entering the volume mid-slab keep the partial segment even when
    NO ray in the tile has its slab-center alpha inside the entry slab
    (regression: center-based plane activity dropped up to 0.5 voxel of
    boundary path per ray — exact match required on an all-ones volume)."""
    vol = jnp.ones((32, 32, 32), jnp.float32)
    H = W = 16
    x_e = 10.3  # all rays enter through the y-face in slab 10's second half
    y_s = -0.5 - 0.8 * (x_e + 50)
    jit = np.linspace(0, 0.02, H * W)
    sv = jnp.asarray(np.stack(
        [np.full(H * W, -50.0), np.full(H * W, y_s), np.full(H * W, 16.0)],
        1), jnp.float32)[None]
    tv = jnp.asarray(np.stack(
        [np.full(H * W, 50.0), np.full(H * W, y_s + 80.0), 16.0 + jit],
        1), jnp.float32)[None]
    w = jnp.ones((1, 1, H * W), jnp.float32)
    ref = np.asarray(siddon_raycast(vol, sv, tv, w))
    got = np.asarray(siddon_pallas_raycast(
        vol, sv, tv, w, image_shape=(H, W), axis=0,
        tile=16, ky=64, zw=256, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6 * np.abs(ref).max())


def test_pallas_siddon_max_reduce_parity():
    """MIP (reducefn='max') on the exact-Siddon kernel: per-segment maxima
    match the sorted oracle; gradients flow via the oracle-VJP route."""
    rng = np.random.default_rng(4)
    vol = jnp.asarray(rng.random((24, 24, 24)).astype(np.float32))
    H = W = 16
    ys, zs = np.meshgrid(np.linspace(1.0, 23.0, H),
                         np.linspace(1.0, 23.0, W), indexing="ij")
    tv = jnp.asarray(np.stack(
        [np.full(ys.size, 50.0), ys.ravel(), zs.ravel()], 1), jnp.float32)[None]
    sv = jnp.asarray([[[-50.0, 11.7, 12.3]]], jnp.float32)
    w = jnp.ones((1, 1, H * W), jnp.float32)

    ref = np.asarray(siddon_raycast(vol, sv, tv, w, reducefn="max"))
    got = np.asarray(siddon_pallas_raycast(
        vol, sv, tv, w, image_shape=(H, W), axis=0,
        tile=16, ky=64, zw=256, interpret=True, reducefn="max"))
    np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max())
    summed = np.asarray(siddon_raycast(vol, sv, tv, w))
    assert not np.allclose(got, summed)

    def loss_pal(rho):
        return jnp.sum(siddon_pallas_raycast(
            rho, sv, tv, w, image_shape=(H, W), axis=0,
            tile=16, ky=64, zw=256, interpret=True, reducefn="max") ** 2)

    def loss_ref(rho):
        return jnp.sum(siddon_raycast(rho, sv, tv, w, reducefn="max") ** 2)

    ga = np.asarray(jax.grad(loss_pal)(vol))
    gb = np.asarray(jax.grad(loss_ref)(vol))
    np.testing.assert_allclose(ga, gb, atol=1e-5 * max(np.abs(gb).max(), 1e-9))


def test_mip_gradients_in_kernel_match_oracle():
    """Exact-Siddon reducefn="max" backward runs in-kernel (argmax over
    slab*4+segment gates the analytic VJPs); gradient parity vs the
    sort-based oracle's max-VJP at generic poses."""
    from diffdrr_tpu.ops.siddon import siddon_raycast

    rng = np.random.default_rng(4)
    vol = jnp.asarray(rng.uniform(0.1, 1.0, (40, 36, 32)), jnp.float32)
    H = W = 16
    src = jnp.asarray([[[-25.3137, 17.351, 15.2321]]], jnp.float32)
    u, v = np.meshgrid(np.linspace(5.1371, 30.211, H),
                       np.linspace(4.0913, 27.317, W), indexing="ij")
    tgt = jnp.asarray(np.stack([np.full_like(u, 70.137), u, v], -1)
                      .reshape(1, H * W, 3), jnp.float32)
    wgt = jnp.linalg.norm(tgt - src, axis=-1)[:, None, :]
    kw = dict(image_shape=(H, W), axis=0, tile=16, ky=64, zw=256, zc=128,
              interpret=True)

    def loss(f):
        return lambda *a: jnp.sum(f(*a) ** 2)

    gr = jax.grad(loss(lambda v_, s_, t_, w_: siddon_raycast(
        v_, s_, t_, w_, reducefn="max")), argnums=(0, 1, 2, 3))(
        vol, src, tgt, wgt)
    gk = jax.grad(loss(lambda v_, s_, t_, w_: siddon_pallas_raycast(
        v_, s_, t_, w_, reducefn="max", **kw)), argnums=(0, 1, 2, 3))(
        vol, src, tgt, wgt)
    for a, b in zip(gr, gk):
        err = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
        assert err < 1e-4, err


def test_fused_pose_bwd_matches_two_kernel_path(scene):
    """Fused value+gradient march vs lean fwd + bwd re-march (exact Siddon,
    round 4): same gradients; values agree to float-reassociation noise
    (the fused value sums per-segment products in a different order)."""
    drr, sv, tv, weights, ax = scene
    vol = drr.density

    def make_loss(fused):
        def loss(s, t, w):
            out = siddon_pallas_raycast(
                vol, s, t, w, image_shape=(32, 32), axis=ax,
                tile=16, ky=64, zw=256, interpret=True,
                fused_pose_bwd=fused,
            )
            return jnp.sum(jnp.sin(out * 0.1))
        return loss

    va, ga = jax.value_and_grad(make_loss(True), argnums=(0, 1, 2))(
        sv, tv, weights)
    vb, gb = jax.value_and_grad(make_loss(False), argnums=(0, 1, 2))(
        sv, tv, weights)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6 * np.abs(b).max() + 1e-12)


def test_detector_inside_volume_full_line_semantics():
    """Round-4 regression: the reference's sort-based Siddon integrates the
    FULL line's crossing of the volume — it never clips to the
    [source, target] parametric segment (renderers.py:94-113). The kernel's
    [0, 1] clamp on the slab interval truncated rays whose detector sits
    inside a tall volume (30% undercount on central rays at 96x96x320 on
    hardware). Kernel must match the oracle, which matches torch."""
    subject = load_example_ct(shape=(64, 64, 200))
    drr = DRR(subject, sdd=1020.0, height=32, delx=8.0, renderer="siddon")
    rot = jnp.asarray([[0.01, np.pi / 2 + 0.02, -0.01]], jnp.float32)
    trans = jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32)
    pose = convert(rot, trans, parameterization="euler_angles",
                   convention="ZXY")
    src, tgt = drr.detector(pose, None)
    sv, tv = drr.affine_inverse(src), drr.affine_inverse(tgt)
    w = jnp.linalg.norm(tv - sv, axis=-1)[:, None, :]
    # The tall volume (200 * 2.5 mm = 500 mm along the march axis) extends
    # past the detector plane: rays END inside the volume.
    tile, ky, zw, zc = drr.pallas_cfg[2]
    k = siddon_pallas_raycast(drr.density, sv, tv, w, image_shape=(32, 32),
                              axis=2, tile=tile, ky=ky, zw=zw, zc=zc,
                              interpret=True)
    from diffdrr_tpu.ops.siddon import siddon_raycast

    o = siddon_raycast(drr.density, sv, tv, w)
    np.testing.assert_allclose(np.asarray(k), np.asarray(o),
                               atol=2e-4 * float(jnp.abs(o).max()))


def test_streaming_plane_major_interpret_parity():
    """Plane-major streaming forward (round 5) vs the sort-based oracle in
    interpret mode — the streaming dispatch now takes this path for scalar
    sum-reduce renders."""
    import numpy as np
    import jax.numpy as jnp

    from diffdrr_tpu import DRR, load_example_ct, convert
    from diffdrr_tpu.ops.siddon import siddon_raycast
    from diffdrr_tpu.ops.pallas.siddon import siddon_pallas_raycast

    subject = load_example_ct(shape=(64, 64, 32))
    drr = DRR(subject, sdd=800.0, height=32, delx=2.0)
    rot = jnp.array([[0.013, np.pi / 2 + 0.017, -0.011]], jnp.float32)
    trans = jnp.array([[3.0, 401.0, -2.0]], jnp.float32)
    pose = convert(rot, trans, parameterization="euler_angles",
                   convention="ZXY")
    source, target = drr.detector(pose, None)
    weights = jnp.linalg.norm(target - source, axis=-1)[:, None, :]
    sv, tv = drr.affine_inverse(source), drr.affine_inverse(target)

    ref = np.asarray(siddon_raycast(drr.density, sv, tv, weights))
    got = np.asarray(siddon_pallas_raycast(
        drr.density, sv, tv, weights, image_shape=(32, 32), axis=2,
        tile=16, ky=64, zw=256, interpret=True,
        resident=False)).reshape(ref.shape)
    np.testing.assert_allclose(got, ref, atol=2e-3 * np.abs(ref).max())
