"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY §4 item 5)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct, convert
from diffdrr_tpu.parallel import (
    make_mesh,
    make_sharded_render,
    slab_sharded_raycast,
    make_reconstruction_step,
    shard_drr,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def setup():
    subject = load_example_ct(shape=(32, 32, 16))
    drr = DRR(subject, sdd=600.0, height=16, delx=4.0, renderer="trilinear")
    rot = jnp.asarray([[0.0, np.pi / 2, 0.0]] * 2, jnp.float32)
    trans = jnp.asarray([[0.0, 300.0, 0.0]] * 2, jnp.float32)
    return subject, drr, rot, trans


def test_ray_sharded_render_matches_single(setup):
    _, drr, rot, trans = setup
    expect = drr(rot, trans, parameterization="euler_angles", convention="ZXY",
                 n_points=100)

    mesh = make_mesh((2, 4), ("data", "rays"))
    render = make_sharded_render(
        drr, mesh, "euler_angles", "ZXY", n_points=100
    )
    got = render(rot, trans)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-4,
                               atol=1e-5)


def test_slab_sharded_matches_replicated(setup):
    subject, drr, rot, trans = setup
    pose = convert(rot, trans, parameterization="euler_angles", convention="ZXY")
    source, target = drr.detector(pose, None)
    weights = jnp.linalg.norm(target - source, axis=-1)[:, None, :]
    source_v = drr.affine_inverse(source)
    target_v = drr.affine_inverse(target)

    from diffdrr_tpu.ops.trilinear import trilinear_raycast

    expect = trilinear_raycast(
        drr.density, source_v, target_v, weights, n_points=100
    )

    mesh = make_mesh((8,), ("rays",))
    got = slab_sharded_raycast(
        drr.density, source_v, target_v, weights, mesh, axis="rays",
        n_points=100,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-3,
                               atol=1e-4)


def test_distributed_reconstruction_step_descends(setup):
    subject, drr, rot, trans = setup
    measured = drr(rot, trans, parameterization="euler_angles", convention="ZXY",
                   n_points=50)

    mesh = make_mesh((2, 4), ("data", "rays"))
    init_fn, step_fn = make_reconstruction_step(
        drr, mesh, lr=5e-2, n_points=50
    )
    density0 = jnp.zeros_like(drr.density)
    density, opt_state = init_fn(density0)
    losses = []
    for _ in range(5):
        density, opt_state, loss = step_fn(density, opt_state, rot, trans, measured)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_shard_drr_render_gradients(setup):
    """Pose gradients flow through a sharded render identically."""
    _, drr, rot, trans = setup

    def loss(drr, rot):
        img = drr(rot, trans, parameterization="euler_angles", convention="ZXY",
                  n_points=50)
        return jnp.sum(img**2)

    g_single = jax.grad(loss, argnums=1)(drr, rot)
    mesh = make_mesh((1, 8), ("data", "rays"))
    drr_sharded = shard_drr(drr, mesh)
    g_sharded = jax.grad(loss, argnums=1)(drr_sharded, rot)
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_single), rtol=1e-3, atol=1e-5
    )


def test_slab_sharded_joseph_matches_replicated(setup):
    """Joseph march-axis slab sharding (zero-halo, one psum) == replicated."""
    from diffdrr_tpu.parallel import slab_sharded_joseph
    from diffdrr_tpu.ops.joseph import joseph_raycast, choose_march_axis

    subject, drr, rot, trans = setup
    pose = convert(rot, trans, parameterization="euler_angles",
                   convention="ZXY")
    source, target = drr.detector(pose, None)
    weights = jnp.linalg.norm(target - source, axis=-1)[:, None, :]
    sv, tv = drr.affine_inverse(source), drr.affine_inverse(target)
    ax = choose_march_axis(np.asarray(sv), np.asarray(tv))

    expect = np.asarray(joseph_raycast(drr.density, sv, tv, weights, axis=ax))
    mesh = make_mesh((8,), ("rays",))
    got = np.asarray(slab_sharded_joseph(
        drr.density, sv, tv, weights, mesh, axis="rays", march_axis=ax,
    ))
    np.testing.assert_allclose(got, expect, rtol=1e-4,
                               atol=1e-4 * np.abs(expect).max())


def test_sharded_render_production_joseph(setup):
    """Ray sharding composes with the production joseph dispatch (the
    lax.switch + sharded-target composition, VERDICT round-1 weak #9)."""
    subject, _, rot, trans = setup
    drr_j = DRR(subject, sdd=600.0, height=16, delx=4.0, renderer="joseph")
    expect = drr_j(rot, trans, parameterization="euler_angles",
                   convention="ZXY")

    mesh = make_mesh((2, 4), ("data", "rays"))
    render = make_sharded_render(drr_j, mesh, "euler_angles", "ZXY")
    got = render(rot, trans)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-4,
                               atol=1e-5)


def test_multihost_shapes_single_process():
    """Multi-host helpers run (degenerately) in a single process: the code
    shape the DCN path uses — global mesh, process-local slices, global
    array assembly — exercised end to end."""
    from diffdrr_tpu.parallel import (
        initialize_distributed, global_mesh, local_batch_to_global,
        process_local_slice,
    )
    from jax.sharding import PartitionSpec as P

    initialize_distributed()  # no-op single-process
    mesh = global_mesh((1, 8), ("data", "rays"))
    start, size = process_local_slice(8)
    assert (start, size) == (0, 8)
    local = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = local_batch_to_global(mesh, P("data"), local)
    np.testing.assert_allclose(np.asarray(arr), local)

    # A sharded render fed by globally-assembled pose batches.
    subject = load_example_ct(shape=(16, 16, 8))
    drr = DRR(subject, sdd=400.0, height=8, delx=4.0, renderer="trilinear")
    mesh2 = global_mesh((8, 1), ("data", "rays"))
    rot = np.tile(np.asarray([[0.0, np.pi / 2, 0.0]], np.float32), (8, 1))
    trans = np.tile(np.asarray([[0.0, 200.0, 0.0]], np.float32), (8, 1))
    rot_g = local_batch_to_global(mesh2, P("data"), rot)
    trans_g = local_batch_to_global(mesh2, P("data"), trans)
    img = drr(rot_g, trans_g, parameterization="euler_angles",
              convention="ZXY", n_points=16)
    assert np.isfinite(np.asarray(img)).all()
    assert img.shape == (8, 1, 8, 8)


def test_slab_sharded_siddon_matches_replicated(setup):
    """Exact-Siddon slab sharding == replicated render, values AND pose
    gradients (slab boundaries are grid planes, so the segment partition is
    exact — not an approximation)."""
    from diffdrr_tpu.parallel import slab_sharded_siddon
    from diffdrr_tpu.ops.siddon import siddon_raycast

    subject, drr, rot, trans = setup
    # Generic pose: keep midpoints off exact grid alignments.
    pose = convert(rot + 0.013, trans + 1.7, parameterization="euler_angles",
                   convention="ZXY")
    source, target = drr.detector(pose, None)
    weights = jnp.linalg.norm(target - source, axis=-1)[:, None, :]
    sv, tv = drr.affine_inverse(source), drr.affine_inverse(target)
    mesh = make_mesh((8,), ("rays",))

    def full(sv, tv):
        return jnp.sum(siddon_raycast(drr.density, sv, tv, weights))

    def sharded(sv, tv):
        return jnp.sum(slab_sharded_siddon(
            drr.density, sv, tv, weights, mesh, axis="rays", slab_axis=0))

    expect = np.asarray(siddon_raycast(drr.density, sv, tv, weights))
    got = np.asarray(slab_sharded_siddon(
        drr.density, sv, tv, weights, mesh, axis="rays", slab_axis=0))
    np.testing.assert_allclose(got, expect, rtol=1e-4,
                               atol=1e-4 * np.abs(expect).max())

    g_full = jax.grad(full, argnums=(0, 1))(sv, tv)
    g_shard = jax.grad(sharded, argnums=(0, 1))(sv, tv)
    for a, b in zip(g_full, g_shard):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3,
            atol=1e-4 * np.abs(np.asarray(a)).max())


def test_slab_sharded_joseph_pallas_kernel(setup):
    """The >HBM-volume production path: the Pallas joseph kernel running
    per-slab under shard_map (interpret mode on the CPU mesh) matches the
    replicated XLA render."""
    from diffdrr_tpu.parallel import slab_sharded_joseph
    from diffdrr_tpu.ops.joseph import joseph_raycast

    subject, drr, rot, trans = setup
    pose = convert(rot + 0.011, trans + 1.3, parameterization="euler_angles",
                   convention="ZXY")
    source, target = drr.detector(pose, None)
    weights = jnp.linalg.norm(target - source, axis=-1)[:, None, :]
    sv, tv = drr.affine_inverse(source), drr.affine_inverse(target)
    mesh = make_mesh((8,), ("rays",))

    expect = np.asarray(joseph_raycast(drr.density, sv, tv, weights, axis=0))
    got = np.asarray(slab_sharded_joseph(
        drr.density, sv, tv, weights, mesh, axis="rays", march_axis=0,
        use_pallas=True, image_shape=(16, 16),
        pallas_kwargs=dict(tile=16, ky=64, zw=128, interpret=True),
    ))
    np.testing.assert_allclose(got, expect, rtol=1e-4,
                               atol=1e-4 * np.abs(expect).max())


def test_slab_sharded_siddon_pallas_kernel(setup):
    """Exact-Siddon Pallas kernel per slab under shard_map == sorted XLA."""
    from diffdrr_tpu.parallel import slab_sharded_siddon
    from diffdrr_tpu.ops.siddon import siddon_raycast

    subject, drr, rot, trans = setup
    pose = convert(rot + 0.011, trans + 1.3, parameterization="euler_angles",
                   convention="ZXY")
    source, target = drr.detector(pose, None)
    weights = jnp.linalg.norm(target - source, axis=-1)[:, None, :]
    sv, tv = drr.affine_inverse(source), drr.affine_inverse(target)
    mesh = make_mesh((8,), ("rays",))

    expect = np.asarray(siddon_raycast(drr.density, sv, tv, weights))
    # March/slab axis must be the rays' MAJOR axis (kernel validity domain);
    # for this pose that is axis 2.
    got = np.asarray(slab_sharded_siddon(
        drr.density, sv, tv, weights, mesh, axis="rays", slab_axis=2,
        use_pallas=True, image_shape=(16, 16),
        pallas_kwargs=dict(tile=16, ky=64, zw=128, interpret=True),
    ))
    np.testing.assert_allclose(got, expect, rtol=1e-4,
                               atol=1e-4 * np.abs(expect).max())
