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
