"""Registration tests: the flagship workload (SURVEY §3.3).

The minimum end-to-end slice from SURVEY §7: render a target at a known pose,
perturb it, and recover the pose by gradient descent through the renderer.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct, convert
from diffdrr_tpu.metrics import DoubleGeodesicSE3
from diffdrr_tpu.registration import (
    Registration,
    PoseRegressor,
    optimize,
    make_registration_step,
    N_ANGULAR_COMPONENTS,
)


@pytest.fixture(scope="module")
def setup():
    subject = load_example_ct(shape=(48, 48, 24))
    drr = DRR(subject, sdd=800.0, height=32, delx=3.0, renderer="trilinear")
    rot_true = jnp.asarray([[0.05, np.pi / 2 + 0.03, -0.04]], jnp.float32)
    trans_true = jnp.asarray([[2.0, 400.0, -3.0]], jnp.float32)
    target = drr(
        rot_true, trans_true, parameterization="euler_angles", convention="ZXY",
        n_points=200,
    )
    return subject, drr, rot_true, trans_true, target


def test_registration_object(setup):
    _, drr, rot_true, trans_true, target = setup
    reg = Registration(drr, rot_true, trans_true, "euler_angles", "ZXY")
    img = reg(n_points=200)
    np.testing.assert_allclose(np.asarray(img), np.asarray(target), atol=1e-5)
    # pytree: gradients w.r.t. the registration leaves flow.
    def loss(reg):
        return jnp.sum(reg(n_points=100) ** 2)

    g = jax.grad(loss)(reg)
    assert np.abs(np.asarray(g._rotation)).sum() > 0
    assert np.abs(np.asarray(g._translation)).sum() > 0


def test_gradient_descent_recovers_pose(setup):
    _, drr, rot_true, trans_true, target = setup
    rot0 = rot_true + jnp.asarray([[0.04, -0.05, 0.03]], jnp.float32)
    trans0 = trans_true + jnp.asarray([[6.0, -8.0, 5.0]], jnp.float32)

    geo = DoubleGeodesicSE3(sdd=800.0)
    pose_true = convert(
        rot_true, trans_true, parameterization="euler_angles", convention="ZXY"
    )

    def geodesic(rot, trans):
        pose = convert(
            rot, trans, parameterization="euler_angles", convention="ZXY"
        )
        return float(geo(pose_true, pose)[2][0])

    before = geodesic(rot0, trans0)
    rot, trans, trace = optimize(
        drr, target, rot0, trans0, "euler_angles", "ZXY",
        n_iters=150, lr_rotation=2e-3, lr_translation=6e-1, n_points=200,
    )
    after = geodesic(rot, trans)
    assert after < before * 0.25, (before, after, trace[-5:])
    assert trace[-1] > trace[0]


def test_registration_step_is_jittable(setup):
    _, drr, rot_true, trans_true, target = setup
    init_fn, step_fn = make_registration_step(
        drr, target, "euler_angles", "ZXY", n_points=100
    )
    params, opt_state = init_fn(rot_true, trans_true)
    params, opt_state, score = step_fn(params, opt_state)
    assert np.isfinite(float(score))


@pytest.mark.parametrize("parameterization", list(N_ANGULAR_COMPONENTS))
def test_pose_regressor_all_parameterizations(parameterization):
    conv = "ZYX" if parameterization == "euler_angles" else None
    model = PoseRegressor(parameterization=parameterization, convention=conv,
                          model_name="small")
    x = jnp.ones((2, 1, 32, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    pose = model.apply(params, x)
    R = np.asarray(pose.rotation)
    assert R.shape == (2, 3, 3)
    # Valid rotations: R^T R = I, det = +1.
    np.testing.assert_allclose(
        np.einsum("bij,bik->bjk", R, R), np.broadcast_to(np.eye(3), R.shape),
        atol=1e-4,
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)


def test_pose_regressor_trains_end_to_end():
    """Gradients flow through convert for network training."""
    model = PoseRegressor(parameterization="rotation_6d", model_name="small")
    x = jnp.ones((1, 1, 32, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    target = jnp.eye(4)[None]

    def loss(params):
        pose = model.apply(params, x)
        return jnp.sum((pose.matrix - target) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(np.abs(np.asarray(l)).sum()) for l in leaves) > 0


def test_multiscale_registration_recovers_pose(setup):
    from diffdrr_tpu.registration import optimize_multiscale

    _, drr, rot_true, trans_true, target = setup
    rot0 = rot_true + jnp.asarray([[0.05, -0.06, 0.04]], jnp.float32)
    trans0 = trans_true + jnp.asarray([[8.0, -10.0, 7.0]], jnp.float32)

    geo = DoubleGeodesicSE3(sdd=800.0)
    pose_true = convert(
        rot_true, trans_true, parameterization="euler_angles", convention="ZXY"
    )

    rot, trans, traces = optimize_multiscale(
        drr, target, rot0, trans0, "euler_angles", "ZXY",
        scales=(0.5, 1.0), n_iters_per_scale=90,
        lr_rotation=2e-3, lr_translation=6e-1, n_points=200,
    )
    pose0 = convert(rot0, trans0, parameterization="euler_angles",
                    convention="ZXY")
    pose1 = convert(rot, trans, parameterization="euler_angles",
                    convention="ZXY")
    before = float(geo(pose_true, pose0)[2][0])
    after = float(geo(pose_true, pose1)[2][0])
    assert after < before * 0.35, (before, after)
    assert len(traces) == 2


def test_optimizer_variants_descend(setup):
    """SGD+momentum/dampening and LBFGS improve the similarity score
    (reference experiment sweep, experiments/registration.py:74-116)."""
    _, drr, rot_true, trans_true, target = setup
    rot0 = rot_true + jnp.asarray([[0.03, -0.03, 0.02]], jnp.float32)
    trans0 = trans_true + jnp.asarray([[5.0, -6.0, 4.0]], jnp.float32)

    for opt, kwargs in [
        ("sgd", dict(momentum=0.9, dampening=0.9, lr_rotation=5e-3,
                     lr_translation=5e-1)),
        ("lbfgs", dict()),
    ]:
        _, _, trace = optimize(
            drr, target, rot0, trans0, "euler_angles", "ZXY",
            n_iters=12, optimizer=opt, n_points=100, **kwargs,
        )
        assert trace[-1] > trace[0] + 1e-4, (opt, trace[0], trace[-1])


def test_scan_loop_matches_python_loop(setup):
    """The on-device lax.scan loop computes the same trajectory as the
    per-step Python loop (single dispatch, single host sync)."""
    _, drr, rot_true, trans_true, target = setup
    rot0 = rot_true + jnp.asarray([[0.02, -0.02, 0.01]], jnp.float32)
    trans0 = trans_true + jnp.asarray([[3.0, -4.0, 2.0]], jnp.float32)

    # One step: tight parity (same math, different compilation strategies).
    r1, t1, trace1 = optimize(drr, target, rot0, trans0, "euler_angles",
                              "ZXY", n_iters=1, scan=True, n_points=100)
    r2, t2, trace2 = optimize(drr, target, rot0, trans0, "euler_angles",
                              "ZXY", n_iters=1, scan=False, n_points=100)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-4)
    np.testing.assert_allclose(trace1, trace2, atol=1e-5)

    # Eight steps: the two compilations reassociate f32 differently and the
    # optimizer amplifies the drift, so parity is only approximate.
    r1, t1, trace1 = optimize(drr, target, rot0, trans0, "euler_angles",
                              "ZXY", n_iters=8, scan=True, n_points=100)
    r2, t2, trace2 = optimize(drr, target, rot0, trans0, "euler_angles",
                              "ZXY", n_iters=8, scan=False, n_points=100)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-3)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-1)
    np.testing.assert_allclose(trace1, trace2, atol=1e-3)


def test_optimize_until_converges_on_device(setup):
    """while_loop registration stops at the geodesic tolerance with zero
    host syncs (the reference's 1 mm convergence criterion)."""
    from diffdrr_tpu.registration import optimize_until

    _, drr, rot_true, trans_true, target = setup
    rot0 = rot_true + jnp.asarray([[0.015, -0.015, 0.01]], jnp.float32)
    trans0 = trans_true + jnp.asarray([[3.0, -3.0, 2.0]], jnp.float32)
    pose_true = convert(rot_true, trans_true,
                        parameterization="euler_angles", convention="ZXY")

    geo = DoubleGeodesicSE3(sdd=800.0)
    d0 = float(geo(pose_true, convert(rot0, trans0,
               parameterization="euler_angles", convention="ZXY"))[2].max())
    rot, trans, n, dist = optimize_until(
        drr, target, rot0, trans0, "euler_angles", "ZXY",
        true_pose=pose_true, tol_mm=max(1.0, d0 / 3), max_iters=150,
        lr_rotation=5e-3, lr_translation=5e-1, n_points=100,
    )
    assert float(dist) <= max(1.0, d0 / 3) or int(n) == 150
    assert float(dist) < d0  # strictly improved


def test_optimize_multistart_matches_independent_runs(setup):
    """Batched restarts are EXACTLY N independent optimizations (elementwise
    Adam + summed per-restart loss), and the winner is the best init."""
    from diffdrr_tpu.registration import optimize_multistart

    _, drr, rot_true, trans_true, target = setup
    # Three restarts: near-true, moderate, far.
    offs_r = jnp.asarray([[0.005, -0.005, 0.0],
                          [0.05, -0.05, 0.04],
                          [0.4, 0.3, -0.35]], jnp.float32)
    offs_t = jnp.asarray([[1.0, -1.0, 0.5],
                          [6.0, -5.0, 4.0],
                          [25.0, 20.0, -22.0]], jnp.float32)
    rots0 = rot_true + offs_r
    transs0 = trans_true + offs_t

    rots, transs, scores, trace = optimize_multistart(
        drr, target, rots0, transs0, "euler_angles", "ZXY",
        n_iters=6, lr_rotation=2e-3, lr_translation=3e-1, n_points=100,
    )
    assert rots.shape == (3, 3) and scores.shape == (3,)
    assert trace.shape == (6, 3)
    assert int(jnp.argmax(scores)) == 0  # best init wins
    # scores improve over the loop for the near starts
    assert float(trace[-1, 0]) >= float(trace[0, 0]) - 1e-4

    # Equivalence with running each restart alone (exact in exact
    # arithmetic — the summed loss has independent per-restart gradients and
    # Adam is elementwise; in f32 the batched render's different reduction
    # order drifts trajectories at the ~1e-3 level over 6 Adam steps).
    for i in range(2):
        r1, t1, tr1 = optimize(
            drr, target, rots0[i:i + 1], transs0[i:i + 1], "euler_angles",
            "ZXY", n_iters=6, lr_rotation=2e-3, lr_translation=3e-1,
            n_points=100,
        )
        np.testing.assert_allclose(np.asarray(r1)[0], np.asarray(rots)[i],
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(t1)[0], np.asarray(transs)[i],
                                   rtol=2e-3, atol=0.3)
        np.testing.assert_allclose(np.asarray(tr1),
                                   np.asarray(trace)[:, i], atol=1e-3)


def test_optimize_multistart_lbfgs(setup):
    """LBFGS restarts run independently under one lax.map (each with its
    own line search), returning the same contract as the batched path."""
    from diffdrr_tpu.registration import optimize_multistart

    _, drr, rot_true, trans_true, target = setup
    rots0 = rot_true[0] + jnp.asarray(
        [[0.01, -0.01, 0.0], [0.2, 0.15, -0.18]], jnp.float32)
    transs0 = trans_true[0] + jnp.asarray(
        [[1.0, -1.0, 0.5], [15.0, 12.0, -14.0]], jnp.float32)

    rots, transs, scores, trace = optimize_multistart(
        drr, target, rots0, transs0, "euler_angles", "ZXY",
        optimizer="lbfgs", n_iters=4, n_points=100,
    )
    assert rots.shape == (2, 3) and transs.shape == (2, 3)
    assert scores.shape == (2,) and trace.shape == (4, 2)
    assert np.isfinite(np.asarray(scores)).all()
    # The near start must score at least as well as the far one, and each
    # restart must match running it alone through the lbfgs step path.
    assert float(scores[0]) >= float(scores[1]) - 1e-4
    r1, t1, tr1 = optimize(
        drr, target, rots0[0:1], transs0[0:1], "euler_angles", "ZXY",
        optimizer="lbfgs", n_iters=4, n_points=100,
    )
    np.testing.assert_allclose(np.asarray(r1)[0], np.asarray(rots)[0],
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(tr1), np.asarray(trace)[:, 0],
                               atol=1e-3)


def test_sgd_momentum_matches_torch():
    """_sgd_momentum must track torch.optim.SGD exactly, INCLUDING the first
    step (torch initializes the buffer to the raw gradient — no dampening)."""
    import torch
    import optax
    from diffdrr_tpu.registration import _sgd_momentum

    lr, momentum, dampening = 0.1, 0.9, 0.9
    rng = np.random.default_rng(3)
    p0 = rng.normal(size=(5,)).astype(np.float32)
    grads = [rng.normal(size=(5,)).astype(np.float32) for _ in range(4)]

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.SGD([tp], lr=lr, momentum=momentum,
                           dampening=dampening)
    tx = _sgd_momentum(lr, momentum=momentum, dampening=dampening)
    jp = jnp.asarray(p0)
    state = tx.init(jp)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()
        updates, state = tx.update(jnp.asarray(g), state)
        jp = optax.apply_updates(jp, updates)
        np.testing.assert_allclose(np.asarray(jp),
                                   tp.detach().numpy(), atol=1e-6)


def test_rescaled_drr_preserves_fov_and_options():
    """Coarse multiscale DRRs cover the SAME physical plane (regression:
    the delx/dely rescale ratios were swapped — masked by square detectors)
    and inherit constructor-consumed options."""
    from diffdrr_tpu.registration import rescaled_drr

    subject = load_example_ct(shape=(32, 32, 16))
    drr = DRR(subject, sdd=700.0, height=32, width=64, delx=2.0, dely=3.0,
              renderer="trilinear", storage="bf16",
              checkpoint_gradients=True)
    c = rescaled_drr(drr, 0.3)
    # FOV preserved exactly on BOTH axes despite rounding/clamping.
    np.testing.assert_allclose(c.detector.width * c.detector.delx,
                               64 * 2.0, rtol=1e-6)
    np.testing.assert_allclose(c.detector.height * c.detector.dely,
                               32 * 3.0, rtol=1e-6)
    assert c.pallas_storage == "bf16"
    assert c.checkpoint_gradients is True


def test_gradient_ncc_polish_endgame(setup):
    """The round-5 endgame finding (tools/diag_reg2.py): on flat-air
    phantoms, patch NCC's value landscape is NOT maximal at the true pose
    (eps-floored flat patches contribute noise that can prefer mm-scale
    offsets), while gradient NCC's is exact — score(true) = 1.0 and every
    small pose offset strictly decreases it, including the depth direction
    patch NCC is nearly blind to. The full-scale registration experiment's
    --polish-iters stage relies on this.
    """
    from diffdrr_tpu.metrics import GradientNormalizedCrossCorrelation2d

    _, drr, rot_true, trans_true, target = setup
    gncc = GradientNormalizedCrossCorrelation2d()

    def score(drot, dtrans):
        img = drr(
            rot_true + jnp.asarray([drot], jnp.float32),
            trans_true + jnp.asarray([dtrans], jnp.float32),
            parameterization="euler_angles", convention="ZXY", n_points=200,
        )
        return float(gncc(img, target)[0])

    s0 = score((0, 0, 0), (0, 0, 0))
    np.testing.assert_allclose(s0, 1.0, atol=1e-6)
    offsets = [
        ((0.02, 0, 0), (0, 0, 0)),
        ((0, 0.02, 0), (0, 0, 0)),
        ((0, 0, 0.02), (0, 0, 0)),
        ((0, 0, 0), (1.5, 0, 0)),
        ((0, 0, 0), (0, 1.5, 0)),   # depth: the patch-NCC blind spot
        ((0, 0, 0), (0, -1.5, 0)),
        ((0, 0, 0), (0, 0, 1.5)),
    ]
    for drot, dtrans in offsets:
        assert score(drot, dtrans) < s0 - 1e-6, (drot, dtrans)


def test_gradient_ncc_descends_from_millimetre_offset(setup):
    """Adam on gradient NCC from a ~2 mm offset reaches deep sub-mm pose
    error — the polish-stage contract behind the full-scale experiment's
    0.014 mm convergence record (experiments/results_fullscale)."""
    from diffdrr_tpu.metrics import GradientNormalizedCrossCorrelation2d

    _, drr, rot_true, trans_true, target = setup
    geo = DoubleGeodesicSE3(sdd=800.0)
    pose_true = convert(rot_true, trans_true,
                        parameterization="euler_angles", convention="ZXY")
    rot, trans, trace = optimize(
        drr, target, rot_true + 0.004, trans_true + 1.5,
        "euler_angles", "ZXY", n_iters=150,
        lr_rotation=1e-3, lr_translation=1e-1, n_points=200,
        metric=GradientNormalizedCrossCorrelation2d(),
    )
    pose = convert(rot, trans, parameterization="euler_angles",
                   convention="ZXY")
    _, _, dgeo0 = geo(pose_true, convert(
        rot_true + 0.004, trans_true + 1.5,
        parameterization="euler_angles", convention="ZXY"))
    _, _, dgeo = geo(pose_true, pose)
    assert float(trace[-1]) > float(trace[0])
    assert float(dgeo[0]) < 0.5 < float(dgeo0[0])
