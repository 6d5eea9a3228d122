"""Pose algebra tests: round-trips for all 9 parameterizations + Lie maps.

Strategy per SURVEY §4: property-test `convert(T.convert(p)) ≈ T` for every
parameterization, validate rotations against scipy (an independent oracle),
and check SE(3) exp/log against scipy.linalg matrix exp/log.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation
import scipy.linalg

from diffdrr_tpu.pose import (
    RigidTransform,
    convert,
    make_matrix,
    random_rigid_transform,
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    euler_angles_to_matrix,
    matrix_to_euler_angles,
    quaternion_to_matrix,
    matrix_to_quaternion,
    rotation_6d_to_matrix,
    rotation_10d_to_quaternion,
    quaternion_to_rotation_10d,
    quaternion_adjugate_to_quaternion,
    quaternion_to_quaternion_adjugate,
    se3_exp_map,
    se3_log_map,
    so3_log_map,
    hat,
    standardize_quaternion,
)

PARAMS = [
    ("axis_angle", None),
    ("euler_angles", "ZYX"),
    ("euler_angles", "XYZ"),
    ("euler_angles", "ZXZ"),
    ("quaternion", None),
    ("quaternion_adjugate", None),
    ("rotation_6d", None),
    ("rotation_9d", None),
    ("rotation_10d", None),
    ("se3_log_map", None),
]


def _random_T(seed, batch=4):
    return random_rigid_transform(jax.random.PRNGKey(seed), batch)


@pytest.mark.parametrize("parameterization,convention", PARAMS)
def test_roundtrip(parameterization, convention):
    T = _random_T(0)
    rot, trans = T.convert(parameterization, convention)
    T2 = convert(rot, trans, parameterization=parameterization, convention=convention)
    np.testing.assert_allclose(np.asarray(T2.matrix), np.asarray(T.matrix), atol=2e-4)


def test_matrix_roundtrip():
    T = _random_T(1)
    rot, trans = T.convert("matrix")
    # The "matrix" parameterization takes the full 4x4 matrix.
    T2 = convert(np.asarray(T.matrix), parameterization="matrix")
    np.testing.assert_allclose(np.asarray(T2.matrix), np.asarray(T.matrix), atol=1e-6)


def test_camera_center_convention():
    """convert() stores R @ t as the matrix translation (reference pose.py:149-157)."""
    rng = np.random.default_rng(0)
    rot = Rotation.random(3, random_state=1)
    t = rng.normal(size=(3, 3)).astype(np.float32) * 50
    T = convert(
        jnp.asarray(rot.as_euler("ZYX"), jnp.float32),
        jnp.asarray(t),
        parameterization="euler_angles",
        convention="ZYX",
    )
    R = rot.as_matrix().astype(np.float32)
    np.testing.assert_allclose(np.asarray(T.rotation), R, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(T.translation), np.einsum("bij,bj->bi", R, t), atol=1e-4
    )
    # And .convert returns the original t.
    _, t_back = T.convert("euler_angles", "ZYX")
    np.testing.assert_allclose(np.asarray(t_back), t, atol=1e-3)


def test_euler_vs_scipy():
    """Euler convention must match scipy's intrinsic (capital) conventions."""
    rng = np.random.default_rng(2)
    angles = rng.uniform(-1.2, 1.2, (5, 3)).astype(np.float32)
    for conv in ["ZYX", "XYZ", "ZXY"]:
        ours = np.asarray(euler_angles_to_matrix(jnp.asarray(angles), conv))
        theirs = Rotation.from_euler(conv, angles).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)
        back = np.asarray(matrix_to_euler_angles(jnp.asarray(theirs, jnp.float32), conv))
        np.testing.assert_allclose(back, angles, atol=1e-4)


def test_quaternion_vs_scipy():
    q = Rotation.random(6, random_state=3).as_quat()  # scipy: (x, y, z, w)
    q_wxyz = np.concatenate([q[:, 3:], q[:, :3]], axis=1).astype(np.float32)
    ours = np.asarray(quaternion_to_matrix(jnp.asarray(q_wxyz)))
    theirs = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    q_back = np.asarray(matrix_to_quaternion(jnp.asarray(theirs, jnp.float32)))
    expect = np.where(q_wxyz[:, :1] < 0, -q_wxyz, q_wxyz)
    np.testing.assert_allclose(q_back, expect, atol=1e-4)


def test_axis_angle_vs_scipy():
    rv = Rotation.random(6, random_state=4).as_rotvec().astype(np.float32)
    ours = np.asarray(axis_angle_to_matrix(jnp.asarray(rv)))
    theirs = Rotation.from_rotvec(rv).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    back = np.asarray(matrix_to_axis_angle(jnp.asarray(theirs, jnp.float32)))
    np.testing.assert_allclose(back, rv, atol=1e-4)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(5)
    v = rng.normal(size=(8, 6)).astype(np.float32)
    v[:, 3:] *= 0.8  # keep rotation below pi
    T = np.asarray(se3_exp_map(jnp.asarray(v)))
    v_back = np.asarray(se3_log_map(jnp.asarray(T)))
    np.testing.assert_allclose(v_back, v, atol=1e-4)


def test_se3_exp_vs_scipy_expm():
    """exp([nu, w]) must equal expm of the 4x4 twist matrix."""
    rng = np.random.default_rng(6)
    v = rng.normal(size=(4, 6)).astype(np.float64) * 0.7
    ours = np.asarray(se3_exp_map(jnp.asarray(v, jnp.float32)))
    for i in range(4):
        twist = np.zeros((4, 4))
        twist[:3, :3] = np.asarray(hat(jnp.asarray(v[i : i + 1, 3:])))[0]
        twist[:3, 3] = v[i, :3]
        expect = scipy.linalg.expm(twist)
        np.testing.assert_allclose(ours[i], expect, atol=1e-4)


def test_compose_inverse_apply():
    A = _random_T(7, 3)
    B = _random_T(8, 3)
    pts = jax.random.normal(jax.random.PRNGKey(9), (3, 5, 3)) * 10

    # compose: A.compose(B) applies A first then B.
    out1 = B(A(pts))
    out2 = A.compose(B)(pts)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-3)

    # __matmul__ matches matrix product.
    np.testing.assert_allclose(
        np.asarray((A @ B).matrix),
        np.einsum("bij,bjk->bik", np.asarray(A.matrix), np.asarray(B.matrix)),
        atol=1e-4,
    )

    # inverse
    eye = np.asarray(A.compose(A.inverse()).matrix)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), eye.shape), atol=1e-4)

    # apply = homogeneous matmul
    expect = (
        np.einsum("bij,bnj->bni", np.asarray(A.rotation), np.asarray(pts))
        + np.asarray(A.translation)[:, None]
    )
    np.testing.assert_allclose(np.asarray(A(pts)), expect, atol=1e-4)


def test_10d_and_adjugate_sign_invariance():
    q = Rotation.random(5, random_state=10).as_quat()
    q_wxyz = jnp.asarray(
        np.concatenate([q[:, 3:], q[:, :3]], axis=1), jnp.float32
    )
    ten = quaternion_to_rotation_10d(q_wxyz)
    q_back = rotation_10d_to_quaternion(ten)
    # q and -q are the same rotation; compare rotation matrices.
    np.testing.assert_allclose(
        np.asarray(quaternion_to_matrix(q_back)),
        np.asarray(quaternion_to_matrix(q_wxyz)),
        atol=1e-4,
    )
    adj = quaternion_to_quaternion_adjugate(q_wxyz)
    q_back2 = quaternion_adjugate_to_quaternion(adj)
    np.testing.assert_allclose(
        np.asarray(quaternion_to_matrix(q_back2)),
        np.asarray(quaternion_to_matrix(q_wxyz)),
        atol=1e-4,
    )


def test_convert_differentiable():
    """Gradients must flow through convert for every parameterization
    (the PoseRegressor contract, reference registration.py:92-98)."""
    for parameterization, convention in PARAMS:
        T = _random_T(11, 2)
        rot, trans = T.convert(parameterization, convention)

        def loss(rot, trans):
            T2 = convert(
                rot, trans, parameterization=parameterization, convention=convention
            )
            return jnp.sum(T2.matrix**2)

        g_rot, g_trans = jax.grad(loss, argnums=(0, 1))(rot, trans)
        assert np.all(np.isfinite(np.asarray(g_rot))), parameterization
        assert np.all(np.isfinite(np.asarray(g_trans))), parameterization


def test_pytree_roundtrip_and_jit():
    T = _random_T(12, 2)
    leaves, treedef = jax.tree_util.tree_flatten(T)
    T2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(T2, RigidTransform)

    @jax.jit
    def f(T: RigidTransform):
        return T.inverse().matrix

    np.testing.assert_allclose(
        np.asarray(f(T)), np.asarray(T.inverse().matrix), atol=1e-5
    )


def test_getitem_len():
    T = _random_T(13, 5)
    assert len(T) == 5
    assert len(T[2]) == 1
    np.testing.assert_allclose(
        np.asarray(T[2].matrix[0]), np.asarray(T.matrix[2]), atol=0
    )


def test_convert_matrix_pair_unbatched():
    """Unbatched (3,3)+(3,) pair-form must equal the batched result
    (regression: jnp.atleast_3d APPENDS the axis, giving (3,3,1) garbage)."""
    R = jnp.asarray(Rotation.random(random_state=7).as_matrix(), jnp.float32)
    t = jnp.asarray([1.0, -2.0, 3.0], jnp.float32)
    T1 = convert(R, t, parameterization="matrix")
    T2 = convert(R[None], t[None], parameterization="matrix")
    np.testing.assert_allclose(np.asarray(T1.matrix), np.asarray(T2.matrix),
                               atol=1e-6)
    r, tt = T1.convert("matrix")
    np.testing.assert_allclose(np.asarray(r)[0], np.asarray(R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tt)[0], np.asarray(t), atol=1e-4)


def test_rotation_10d_jacobi_accuracy_and_grad():
    """Backend-independent Jacobi eigensolver: accuracy vs f64 numpy, and
    the analytic JVP vs finite differences (VERDICT r4 weak #6: no
    trace-time backend branch, no global x64 toggle)."""
    rng = np.random.default_rng(42)
    q = Rotation.random(16, random_state=5).as_quat()
    q_wxyz = np.concatenate([q[:, 3:], q[:, :3]], axis=1).astype(np.float32)
    ten = np.asarray(quaternion_to_rotation_10d(jnp.asarray(q_wxyz)))
    # Add noise: network outputs are not exact -qq^T matrices.
    ten_noisy = ten + rng.normal(0, 0.05, ten.shape).astype(np.float32)

    from diffdrr_tpu.pose import _10vec_to_4x4symmetric

    for t in [ten, ten_noisy]:
        ours = np.asarray(rotation_10d_to_quaternion(jnp.asarray(t)))
        A = np.asarray(_10vec_to_4x4symmetric(jnp.asarray(t, jnp.float64)))
        _, V = np.linalg.eigh(A)
        truth = V[..., 0]
        sgn = np.sign(np.sum(ours * truth, -1, keepdims=True))
        sgn[sgn == 0] = 1
        np.testing.assert_allclose(ours, sgn * truth, atol=2e-6)

    # Analytic JVP vs central finite differences (away from degeneracy).
    t0 = jnp.asarray(ten_noisy[0])

    def f(t):
        return rotation_10d_to_quaternion(t)

    tangent = jnp.asarray(rng.normal(size=10), jnp.float32)
    _, jvp = jax.jvp(f, (t0,), (tangent,))
    eps = 1e-3
    fd = (np.asarray(f(t0 + eps * tangent), np.float64)
          - np.asarray(f(t0 - eps * tangent), np.float64)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(jvp), fd, atol=5e-3)


def test_rotation_10d_jit_non_default_backend():
    """The conversion must compile and agree when explicitly jitted for a
    backend that is not the session default (the round-4 implementation
    branched on jax.default_backend() at trace time)."""
    t = np.asarray(
        quaternion_to_rotation_10d(
            jnp.asarray([[1.0, 0.2, -0.3, 0.1]]) /
            np.linalg.norm([1.0, 0.2, -0.3, 0.1])
        )
    )
    base = np.asarray(rotation_10d_to_quaternion(jnp.asarray(t)))
    cpu = jax.devices("cpu")[0]
    jitted = jax.jit(rotation_10d_to_quaternion, device=cpu)
    out = np.asarray(jitted(jnp.asarray(t)))
    sgn = np.sign(np.sum(out * base, -1, keepdims=True))
    np.testing.assert_allclose(out, sgn * base, atol=1e-6)
