"""SE(3) pose algebra for TPU-native differentiable rendering.

A functional, JAX-idiomatic reimplementation of the pose layer of the reference
DiffDRR library (reference: diffdrr/pose.py). Everything here is:

  * pure ``jax.numpy`` — jit/vmap/grad-safe, no in-place mutation;
  * batched over a leading axis ``(B, ...)``;
  * differentiable end-to-end so networks can regress poses through any
    parameterization (reference: diffdrr/registration.py:92-98).

Conventions (matched to the reference so the two libraries interoperate):

  * Rotation matrices act on column vectors: ``y = R @ x``.
  * Quaternions are real-first ``(w, x, y, z)``.
  * ``convert(rotation, translation, parameterization=...)`` stores the
    *camera center* convention: the 4x4 matrix holds ``t_matrix = R @ t``
    (reference: diffdrr/pose.py:149-157).
  * Euler conventions are 3-letter strings over {X, Y, Z}; the rotation is the
    product ``R(c0, a0) @ R(c1, a1) @ R(c2, a2)`` (reference:
    diffdrr/pose.py:444-470).
  * The SE(3) log is laid out ``[nu (translation), omega (rotation)]`` and the
    exponential produces ``[[exp(hat(omega)), V(omega) @ nu], [0, 1]]``
    (reference: diffdrr/pose.py:1124-1208 after the ``.mT`` in
    diffdrr/pose.py:186).

``RigidTransform`` is a registered pytree, so it can be passed through
``jax.jit`` boundaries, carried in optimizer state, and sharded with the rest
of a computation.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ._precision import f32_matmuls

__all__ = [
    "RigidTransform",
    "convert",
    "make_matrix",
    "random_rigid_transform",
    "PARAMETERIZATIONS",
    # rotation representation conversions
    "axis_angle_to_matrix",
    "matrix_to_axis_angle",
    "axis_angle_to_quaternion",
    "quaternion_to_axis_angle",
    "quaternion_to_matrix",
    "matrix_to_quaternion",
    "standardize_quaternion",
    "quaternion_multiply",
    "quaternion_invert",
    "quaternion_apply",
    "euler_angles_to_matrix",
    "matrix_to_euler_angles",
    "rotation_6d_to_matrix",
    "matrix_to_rotation_6d",
    "rotation_9d_to_matrix",
    "matrix_to_rotation_9d",
    "rotation_10d_to_quaternion",
    "quaternion_to_rotation_10d",
    "quaternion_adjugate_to_quaternion",
    "quaternion_to_quaternion_adjugate",
    # Lie group maps
    "hat",
    "hat_inv",
    "so3_exp_map",
    "so3_log_map",
    "so3_rotation_angle",
    "so3_relative_angle",
    "se3_exp_map",
    "se3_log_map",
    "acos_linear_extrapolation",
]

PARAMETERIZATIONS = [
    "axis_angle",
    "euler_angles",
    "matrix",
    "quaternion",
    "quaternion_adjugate",
    "rotation_6d",
    "rotation_9d",
    "rotation_10d",
    "se3_log_map",
]


# -----------------------------------------------------------------------------
# Small numerics helpers
# -----------------------------------------------------------------------------

_DEFAULT_ACOS_BOUND = 1.0 - 1e-4


def acos_linear_extrapolation(
    x: jnp.ndarray,
    bounds: Tuple[float, float] = (-_DEFAULT_ACOS_BOUND, _DEFAULT_ACOS_BOUND),
) -> jnp.ndarray:
    """arccos with linear extrapolation outside ``bounds`` for stable gradients.

    Mirrors the stabilized arccos used by the reference
    (diffdrr/pose.py:789-858): inside the bounds it is exact; outside it is the
    first-order Taylor expansion around the bound, which keeps both values and
    gradients finite when ``|x|`` drifts past 1 due to round-off.
    """
    lo, hi = bounds
    x_mid = jnp.clip(x, lo, hi)
    acos_mid = jnp.arccos(x_mid)

    def _dacos(b):
        return -1.0 / jnp.sqrt(1.0 - b * b)

    lower = jnp.arccos(jnp.asarray(lo, x.dtype)) + _dacos(jnp.asarray(lo, x.dtype)) * (x - lo)
    upper = jnp.arccos(jnp.asarray(hi, x.dtype)) + _dacos(jnp.asarray(hi, x.dtype)) * (x - hi)
    out = jnp.where(x < lo, lower, jnp.where(x > hi, upper, acos_mid))
    return out


def _safe_normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(norm, eps)


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a zero subgradient at x == 0."""
    positive = x > 0
    safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), jnp.zeros_like(x))


# -----------------------------------------------------------------------------
# Quaternions
# -----------------------------------------------------------------------------


def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the real part is non-negative (reference: pose.py:558-570)."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quaternion_raw_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quaternion_apply(q: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    real = jnp.zeros(point.shape[:-1] + (1,), point.dtype)
    pq = jnp.concatenate([real, point], axis=-1)
    out = quaternion_raw_multiply(quaternion_raw_multiply(q, pq), quaternion_invert(q))
    return out[..., 1:]


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Real-first (possibly unnormalized) quaternion -> rotation matrix."""
    r, i, j, k = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> standardized real-first quaternion.

    Uses the numerically robust four-candidate construction (pick the
    best-conditioned denominator), matching reference pose.py:352-411.
    """
    if matrix.shape[-1] != 3 or matrix.shape[-2] != 3:
        raise ValueError(f"Invalid rotation matrix shape {matrix.shape}.")
    batch_dim = matrix.shape[:-2]
    m = matrix.reshape(batch_dim + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )

    flr = jnp.asarray(0.1, q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    out = jnp.take_along_axis(
        quat_candidates, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    return standardize_quaternion(out)


# -----------------------------------------------------------------------------
# Axis-angle
# -----------------------------------------------------------------------------


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    angles = jnp.sqrt(jnp.maximum(sq, 1e-30))
    half = angles * 0.5
    eps = 1e-6
    small = angles < eps
    # sin(x/2)/x ~= 1/2 - x^2/48 for small x
    safe_angles = jnp.where(small, jnp.ones_like(angles), angles)
    factor = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / safe_angles)
    return jnp.concatenate([jnp.cos(half), axis_angle * factor], axis=-1)


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    sq = jnp.sum(q[..., 1:] * q[..., 1:], axis=-1, keepdims=True)
    norms = jnp.sqrt(jnp.maximum(sq, 1e-30))
    half = jnp.arctan2(norms, q[..., :1])
    angles = 2.0 * half
    eps = 1e-6
    small = jnp.abs(angles) < eps
    safe_angles = jnp.where(small, jnp.ones_like(angles), angles)
    factor = jnp.where(small, 0.5 - angles * angles / 48.0, jnp.sin(half) / safe_angles)
    return q[..., 1:] / factor


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


# -----------------------------------------------------------------------------
# Euler angles
# -----------------------------------------------------------------------------

_AXIS_INDEX = {"X": 0, "Y": 1, "Z": 2}


def _single_axis_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        flat = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        flat = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError("letter must be either X, Y or Z.")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def _check_convention(convention: str) -> None:
    if len(convention) != 3:
        raise ValueError("Convention must have 3 letters.")
    if convention[1] in (convention[0], convention[2]):
        raise ValueError(f"Invalid convention {convention}.")
    for letter in convention:
        if letter not in ("X", "Y", "Z"):
            raise ValueError(f"Invalid letter {letter} in convention string.")


def euler_angles_to_matrix(euler_angles: jnp.ndarray, convention: str) -> jnp.ndarray:
    """R = R(c0, a0) @ R(c1, a1) @ R(c2, a2) (reference: pose.py:444-470)."""
    if euler_angles.ndim == 0 or euler_angles.shape[-1] != 3:
        raise ValueError("Invalid input euler angles.")
    _check_convention(convention)
    mats = [
        _single_axis_rotation(c, euler_angles[..., i])
        for i, c in enumerate(convention)
    ]
    return mats[0] @ mats[1] @ mats[2]


def _angle_from_tan(
    axis: str, other_axis: str, data: jnp.ndarray, horizontal: bool, tait_bryan: bool
) -> jnp.ndarray:
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ["XY", "YZ", "ZX"]
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str) -> jnp.ndarray:
    """Inverse of :func:`euler_angles_to_matrix` (reference: pose.py:516-555)."""
    _check_convention(convention)
    if matrix.shape[-1] != 3 or matrix.shape[-2] != 3:
        raise ValueError(f"Invalid rotation matrix shape {matrix.shape}.")
    i0 = _AXIS_INDEX[convention[0]]
    i2 = _AXIS_INDEX[convention[2]]
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(matrix[..., i0, i2] * (-1.0 if i0 - i2 in [-1, 2] else 1.0), -1, 1)
        )
    else:
        central = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1, 1))
    o = (
        _angle_from_tan(convention[0], convention[1], matrix[..., i2], False, tait_bryan),
        central,
        _angle_from_tan(convention[2], convention[1], matrix[..., i0, :], True, tait_bryan),
    )
    return jnp.stack(o, axis=-1)


# -----------------------------------------------------------------------------
# 6d / 9d / 10d rotation representations
# -----------------------------------------------------------------------------


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Zhou et al. 6D -> rotation matrix via Gram-Schmidt (reference: pose.py:740-761)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = _safe_normalize(a1)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = _safe_normalize(b2)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    batch_dim = matrix.shape[:-2]
    return matrix[..., :2, :].reshape(batch_dim + (6,))


@jax.custom_jvp
def special_procrustes(m: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 3, 3) matrices onto SO(3) (symmetric orthogonalization).

    Forward pass matches the reference's SVD construction (pose.py:193-201).
    The derivative is supplied by a custom JVP: SVD's own gradient divides by
    differences of singular values and produces NaN exactly at rotation
    matrices (all singular values equal — the common case, e.g. an identity
    init). The polar-factor derivative instead solves the Lyapunov equation
    ``Omega S + S Omega = A - A^T`` with S symmetric positive (semi)definite,
    whose solution divides only by *sums* of eigenvalues — stable everywhere
    near SO(3).
    """
    u, s, vt = jnp.linalg.svd(m, full_matrices=False)
    det = jnp.linalg.det(u @ vt)[..., None, None]
    vt = jnp.concatenate([vt[..., :2, :], det * vt[..., -1:, :]], axis=-2)
    return u @ vt


@special_procrustes.defjvp
def _special_procrustes_jvp(primals, tangents):
    (m,) = primals
    (dm,) = tangents
    R = special_procrustes(m)
    # S = R^T m is symmetric (positive definite for det(m) > 0).
    S = jnp.einsum("...ji,...jk->...ik", R, m)
    S = (S + jnp.swapaxes(S, -1, -2)) / 2
    lam, Q = jnp.linalg.eigh(S)
    A = jnp.einsum("...ji,...jk->...ik", R, dm)
    B = A - jnp.swapaxes(A, -1, -2)
    Bq = jnp.einsum("...ji,...jk,...kl->...il", Q, B, Q)
    denom = lam[..., :, None] + lam[..., None, :]
    denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    Oq = Bq / denom
    Omega = jnp.einsum("...ij,...jk,...lk->...il", Q, Oq, Q)
    dR = jnp.einsum("...ij,...jk->...ik", R, Omega)
    return R, dR


def rotation_9d_to_matrix(rotation: jnp.ndarray) -> jnp.ndarray:
    """9-vector -> SO(3) via symmetric orthogonalization (reference: pose.py:193-201).

    Levinson et al. (https://arxiv.org/abs/2006.14616). See
    :func:`special_procrustes` for the numerically stable derivative.
    """
    # Preserve leading batch dims (the sibling converters all do).
    m = rotation.reshape(rotation.shape[:-1] + (3, 3))
    return special_procrustes(m)


def matrix_to_rotation_9d(matrix: jnp.ndarray) -> jnp.ndarray:
    return matrix.reshape(matrix.shape[:-2] + (9,))


_TRIU_I, _TRIU_J = [0, 0, 0, 0, 1, 1, 1, 2, 2, 3], [0, 1, 2, 3, 1, 2, 3, 2, 3, 3]


def _10vec_to_4x4symmetric(vec: jnp.ndarray) -> jnp.ndarray:
    """10-vector -> symmetric 4x4 (upper-triangular fill; reference: pose.py:208-215)."""
    batch = vec.shape[:-1]
    A = jnp.zeros(batch + (4, 4), vec.dtype)
    idx = jnp.asarray(_TRIU_I)
    jdx = jnp.asarray(_TRIU_J)
    A = A.at[..., idx, jdx].set(vec)
    A = A.at[..., jdx, idx].set(vec)
    return A


_JACOBI_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _jacobi_eigh4(A: jnp.ndarray, sweeps: int = 8):
    """Cyclic Jacobi eigendecomposition of batched symmetric 4x4 matrices.

    Backend-independent replacement for ``jnp.linalg.eigh`` on this tiny
    problem: XLA's f32 eigh leaves ~5e-6 eigenvector error on TPU, which the
    camera-center convention (``t_stored = R @ t``) amplifies to ~3e-4 mm on
    O(50 mm) translations — at the edge of reference-parity tolerance. Eight
    cyclic-Jacobi sweeps in f32 measure at ~1e-7 (quadratic convergence; the
    off-diagonal norm is far below f32 eps well before sweep 8), and compile
    identically on every backend — no f64 island, no trace-time backend
    branch. Returns ``(lam ascending, V columns)``.
    """
    dtype = A.dtype
    eye = jnp.eye(4, dtype=dtype)
    V = jnp.broadcast_to(eye, A.shape)
    for _ in range(sweeps):
        for p, q in _JACOBI_PAIRS:
            apq = A[..., p, q]
            app = A[..., p, p]
            aqq = A[..., q, q]
            theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
            c = jnp.cos(theta)[..., None, None]
            s = jnp.sin(theta)[..., None, None]
            ep, eq = eye[p], eye[q]
            Ppq = ep[:, None] * ep[None, :] + eq[:, None] * eq[None, :]
            Rot = (eye - Ppq + c * Ppq
                   + s * (ep[:, None] * eq[None, :])
                   - s * (eq[:, None] * ep[None, :]))
            A = jnp.einsum("...ji,...jk,...kl->...il", Rot, A, Rot)
            A = (A + jnp.swapaxes(A, -1, -2)) * 0.5  # kill rounding skew
            V = jnp.einsum("...ij,...jk->...ik", V, Rot)
    lam = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(lam, axis=-1)
    lam = jnp.take_along_axis(lam, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return lam, V


@jax.custom_jvp
def _smallest_eigvec4(A: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric 4x4 ``A``."""
    _, V = _jacobi_eigh4(A)
    return V[..., 0]


@_smallest_eigvec4.defjvp
def _smallest_eigvec4_jvp(primals, tangents):
    (A,), (dA,) = primals, tangents
    lam, V = _jacobi_eigh4(A)
    v0 = V[..., 0]
    # dv0 = sum_{j>0} (v_j^T dA v_0) / (lam_0 - lam_j) v_j  (standard
    # simple-eigenvector perturbation; the min eigenvalue is simple for the
    # -qq^T matrices this parameterization produces — gap 1 at unit q).
    dA = (dA + jnp.swapaxes(dA, -1, -2)) * 0.5
    w = jnp.einsum("...ij,...j->...i", dA, v0)           # dA v0
    proj = jnp.einsum("...ij,...i->...j", V, w)          # v_j^T dA v0, all j
    gap = lam[..., 0:1] - lam                            # lam_0 - lam_j
    gap = jnp.where(jnp.abs(gap) < 1e-6,
                    jnp.where(gap < 0, -1e-6, 1e-6), gap)
    coeff = proj / gap
    coeff = coeff.at[..., 0].set(0.0)                    # no self term
    dv0 = jnp.einsum("...ij,...j->...i", V, coeff)
    return v0, dv0


def rotation_10d_to_quaternion(rotation: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of the min-modulus eigenvalue of a symmetric 4x4.

    Peretroukhin et al. (https://arxiv.org/abs/2006.01031); reference:
    pose.py:218-226 (ascending eigenvalues -> column 0). Uses the
    backend-independent :func:`_jacobi_eigh4` with an analytic JVP — see its
    docstring for why not ``jnp.linalg.eigh``.
    """
    A = _10vec_to_4x4symmetric(rotation)
    return _smallest_eigvec4(A)


def quaternion_to_rotation_10d(q: jnp.ndarray) -> jnp.ndarray:
    A = -jnp.einsum("...i,...j->...ij", q, q)
    return A[..., jnp.asarray(_TRIU_I), jnp.asarray(_TRIU_J)]


def quaternion_adjugate_to_quaternion(rotation: jnp.ndarray) -> jnp.ndarray:
    """Max-modulus row of the quaternion adjugate, normalized.

    (https://arxiv.org/abs/2205.09116); reference: pose.py:235-247.
    """
    A = _10vec_to_4x4symmetric(rotation)
    row_norms = jnp.linalg.norm(A, axis=-2)  # norm over rows for each column j
    norms = jnp.max(row_norms, axis=-1, keepdims=True)
    best = jnp.argmax(row_norms, axis=-1)
    rows = jnp.take_along_axis(A, best[..., None, None].astype(jnp.int32), axis=-2)[
        ..., 0, :
    ]
    return rows / norms


def quaternion_to_quaternion_adjugate(q: jnp.ndarray) -> jnp.ndarray:
    A = jnp.einsum("...i,...j->...ij", q, q)
    return A[..., jnp.asarray(_TRIU_I), jnp.asarray(_TRIU_J)]


# -----------------------------------------------------------------------------
# so(3) / se(3)
# -----------------------------------------------------------------------------


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector -> skew-symmetric matrix (reference: pose.py:1083-1118)."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def hat_inv(h: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([h[..., 2, 1], h[..., 0, 2], h[..., 1, 0]], axis=-1)


def so3_exp_map(log_rot: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    return axis_angle_to_matrix(log_rot)


def so3_log_map(R: jnp.ndarray, eps: float = 1e-4, cos_bound: float = 1e-4) -> jnp.ndarray:
    """Rotation matrix -> axis-angle via the quaternion path (reference: pose.py:1022-1044)."""
    return matrix_to_axis_angle(R)


def so3_rotation_angle(
    R: jnp.ndarray, eps: float = 1e-4, cos_angle: bool = False, cos_bound: float = 1e-4
) -> jnp.ndarray:
    rot_trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    phi_cos = (rot_trace - 1.0) * 0.5
    if cos_angle:
        return phi_cos
    if cos_bound > 0.0:
        bound = 1.0 - cos_bound
        return acos_linear_extrapolation(phi_cos, (-bound, bound))
    return jnp.arccos(phi_cos)


def so3_relative_angle(
    R1: jnp.ndarray,
    R2: jnp.ndarray,
    cos_angle: bool = False,
    cos_bound: float = 1e-4,
    eps: float = 1e-4,
) -> jnp.ndarray:
    R12 = jnp.einsum("...ij,...kj->...ik", R1, R2)
    return so3_rotation_angle(R12, eps=eps, cos_angle=cos_angle, cos_bound=cos_bound)


def _se3_V_matrix(omega: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """V(omega) = I + (1-cos t)/t^2 hat(w) + (t - sin t)/t^3 hat(w)^2."""
    nrms = jnp.sum(omega * omega, axis=-1)
    t = jnp.sqrt(jnp.maximum(nrms, eps))
    h = hat(omega)
    h2 = h @ h
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), h.shape)
    a = ((1.0 - jnp.cos(t)) / (t * t))[..., None, None]
    b = ((t - jnp.sin(t)) / (t * t * t))[..., None, None]
    return eye + a * h + b * h2


def se3_exp_map(log_transform: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """[nu, omega] (B, 6) -> (B, 4, 4) matrices [[exp(hat(w)), V nu], [0, 1]].

    NOTE: unlike the vendored pytorch3d code (reference: pose.py:1124-1208,
    which returns row-vector-convention matrices that the reference transposes
    at the call site, pose.py:186), this returns the column-vector-convention
    pose matrix directly.
    """
    if log_transform.ndim != 2 or log_transform.shape[-1] != 6:
        raise ValueError("Expected input to be of shape (N, 6).")
    nu = log_transform[..., :3]
    omega = log_transform[..., 3:]
    R = axis_angle_to_matrix(omega)
    V = _se3_V_matrix(omega, eps=eps)
    t = jnp.einsum("...ij,...j->...i", V, nu)
    return make_matrix(R, t)


def se3_log_map(
    transform: jnp.ndarray, eps: float = 1e-4, cos_bound: float = 1e-4
) -> jnp.ndarray:
    """(B, 4, 4) column-convention pose matrices -> (B, 6) logs [nu, omega].

    Inverse of :func:`se3_exp_map`; behavioral match for the reference's
    ``get_se3_log`` (pose.py:104-105 composed with pose.py:1211-1290).
    """
    R = transform[..., :3, :3]
    t = transform[..., :3, 3]
    omega = so3_log_map(R)
    V = _se3_V_matrix(omega, eps=eps)
    nu = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([nu, omega], axis=-1)


# -----------------------------------------------------------------------------
# RigidTransform pytree
# -----------------------------------------------------------------------------


def make_matrix(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble [[R, t], [0, 1]] batched (reference: pose.py:108-114)."""
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def _is_orthonormal(matrix: jnp.ndarray, eps: float) -> jnp.ndarray:
    R = matrix[..., :3, :3]
    should_be_eye = jnp.einsum("...ij,...kj->...ik", R, R)
    eye = jnp.eye(3, dtype=matrix.dtype)
    return jnp.all(jnp.abs(should_be_eye - eye) < eps)


@jax.tree_util.register_pytree_node_class
class RigidTransform:
    """Batched SE(3) transforms stored as (B, 4, 4) homogeneous matrices.

    A functional analog of the reference's ``RigidTransform`` nn.Module
    (diffdrr/pose.py:14-105). Registered as a JAX pytree: instances pass
    freely through jit/vmap/grad and can be held in optimizer states.
    """

    def __init__(self, matrix: Union[jnp.ndarray, "RigidTransform"], eps: float = 1e-6):
        if isinstance(matrix, RigidTransform):
            matrix = matrix.matrix
        matrix = jnp.asarray(matrix)
        if matrix.ndim == 2:
            matrix = matrix[None]
        self.matrix = matrix
        self.eps = eps

    # --- pytree protocol ---
    def tree_flatten(self):
        return (self.matrix,), (self.eps,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.matrix = children[0]
        obj.eps = aux[0]
        return obj

    # --- container protocol ---
    def __len__(self):
        return self.matrix.shape[0]

    def __getitem__(self, idx):
        m = self.matrix[idx]
        if m.ndim == 2:
            m = m[None]
        return RigidTransform(m, self.eps)

    def __matmul__(self, T: "RigidTransform") -> "RigidTransform":
        # Matches the reference: (A @ B).matrix == A.matrix @ B.matrix
        # (diffdrr/pose.py:42-43 with compose at pose.py:69-71).
        return T.compose(self)

    # --- geometry ---
    # f32_matmuls: bf16-default TPU matmuls on O(100 mm) coordinates corrupt
    # downstream pose gradients (~100% rel error measured); see _precision.py.
    @f32_matmuls
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Apply the transform(s) to a pointcloud (..., N, 3)."""
        x = jnp.asarray(x)
        R = self.matrix[..., :3, :3]
        t = self.matrix[..., :3, 3]
        if x.ndim == 2:  # (N, 3) -> broadcast over batch
            return jnp.einsum("bij,nj->bni", R, x) + t[:, None, :]
        return jnp.einsum("bij,bnj->bni", R, x) + t[:, None, :]

    forward = __call__

    @property
    def rotation(self) -> jnp.ndarray:
        return self.matrix[..., :3, :3]

    @property
    def translation(self) -> jnp.ndarray:
        return self.matrix[..., :3, 3]

    @property
    def dtype(self):
        return self.matrix.dtype

    @property
    def shape(self):
        return self.matrix.shape

    def astype(self, dtype) -> "RigidTransform":
        return RigidTransform(self.matrix.astype(dtype), self.eps)

    @f32_matmuls
    def inverse(self) -> "RigidTransform":
        """Closed-form inverse for orthonormal rotations, solve otherwise.

        The reference branches on a host-side orthonormality check
        (pose.py:58-67); to stay jit-safe we branch with ``jnp.where`` on a
        traced predicate instead.
        """
        R = self.matrix[..., :3, :3]
        t = self.matrix[..., :3, 3]
        Rinv = jnp.swapaxes(R, -1, -2)
        tinv = -jnp.einsum("...ij,...j->...i", Rinv, t)
        fast = make_matrix(Rinv, tinv)
        ortho = _is_orthonormal(self.matrix, self.eps)
        general = jnp.linalg.inv(self.matrix)
        return RigidTransform(jnp.where(ortho, fast, general), self.eps)

    @f32_matmuls
    def compose(self, T: "RigidTransform") -> "RigidTransform":
        """Returns the transform `x -> T(self(x))` (reference: pose.py:69-71)."""
        return RigidTransform(
            jnp.einsum("bij,bjk->bik", T.matrix, self.matrix), self.eps
        )

    @f32_matmuls
    def convert(
        self,
        parameterization: str,
        convention: Optional[str] = None,
        degrees: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Export (rotation_repr, translation) in any parameterization.

        The returned ``translation`` is the camera-frame translation ``t`` such
        that the stored matrix translation is ``R @ t`` — inverse of the
        convention applied by :func:`convert` (reference: pose.py:73-102).
        """
        translation = -self.inverse().translation
        R = self.matrix[..., :3, :3]
        if parameterization == "axis_angle":
            rotation = matrix_to_axis_angle(R)
        elif parameterization == "euler_angles":
            rotation = matrix_to_euler_angles(R, convention)
            if degrees:
                rotation = rotation / jnp.pi * 180.0
        elif parameterization == "matrix":
            rotation = R
        elif parameterization == "quaternion":
            rotation = standardize_quaternion(matrix_to_quaternion(R))
        elif parameterization == "quaternion_adjugate":
            rotation = quaternion_to_quaternion_adjugate(matrix_to_quaternion(R))
        elif parameterization == "rotation_6d":
            rotation = matrix_to_rotation_6d(R)
        elif parameterization == "rotation_9d":
            rotation = matrix_to_rotation_9d(R)
        elif parameterization == "rotation_10d":
            rotation = quaternion_to_rotation_10d(matrix_to_quaternion(R))
        elif parameterization == "se3_log_map":
            params = self.get_se3_log()
            rotation = params[..., 3:]
            translation = params[..., :3]
        else:
            raise ValueError(
                f"Must be in {PARAMETERIZATIONS}, not {parameterization}"
            )
        return rotation, translation

    @f32_matmuls
    def get_se3_log(self) -> jnp.ndarray:
        return se3_log_map(self.matrix)

    def __repr__(self):
        return f"RigidTransform(matrix={self.matrix!r})"


@f32_matmuls
def convert(
    *args,
    parameterization: str,
    convention: Optional[str] = None,
    degrees: bool = False,
) -> RigidTransform:
    """Build a :class:`RigidTransform` from any parameterization.

    Behavioral match for the reference's ``convert`` (diffdrr/pose.py:140-190),
    including the camera-center translation convention: for all rotational
    parameterizations except ``se3_log_map`` the stored matrix translation is
    ``R @ t`` (pose.py:149-157).
    """
    if parameterization == "euler_angles" and convention is None:
        raise ValueError(
            "convention for Euler angles must be specified as a 3 letter "
            "combination of [X, Y, Z]"
        )

    if parameterization == "matrix":
        m = jnp.asarray(args[0])
        if len(args) == 1 and m.shape[-2:] == (4, 4):
            # Reference form: a single homogeneous matrix (pose.py:158-159).
            return RigidTransform(m)
        # Pair form (extension): (3x3 rotation, translation) with the same
        # camera-center convention as every other parameterization, so
        # convert(*T.convert("matrix"), parameterization="matrix") == T.
        # NOT atleast_3d: that APPENDS an axis, turning an unbatched (3,3)
        # rotation into (3,3,1) and silently broadcasting garbage below.
        rotmat = m[None] if m.ndim == 2 else m
        translation = jnp.atleast_2d(jnp.asarray(args[1]))
        camera_center = jnp.einsum("bij,bj->bi", rotmat, translation)
        return RigidTransform(make_matrix(rotmat, camera_center))

    if parameterization == "se3_log_map":
        rotation, translation = args
        rotation = jnp.atleast_2d(jnp.asarray(rotation))
        translation = jnp.atleast_2d(jnp.asarray(translation))
        params = jnp.concatenate([translation, rotation], axis=-1)
        return RigidTransform(se3_exp_map(params))

    rotation, translation = args
    rotation = jnp.asarray(rotation)
    translation = jnp.atleast_2d(jnp.asarray(translation))
    if parameterization != "matrix" and rotation.ndim == 1:
        rotation = rotation[None]

    if parameterization == "axis_angle":
        rotmat = axis_angle_to_matrix(rotation)
    elif parameterization == "euler_angles":
        if degrees:
            rotation = rotation / 180.0 * jnp.pi
        rotmat = euler_angles_to_matrix(rotation, convention)
    elif parameterization == "quaternion":
        rotmat = quaternion_to_matrix(rotation)
    elif parameterization == "quaternion_adjugate":
        rotmat = quaternion_to_matrix(quaternion_adjugate_to_quaternion(rotation))
    elif parameterization == "rotation_6d":
        rotmat = rotation_6d_to_matrix(rotation)
    elif parameterization == "rotation_9d":
        rotmat = rotation_9d_to_matrix(rotation)
    elif parameterization == "rotation_10d":
        rotmat = quaternion_to_matrix(rotation_10d_to_quaternion(rotation))
    else:
        raise ValueError(f"Must be in {PARAMETERIZATIONS}, not {parameterization}")

    camera_center = jnp.einsum("bij,bj->bi", rotmat, translation)
    return RigidTransform(make_matrix(rotmat, camera_center))


def random_rigid_transform(
    key: jax.Array, batch_size: int = 1, translation_scale: float = 100.0
) -> RigidTransform:
    """Random SE(3) sample for testing (reference: pose.py:120-124)."""
    k1, k2 = jax.random.split(key)
    q = _safe_normalize(jax.random.normal(k1, (batch_size, 4)))
    R = quaternion_to_matrix(q)
    t = translation_scale * jax.random.normal(k2, (batch_size, 3))
    return RigidTransform(make_matrix(R, t))
