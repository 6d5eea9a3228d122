"""Detector tests: canonical plane, calibration, intrinsics helpers."""

import numpy as np
import pytest
import jax.numpy as jnp

from diffdrr_tpu.detector import (
    Detector,
    get_focal_length,
    get_principal_point,
    parse_intrinsic_matrix,
    make_intrinsic_matrix,
)
from diffdrr_tpu.pose import RigidTransform, convert


def _detector(**kw):
    args = dict(sdd=1000.0, height=4, width=6, delx=2.0, dely=3.0, x0=1.0,
                y0=-2.0, reorient=jnp.eye(4))
    args.update(kw)
    return Detector(**args)


def test_canonical_plane_centering():
    det = _detector(x0=0.0, y0=0.0)
    target = np.asarray(det.calibration(det.target))[0]
    # Scaled plane: centered around (x0, y0, sdd).
    np.testing.assert_allclose(target[:, 0].mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(target[:, 1].mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(target[:, 2], 1000.0)
    # Pixel pitch in world units.
    cols = target[:, 0].reshape(4, 6)
    rows = target[:, 1].reshape(4, 6)
    np.testing.assert_allclose(np.diff(cols, axis=1).ravel(),
                               np.full(20, np.sign(np.diff(cols, axis=1).ravel()[0]) * 2.0))
    np.testing.assert_allclose(np.abs(np.diff(rows, axis=0)), 3.0)


def test_odd_sizes_have_center_pixel():
    det = _detector(height=5, width=7, x0=0.0, y0=0.0)
    target = np.asarray(det.calibration(det.target))[0]
    # An odd-sized detector has a pixel exactly on the principal axis...
    d = np.linalg.norm(target[:, :2], axis=1)
    assert d.min() < 1e-5
    # ...and the whole plane is CENTERED on it (regression: the arange lower
    # bound missed torch's floor division, shifting odd detectors one full
    # pixel off-axis while still containing an on-axis pixel).
    np.testing.assert_allclose(target[:, :2].mean(axis=0), 0.0, atol=1e-5)
    # Row coordinates match torch.arange(-h // 2, h // 2) + 1 exactly.
    rows = np.unique(np.round(target[:, 1] / det.dely, 5))
    np.testing.assert_allclose(sorted(rows), [-2.0, -1.0, 0.0, 1.0, 2.0])


def test_forward_applies_reorient_and_pose():
    det = _detector()
    pose = convert(
        jnp.asarray([[0.1, 0.2, -0.1]], jnp.float32),
        jnp.asarray([[5.0, -3.0, 100.0]], jnp.float32),
        parameterization="euler_angles",
        convention="ZYX",
    )
    source, target = det(pose)
    assert source.shape == (1, 1, 3)
    assert target.shape == (1, 24, 3)
    # Source = pose applied to the origin = the stored matrix translation.
    np.testing.assert_allclose(
        np.asarray(source)[0, 0], np.asarray(pose.translation)[0], atol=1e-4
    )


def test_custom_calibration_overrides():
    det = _detector()
    other = RigidTransform(
        jnp.asarray(
            [[4.0, 0, 0, 0], [0, 4.0, 0, 0], [0, 0, 500.0, 0], [0, 0, 0, 1]],
            jnp.float32,
        )
    )
    pose = convert(
        jnp.zeros((1, 3), jnp.float32), jnp.zeros((1, 3), jnp.float32),
        parameterization="euler_angles", convention="ZYX",
    )
    _, t_default = det(pose)
    _, t_custom = det(pose, other)
    assert not np.allclose(np.asarray(t_default), np.asarray(t_custom))
    np.testing.assert_allclose(np.asarray(t_custom)[0, :, 2], 500.0, atol=1e-4)


def test_intrinsic_matrix_round_trip():
    det = _detector()
    K = np.asarray(det.intrinsic)
    focal, x0, y0 = parse_intrinsic_matrix(
        K, det.height, det.width, det.delx, det.dely
    )
    np.testing.assert_allclose(focal, det.sdd, rtol=1e-6)
    np.testing.assert_allclose(x0, det.x0, atol=1e-5)
    np.testing.assert_allclose(y0, det.y0, atol=1e-5)
    assert get_focal_length(K, det.delx, det.dely) == focal
    assert get_principal_point(K, det.height, det.width, det.delx, det.dely) == (
        pytest.approx(det.x0), pytest.approx(det.y0)
    )


def test_subsample_reduces_rays():
    det = _detector(n_subsample=10)
    assert det.n_rays == 10
    assert len(det.subsamples) == 1
    assert len(det.subsamples[0]) == 10


def test_reverse_x_axis_flips_columns():
    a = _detector(reverse_x_axis=False, x0=0.0, y0=0.0)
    b = _detector(reverse_x_axis=True, x0=0.0, y0=0.0)
    ta = np.asarray(a.calibration(a.target))[0][:, 0].reshape(4, 6)
    tb = np.asarray(b.calibration(b.target))[0][:, 0].reshape(4, 6)
    np.testing.assert_allclose(ta, -tb, atol=1e-5)
