"""Camera utils tests: resample, PnP-DLT, pinhole camera bridge."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from diffdrr_tpu import DRR, load_example_ct, convert
from diffdrr_tpu.utils import resample, solve_pnp_dlt, get_pinhole_camera


def test_resample_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 1, 32, 32)), jnp.float32)
    out = resample(img, focal_len=1000.0, delx=2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_resample_focal_change_zooms():
    img = np.zeros((1, 1, 33, 33), np.float32)
    img[0, 0, 16, 16] = 1.0  # bright center pixel survives a center zoom
    out = np.asarray(resample(jnp.asarray(img), 1000.0, 2.0, new_focal_len=2000.0))
    assert out.shape == img.shape
    assert out[0, 0, 10:23, 10:23].max() > 0.1


def test_solve_pnp_dlt_recovers_extrinsics():
    rng = np.random.default_rng(1)
    R = Rotation.random(random_state=2).as_matrix()
    t = np.array([0.3, -0.2, 5.0])
    K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])

    X = rng.uniform(-1, 1, (12, 3))
    Xc = (R @ X.T).T + t
    uv = (K @ Xc.T).T
    uv = uv[:, :2] / uv[:, 2:]

    E = solve_pnp_dlt(X[None], uv[None], K[None])[0]
    np.testing.assert_allclose(E[:, :3], R, atol=1e-6)
    np.testing.assert_allclose(E[:, 3], t, atol=1e-6)


def test_get_pinhole_camera_consistency():
    subject = load_example_ct(shape=(32, 32, 16))
    drr = DRR(subject, sdd=600.0, height=32, delx=2.0)
    pose = convert(
        jnp.asarray([[0.1, np.pi / 2, -0.05]], jnp.float32),
        jnp.asarray([[3.0, 350.0, -2.0]], jnp.float32),
        parameterization="euler_angles",
        convention="ZXY",
    )
    cam = get_pinhole_camera(drr, pose)

    # 1) The recovered projection matrix must reproject the bbox corners onto
    #    the same pixels as DRR.perspective_projection.
    (xmin, xmax), (ymin, ymax), (zmin, zmax) = subject.volume.get_bounds()
    X = np.array(
        [[xmin, ymin, zmin], [xmax, ymax, zmax], [xmin, ymax, zmax],
         [xmax, ymin, zmin]]
    )
    expect = np.asarray(
        drr.perspective_projection(pose, jnp.asarray(X[None], jnp.float32))
    )[0]
    P = cam.projmat[0].astype(np.float64)
    proj = (P @ np.concatenate([X, np.ones((4, 1))], axis=1).T).T
    proj = proj[:, :2] / proj[:, 2:]
    np.testing.assert_allclose(proj, expect, atol=0.1)

    # 2) The camera center must coincide with the X-ray source position.
    source, _ = drr.detector(pose, None)
    np.testing.assert_allclose(cam.center[0], np.asarray(source)[0, 0], atol=0.5)

    # 3) cam.pose round-trips to a usable DRR pose (w2c inverse of extrinsics).
    assert cam.pose.matrix.shape == (1, 4, 4)


def test_resample_pixel_shrink_crops():
    """new_delx < delx must crop (torch negative-pad semantics), not crash."""
    img = np.zeros((1, 1, 32, 32), np.float32)
    img[0, 0, 16, 16] = 1.0
    out = np.asarray(resample(jnp.asarray(img), 1000.0, 2.0, new_delx=1.0))
    assert out.shape == img.shape
    # Halving the pixel size zooms in 2x about the center: the bright pixel
    # stays near the center.
    r, c = np.unravel_index(np.argmax(out[0, 0]), out[0, 0].shape)
    assert abs(r - 16) <= 2 and abs(c - 16) <= 2
    assert out[0, 0].max() > 0.1
