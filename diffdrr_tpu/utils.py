"""Camera utilities: intrinsic resampling and pinhole-camera interop.

TPU-native reimplementation of diffdrr/utils.py, replacing the kornia
dependencies (translate/center_crop/resize warps, PinholeCamera, PnP-DLT —
SURVEY §2.3) with native JAX/NumPy implementations.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp

from .detector import Detector
from .pose import RigidTransform

__all__ = ["resample", "PinholeCamera", "get_pinhole_camera", "solve_pnp_dlt"]


# -----------------------------------------------------------------------------
# Image resampling under new intrinsics
# -----------------------------------------------------------------------------


def _resize(img: jnp.ndarray, size) -> jnp.ndarray:
    B, C, H, W = img.shape
    return jax.image.resize(img, (B, C, int(size[0]), int(size[1])), method="linear")


def _translate(img: jnp.ndarray, tx: float, ty: float) -> jnp.ndarray:
    """Shift by (tx, ty) pixels with bilinear interpolation, zero padding."""
    B, C, H, W = img.shape
    ys = jnp.arange(H, dtype=img.dtype) - ty
    xs = jnp.arange(W, dtype=img.dtype) - tx
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    fy = (ys - y0)[None, None, :, None]
    fx = (xs - x0)[None, None, None, :]

    def take(yi, xi):
        valid = (
            (yi >= 0)[:, None] & (yi < H)[:, None] & (xi >= 0)[None, :] & (xi < W)[None, :]
        )
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        vals = img[:, :, yc][:, :, :, xc]
        return jnp.where(valid[None, None], vals, 0.0)

    return (
        take(y0, x0) * (1 - fy) * (1 - fx)
        + take(y0 + 1, x0) * fy * (1 - fx)
        + take(y0, x0 + 1) * (1 - fy) * fx
        + take(y0 + 1, x0 + 1) * fy * fx
    )


def _center_crop(img: jnp.ndarray, size) -> jnp.ndarray:
    B, C, H, W = img.shape
    h, w = int(size[0]), int(size[1])
    top = (H - h) // 2
    left = (W - w) // 2
    if top >= 0 and left >= 0:
        return img[:, :, top : top + h, left : left + w]
    pad_t = max(0, -top)
    pad_l = max(0, -left)
    img = jnp.pad(
        img, ((0, 0), (0, 0), (pad_t, max(0, h - H - pad_t)),
              (pad_l, max(0, w - W - pad_l)))
    )
    return img[:, :, : h, : w]


def resample(
    img: jnp.ndarray,
    focal_len: float,
    delx: float,
    x0: float = 0,
    y0: float = 0,
    new_focal_len: Optional[float] = None,
    new_delx: Optional[float] = None,
    new_x0: Optional[float] = None,
    new_y0: Optional[float] = None,
) -> jnp.ndarray:
    """Resample an image to new intrinsics without re-rendering.

    Matches the reference pipeline (utils.py:11-53): principal-point
    translation, center-crop for focal-length change, padding for pixel-size
    change, with bilinear resizes back to the original resolution.
    """
    if new_focal_len is None:
        new_focal_len = focal_len
    if new_delx is None:
        new_delx = delx
    if new_x0 is None:
        new_x0 = x0
    if new_y0 is None:
        new_y0 = y0

    x = img
    _, _, height, width = x.shape
    shape = np.array([height, width], np.float64)

    # Translate the image (pixel shift of the principal point).
    tx = (new_x0 - x0) / delx
    ty = (new_y0 - y0) / delx
    x = _translate(x, tx, ty)

    # Crop to change the focal length.
    focal_scaling = new_focal_len / focal_len
    crop_size = (shape / focal_scaling).astype(int)
    x = _center_crop(x, crop_size)
    x = _resize(x, (height, width))

    # Pad (growing pixels) or crop (shrinking pixels) to resize pixels. The
    # reference's torch F.pad interprets negative padding as a crop;
    # jnp.pad rejects it, so take the explicit crop branch.
    pixel_scaling = new_delx / delx
    padding = (shape * (pixel_scaling - 1) / 2).astype(int)
    if pixel_scaling >= 1:
        x = jnp.pad(
            x,
            ((0, 0), (0, 0), (padding[0], padding[0]),
             (padding[1], padding[1])),
        )
    else:
        crop_size = np.maximum(shape.astype(int) + 2 * padding, 1)
        x = _center_crop(x, crop_size)
    x = _resize(x, (height, width))
    return x


# -----------------------------------------------------------------------------
# PnP (DLT) and the pinhole camera bridge
# -----------------------------------------------------------------------------


def solve_pnp_dlt(
    world_points: np.ndarray, img_points: np.ndarray, intrinsics: np.ndarray
) -> np.ndarray:
    """Direct Linear Transform PnP: recover [R|t] from 3D-2D correspondences.

    Native replacement for kornia's ``solve_pnp_dlt`` (reference:
    utils.py:99,151-152). Solves for the projection matrix with SVD and
    projects its left block onto SO(3). Host-side, float64.

    Args: world_points (B, N, 3), img_points (B, N, 2), intrinsics (B, 3, 3).
    Returns: (B, 3, 4) world->camera extrinsic matrices.
    """
    world_points = np.asarray(world_points, np.float64)
    img_points = np.asarray(img_points, np.float64)
    intrinsics = np.asarray(intrinsics, np.float64)
    B, N, _ = world_points.shape
    out = np.zeros((B, 3, 4))
    for b in range(B):
        # Normalize pixel coords with the intrinsics.
        Kinv = np.linalg.inv(intrinsics[b])
        uv1 = np.concatenate([img_points[b], np.ones((N, 1))], axis=1)
        xn = (Kinv @ uv1.T).T[:, :2]

        X = np.concatenate([world_points[b], np.ones((N, 1))], axis=1)
        A = np.zeros((2 * N, 12))
        A[0::2, 0:4] = X
        A[0::2, 8:12] = -xn[:, 0:1] * X
        A[1::2, 4:8] = X
        A[1::2, 8:12] = -xn[:, 1:2] * X
        _, _, Vt = np.linalg.svd(A)
        P = Vt[-1].reshape(3, 4)

        R = P[:, :3]
        # Fix scale and sign: rotation rows must be unit-norm, det(R) = +1,
        # and points must land in front of the camera (positive depth).
        scale = np.cbrt(np.linalg.det(R)) if np.linalg.det(R) != 0 else np.linalg.norm(
            R[0]
        )
        if scale == 0:
            scale = 1.0
        P = P / scale
        depths = (P[2, :3] @ world_points[b].T + P[2, 3])
        if np.median(depths) < 0:
            P = -P
        # Project the rotation block onto SO(3).
        U, _, Vt2 = np.linalg.svd(P[:, :3])
        R = U @ Vt2
        if np.linalg.det(R) < 0:
            R = U @ np.diag([1.0, 1.0, -1.0]) @ Vt2
        # Re-estimate scale for the translation from the rotation fit.
        s = np.trace(R.T @ P[:, :3]) / 3.0
        t = P[:, 3] / s
        out[b, :, :3] = R
        out[b, :, 3] = t
    return out


class PinholeCamera:
    """Standard-CV pinhole camera (Hartley-Zisserman conventions).

    Native replacement for the kornia-based camera in the reference
    (utils.py:62-94); the bridge to NeRF/3DGS-style pipelines.
    """

    def __init__(
        self,
        intrinsics: np.ndarray,  # (B, 4, 4)
        extrinsics: np.ndarray,  # (B, 4, 4) world -> camera
        height,
        width,
        detector: Detector,
        subject,
    ):
        self.intrinsics = np.asarray(intrinsics)
        self.extrinsics = np.asarray(extrinsics)
        self.height = np.atleast_1d(np.asarray(height))
        self.width = np.atleast_1d(np.asarray(width))
        multiplier = -1 if subject.orientation == "PA" else 1
        self.sdd = multiplier * detector.sdd
        self.delx = detector.delx
        self.dely = detector.dely
        self.x0 = detector.x0
        self.y0 = detector.y0

    @property
    def fx(self):
        return self.intrinsics[:, 0, 0]

    @property
    def fy(self):
        return self.intrinsics[:, 1, 1]

    @property
    def cx(self):
        return self.intrinsics[:, 0, 2]

    @property
    def cy(self):
        return self.intrinsics[:, 1, 2]

    @property
    def camera_matrix(self):
        return self.intrinsics[:, :3, :3]

    @property
    def rotation_matrix(self):
        return self.extrinsics[:, :3, :3]

    @property
    def translation_vector(self):
        return self.extrinsics[:, :3, 3:]

    @property
    def center(self):
        """Camera center -R^T t (Hartley and Zisserman)."""
        R = self.extrinsics[:, :3, :3]
        t = self.extrinsics[:, :3, 3:]
        return (-np.swapaxes(R, -1, -2) @ t)[..., 0]

    @property
    def projmat(self):
        """(B, 3, 4) camera matrix."""
        return (self.intrinsics @ self.extrinsics)[:, :3]

    @property
    def pose(self) -> RigidTransform:
        """c2w -> w2c RigidTransform usable as a DRR pose."""
        return RigidTransform(jnp.asarray(self.extrinsics, jnp.float32)).inverse()


def get_pinhole_camera(drr, pose: RigidTransform, dtype=np.float64) -> PinholeCamera:
    """Recover intrinsics + extrinsics of a DRR view as a pinhole camera.

    Matches the reference procedure (utils.py:106-164): build the pixel-space
    intrinsic matrix, project the volume's bounding-box corners, and solve
    PnP-DLT in float64 for the extrinsics.
    """
    # Intrinsic matrix (in pixels); AP orientation flips the focal sign.
    multiplier = -1 if drr.subject.orientation == "AP" else 1
    fx = multiplier * drr.detector.sdd / drr.detector.delx
    fy = multiplier * drr.detector.sdd / drr.detector.dely
    u0 = drr.detector.x0 / drr.detector.delx + drr.detector.width / 2
    v0 = drr.detector.y0 / drr.detector.dely + drr.detector.height / 2
    intrinsics = np.array(
        [[[fx, 0.0, u0, 0.0], [0.0, fy, v0, 0.0], [0.0, 0.0, 1.0, 0.0],
          [0.0, 0.0, 0.0, 1.0]]],
        dtype,
    )

    # Matching 3D (world bbox corners) and 2D (projected) points.
    (xmin, xmax), (ymin, ymax), (zmin, zmax) = drr.subject.volume.get_bounds()
    X = np.array(
        [[[xmin, ymin, zmin], [xmax, ymin, zmin], [xmin, ymax, zmin],
          [xmax, ymax, zmin], [xmin, ymin, zmax], [xmax, ymin, zmax],
          [xmin, ymax, zmax], [xmax, ymax, zmax]]],
        dtype,
    )
    x = np.asarray(drr.perspective_projection(pose, jnp.asarray(X, jnp.float32)))

    extrinsics = np.eye(4, dtype=dtype)[None].repeat(1, axis=0)
    extrinsics[:, :3, :] = solve_pnp_dlt(X, x, intrinsics[..., :3, :3])

    return PinholeCamera(
        intrinsics.astype(np.float32),
        extrinsics.astype(np.float32),
        np.array([drr.detector.height]),
        np.array([drr.detector.width]),
        drr.detector,
        drr.subject,
    )
