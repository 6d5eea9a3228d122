"""C-arm detector / camera model.

TPU-native reimplementation of the reference's ``Detector``
(diffdrr/detector.py:17-154): a 6-DoF C-arm with the X-ray source at the
origin and the detector plane centered on the +z unit sphere point, scaled to
world units by a 4x4 calibration matrix holding the intrinsics.

``Detector`` is a registered pytree — array leaves (canonical source/target,
reorient, calibration) flow through jit; integer/config fields are static.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from .pose import RigidTransform

__all__ = [
    "Detector",
    "get_focal_length",
    "get_principal_point",
    "parse_intrinsic_matrix",
    "make_intrinsic_matrix",
]


def _canonical_plane(
    height: int, width: int, reverse_x_axis: bool, dtype=np.float32
) -> Tuple[np.ndarray, np.ndarray]:
    """Canonical source (origin) + unit detector plane centered at (0, 0, 1).

    Matches reference ``_initialize_carm`` (detector.py:98-138), including the
    even/odd centering offsets and the row-major (t outer, s inner) pixel
    ordering, so images reshape identically.
    """
    source = np.zeros((1, 1, 3), dtype=dtype)

    h_off = 1.0 if height % 2 else 0.5
    w_off = 1.0 if width % 2 else 0.5

    # torch.arange(-h // 2, h // 2) uses Python FLOOR division on the lower
    # bound: -5 // 2 = -3, so odd sizes span [-(h+1)//2, h//2) and the +1.0
    # offset centers them. (Using -(h // 2) as the lower bound shifted every
    # odd-sized detector one full pixel off the principal axis.)
    t = np.arange(-((height + 1) // 2), height // 2, dtype=dtype) + h_off
    s = np.arange(-((width + 1) // 2), width // 2, dtype=dtype) + w_off

    t = -t
    if reverse_x_axis:
        s = -s

    # cartesian_prod(t, s): t varies slowest. Detector basis: rows along y,
    # columns along x (basis vectors (0,1,0) and (1,0,0), detector.py:110).
    tt, ss = np.meshgrid(t, s, indexing="ij")
    target = np.stack([ss.ravel(), tt.ravel(), np.ones(height * width, dtype)], -1)
    return source, target[None]


class Detector:
    """X-ray C-arm detector model (reference: diffdrr/detector.py:17)."""

    def __init__(
        self,
        sdd: float,
        height: int,
        width: int,
        delx: float,
        dely: float,
        x0: float,
        y0: float,
        reorient: jnp.ndarray,
        n_subsample: Optional[int] = None,
        reverse_x_axis: bool = False,
        *,
        seed: int = 0,
        _arrays: Optional[tuple] = None,
    ):
        self.height = int(height)
        self.width = int(width)
        self.n_subsample = n_subsample
        self.reverse_x_axis = bool(reverse_x_axis)
        self._sdd = float(sdd)
        self._delx = float(delx)
        self._dely = float(dely)
        self._x0 = float(x0)
        self._y0 = float(y0)
        self.seed = seed

        if _arrays is not None:
            (self.source, self.target, self.target_full, self._reorient,
             self._calibration, self.subsamples) = _arrays
            return

        source, target = _canonical_plane(self.height, self.width, self.reverse_x_axis)
        self.subsamples = []
        full = jnp.asarray(target)
        if n_subsample is not None:
            # Host-side random pixel subsampling (reference: detector.py:134-137).
            rng = np.random.default_rng(seed)
            sample = rng.permutation(self.height * self.width)[: int(n_subsample)]
            target = target[:, sample, :]
            self.subsamples.append(sample.tolist())

        self.source = jnp.asarray(source)
        self.target = jnp.asarray(target)
        # Full canonical plane (same array as `target` when not subsampling):
        # the Pallas sparse path renders the full frame and gathers.
        self.target_full = full if n_subsample is not None else self.target
        self._reorient = jnp.asarray(reorient, jnp.float32)
        # 4x4 "calibration": scales the canonical plane to world units
        # (reference: detector.py:50-60).
        self._calibration = jnp.asarray(
            [
                [self._delx, 0, 0, self._x0],
                [0, self._dely, 0, self._y0],
                [0, 0, self._sdd, 0],
                [0, 0, 0, 1],
            ],
            jnp.float32,
        )

    # --- pytree protocol ---
    def tree_flatten(self):
        children = (self.source, self.target, self.target_full,
                    self._reorient, self._calibration)
        aux = (
            self._sdd, self.height, self.width, self._delx, self._dely,
            self._x0, self._y0, self.n_subsample, self.reverse_x_axis,
            self.seed, tuple(tuple(s) for s in self.subsamples),
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (sdd, height, width, delx, dely, x0, y0, n_subsample, reverse_x_axis,
         seed, subsamples) = aux
        source, target, target_full, reorient, calibration = children
        return cls(
            sdd, height, width, delx, dely, x0, y0, reorient,
            n_subsample, reverse_x_axis, seed=seed,
            _arrays=(source, target, target_full, reorient, calibration,
                     [list(s) for s in subsamples]),
        )

    # --- intrinsics (reference: detector.py:62-94) ---
    @property
    def sdd(self) -> float:
        return self._sdd

    @property
    def delx(self) -> float:
        return self._delx

    @property
    def dely(self) -> float:
        return self._dely

    @property
    def x0(self) -> float:
        # The reference's property negates the calibration entry
        # (diffdrr/detector.py:73-79); replicated so make_intrinsic_matrix,
        # perspective_projection, and get_pinhole_camera match reference
        # outputs for nonzero principal points. Constructors take the raw
        # (un-negated) value — use ``_x0``/``_y0`` when re-building.
        return -self._x0

    @property
    def y0(self) -> float:
        return -self._y0

    @property
    def reorient(self) -> RigidTransform:
        return RigidTransform(self._reorient)

    @property
    def calibration(self) -> RigidTransform:
        """4x4 matrix rescaling the detector plane to world coordinates."""
        return RigidTransform(self._calibration)

    @property
    def intrinsic(self) -> jnp.ndarray:
        """The 3x3 intrinsic matrix."""
        return make_intrinsic_matrix(self)

    @property
    def n_rays(self) -> int:
        return self.target.shape[1]

    def __call__(
        self,
        extrinsic: RigidTransform,
        calibration: Optional[RigidTransform] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """World-space (source, target) rays for a batch of poses.

        Matches reference ``Detector.forward`` (detector.py:145-154): scale the
        canonical plane by the calibration, then apply ``reorient`` composed
        with the extrinsic pose.
        """
        if calibration is None:
            calibration = self.calibration
        target = calibration(self.target)  # (1, N, 3)
        pose = self.reorient.compose(extrinsic)  # batch B
        source = pose(self.source)  # (B, 1, 3) via size-1 broadcast
        target = pose(target)  # (B, N, 3)
        return source, target

    forward = __call__

    def full_plane_target(
        self,
        extrinsic: RigidTransform,
        calibration: Optional[RigidTransform] = None,
    ) -> jnp.ndarray:
        """World-space targets for the FULL detector plane (ignoring any
        pixel subsampling) — the Pallas sparse-render path."""
        if calibration is None:
            calibration = self.calibration
        target = calibration(self.target_full)
        pose = self.reorient.compose(extrinsic)
        return pose(target)


jax.tree_util.register_pytree_node(
    Detector,
    lambda d: d.tree_flatten(),
    Detector.tree_unflatten,
)


def get_focal_length(intrinsic, delx: float, dely: float) -> float:
    """Recover focal length from a 3x3 intrinsic matrix (detector.py:157-164)."""
    fx = intrinsic[0, 0]
    fy = intrinsic[1, 1]
    return float(abs((fx * delx) + (fy * dely))) / 2.0


def get_principal_point(intrinsic, height: int, width: int, delx: float, dely: float):
    """Recover (x0, y0) from a 3x3 intrinsic matrix (detector.py:167-176)."""
    x0 = delx * (intrinsic[0, 2] - width / 2)
    y0 = dely * (intrinsic[1, 2] - height / 2)
    return float(x0), float(y0)


def parse_intrinsic_matrix(intrinsic, height: int, width: int, delx: float, dely: float):
    """(focal_length, x0, y0) from a 3x3 intrinsic matrix (detector.py:179-188)."""
    focal_length = get_focal_length(intrinsic, delx, dely)
    x0, y0 = get_principal_point(intrinsic, height, width, delx, dely)
    return focal_length, x0, y0


def make_intrinsic_matrix(detector: "Detector") -> jnp.ndarray:
    """3x3 intrinsic matrix from detector parameters (detector.py:191-202)."""
    fx = detector.sdd / detector.delx
    fy = detector.sdd / detector.dely
    u0 = detector.x0 / detector.delx + detector.width / 2
    v0 = detector.y0 / detector.dely + detector.height / 2
    return jnp.asarray(
        [[fx, 0.0, u0], [0.0, fy, v0], [0.0, 0.0, 1.0]], jnp.float32
    )
