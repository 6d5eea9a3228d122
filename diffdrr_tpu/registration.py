"""2D/3D registration: iterative differentiable-rendering + CNN pose regression.

TPU-native reimplementation of the reference's registration layer
(diffdrr/registration.py). Differences by design:

  * ``Registration`` is a registered pytree whose leaves are the pose
    parameters — ``jax.grad`` w.r.t. the object itself works like torch
    parameter gradients, and the whole optimization step jits.
  * ``PoseRegressor`` replaces the timm backbone zoo (reference:
    registration.py:81-87) with a flax CNN (configurable width/depth presets);
    the decoding contract is identical: backbone features -> two linear heads
    -> ``convert`` to a RigidTransform, differentiable for every
    parameterization.
  * ``make_registration_step``/``optimize`` provide the jit-compiled
    optimization loop with split rotation/translation learning rates that the
    reference implements ad hoc in experiments (experiments/registration.py:74-116).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .drr import DRR
from .metrics import MultiscaleNormalizedCrossCorrelation2d
from .pose import RigidTransform, convert

__all__ = [
    "Registration",
    "PoseRegressor",
    "N_ANGULAR_COMPONENTS",
    "make_registration_step",
    "optimize",
]

N_ANGULAR_COMPONENTS = {
    "axis_angle": 3,
    "euler_angles": 3,
    "se3_log_map": 3,
    "quaternion": 4,
    "rotation_6d": 6,
    "rotation_9d": 9,
    "rotation_10d": 10,
    "quaternion_adjugate": 10,
}


class Registration:
    """Iterative 2D/3D registration via differentiable rendering.

    Mirrors the reference ``Registration`` module (registration.py:14-50): the
    pose parameters are the optimizable leaves; ``forward``/``__call__``
    renders at the current pose.
    """

    def __init__(
        self,
        drr: DRR,
        rotation: jnp.ndarray,
        translation: jnp.ndarray,
        parameterization: str,
        convention: Optional[str] = None,
    ):
        self.drr = drr
        self._rotation = jnp.asarray(rotation)
        self._translation = jnp.asarray(translation)
        self.parameterization = parameterization
        self.convention = convention

    # --- pytree protocol: rotation/translation (and drr) are leaves ---
    def tree_flatten(self):
        return (self.drr, self._rotation, self._translation), (
            self.parameterization,
            self.convention,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.drr, obj._rotation, obj._translation = children
        obj.parameterization, obj.convention = aux
        return obj

    @property
    def pose(self) -> RigidTransform:
        return convert(
            self._rotation,
            self._translation,
            parameterization=self.parameterization,
            convention=self.convention,
        )

    @property
    def rotation(self) -> jnp.ndarray:
        return self._rotation

    @property
    def translation(self) -> jnp.ndarray:
        return self._translation

    def __call__(self, **kwargs):
        return self.drr(self.pose, **kwargs)

    forward = __call__


jax.tree_util.register_pytree_node(
    Registration, lambda r: r.tree_flatten(), Registration.tree_unflatten
)


def make_registration_step(
    drr: DRR,
    target_img: jnp.ndarray,
    parameterization: str,
    convention: Optional[str] = None,
    metric: Optional[Callable] = None,
    lr_rotation: float = 5e-2,
    lr_translation: float = 1e0,
    optimizer: str = "adam",
    maximize: bool = True,
    **render_kwargs,
):
    """Build (init_fn, step_fn) for a jit-compiled registration loop.

    The optimizer applies split learning rates to the rotation and translation
    parameter groups (reference: experiments/registration.py:74-116), and
    ``maximize=True`` ascends similarity metrics like NCC.
    """
    if metric is None:
        metric = MultiscaleNormalizedCrossCorrelation2d([None, 13], [0.5, 0.5])

    opt_cls = {"adam": optax.adam, "sgd": optax.sgd}[optimizer]
    tx = optax.multi_transform(
        {
            "rotation": opt_cls(lr_rotation),
            "translation": opt_cls(lr_translation),
        },
        {"rotation": "rotation", "translation": "translation"},
    )

    def init_fn(rotation: jnp.ndarray, translation: jnp.ndarray):
        params = {
            "rotation": jnp.asarray(rotation),
            "translation": jnp.asarray(translation),
        }
        return params, tx.init(params)

    def loss_fn(params):
        img = drr(
            params["rotation"],
            params["translation"],
            parameterization=parameterization,
            convention=convention,
            **render_kwargs,
        )
        score = jnp.mean(metric(img, target_img))
        return -score if maximize else score

    @jax.jit
    def step_fn(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        score = -loss if maximize else loss
        return params, opt_state, score

    return init_fn, step_fn


def optimize(
    drr: DRR,
    target_img: jnp.ndarray,
    rotation: jnp.ndarray,
    translation: jnp.ndarray,
    parameterization: str,
    convention: Optional[str] = None,
    n_iters: int = 100,
    verbose: bool = False,
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray, list]:
    """Run an iterative registration; returns (rotation, translation, trace)."""
    init_fn, step_fn = make_registration_step(
        drr, target_img, parameterization, convention, **kwargs
    )
    params, opt_state = init_fn(rotation, translation)
    trace = []
    for it in range(n_iters):
        params, opt_state, score = step_fn(params, opt_state)
        trace.append(float(score))
        if verbose:
            print(f"iter {it:4d}  score {trace[-1]:.5f}")
    return params["rotation"], params["translation"], trace


# -----------------------------------------------------------------------------
# CNN pose regressor
# -----------------------------------------------------------------------------

try:
    import flax.linen as nn

    class _ConvBackbone(nn.Module):
        """Small strided CNN feature extractor (timm-backbone replacement)."""

        widths: Tuple[int, ...] = (32, 64, 128, 256)

        @nn.compact
        def __call__(self, x):  # (B, 1, H, W) -> (B, F)
            x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
            for w in self.widths:
                x = nn.Conv(w, (3, 3), strides=(2, 2))(x)
                x = nn.GroupNorm(num_groups=8)(x)
                x = nn.relu(x)
                x = nn.Conv(w, (3, 3))(x)
                x = nn.GroupNorm(num_groups=8)(x)
                x = nn.relu(x)
            return jnp.mean(x, axis=(1, 2))  # global average pool

    _BACKBONE_PRESETS = {
        "default": (32, 64, 128, 256),
        "small": (16, 32, 64),
        "large": (64, 128, 256, 512),
    }

    class PoseRegressor(nn.Module):
        """CNN that regresses a camera pose from an X-ray image.

        Contract matches the reference ``PoseRegressor``
        (registration.py:58-98): backbone features feed two linear heads
        (rotation with ``N_ANGULAR_COMPONENTS[parameterization]`` outputs,
        translation with 3), decoded by :func:`convert` into a
        ``RigidTransform`` — end-to-end differentiable.

        ``model_name`` selects a backbone preset (replaces the timm zoo).
        """

        parameterization: str
        convention: Optional[str] = None
        model_name: str = "default"
        height: int = 256  # kept for API parity; unused (global pooling)

        @nn.compact
        def __call__(self, x) -> RigidTransform:
            widths = _BACKBONE_PRESETS.get(self.model_name, _BACKBONE_PRESETS["default"])
            features = _ConvBackbone(widths)(x)
            n_rot = N_ANGULAR_COMPONENTS[self.parameterization]
            rot = nn.Dense(n_rot)(features)
            xyz = nn.Dense(3)(features)
            return convert(
                rot,
                xyz,
                parameterization=self.parameterization,
                convention=self.convention,
            )

except ImportError:  # pragma: no cover - flax is expected in this image
    PoseRegressor = None


def optimize_multiscale(
    drr: DRR,
    target_img: jnp.ndarray,
    rotation: jnp.ndarray,
    translation: jnp.ndarray,
    parameterization: str,
    convention: Optional[str] = None,
    scales: Tuple[float, ...] = (0.25, 0.5, 1.0),
    n_iters_per_scale: int = 100,
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray, list]:
    """Coarse-to-fine registration over a detector resolution pyramid.

    Renders and matches at downscaled detector resolutions first (large
    capture range, cheap iterations), then refines at full resolution — the
    standard strategy the reference supports manually via
    ``rescale_detector_`` (reference: drr.py:258-266). ``target_img`` is
    downsampled with area-averaging resizes at each scale.
    """
    import jax.image

    trace = []
    for scale in scales:
        if scale == 1.0:
            drr_s = drr
            tgt = target_img
        else:
            # A rescaled detector: fewer, larger pixels over the same plane.
            from .drr import DRR as _DRR

            drr_s = _DRR(
                drr.subject,
                sdd=drr.detector.sdd,
                height=max(8, int(drr.detector.height * scale)),
                width=max(8, int(drr.detector.width * scale)),
                delx=drr.detector.delx / scale,
                dely=drr.detector.dely / scale,
                x0=drr.detector._x0,
                y0=drr.detector._y0,
                renderer=drr.renderer_name,
                voxel_shift=drr.voxel_shift,
                reverse_x_axis=drr.detector.reverse_x_axis,
                **drr.renderer_kwargs,
            )
            B, C = target_img.shape[:2]
            tgt = jax.image.resize(
                target_img,
                (B, C, drr_s.detector.height, drr_s.detector.width),
                method="linear",
            )
        rotation, translation, t = optimize(
            drr_s, tgt, rotation, translation, parameterization, convention,
            n_iters=n_iters_per_scale, **kwargs,
        )
        trace.append(t)
    return rotation, translation, trace
