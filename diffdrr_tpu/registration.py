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

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import numpy as np
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
    "optimize_until",
    "optimize_multiscale",
    "optimize_multistart",
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

    Mirrors the reference ``Registration`` module (registration.py:14-50):
    ``forward``/``__call__`` renders at the current pose, and the pose
    parameters are exposed as ``.params`` (a ``(rotation, translation)``
    pair) for optimization.

    Pytree note: ``drr`` is a child too (it must trace through jit), so
    ``jax.grad`` of a loss w.r.t. the WHOLE object also carries gradients
    for the DRR's density/geometry leaves — unlike torch, where those are
    non-parameter buffers. Differentiate w.r.t. ``.params`` (as
    ``make_registration_step``/``optimize`` do) unless you really mean to
    update the CT volume.
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

    @property
    def params(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """The optimizable leaves: ``(rotation, translation)``."""
        return self._rotation, self._translation

    def __call__(self, **kwargs):
        return self.drr(self.pose, **kwargs)

    forward = __call__


jax.tree_util.register_pytree_node(
    Registration, lambda r: r.tree_flatten(), Registration.tree_unflatten
)


def _sgd_momentum(
    learning_rate: float,
    momentum: float = 0.0,
    dampening: float = 0.0,
    nesterov: bool = False,
):
    """torch.optim.SGD-compatible transform (momentum + dampening).

    optax.sgd lacks the dampening term the reference experiments sweep
    (experiments/registration.py:84-95: momentum=0.9, dampening=0.9);
    buf = momentum * buf + (1 - dampening) * grad, except on the FIRST step
    where torch initializes buf = grad (no dampening) — starting from a
    zero buffer would make step 1 a factor (1 - dampening) too small.
    """
    if momentum == 0.0:
        return optax.sgd(learning_rate)

    def init(params):
        return (jnp.zeros((), jnp.int32),
                jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        count, bufs = state
        first = count == 0
        buf = jax.tree_util.tree_map(
            lambda b, g: jnp.where(
                first, g, momentum * b + (1.0 - dampening) * g),
            bufs, updates,
        )
        if nesterov:
            out = jax.tree_util.tree_map(
                lambda g, b: g + momentum * b, updates, buf
            )
        else:
            out = buf
        out = jax.tree_util.tree_map(lambda g: -learning_rate * g, out)
        return out, (count + 1, buf)

    return optax.GradientTransformation(init, update)


def _make_optimizer(optimizer, lr_rotation, lr_translation, momentum=0.0,
                    dampening=0.0):
    """Split-LR optimizer matching the reference experiment sweep."""
    if optimizer == "lbfgs":
        return optax.lbfgs()
    opt_cls = {
        "adam": optax.adam,
        "sgd": partial(_sgd_momentum, momentum=momentum,
                       dampening=dampening),
    }[optimizer]
    return optax.multi_transform(
        {
            "rotation": opt_cls(lr_rotation),
            "translation": opt_cls(lr_translation),
        },
        {"rotation": "rotation", "translation": "translation"},
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
    momentum: float = 0.0,
    dampening: float = 0.0,
    maximize: bool = True,
    **render_kwargs,
):
    """Build (init_fn, step_fn) for a jit-compiled registration loop.

    Optimizers match the reference experiment sweep
    (experiments/registration.py:74-116): ``"adam"``, ``"sgd"`` (with
    ``momentum``/``dampening``), and ``"lbfgs"``. Adam/SGD apply split
    learning rates to the rotation and translation parameter groups.
    ``"lbfgs"`` intentionally ignores ``lr_rotation``/``lr_translation``:
    the reference's own LBFGS config is a SINGLE parameter group with the
    default lr and a strong-Wolfe line search
    (``torch.optim.LBFGS([rotations, translations],
    line_search_fn="strong_wolfe")``, experiments/registration.py:110-114);
    ``optax.lbfgs()``'s zoom linesearch is the equivalent — the line search
    sets the step, so per-group LRs have no analog in either library.
    ``maximize=True`` ascends similarity metrics like NCC.
    """
    if metric is None:
        metric = MultiscaleNormalizedCrossCorrelation2d([None, 13], [0.5, 0.5])

    # ``drr``/``target_img`` are jit ARGUMENTS, not closure captures: a
    # captured DRR embeds its density and cached prepped volumes (hundreds
    # of MB) as HLO constants, which inflates every compile and overflows
    # the remote-compile request limit on tunneled TPU backends.
    def loss_of(drr, target_img, params):
        img = drr(
            params["rotation"],
            params["translation"],
            parameterization=parameterization,
            convention=convention,
            **render_kwargs,
        )
        score = jnp.mean(metric(img, target_img))
        return -score if maximize else score

    tx = _make_optimizer(optimizer, lr_rotation, lr_translation, momentum,
                         dampening)

    def init_fn(rotation: jnp.ndarray, translation: jnp.ndarray):
        params = {
            "rotation": jnp.asarray(rotation),
            "translation": jnp.asarray(translation),
        }
        return params, tx.init(params)

    if optimizer == "lbfgs":
        def raw_step(drr, target_img, params, opt_state):
            loss_fn = partial(loss_of, drr, target_img)
            value_and_grad = optax.value_and_grad_from_state(loss_fn)
            loss, grads = value_and_grad(params, state=opt_state)
            updates, opt_state = tx.update(
                grads, opt_state, params, value=loss, grad=grads,
                value_fn=loss_fn,
            )
            params = optax.apply_updates(params, updates)
            score = -loss if maximize else loss
            return params, opt_state, score
    else:
        def raw_step(drr, target_img, params, opt_state):
            loss, grads = jax.value_and_grad(
                partial(loss_of, drr, target_img))(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            score = -loss if maximize else loss
            return params, opt_state, score

    jitted_step = jax.jit(raw_step)

    def step_fn(params, opt_state):
        return jitted_step(drr, target_img, params, opt_state)

    # Internal seam for loop builders (optimize/optimize_until/bench): the
    # un-jitted step parameterized by (drr, target_img) so outer jits can
    # pass them as arguments too.
    step_fn.raw = raw_step
    step_fn.operands = (drr, target_img)
    step_fn.metric = metric
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
    scan: Optional[bool] = None,
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray, list]:
    """Run an iterative registration; returns (rotation, translation, trace).

    By default the whole loop runs on-device as one jitted ``lax.scan`` —
    a single dispatch and a single host sync for the full trace (the
    per-iteration ``float()`` sync would dominate on a remote TPU).
    ``verbose=True`` (or ``scan=False``) uses a per-step Python loop.
    """
    init_fn, step_fn = make_registration_step(
        drr, target_img, parameterization, convention, **kwargs
    )
    params, opt_state = init_fn(rotation, translation)
    if scan is None:
        scan = not verbose
    if scan:
        @partial(jax.jit, static_argnames=("n",))
        def run(drr, target_img, params, opt_state, n):
            def body(carry, _):
                params, opt_state = carry
                params, opt_state, score = step_fn.raw(
                    drr, target_img, params, opt_state)
                return (params, opt_state), score

            (params, opt_state), scores = jax.lax.scan(
                body, (params, opt_state), None, length=n
            )
            return params, scores

        params, scores = run(drr, target_img, params, opt_state, n_iters)
        trace = [float(s) for s in np.asarray(scores)]
    else:
        trace = []
        for it in range(n_iters):
            params, opt_state, score = step_fn(params, opt_state)
            trace.append(float(score))
            if verbose:
                print(f"iter {it:4d}  score {trace[-1]:.5f}")
    return params["rotation"], params["translation"], trace


def optimize_multistart(
    drr: DRR,
    target_img: jnp.ndarray,
    rotations: jnp.ndarray,
    translations: jnp.ndarray,
    parameterization: str,
    convention: Optional[str] = None,
    n_iters: int = 100,
    metric: Optional[Callable] = None,
    optimizer: str = "adam",
    lr_rotation: float = 5e-2,
    lr_translation: float = 1e0,
    momentum: float = 0.0,
    dampening: float = 0.0,
    maximize: bool = True,
    **render_kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run N random restarts as ONE batched optimization.

    The reference's experiments loop over 100 random initializations one
    registration at a time (experiments/registration.py:119-186). On TPU the
    restarts batch: every iteration renders all N candidate poses in one
    kernel dispatch, and because Adam/SGD updates are elementwise and the
    loss is a SUM of per-restart scores, the batched run is exactly N
    independent optimizations — same trajectories, one compile, one
    dispatch chain. ``lbfgs`` cannot share one batched update (its line
    search would couple the restarts through a shared step size), so it
    runs each restart independently under a single compiled
    ``jax.lax.map`` — the faithful analog of the reference's
    one-registration-at-a-time loop (experiments/registration.py:119-186).

    Args mirror :func:`optimize`, with ``rotations``/``translations``
    carrying a leading restart axis (N, ...). Returns
    ``(rotations, translations, final_scores, score_trace)``: raw metric
    values (never sign-flipped, matching :func:`optimize`'s trace), with
    ``final_scores`` (N,) evaluated at the RETURNED poses and
    ``score_trace`` (n_iters, N) holding each iteration's pre-update score.
    Pick the winner with ``argmax`` (``maximize=True``) / ``argmin``.
    """
    if optimizer == "lbfgs":
        return _multistart_lbfgs(
            drr, target_img, rotations, translations, parameterization,
            convention, n_iters, metric, maximize, **render_kwargs,
        )
    if metric is None:
        metric = MultiscaleNormalizedCrossCorrelation2d([None, 13], [0.5, 0.5])
    tx = _make_optimizer(optimizer, lr_rotation, lr_translation, momentum,
                         dampening)
    params = {
        "rotation": jnp.asarray(rotations),
        "translation": jnp.asarray(translations),
    }
    opt_state = tx.init(params)

    def loss_of(drr, tgt, params):
        img = drr(
            params["rotation"], params["translation"],
            parameterization=parameterization, convention=convention,
            **render_kwargs,
        )
        per = metric(img, jnp.broadcast_to(tgt, img.shape))  # (N,) raw
        # Sum: each restart's gradient depends only on its own pose.
        loss = -jnp.sum(per) if maximize else jnp.sum(per)
        return loss, per

    @partial(jax.jit, static_argnames=("n",))
    def run(drr, tgt, params, opt_state, n):
        def body(carry, _):
            params, opt_state = carry
            (_, per), grads = jax.value_and_grad(
                partial(loss_of, drr, tgt), has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), per

        (params, _), trace = jax.lax.scan(
            body, (params, opt_state), None, length=n)
        # Score the poses actually returned (the trace rows are pre-update).
        _, final = loss_of(drr, tgt, params)
        return params, trace, final

    params, trace, final = run(drr, target_img, params, opt_state, n_iters)
    return (params["rotation"], params["translation"], final, trace)


def _multistart_lbfgs(
    drr, target_img, rotations, translations, parameterization, convention,
    n_iters, metric, maximize, **render_kwargs,
):
    """N independent LBFGS registrations under one compiled ``lax.map``.

    Each restart carries its own optax L-BFGS state and line search (the
    reference runs LBFGS restarts one at a time for the same reason,
    experiments/registration.py:110-114,119-186). Returns the same
    ``(rotations, translations, final_scores, score_trace)`` contract as
    :func:`optimize_multistart`, with ``score_trace`` shaped (n_iters, N).
    """
    init_fn, step_fn = make_registration_step(
        drr, target_img, parameterization, convention, metric=metric,
        optimizer="lbfgs", maximize=maximize, **render_kwargs,
    )

    @partial(jax.jit, static_argnames=("n",))
    def run_all(drr, tgt, rots, trans, n):
        def one(rt):
            rot, tr = rt
            params, opt_state = init_fn(rot, tr)

            def body(carry, _):
                params, opt_state = carry
                params, opt_state, score = step_fn.raw(
                    drr, tgt, params, opt_state)
                return (params, opt_state), score

            (params, _), scores = jax.lax.scan(
                body, (params, opt_state), None, length=n)
            # Score the returned pose (trace rows are pre-update scores).
            img = drr(params["rotation"], params["translation"],
                      parameterization=parameterization,
                      convention=convention, **render_kwargs)
            final = jnp.mean(step_fn.metric(img, tgt))
            return params["rotation"], params["translation"], final, scores

        return jax.lax.map(one, (rots, trans))

    rots = jnp.asarray(rotations)[:, None]  # per-restart batch axis of 1
    trans = jnp.asarray(translations)[:, None]
    r, t, final, scores = run_all(drr, target_img, rots, trans, n_iters)
    return r[:, 0], t[:, 0], final, jnp.moveaxis(scores, 0, 1)


def optimize_until(
    drr: DRR,
    target_img: jnp.ndarray,
    rotation: jnp.ndarray,
    translation: jnp.ndarray,
    parameterization: str,
    convention: Optional[str] = None,
    true_pose: Optional[RigidTransform] = None,
    tol_mm: float = 1.0,
    max_iters: int = 500,
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """On-device registration with a convergence check — zero host syncs.

    Runs a jitted ``lax.while_loop`` until the DoubleGeodesicSE3 distance to
    ``true_pose`` drops below ``tol_mm`` (the reference experiments' 1 mm
    criterion, experiments/registration.py:172-174) or ``max_iters`` is hit.
    Returns (rotation, translation, n_iters_used, final_geodesic_mm).
    """
    from .metrics import DoubleGeodesicSE3

    if true_pose is None:
        raise ValueError("optimize_until requires the ground-truth pose")
    geodesic = DoubleGeodesicSE3(sdd=drr.detector.sdd)
    init_fn, step_fn = make_registration_step(
        drr, target_img, parameterization, convention, **kwargs
    )
    params0, opt_state0 = init_fn(rotation, translation)

    def distance(params):
        est = convert(
            params["rotation"], params["translation"],
            parameterization=parameterization, convention=convention,
        )
        return jnp.max(geodesic(true_pose, est)[2])

    @jax.jit
    def run(drr, target_img, params, opt_state):
        def cond(carry):
            _, _, it, dist = carry
            return (dist > tol_mm) & (it < max_iters)

        def body(carry):
            params, opt_state, it, _ = carry
            params, opt_state, _ = step_fn.raw(
                drr, target_img, params, opt_state)
            return params, opt_state, it + 1, distance(params)

        params, opt_state, n, dist = jax.lax.while_loop(
            cond, body, (params, opt_state, jnp.int32(0), distance(params))
        )
        return params, n, dist

    params, n, dist = run(drr, target_img, params0, opt_state0)
    return params["rotation"], params["translation"], n, dist


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


def rescaled_drr(drr: DRR, scale: float) -> DRR:
    """A coarse-resolution twin of ``drr`` over the SAME physical plane.

    Pixel pitch derives from the realized coarse pixel count
    (``h * dely == h_s * dely_s`` exactly; delx scales the WIDTH axis per
    the detector calibration convention) — deriving it from the requested
    scale would change the field of view whenever ``h * scale`` rounds or
    clamps, geometrically biasing coarse registration stages.
    """
    h_s = max(8, int(round(drr.detector.height * scale)))
    w_s = max(8, int(round(drr.detector.width * scale)))
    return DRR(
        drr.subject,
        sdd=drr.detector.sdd,
        height=h_s,
        width=w_s,
        delx=drr.detector.delx * drr.detector.width / w_s,
        dely=drr.detector.dely * drr.detector.height / h_s,
        x0=drr.detector._x0,
        y0=drr.detector._y0,
        renderer=drr.renderer_name,
        voxel_shift=drr.voxel_shift,
        reverse_x_axis=drr.detector.reverse_x_axis,
        # Constructor-consumed options the source DRR popped out of
        # renderer_kwargs — losing them would silently revert coarse
        # scales to default precision/storage/remat behavior.
        patch_size=drr.patch_size,
        checkpoint_gradients=drr.checkpoint_gradients,
        precision=drr.pallas_precision,
        storage=drr.pallas_storage,
        pallas_fp_scale=drr._fp_scale,
        **({"pallas_tile": drr._tile_override}
           if drr._tile_override is not None else {}),
        **drr.renderer_kwargs,
    )


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
            drr_s = rescaled_drr(drr, scale)
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
