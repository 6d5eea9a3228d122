"""Differentiable CT reconstruction: optimizing voxel densities.

The reference's ``reconstruction.ipynb`` workload (SURVEY §3.4): DRRs are
differentiable w.r.t. the *volume* too, so given X-rays from known poses
you can recover the densities by gradient descent on the re-rendering
error. This is why ``DRR.render`` takes the density as an explicit
argument rather than always reading the stored buffer — the optimization
parameter flows through that seam.

Run:  python tutorials/03_reconstruction.py [--full] [--tpu]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if "--tpu" not in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp
import optax

FULL = "--full" in sys.argv

from diffdrr_tpu import DRR, load_example_ct, convert

# ---------------------------------------------------------------------------
# 1. Ground truth: the phantom CT and a ring of views around it.
# ---------------------------------------------------------------------------
shape = (96, 96, 48) if FULL else (48, 48, 24)
subject = load_example_ct(shape=shape)
H = 128 if FULL else 64
drr = DRR(subject, sdd=1020.0, height=H, delx=6.0, renderer="trilinear")

n_views = 32 if FULL else 16
angles = np.linspace(0, np.pi, n_views, endpoint=False)
rotations = jnp.asarray(
    [[float(a), np.pi / 2, 0.0] for a in angles], jnp.float32
)
translations = jnp.tile(jnp.array([[0.0, 850.0, 0.0]]), (n_views, 1))
pose = convert(rotations, translations,
               parameterization="euler_angles", convention="ZXY")

n_points = 200 if FULL else 150
measured = drr(pose, n_points=n_points)
print(f"{n_views} measured views of {shape} volume:", measured.shape)

# ---------------------------------------------------------------------------
# 2. The reconstruction loop: the density grid is the parameter. Note the
# explicit-density render — `drr.render(density, source, target)` — while
# the detector geometry comes from the stored DRR.
# ---------------------------------------------------------------------------
density_true = drr.density
density = jnp.zeros_like(density_true)

source, target = drr.detector(pose, None)
tx = optax.adam(5e-2)
opt_state = tx.init(density)


# The DRR and measured projections ride through jit as ARGUMENTS (pytrees):
# closing over them would embed the volume as compile-time constants.
def loss_fn(drr, measured, density):
    img = drr.render(density, source, target, n_points=n_points)
    img = drr.reshape_transform(img, batch_size=n_views)
    return jnp.mean((img - measured) ** 2)


@jax.jit
def step_inner(drr, measured, density, opt_state):
    loss, grads = jax.value_and_grad(loss_fn, argnums=2)(drr, measured,
                                                         density)
    updates, opt_state = tx.update(grads, opt_state, density)
    # Densities are physical attenuation: project onto the nonnegative cone.
    density = jnp.maximum(optax.apply_updates(density, updates), 0.0)
    return density, opt_state, loss


def step(density, opt_state):
    return step_inner(drr, measured, density, opt_state)


n_iters = 200 if FULL else 120
losses = []
for it in range(n_iters):
    density, opt_state, loss = step(density, opt_state)
    losses.append(float(loss))
    if it % max(1, n_iters // 6) == 0:
        print(f"iter {it:4d}  mse {losses[-1]:.5f}")

print(f"final mse {losses[-1]:.5f} (from {losses[0]:.5f})")
assert losses[-1] < losses[0] * 0.05

# ---------------------------------------------------------------------------
# 3. How good is the recovered volume? Limited-view cone-beam reconstruction
# is underdetermined — a handful of projections constrain line integrals,
# not voxels, so expect structural agreement that improves with view count
# (and with regularizers you can add directly to `loss_fn`), not voxel
# equality.
# ---------------------------------------------------------------------------
err = jnp.abs(density - density_true)
corr = jnp.corrcoef(density.ravel(), density_true.ravel())[0, 1]
print(f"voxel correlation with ground truth: {float(corr):.3f}, "
      f"mean |err| {float(err.mean()):.4f}")
assert float(corr) > 0.4

# ---------------------------------------------------------------------------
# 4. Checkpoint / resume. Long reconstructions (full-resolution CT, many
# views) should checkpoint: `diffdrr_tpu.checkpoint` wraps orbax with
# step-indexed retention, and restoring with a sharded `like` pytree
# resumes on any device-mesh layout. (`experiments/reconstruction.py
# --ckpt-dir` wires this into the CLI.)
# ---------------------------------------------------------------------------
import tempfile

from diffdrr_tpu.checkpoint import CheckpointManager

with tempfile.TemporaryDirectory() as td:
    with CheckpointManager(td, max_to_keep=2) as mgr:
        mgr.save(n_iters, {"density": density, "opt_state": opt_state})
        mgr.wait()
        step_back, state = mgr.latest(
            like={"density": jnp.zeros_like(density),
                  "opt_state": opt_state})
    assert step_back == n_iters
    np.testing.assert_allclose(np.asarray(state["density"]),
                               np.asarray(density))
print("checkpoint save/restore round trip: OK")

print("tutorial 03: all checks passed")
