"""Multi-chip scaling: meshes, sharded rendering, and slab-sharded volumes.

This capability has no reference counterpart — the reference is a
single-process, single-GPU library. Here, rendering distributes over a
``jax.sharding.Mesh`` three independent ways, all composable:

* **data parallel** — the pose batch splits across the ``data`` mesh axis;
* **ray sharding** (the sequence-parallel analog) — each image's detector
  pixels split across the ``rays`` axis, volume replicated;
* **slab sharding** (the tensor-parallel analog) — the *volume* splits into
  march-axis slabs, one per device, with a single ``psum`` combining the
  partial line integrals. This is the >HBM-volume path: no device ever
  holds the whole CT.

This script runs anywhere: with no TPU slice attached it uses 8 virtual
CPU devices (the same mechanism the test suite uses). On a real multi-chip
slice the identical code lays the collectives on ICI. For multi-host (DCN)
jobs, `diffdrr_tpu.parallel.initialize_distributed` bootstraps
`jax.distributed` and `local_batch_to_global` builds globally-sharded
arrays from per-host batches.

Run:  python tutorials/04_multi_chip.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# When no real multi-device platform is present, virtualize 8 CPU devices.
# (Must be set before jax initializes; harmless if jax is already imported
# with devices available, as under the test suite.)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct, convert
from diffdrr_tpu.parallel import (
    make_mesh,
    make_sharded_render,
    slab_sharded_joseph,
    make_reconstruction_step,
)

n_dev = len(jax.devices())
print(f"{n_dev} devices:", jax.devices()[0].platform)
assert n_dev >= 2, "need >= 2 devices (or the XLA_FLAGS virtualization)"

subject = load_example_ct(shape=(48, 48, 24))
H = 32
drr = DRR(subject, sdd=1020.0, height=H, delx=12.0, renderer="trilinear")
rot = jnp.array([[0.0, np.pi / 2, 0.0]])
trans = jnp.array([[0.0, 850.0, 0.0]])

# ---------------------------------------------------------------------------
# 1. Reference result on one device.
# ---------------------------------------------------------------------------
ref = np.asarray(
    drr(rot, trans, parameterization="euler_angles", convention="ZXY",
        n_points=100)
)

# ---------------------------------------------------------------------------
# 2. DP x ray sharding. A (data, rays) mesh: pose batch over `data`, each
# image's pixels over `rays`. `make_sharded_render` returns a jitted render
# with the right shardings; XLA inserts the collectives.
# ---------------------------------------------------------------------------
data_dim = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
mesh = make_mesh((data_dim, n_dev // data_dim), ("data", "rays"))
print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))

render = make_sharded_render(
    drr, mesh, "euler_angles", "ZXY", n_points=100
)
B = 4
rot_b = jnp.tile(rot, (B, 1)) + 0.02 * jnp.arange(B)[:, None]
trans_b = jnp.tile(trans, (B, 1))
imgs = np.asarray(render(rot_b, trans_b))
assert imgs.shape == (B, 1, H, H)
np.testing.assert_allclose(imgs[0], ref[0], rtol=5e-3, atol=1e-4 * ref.max())
print("DP x ray-sharded render matches single-device: OK")

# ---------------------------------------------------------------------------
# 3. Slab sharding: the volume itself is split into march-axis slabs, one
# per device (shard_map + one psum). Joseph's samples stay inside single
# planes, so the decomposition is exact — no halo exchange.
# ---------------------------------------------------------------------------
mesh1 = make_mesh((1, n_dev), ("data", "rays"))
drr_j = DRR(subject, sdd=1020.0, height=H, delx=12.0, renderer="joseph")
pose = convert(rot, trans, parameterization="euler_angles", convention="ZXY")
source, target = drr_j.detector(pose, None)
weights = jnp.linalg.norm(target - source, axis=-1)[:, None, :]
source_v, target_v = drr_j.affine_inverse(source), drr_j.affine_inverse(target)

from diffdrr_tpu.ops.joseph import joseph_raycast, choose_march_axis

march_axis = choose_march_axis(np.asarray(source_v), np.asarray(target_v))
img_slab = slab_sharded_joseph(
    drr_j.density, source_v, target_v, weights, mesh1, "rays",
    march_axis=march_axis,
)
img_full = joseph_raycast(
    drr_j.density, source_v, target_v, weights, axis=march_axis
)
np.testing.assert_allclose(
    np.asarray(img_slab), np.asarray(img_full),
    rtol=1e-4, atol=1e-4 * float(np.abs(img_full).max()),
)
print("slab-sharded Joseph (volume split across devices) matches: OK")

# The EXACT Siddon renderer slab-shards too, and the decomposition is
# mathematically exact (not an approximation): slab boundaries are grid
# planes, which are already Siddon segment boundaries, so each segment's
# contribution lands on exactly one device and one psum restores the full
# integral — values and gradients.
from diffdrr_tpu.parallel import slab_sharded_siddon
from diffdrr_tpu.ops.siddon import siddon_raycast

img_slab_s = slab_sharded_siddon(
    drr_j.density, source_v, target_v, weights, mesh1, "rays", slab_axis=0,
)
img_full_s = siddon_raycast(drr_j.density, source_v, target_v, weights)
np.testing.assert_allclose(
    np.asarray(img_slab_s), np.asarray(img_full_s),
    rtol=1e-4, atol=1e-4 * float(np.abs(img_full_s).max()),
)
print("slab-sharded exact Siddon matches: OK")

# ---------------------------------------------------------------------------
# 4. Distributed reconstruction: views shard over `data`, rays over `rays`,
# the density gradient is all-reduced by XLA automatically under jit.
# ---------------------------------------------------------------------------
n_views = 8
angles = np.linspace(0, np.pi, n_views, endpoint=False)
rot_v = jnp.asarray([[a, np.pi / 2, 0.0] for a in angles], jnp.float32)
trans_v = jnp.tile(trans, (n_views, 1))
measured = drr(rot_v, trans_v, parameterization="euler_angles",
               convention="ZXY", n_points=100)

init_fn, step_fn = make_reconstruction_step(drr, mesh, lr=5e-2, n_points=100)
density, opt_state = init_fn(jnp.zeros_like(drr.density))
losses = []
for _ in range(10):
    density, opt_state, loss = step_fn(density, opt_state, rot_v, trans_v, measured)
    losses.append(float(loss))
print(f"distributed reconstruction: mse {losses[0]:.4f} -> {losses[-1]:.4f}")
assert losses[-1] < losses[0]

print("tutorial 04: all checks passed")
