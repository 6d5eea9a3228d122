"""Differentiable CT reconstruction from multi-view DRRs.

Analog of the reference's reconstruction tutorial (SURVEY §3.4,
tutorials/reconstruction.ipynb): render N views of the ground-truth volume,
then recover the voxel densities by gradient descent through the renderer.
Runs single-device by default; --mesh shards views and rays across all
available devices with the density gradient all-reduced by XLA.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import click
import numpy as np

import jax
import jax.numpy as jnp
import optax

from diffdrr_tpu import DRR, load_example_ct


@click.command()
@click.option("--cpu/--no-cpu", default=False, help="Force CPU execution")
@click.option("--n-views", default=8, help="Number of training views")
@click.option("--n-iters", default=100)
@click.option("--height", default=64)
@click.option("--volume-size", default=96)
@click.option("--lr", default=5e-2)
@click.option("--mesh/--no-mesh", default=False,
              help="Shard views/rays across all devices")
@click.option("--renderer", default="trilinear",
              type=click.Choice(["trilinear", "joseph"]))
@click.option("--ckpt-dir", default=None,
              help="Checkpoint directory; resumes from the latest step if "
                   "one exists (diffdrr_tpu.checkpoint)")
@click.option("--ckpt-every", default=25, help="Checkpoint interval (steps)")
def main(cpu, n_views, n_iters, height, volume_size, lr, mesh, renderer,
         ckpt_dir, ckpt_every):
    if cpu:
        # NOTE: no local `import jax` here — that would shadow the module-
        # level import for the whole function and break the accelerator
        # branch with UnboundLocalError (round-4 find: the TPU path of this
        # CLI had been dead since the round-3 cache change; the suite only
        # exercises --cpu).
        jax.config.update("jax_platforms", "cpu")
    else:
        from diffdrr_tpu.profiling import enable_compilation_cache

        enable_compilation_cache()  # reuse remote Pallas compiles across runs
    subject = load_example_ct(
        shape=(volume_size, volume_size, max(16, volume_size // 4))
    )
    drr = DRR(subject, sdd=1020.0, height=height, delx=3.0, renderer=renderer)

    # Ground-truth views on a circular trajectory about the z-axis.
    thetas = np.linspace(0, np.pi, n_views, endpoint=False)
    rot = jnp.asarray(
        np.stack([thetas, np.full_like(thetas, np.pi / 2), np.zeros_like(thetas)],
                 axis=1),
        jnp.float32,
    )
    trans = jnp.tile(jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32), (n_views, 1))
    measured = drr(rot, trans, parameterization="euler_angles", convention="ZXY")

    if mesh:
        from diffdrr_tpu.parallel import make_mesh, make_reconstruction_step

        n_dev = len(jax.devices())
        data = 2 if n_views % 2 == 0 and n_dev % 2 == 0 and n_dev > 1 else 1
        m = make_mesh((data, n_dev // data), ("data", "rays"))
        init_fn, step_fn = make_reconstruction_step(drr, m, lr=lr)
        density, opt_state = init_fn(jnp.zeros_like(drr.density))

        def step(density, opt_state):
            return step_fn(density, opt_state, rot, trans, measured)

    else:
        tx = optax.adam(lr)
        density = jnp.zeros_like(drr.density)
        opt_state = tx.init(density)

        # drr/measured are jit ARGUMENTS (pytrees), not closure captures:
        # captured arrays become HLO constants and bloat every compile.
        def loss_fn(drr, measured, density):
            from diffdrr_tpu.pose import convert

            pose = convert(rot, trans, parameterization="euler_angles",
                           convention="ZXY")
            source, target = drr.detector(pose, None)
            img = drr.render(density, source, target)
            img = drr.reshape_transform(img, batch_size=n_views)
            return jnp.mean((img - measured) ** 2)

        @jax.jit
        def step_inner(drr, measured, density, opt_state):
            loss, grads = jax.value_and_grad(loss_fn, argnums=2)(
                drr, measured, density)
            updates, opt_state = tx.update(grads, opt_state, density)
            return optax.apply_updates(density, updates), opt_state, loss

        def step(density, opt_state):
            return step_inner(drr, measured, density, opt_state)

    mgr = None
    start = 0
    if ckpt_dir is not None:
        from diffdrr_tpu.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
        resumed = mgr.latest(like={"density": density, "opt_state": opt_state})
        if resumed is not None:
            start, state = resumed
            density, opt_state = state["density"], state["opt_state"]
            click.echo(f"resumed from step {start} in {ckpt_dir}")

    t0 = time.perf_counter()
    loss = float("nan")
    for it in range(start, n_iters):
        density, opt_state, loss = step(density, opt_state)
        if it % 10 == 0 or it == n_iters - 1:
            click.echo(f"iter {it:4d}  mse {float(loss):.6f}")
        if mgr is not None:
            mgr.maybe_save(
                it + 1, {"density": density, "opt_state": opt_state},
                every=ckpt_every,
            )
    elapsed = time.perf_counter() - t0
    if mgr is not None:
        mgr.wait()
        mgr.close()

    err = float(jnp.sqrt(jnp.mean((density - drr.density) ** 2)))
    base = float(jnp.sqrt(jnp.mean(drr.density**2)))
    ran = max(1, n_iters - start)
    click.echo(
        f"done in {elapsed:.1f} s ({ran / elapsed:.2f} it/s); "
        f"voxel RMSE {err:.4f} (volume RMS {base:.4f})"
    )


if __name__ == "__main__":
    main()
