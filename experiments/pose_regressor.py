"""Train a CNN pose regressor on synthetic DRRs.

Deep-learning integration demo (SURVEY §3.5): render random-pose DRRs on the
fly, regress the pose with a flax CNN through any differentiable rotation
parameterization, and train end-to-end with a pose geodesic loss.
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

from diffdrr_tpu import DRR, load_example_ct, convert
from diffdrr_tpu.registration import PoseRegressor


@click.command()
@click.option("--cpu/--no-cpu", default=False)
@click.option("--n-steps", default=200)
@click.option("--batch-size", default=8)
@click.option("--height", default=64)
@click.option("--volume-size", default=96)
@click.option("--parameterization", default="rotation_6d")
@click.option("--lr", default=3e-4)
@click.option("--ckpt-dir", default=None,
              help="Checkpoint directory; resumes from the latest step")
@click.option("--ckpt-every", default=50)
def main(cpu, n_steps, batch_size, height, volume_size, parameterization, lr,
         ckpt_dir, ckpt_every):
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from diffdrr_tpu.profiling import enable_compilation_cache

        enable_compilation_cache()  # reuse remote Pallas compiles across runs
    subject = load_example_ct(
        shape=(volume_size, volume_size, max(16, volume_size // 4))
    )
    drr = DRR(subject, sdd=1020.0, height=height, delx=3.0, renderer="trilinear")

    model = PoseRegressor(parameterization=parameterization, model_name="small")
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, height, height), jnp.float32)
    )
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    rot0 = jnp.asarray([[0.0, np.pi / 2, 0.0]], jnp.float32)
    trans0 = jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32)

    def sample_batch(drr, key):
        k1, k2 = jax.random.split(key)
        drot = 0.1 * jax.random.normal(k1, (batch_size, 3))
        dtrans = 15.0 * jax.random.normal(k2, (batch_size, 3))
        rot = rot0 + drot
        trans = trans0 + dtrans
        imgs = drr(rot, trans, parameterization="euler_angles", convention="ZXY")
        # Normalize images (the regressor shouldn't depend on exposure).
        mu = jnp.mean(imgs, axis=(1, 2, 3), keepdims=True)
        sd = jnp.std(imgs, axis=(1, 2, 3), keepdims=True) + 1e-6
        pose = convert(rot, trans, parameterization="euler_angles",
                       convention="ZXY")
        return (imgs - mu) / sd, pose

    def loss_fn(params, imgs, pose_true):
        pose_pred = model.apply(params, imgs)
        # Frobenius distance on rotation + scaled translation error.
        dR = jnp.sum((pose_pred.rotation - pose_true.rotation) ** 2, axis=(1, 2))
        dt = jnp.sum(
            (pose_pred.translation - pose_true.translation) ** 2, axis=1
        )
        return jnp.mean(dR + 1e-4 * dt)

    # drr is a jit ARGUMENT, not a closure capture (captured arrays become
    # HLO constants and bloat every compile request).
    @jax.jit
    def step_inner(drr, params, opt_state, key):
        imgs, pose_true = sample_batch(drr, key)
        loss, grads = jax.value_and_grad(loss_fn)(params, imgs, pose_true)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def step(params, opt_state, key):
        return step_inner(drr, params, opt_state, key)

    mgr = None
    start = 0
    key = jax.random.PRNGKey(1)
    if ckpt_dir is not None:
        from diffdrr_tpu.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
        resumed = mgr.latest(like={"params": params, "opt_state": opt_state,
                                   "key": key})
        if resumed is not None:
            start, state = resumed
            params, opt_state, key = (state["params"], state["opt_state"],
                                      state["key"])
            click.echo(f"resumed from step {start} in {ckpt_dir}")

    t0 = time.perf_counter()
    for it in range(start, n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if it % 20 == 0 or it == n_steps - 1:
            click.echo(f"step {it:4d}  loss {float(loss):.4f}")
        if mgr is not None:
            mgr.maybe_save(it + 1, {"params": params, "opt_state": opt_state,
                                    "key": key}, every=ckpt_every)
    if mgr is not None:
        mgr.wait()
        mgr.close()
    ran = max(1, n_steps - start)
    click.echo(
        f"done in {time.perf_counter() - t0:.1f} s "
        f"({ran / (time.perf_counter() - t0):.2f} steps/s)"
    )


if __name__ == "__main__":
    main()
