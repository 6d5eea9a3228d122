"""Gradient-free registration baseline via scipy.optimize.

Analog of the reference's reg_scipy.py: the same pose-recovery task solved
with Nelder-Mead / Powell on the (jit-compiled, forward-only) image
similarity — the classical baseline that differentiable rendering beats.
"""

from __future__ import annotations

import time

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import click
import numpy as np

import jax
import scipy.optimize

import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct, convert
from diffdrr_tpu.metrics import DoubleGeodesicSE3, NormalizedCrossCorrelation2d


@click.command()
@click.option("--cpu/--no-cpu", default=False, help="Force CPU execution")
@click.option("--n-runs", default=5)
@click.option("--height", default=64)
@click.option("--volume-size", default=128)
@click.option("--method", default="Nelder-Mead",
              type=click.Choice(["Nelder-Mead", "Powell"]))
@click.option("--maxiter", default=300)
@click.option("--seed", default=0)
def main(cpu, n_runs, height, volume_size, method, maxiter, seed):
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    subject = load_example_ct(
        shape=(volume_size, volume_size, max(16, volume_size // 4))
    )
    drr = DRR(subject, sdd=1020.0, height=height, delx=2.0, renderer="trilinear")
    metric = NormalizedCrossCorrelation2d()
    geo = DoubleGeodesicSE3(sdd=1020.0)

    rot_true = np.array([0.0, np.pi / 2, 0.0], np.float32)
    trans_true = np.array([0.0, 850.0, 0.0], np.float32)
    target = drr(
        jnp.asarray(rot_true[None]), jnp.asarray(trans_true[None]),
        parameterization="euler_angles", convention="ZXY",
    )
    pose_true = convert(
        jnp.asarray(rot_true[None]), jnp.asarray(trans_true[None]),
        parameterization="euler_angles", convention="ZXY",
    )

    import jax

    # drr/target are jit ARGUMENTS, not closure captures (captured arrays
    # become HLO constants and bloat every compile request).
    @jax.jit
    def score(drr, target, rot, trans):
        img = drr(rot, trans, parameterization="euler_angles", convention="ZXY")
        return -jnp.mean(metric(img, target))

    def objective(x):
        rot = jnp.asarray(x[:3], jnp.float32)[None]
        trans = jnp.asarray(x[3:], jnp.float32)[None]
        return float(score(drr, target, rot, trans))

    rng = np.random.default_rng(seed)
    for run in range(n_runs):
        x0 = np.concatenate(
            [rot_true + rng.normal(0, 0.06, 3), trans_true + rng.normal(0, 12.0, 3)]
        )
        t0 = time.perf_counter()
        res = scipy.optimize.minimize(
            objective, x0, method=method, options={"maxiter": maxiter}
        )
        pose = convert(
            jnp.asarray(res.x[:3], jnp.float32)[None],
            jnp.asarray(res.x[3:], jnp.float32)[None],
            parameterization="euler_angles", convention="ZXY",
        )
        err = float(geo(pose_true, pose)[2][0])
        click.echo(
            f"run {run}: {method} nfev={res.nfev} final={err:8.3f} mm"
            f" ({time.perf_counter() - t0:.1f} s)"
        )


if __name__ == "__main__":
    main()
