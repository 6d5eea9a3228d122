"""Bound the reference's fwd+bwd time from its CPU bwd/fwd ratio.

The reference publishes forward-only timings (README.md:85-87,
timing.ipynb) — no backward numbers. CUDA torch is absent here, so this
tool measures the bwd/fwd RATIO of the actual reference renderer on CPU
(same tensor ops, same autograd graph shape) and applies it to the
published 2080 Ti forward times. The ratio transfers imperfectly across
devices (CPU has no kernel-launch overhead; GPU sort/scatter backward has
different relative cost), so the output is a BOUND/estimate, labeled as
such — but it turns "we beat the reference on gradients" from a guess into
an argument with data (VERDICT r3, next #3).

Pose-only backward (stop_gradients_through_grid_sample=True) matches our
bench's fwd+pose-bwd metrics.

Usage: python tools/ref_bwd_bound.py [--height 100] [--reps 5]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import torch

    from diffdrr.renderers import Siddon, Trilinear

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffdrr_tpu import DRR, load_example_ct
    from diffdrr_tpu.pose import convert

    # Build the bench geometry's voxel-space rays with OUR detector (the
    # reference detector needs uninstalled deps); both renderers consume
    # identical (source, target) bundles, so the ray provenance is neutral.
    subject = load_example_ct(shape=(512, 512, 133))
    h = args.height
    drr = DRR(subject, sdd=1020.0, height=h, delx=2.0 * 200 / h,
              renderer="siddon")
    pose = convert(jnp.asarray([[0.01, np.pi / 2 + 0.02, -0.01]], jnp.float32),
                   jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32),
                   parameterization="euler_angles", convention="ZXY")
    src, tgt = drr.detector(pose, None)
    sv = np.asarray(drr.affine_inverse(src), np.float32)
    tv = np.asarray(drr.affine_inverse(tgt), np.float32)
    w = np.linalg.norm(tv - sv, axis=-1)[:, None, :].astype(np.float32)
    density = np.asarray(drr.density, np.float32)

    tdensity = torch.from_numpy(density)
    tw = torch.from_numpy(w)

    def timed(fn):
        fn()  # warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    results = {}
    for name, renderer, kw in (
        ("siddon", Siddon(stop_gradients_through_grid_sample=True), {}),
        ("trilinear", Trilinear(), {"n_points": 500}),
    ):
        ts_f = torch.from_numpy(sv)
        tt_f = torch.from_numpy(tv)

        def fwd():
            with torch.no_grad():
                renderer(tdensity, ts_f, tt_f, tw, **kw)

        ts_g = torch.from_numpy(sv).requires_grad_(True)
        tt_g = torch.from_numpy(tv).requires_grad_(True)

        def fwdbwd():
            out = renderer(tdensity, ts_g, tt_g, tw, **kw)
            out.sum().backward()
            ts_g.grad = tt_g.grad = None

        t_f = timed(fwd)
        t_fb = timed(fwdbwd)
        results[name] = (t_f, t_fb, t_fb / t_f)
        print(f"{name}: cpu fwd {t_f*1e3:.1f} ms, fwd+bwd {t_fb*1e3:.1f} ms, "
              f"ratio {t_fb/t_f:.2f}", flush=True)

    # Published 2080 Ti forwards (BASELINE.md): siddon 200^2 24.6 ms,
    # trilinear n=500 7.63 ms.
    for name, pub in (("siddon", 24.6), ("trilinear", 7.63)):
        ratio = results[name][2]
        print(f"{name}: published GPU fwd {pub} ms x cpu ratio {ratio:.2f} "
              f"=> estimated GPU fwd+pose-bwd ~{pub*ratio:.0f} ms "
              f"(CPU-transferred ratio; treat as an estimate)", flush=True)


if __name__ == "__main__":
    main()
