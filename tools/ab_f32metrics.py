"""A/B the cost of "highest"-precision image metrics in registration.

Round-3 wrapped the image metrics (NCC family / Sobel / MI) in
``jax.default_matmul_precision("highest")`` alongside the geometry chain,
and end-to-end registration throughput regressed 46.1 -> 39.6 it/s
(BENCH_r02 vs BENCH_r03) while every component render got faster. This
tool measures that one variable in isolation, on the real bench config
(512x512x133 CT, 200^2 Siddon, multiscale-NCC + Adam).

Run ONE config per process (CLAUDE.md: perf A/Bs contaminate shared
processes). The env var is read by ``_precision.f32_image_metrics`` at
call (trace) time:

    python tools/ab_f32metrics.py --f32-metrics 0
    python tools/ab_f32metrics.py --f32-metrics 1

Prints one JSON line: {"f32_metrics": b, "ms_per_iter": .., "iters_per_s": ..}
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f32-metrics", type=int, required=True)
    ap.add_argument("--cpu", action="store_true", help="tiny smoke on CPU")
    ap.add_argument("--micro", action="store_true",
                    help="time ONLY the multiscale-NCC fwd+grad (isolates "
                         "the metric's precision cost; compiles in seconds "
                         "vs the full registration scan's remote compile)")
    args = ap.parse_args()

    os.environ["DIFFDRR_TPU_F32_METRICS"] = "1" if args.f32_metrics else "0"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from diffdrr_tpu.profiling import enable_compilation_cache

        enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    import bench
    from diffdrr_tpu import DRR, load_example_ct
    from diffdrr_tpu.registration import make_registration_step

    shape = (96, 96, 48) if args.cpu else (512, 512, 133)
    h, delx = (48, 800.0 / 48) if args.cpu else (200, 2.0)

    if args.micro:
        from diffdrr_tpu.metrics import MultiscaleNormalizedCrossCorrelation2d

        metric = MultiscaleNormalizedCrossCorrelation2d([None, 13], [0.5, 0.5])
        key = jax.random.PRNGKey(0)
        tgt = jax.random.uniform(key, (1, 1, h, h), jnp.float32)

        @partial(jax.jit, static_argnames=("iters",))
        def run(img0, iters):
            def body(carry, _):
                img, acc = carry
                val, g = jax.value_and_grad(
                    lambda im: jnp.mean(metric(im, tgt)))(img)
                img = img + 1e-6 * val + 1e-9 * g
                return (img, acc + val), None

            (_, acc), _ = jax.lax.scan(body, (img0, jnp.float32(0.0)), None,
                                       length=iters)
            return acc

        img0 = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, h, h))
        kw = dict(iters=2, reps=1) if args.cpu else dict(iters=16, reps=3)
        t = bench._per_iter(lambda x, n: run(x, n), img0, **kw)
        print(json.dumps({
            "f32_metrics": bool(args.f32_metrics), "micro": True,
            "ms_per_iter": round(t * 1e3, 3),
        }))
        return

    subject = load_example_ct(shape=shape)
    trans = jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32)
    rot0 = jnp.asarray([[0.01, np.pi / 2 + 0.02, -0.01]], jnp.float32)

    drr_s = DRR(subject, sdd=1020.0, height=h, delx=delx, renderer="siddon")
    target = drr_s(rot0, trans, parameterization="euler_angles",
                   convention="ZXY", axis=2)
    init_fn, step_fn = make_registration_step(
        drr_s, target, "euler_angles", "ZXY", lr_rotation=1e-3,
        lr_translation=1e-1, axis=2,
    )

    @partial(jax.jit, static_argnames=("iters",))
    def reg_run_inner(drr, tgt, rot_start, iters):
        params, opt_state = init_fn(rot_start, trans + 5.0)

        def body(carry, _):
            params, opt_state = carry
            params, opt_state, score = step_fn.raw(drr, tgt, params, opt_state)
            return (params, opt_state), score

        (params, _), scores = jax.lax.scan(body, (params, opt_state), None,
                                           length=iters)
        return jnp.sum(scores) + jnp.sum(params["rotation"])

    def reg_run(rot_start, iters):
        return reg_run_inner(drr_s, target, rot_start, iters)

    kw = dict(iters=2, reps=1) if args.cpu else dict(iters=8, reps=3)
    t = bench._per_iter(reg_run, rot0 + 0.03, **kw)
    print(json.dumps({
        "f32_metrics": bool(args.f32_metrics),
        "ms_per_iter": round(t * 1e3, 3),
        "iters_per_s": round(1.0 / t, 2),
    }))


if __name__ == "__main__":
    main()
