"""Sweep pallas tile/window configs for joseph+siddon fwd at 200^2 on TPU.

``--volume 512`` switches the CT to a 512^3 cube — the non-VMEM-resident
regime where kernels stream per-plane HBM windows; sweeping there gives the
cost-model fit a nonzero DMA column (tools/fit_cost_model.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

from diffdrr_tpu import DRR, load_example_ct
from diffdrr_tpu.profiling import enable_compilation_cache

# Each config runs in its own subprocess (perf isolation); the persistent
# cache lets re-runs of a config skip its remote Pallas compiles.
enable_compilation_cache()

VOLSIZE = 512 if "--volume" in sys.argv and \
    sys.argv[sys.argv.index("--volume") + 1] == "512" else 133
# Isotropic spacing for the 512^3 cube (see bench.py: the reference 2.5 mm
# slices would put the detector inside a 1.28 m volume).
subject = load_example_ct(shape=(512, 512, VOLSIZE),
                          **({"spacing": (0.703125,) * 3}
                             if VOLSIZE == 512 else {}))
trans = jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32)
rot0 = jnp.asarray([[0.01, np.pi / 2 + 0.02, -0.01]], jnp.float32)


def render_scanner(drr, **kw):
    @partial(jax.jit, static_argnames=("iters",))
    def run(drr, rot0, iters):
        def body(carry, _):
            rot, acc = carry
            img = drr(rot, trans, parameterization="euler_angles",
                      convention="ZXY", **kw)
            rot = rot + 1e-6 * jnp.mean(img)
            return (rot, acc + jnp.mean(img)), None
        (rot, acc), _ = jax.lax.scan(body, (rot0, jnp.float32(0.0)),
                                     None, length=iters)
        return acc
    return lambda rot0, iters: run(drr, rot0, iters)


def per_iter(run, rot0, iters=6, reps=3):
    float(run(rot0, 1))
    float(run(rot0, 1 + iters))
    for _ in range(3):
        def t(vs, n):
            ts = []
            for v in vs:
                t0 = time.perf_counter()
                float(run(v, n))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return ts[len(ts) // 2]
        t1 = t([rot0 + 1e-4 * (i + 1) for i in range(reps)], 1)
        tk = t([rot0 + 1e-4 * (i + 11) for i in range(reps)], 1 + iters)
        per = (tk - t1) / iters
        if per > 1e-4:
            return per
    return max(per, 1e-9)


CONFIGS = {
    "joseph_t16": dict(renderer="joseph", pallas_tile=16),
    "joseph_t32": dict(renderer="joseph", pallas_tile=32),
    "joseph_t64": dict(renderer="joseph", pallas_tile=64),
    "siddon_t16": dict(renderer="siddon", pallas_tile=16),
    "siddon_t32": dict(renderer="siddon", pallas_tile=32),
    "siddon_t64": dict(renderer="siddon", pallas_tile=64),
    # Shrunken windows (runtime footprint guard keeps these safe): at the
    # bench geometry (volume at 850/1020 of sdd) the true magnification is
    # ~1.0 vs the planner's worst-case 1.35 bound.
    "joseph_t16_fp08": dict(renderer="joseph", pallas_tile=16,
                            pallas_fp_scale=0.8),
    "joseph_t32_fp08": dict(renderer="joseph", pallas_tile=32,
                            pallas_fp_scale=0.8),
    "siddon_t16_fp08": dict(renderer="siddon", pallas_tile=16,
                            pallas_fp_scale=0.8),
    "siddon_t32_fp08": dict(renderer="siddon", pallas_tile=32,
                            pallas_fp_scale=0.8),
    "joseph_t16_fp06": dict(renderer="joseph", pallas_tile=16,
                            pallas_fp_scale=0.6),
    "joseph_t32_fp06": dict(renderer="joseph", pallas_tile=32,
                            pallas_fp_scale=0.6),
    "joseph_t32_fp055": dict(renderer="joseph", pallas_tile=32,
                             pallas_fp_scale=0.55),
    "siddon_t32_fp055": dict(renderer="siddon", pallas_tile=32,
                             pallas_fp_scale=0.55),
    "siddon_t16_fp06": dict(renderer="siddon", pallas_tile=16,
                            pallas_fp_scale=0.6),
    "siddon_t32_fp06": dict(renderer="siddon", pallas_tile=32,
                            pallas_fp_scale=0.6),
}


def run_one(name, bwd=False):
    kwargs = CONFIGS[name]
    drr = DRR(subject, sdd=1020.0, height=200, delx=2.0, **kwargs)
    print(name, "cfg", drr.pallas_cfg[2], flush=True)
    # VALUE check before timing: a miscompiled config (e.g. the Mosaic
    # dynamic-roll bug at non-power-of-two lane widths) would otherwise
    # post a fast-but-garbage number and poison the cost-model fit.
    img = drr(rot0, trans, parameterization="euler_angles",
              convention="ZXY", axis=2)
    ora = drr(rot0, trans, parameterization="euler_angles",
              convention="ZXY", axis=2, force_xla=True)
    rel = float(jnp.abs(img - ora).max() / jnp.abs(ora).max())
    print(f"{name} value-check rel {rel:.2e}", flush=True)
    if rel > 5e-3:  # well beyond bf16-compute tolerance
        print(f"{name}: VALUE CHECK FAILED ({rel:.3e}) — not timing",
              flush=True)
        return
    if bwd:
        import jax

        def scanner(drr_outer, **kw):
            @partial(jax.jit, static_argnames=("iters",))
            def run(drr, rot0, iters):
                def loss(rot):
                    img = drr(rot, trans, parameterization="euler_angles",
                              convention="ZXY", **kw)
                    return jnp.mean(img)

                def body(carry, _):
                    rot, acc = carry
                    val, g = jax.value_and_grad(loss)(rot)
                    rot = rot + 1e-6 * val + 1e-9 * g
                    return (rot, acc + val), None

                (rot, acc), _ = jax.lax.scan(
                    body, (rot0, jnp.float32(0.0)), None, length=iters)
                return acc
            return lambda rot0, iters: run(drr_outer, rot0, iters)
    else:
        scanner = render_scanner
    tm = per_iter(scanner(drr, axis=2), rot0)
    suffix = ("_v512" if VOLSIZE == 512 else "") + ("_bwd" if bwd else "")
    print(f"{name}{suffix}: {tm*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    volargs = []
    if "--volume" in args:
        i = args.index("--volume")
        volargs = args[i:i + 2]
        args = args[:i] + args[i + 2:]
    if args and args[0] == "--one":
        run_one(args[1], bwd=len(args) > 2 and args[2] == "bwd")
    else:
        # Each config in its OWN subprocess: shared-process runs have shown
        # cross-contamination (compile-cache pressure, allocator state).
        import subprocess
        names = args or list(CONFIGS)
        for name in names:
            bwd = name.endswith("_bwd")
            base = name[:-4] if bwd else name
            cmd = [sys.executable, __file__, "--one", base] + (
                ["bwd"] if bwd else []) + volargs
            subprocess.run(cmd, check=False)
