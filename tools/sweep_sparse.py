"""Sweep sparse-render (p_subsample) strategies on TPU; fit the crossover.

True sparse rendering (round 3) dispatches per-construction between three
strategies (DRR._sparse_strategy): "xla" (oracle renders ONLY the sampled
rays), "tiles" (Pallas kernel over the occupied detector tiles), "full"
(kernel full frame + gather). The crossover constant
``drr._SPARSE_XLA_RAY_COST`` ("one oracle ray costs ~N kernel rays") was a
conservative guess (drr.py:85-88); this sweep measures every (p, strategy)
cell so the constant can be fitted from data (VERDICT r3, next #6).

Each cell runs in its own subprocess (perf isolation, CLAUDE.md). Output
lines: ``<renderer>_p<p>_<strategy>: T ms  (n_sub=..., kernel_rays=...)``.

Fit: per-ray oracle cost = slope of xla-times vs n_sub; per-ray kernel
cost = slope of tiles-times vs kernel_rays; their ratio IS the constant.

Usage:
    python tools/sweep_sparse.py                  # all cells
    python tools/sweep_sparse.py --one joseph_p0.1_tiles
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct
from diffdrr_tpu.profiling import enable_compilation_cache

enable_compilation_cache()

TRANS = jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32)
ROT0 = jnp.asarray([[0.01, np.pi / 2 + 0.02, -0.01]], jnp.float32)

PS = (0.01, 0.05, 0.1, 0.25)
STRATEGIES = ("auto", "xla", "tiles", "full")
RENDERERS = ("joseph", "siddon")


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


def run_one(name):
    renderer, p_s, strategy = name.split("_")
    p = float(p_s[1:])
    subject = load_example_ct(shape=(512, 512, 133))
    drr = DRR(subject, sdd=1020.0, height=200, delx=2.0, renderer=renderer,
              p_subsample=p)

    auto_strategy, subsets = drr._sparse_strategy()
    idx = np.asarray(drr.detector.subsamples[-1])
    kernel_rays = None
    cfg = drr.pallas_cfg[2]
    if cfg is not None and subsets[2] is not None:
        kernel_rays = len(subsets[2]) * cfg[0] * cfg[0]
    print(f"{name}: auto would pick {auto_strategy!r}; n_sub={len(idx)}"
          f" kernel_rays={kernel_rays}", flush=True)

    if strategy != "auto":
        # Force the strategy under test. CLASS-level patch: under jit the
        # DRR pytree is unflattened into fresh instances, so an instance
        # attribute would be lost. Safe: each cell is its own subprocess.
        forced = (strategy, subsets if strategy == "tiles"
                  else tuple([None] * 3))
        DRR._sparse_strategy = lambda self: forced

    @partial(jax.jit, static_argnames=("iters",))
    def run(drr, rot0, iters):
        def body(carry, _):
            rot, acc = carry
            img = drr(rot, TRANS, parameterization="euler_angles",
                      convention="ZXY", axis=2)
            rot = rot + 1e-6 * jnp.mean(img)
            return (rot, acc + jnp.mean(img)), None
        (rot, acc), _ = jax.lax.scan(body, (rot0, jnp.float32(0.0)),
                                     None, length=iters)
        return acc

    tm = per_iter(lambda r, n: run(drr, r, n), ROT0)
    print(f"{name}: {tm*1e3:.3f} ms (n_sub={len(idx)},"
          f" kernel_rays={kernel_rays})", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--one":
        run_one(args[1])
    else:
        import subprocess
        names = args or [f"{r}_p{p}_{s}" for r in RENDERERS for p in PS
                         for s in STRATEGIES]
        for name in names:
            subprocess.run([sys.executable, __file__, "--one", name],
                           check=False)
