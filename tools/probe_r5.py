"""Focused hardware probes for the round-5 pending perf items.

Usage: python tools/probe_r5.py <config>
  literal   — trilinear literal n=500 fwd at 200^2 (target <= 7.6 ms)
  s512      — siddon fwd 200^2 on the 512^3 streaming cube (target <= 20 ms)
  j512      — joseph fwd 200^2 on the 512^3 streaming cube (target <= 14 ms)

One config per process (CLAUDE.md perf-isolation doctrine); matches
bench.py's cache-proof carried-input scan methodology exactly.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from diffdrr_tpu import DRR, load_example_ct
from diffdrr_tpu.profiling import enable_compilation_cache

enable_compilation_cache()

trans = jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32)
rot0 = jnp.asarray([[0.01, np.pi / 2 + 0.02, -0.01]], jnp.float32)


def render_scanner(drr_outer, **kw):
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
    return lambda rot0, iters: run(drr_outer, rot0, iters)


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


cfg = sys.argv[1]
if cfg == "literal":
    tile_kw = {}
    if len(sys.argv) > 2:  # optional pallas_tile override for sweeps
        tile_kw["pallas_tile"] = int(sys.argv[2])
    subject = load_example_ct(shape=(512, 512, 133))
    drr = DRR(subject, sdd=1020.0, height=200, delx=2.0,
              renderer="trilinear", **tile_kw)
    kw = dict(axis=2, n_points=500, allow_oversample=True)
    # value check vs XLA oracle
    img = drr(rot0, trans, parameterization="euler_angles",
              convention="ZXY", **kw)
    ora = drr(rot0, trans, parameterization="euler_angles",
              convention="ZXY", force_xla=True, **kw)
    rel = float(jnp.abs(img - ora).max() / jnp.abs(ora).max())
    print(f"literal value-check rel {rel:.2e}", flush=True)
    assert rel < 5e-3, rel
    tm = per_iter(render_scanner(drr, **kw), rot0)
    print(f"trilinear_fwd_200_n500_literal: {tm*1e3:.3f} ms "
          f"(target <= 7.63)", flush=True)
elif cfg in ("s512", "j512"):
    rname = "siddon" if cfg == "s512" else "joseph"
    subject = load_example_ct(shape=(512, 512, 512),
                              spacing=(0.703125,) * 3)
    drr = DRR(subject, sdd=1020.0, height=200, delx=2.0, renderer=rname)
    img = drr(rot0, trans, parameterization="euler_angles",
              convention="ZXY", axis=2)
    ora = drr(rot0, trans, parameterization="euler_angles",
              convention="ZXY", axis=2, force_xla=True)
    rel = float(jnp.abs(img - ora).max() / jnp.abs(ora).max())
    print(f"{rname}_512cube value-check rel {rel:.2e}", flush=True)
    assert rel < 5e-3, rel
    tm = per_iter(render_scanner(drr, axis=2), rot0, iters=4)
    print(f"{rname}_fwd_200_512cube: {tm*1e3:.3f} ms", flush=True)
else:
    raise SystemExit(f"unknown config {cfg}")
