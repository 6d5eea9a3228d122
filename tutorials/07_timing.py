"""Timing DRRs honestly: methodology for benchmarking on accelerators.

The reference's ``timing.ipynb`` analog, with the TPU twist: on a remote
accelerator, naive wall-timing of repeated identical calls LIES — dispatch
is asynchronous and identical calls can be cached. The rule:

1. jit the render once and discard the compile call;
2. time a ``lax.scan`` of K iterations whose input depends on the carry
   (so no two renders are identical and nothing can be cached);
3. report (time(K) - time(1)) / (K - 1), over distinct fresh inputs.

This is exactly what the repo's ``bench.py`` does on real hardware; this
tutorial demonstrates the machinery at toy sizes.

Run:  python tutorials/07_timing.py [--tpu]
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if "--tpu" not in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct

subject = load_example_ct(shape=(64, 64, 32))
trans = jnp.array([[0.0, 850.0, 0.0]])
rot0 = jnp.array([[0.01, np.pi / 2, -0.01]])
H = 48


def scan_timer(drr_outer, **kw):
    """Carry-dependent K-iteration render loop (cache-proof).

    Note the DRR rides through ``jax.jit`` as an ARGUMENT (it is a pytree).
    Closing over it instead would embed the CT volume (and any cached
    prepped volumes) as constants in the compiled program — slow compiles,
    and on tunneled TPU backends an oversized remote-compile request.
    """

    @partial(jax.jit, static_argnames=("iters",))
    def run(drr, rot0, iters):
        def body(carry, _):
            rot, acc = carry
            img = drr(rot, trans, parameterization="euler_angles",
                      convention="ZXY", **kw)
            # Feeding the output back into the next pose defeats both
            # dispatch caching and dead-code elimination.
            rot = rot + 1e-6 * jnp.mean(img)
            return (rot, acc + jnp.mean(img)), None

        (rot, acc), _ = jax.lax.scan(body, (rot0, jnp.float32(0.0)),
                                     None, length=iters)
        return acc

    return lambda rot0, iters: run(drr_outer, rot0, iters)


def per_iter_ms(run, iters=8):
    run(rot0, 1).block_until_ready()          # compile (discard)
    run(rot0, 1 + iters).block_until_ready()  # compile K-loop (discard)
    t0 = time.perf_counter()
    run(rot0 + 1e-4, 1).block_until_ready()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(rot0 + 2e-4, 1 + iters).block_until_ready()
    tk = time.perf_counter() - t0
    return max(tk - t1, 1e-9) / iters * 1e3


rows = []
for name, kw in [("siddon", {}), ("joseph", {}),
                 ("trilinear", {"n_points": 100})]:
    drr = DRR(subject, sdd=1020.0, height=H, delx=6.0, renderer=name)
    ms = per_iter_ms(scan_timer(drr, **kw))
    rays_per_s = H * H / (ms * 1e-3)
    rows.append((name, ms, rays_per_s))
    print(f"{name:10s} {ms:8.2f} ms/render   {rays_per_s/1e6:6.2f} M rays/s")

assert all(ms > 0 for _, ms, _ in rows)

# Why the carry-dependence matters: a naive repeated-identical-call loop can
# report absurdly fast numbers on cached/async dispatch paths. Demonstrate
# the two timers disagree at most modestly on CPU (both honest here) — on
# the axon TPU tunnel the naive loop is wrong by orders of magnitude.
drr = DRR(subject, sdd=1020.0, height=H, delx=6.0, renderer="joseph")
fn = jax.jit(lambda d, r: d(r, trans, parameterization="euler_angles",
                            convention="ZXY"))
fn(drr, rot0).block_until_ready()
t0 = time.perf_counter()
for _ in range(8):
    out = fn(drr, rot0)
out.block_until_ready()
naive_ms = (time.perf_counter() - t0) / 8 * 1e3
print(f"naive identical-call loop: {naive_ms:.2f} ms/render "
      "(trust the scan number, not this one)")

print("tutorial 07: all checks passed")
