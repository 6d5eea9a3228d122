"""Scaling-efficiency measurement: ray-sharded render throughput vs 1 device.

North-star companion metric (BASELINE.md:38-40 "multi-host scaling
efficiency"): renders the same pose batch with the detector-ray axis sharded
over an N-device mesh (``parallel.make_sharded_render``) and on a single
device, and reports

    efficiency = t_single / (N * t_sharded)

Prints ONE JSON line. Runs on whatever mesh exists:

  * real multi-chip TPU: pass nothing — uses ``jax.devices()`` directly and
    the number is the true ICI scaling efficiency;
  * this machine (1 tunneled TPU chip): ``bench.py`` invokes this script in a
    subprocess with ``--cpu-devices 8`` — a virtual 8-device CPU mesh. The
    devices then share the host's cores AND the single-device baseline
    already uses all of them via XLA's intra-op threading, so the reported
    efficiency is a LOWER BOUND dominated by core contention, useful as a
    collectives-overhead regression signal rather than an absolute number
    (methodology is carried in the JSON).

The workload is the XLA joseph renderer (the Pallas kernels need real TPU
hardware; sharding layers above the renderer are identical either way).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force a virtual N-device CPU mesh (0 = use the "
                         "real backend's devices)")
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--volume-size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.cpu_devices}").strip()

    import jax

    if args.cpu_devices:
        # The sitecustomize on this machine ignores JAX_PLATFORMS=cpu; the
        # config update is the reliable switch (tests/conftest.py does the
        # same).
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from diffdrr_tpu import DRR, load_example_ct
    from diffdrr_tpu.parallel import make_mesh, make_sharded_render

    devices = jax.devices()
    n_dev = len(devices)
    s = args.volume_size
    subject = load_example_ct(shape=(s, s, max(8, s // 4)))
    drr = DRR(subject, sdd=1020.0, height=args.height, delx=400.0 / args.height,
              renderer="joseph", force_xla=True)

    rot = jnp.tile(jnp.asarray([[0.01, np.pi / 2 + 0.02, -0.01]], jnp.float32),
                   (args.batch, 1))
    trans = jnp.tile(jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32),
                     (args.batch, 1))

    def timed(render, iters, reps):
        out = render(rot, trans)
        jax.block_until_ready(out)  # compile + warm
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            for i in range(iters):
                # Fresh input each call: rules out any dispatch-level caching.
                out = render(rot + 1e-5 * (r * iters + i + 1), trans)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    # Single device: a 1-device mesh through the SAME code path, so the only
    # difference vs the sharded run is the mesh (not dispatch plumbing).
    mesh1 = make_mesh(devices=devices[:1])
    render1 = make_sharded_render(drr, mesh1, "euler_angles", "ZXY")
    t1 = timed(render1, args.iters, args.reps)

    meshN = make_mesh(devices=devices)
    renderN = make_sharded_render(drr, meshN, "euler_angles", "ZXY")
    tN = timed(renderN, args.iters, args.reps)

    speedup = t1 / tN
    eff = speedup / n_dev
    print(json.dumps({
        "n_devices": n_dev,
        "backend": jax.default_backend(),
        "t_single_ms": round(t1 * 1e3, 3),
        "t_sharded_ms": round(tN * 1e3, 3),
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 4),
        "methodology": (
            "ray-axis (detector) sharding via parallel.make_sharded_render; "
            "efficiency = t_single / (n_devices * t_sharded); XLA joseph "
            "renderer"
            + (", virtual CPU mesh: devices share host cores and the "
               "1-device baseline is already multithreaded, so this is a "
               "collectives-overhead lower bound, not ICI efficiency"
               if args.cpu_devices else ", real device mesh"))}),
        flush=True)


if __name__ == "__main__":
    sys.exit(main())
