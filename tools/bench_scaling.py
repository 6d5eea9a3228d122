"""Scaling-efficiency measurement: ray-sharded render throughput vs 1 device.

North-star companion metric (BASELINE.md:38-40 "multi-host scaling
efficiency"): renders the same pose batch with the detector-ray axis sharded
over an N-device mesh (``parallel.make_sharded_render``) and on a single
device, and reports

    efficiency = t_single / (N * t_sharded)

Prints ONE JSON line. Three modes:

  * real multi-chip TPU (``--cpu-devices 0``, devices > 1): uses
    ``jax.devices()`` in-process — the number is true ICI scaling
    efficiency. Must run standalone (nothing else holding the chips).
  * virtual CPU mesh, PINNED (default for ``--cpu-devices N``): the naive
    virtual-mesh measurement is a mush number — the 1-device baseline
    already uses every host core via XLA intra-op threading, so "scaling"
    mostly measures core contention (VERDICT r3 weak #9). Instead, each
    measurement runs in its own subprocess under ``taskset``: the baseline
    gets exactly the per-device core share (cores/N), the sharded run gets
    all N * (cores/N) cores. Devices are clamped to the core count so every
    virtual device owns >= 1 core. Efficiency then actually isolates
    sharding+collective overhead at fixed per-device compute.
  * ``--no-pin``: the old in-process lower-bound number, kept for
    comparison.

The JSON also carries the analytic collective cost: the only cross-device
traffic in a ray-sharded render is the image all-gather at assembly,
``(N-1)/N * B*H*W*4`` bytes received per device per step — at v5e ICI
(~45 GB/s/link) that is microseconds for any realistic detector, so the
EXPECTED hardware efficiency is ~1.0 and the measured CPU-mesh number is a
conservative floor (host collectives run over shared memory + thread
handoffs, far slower relatively than ICI).

The workload is the XLA joseph renderer (the Pallas kernels need real TPU
hardware; the sharding layers above the renderer are identical either way).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(n_cpu_devices: int, height: int, volume_size: int, batch: int,
             iters: int, reps: int) -> float:
    """In-process: build the renderer on an n-device mesh and time it."""
    if n_cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{n_cpu_devices}").strip()

    import jax

    if n_cpu_devices:
        # The sitecustomize on this machine ignores JAX_PLATFORMS=cpu; the
        # config update is the reliable switch (tests/conftest.py does the
        # same).
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from diffdrr_tpu import DRR, load_example_ct
    from diffdrr_tpu.parallel import make_mesh, make_sharded_render

    devices = jax.devices()
    s = volume_size
    subject = load_example_ct(shape=(s, s, max(8, s // 4)))
    drr = DRR(subject, sdd=1020.0, height=height, delx=400.0 / height,
              renderer="joseph", force_xla=True)
    rot = jnp.tile(jnp.asarray([[0.01, np.pi / 2 + 0.02, -0.01]], jnp.float32),
                   (batch, 1))
    trans = jnp.tile(jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32),
                     (batch, 1))

    mesh = make_mesh(devices=devices)
    render = make_sharded_render(drr, mesh, "euler_angles", "ZXY")

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


def _child(role_devices: int, cores: str, passthrough) -> float:
    """Run one pinned measurement in a taskset'd subprocess."""
    cmd = ["taskset", "-c", cores, sys.executable,
           os.path.abspath(__file__), "--role", "measure",
           "--cpu-devices", str(role_devices), *passthrough]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child sets its own device count
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=520,
                         env=env)
    if out.returncode != 0:
        raise RuntimeError(out.stderr.strip()[-400:])
    return json.loads(out.stdout.strip().splitlines()[-1])["t_s"]


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
    ap.add_argument("--no-pin", action="store_true",
                    help="legacy in-process CPU-mesh number (core-contention "
                         "lower bound)")
    ap.add_argument("--role", choices=["main", "measure"], default="main")
    args = ap.parse_args()

    if args.role == "measure":
        t = _measure(args.cpu_devices, args.height, args.volume_size,
                     args.batch, args.iters, args.reps)
        print(json.dumps({"t_s": t}), flush=True)
        return

    ncores = os.cpu_count() or 1
    pin = (args.cpu_devices > 0 and not args.no_pin and ncores >= 2
           and os.path.exists("/usr/bin/taskset"))

    passthrough = ["--height", str(args.height),
                   "--volume-size", str(args.volume_size),
                   "--batch", str(args.batch), "--iters", str(args.iters),
                   "--reps", str(args.reps)]

    if pin:
        n_dev = min(args.cpu_devices, ncores)
        cpd = ncores // n_dev  # cores per device, >= 1
        t1 = _child(1, f"0-{cpd - 1}" if cpd > 1 else "0", passthrough)
        tN = _child(n_dev, f"0-{n_dev * cpd - 1}", passthrough)
        backend = "cpu"
        methodology = (
            "ray-axis (detector) sharding via parallel.make_sharded_render; "
            "efficiency = t_single / (n_devices * t_sharded); XLA joseph "
            f"renderer; PINNED virtual CPU mesh: baseline taskset to the "
            f"per-device core share ({cpd}/{ncores} cores), sharded run on "
            f"{n_dev} devices x {cpd} cores — isolates sharding+collective "
            "overhead at fixed per-device compute (host shared-memory "
            "collectives; ICI would be faster, see allgather_bytes_per_step)")
    else:
        n_env = args.cpu_devices
        t1_raw = None
        if n_env:
            methodology_extra = (
                ", virtual CPU mesh (unpinned): devices share host cores and "
                "the 1-device baseline is already multithreaded, so this is "
                "a collectives-overhead lower bound, not ICI efficiency")
        else:
            methodology_extra = ", real device mesh"
        # In-process legacy/real-hardware path: 1-device mesh then N-device
        # mesh through the same code path.
        if args.cpu_devices:
            flags = os.environ.get("XLA_FLAGS", "")
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{args.cpu_devices}").strip()

        import jax

        if args.cpu_devices:
            jax.config.update("jax_platforms", "cpu")

        import numpy as np
        import jax.numpy as jnp

        from diffdrr_tpu import DRR, load_example_ct
        from diffdrr_tpu.parallel import make_mesh, make_sharded_render

        devices = jax.devices()
        n_dev = len(devices)
        s = args.volume_size
        subject = load_example_ct(shape=(s, s, max(8, s // 4)))
        drr = DRR(subject, sdd=1020.0, height=args.height,
                  delx=400.0 / args.height, renderer="joseph", force_xla=True)
        rot = jnp.tile(jnp.asarray([[0.01, np.pi / 2 + 0.02, -0.01]],
                                   jnp.float32), (args.batch, 1))
        trans = jnp.tile(jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32),
                         (args.batch, 1))

        def timed(render):
            out = render(rot, trans)
            jax.block_until_ready(out)
            best = float("inf")
            for r in range(args.reps):
                t0 = time.perf_counter()
                for i in range(args.iters):
                    out = render(rot + 1e-5 * (r * args.iters + i + 1), trans)
                jax.block_until_ready(out)
                best = min(best, (time.perf_counter() - t0) / args.iters)
            return best

        mesh1 = make_mesh(devices=devices[:1])
        t1 = timed(make_sharded_render(drr, mesh1, "euler_angles", "ZXY"))
        meshN = make_mesh(devices=devices)
        tN = timed(make_sharded_render(drr, meshN, "euler_angles", "ZXY"))
        backend = jax.default_backend()
        methodology = (
            "ray-axis (detector) sharding via parallel.make_sharded_render; "
            "efficiency = t_single / (n_devices * t_sharded); XLA joseph "
            "renderer" + methodology_extra)

    speedup = t1 / tN
    eff = speedup / n_dev
    if eff > 1.0:
        # Pinned CPU-mesh runs can come out super-linear: the 1-core
        # baseline pays the whole (multi-threaded) XLA runtime/dispatch
        # overhead on one core, while the sharded run spreads it. Report
        # the capped value as THE efficiency (the excess is a baseline
        # artifact, not real scaling) and keep the raw number alongside.
        methodology += (f"; raw efficiency {eff:.3f} > 1 (1-core baseline "
                        "is runtime-overhead-bound) — capped to 1.0")
        eff = 1.0
    # Analytic collective volume: image all-gather at assembly.
    allgather_bytes = int(args.batch * args.height * args.height * 4
                          * (n_dev - 1) / max(n_dev, 1))
    print(json.dumps({
        "n_devices": n_dev,
        "backend": backend,
        "t_single_ms": round(t1 * 1e3, 3),
        "t_sharded_ms": round(tN * 1e3, 3),
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 4),
        "allgather_bytes_per_step": allgather_bytes,
        "expected_ici_overhead_us": round(allgather_bytes / 45e9 * 1e6, 2),
        "methodology": methodology}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
