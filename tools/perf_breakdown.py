"""Where does a 200^2 render spend its time? Kernel vs XLA prep vs glue.

Times isolated pieces of the Pallas render pipeline on real TPU hardware,
cache-proof (inputs depend on the scan carry — the axon tunnel caches
identical dispatches, CLAUDE.md). Each case runs in its own subprocess for
perf isolation, like tools/sweep_tile.py.

Cases (all at the bench geometry, 512x512x133 CT, 200^2 detector):
  full_<r>        end-to-end DRR forward (r in joseph|siddon|trilinear)
  prep_<r>        XLA prep only: _prep_rays + _compute_starts + tiling
  kernel_<r>      pallas fwd kernel only (prepped inputs held static)
  fwdbwd_<r>      value_and_grad w.r.t. rotation (pose-only backward)
  corebwd_<r>     value_and_grad of render() w.r.t. world rays (no pose chain)
  fgrad_<r>       fused value+gradient march kernel only (round 4)
  bwdrays_<r>     pallas bwd-rays kernel only
  vjprays_<r>     the XLA pullback through _prep_rays only
  tileg_<r>       cotangent tile permute (tile_g) only

Usage:
  python tools/perf_breakdown.py            # all joseph+siddon cases
  python tools/perf_breakdown.py --one kernel_joseph
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from diffdrr_tpu import DRR, load_example_ct
from diffdrr_tpu.pose import convert
from diffdrr_tpu.profiling import enable_compilation_cache

enable_compilation_cache()

subject = load_example_ct(shape=(512, 512, 133))
TRANS = jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32)
ROT0 = jnp.asarray([[0.01, np.pi / 2 + 0.02, -0.01]], jnp.float32)
AXIS = 2


def timed_scan(step_fn, x0, iters=8, reps=3):
    """Median per-iter time of a jitted lax.scan whose input rides the carry."""

    @partial(jax.jit, static_argnames=("n",))
    def run(x0, n):
        def body(carry, _):
            x, acc = carry
            val = step_fn(x)
            x = x + 1e-6 * val
            return (x, acc + val), None

        (x, acc), _ = jax.lax.scan(body, (x0, jnp.float32(0.0)), None, length=n)
        return acc

    float(run(x0, 1))
    float(run(x0, 1 + iters))
    best = None
    for _ in range(3):
        def t(vs, n):
            ts = []
            for v in vs:
                t0 = time.perf_counter()
                float(run(v, n))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return ts[len(ts) // 2]

        t1 = t([x0 + 1e-4 * (i + 1) for i in range(reps)], 1)
        tk = t([x0 + 1e-4 * (i + 11) for i in range(reps)], 1 + iters)
        per = (tk - t1) / iters
        if per > 1e-4:
            return per
        best = per
    return max(best, 1e-9)


def make_drr(renderer):
    return DRR(subject, sdd=1020.0, height=200, delx=2.0, renderer=renderer)


def ray_inputs(drr):
    pose = convert(ROT0, TRANS, parameterization="euler_angles",
                   convention="ZXY")
    source, target = drr.detector(pose, None)
    weights = jnp.linalg.norm(target - source, axis=-1)[:, None, :]
    sv = drr.affine_inverse(source)
    tv = drr.affine_inverse(target)
    return sv, tv, weights


def joseph_bits(drr, renderer):
    """(kernel fns, prepped arrays) for the fwd/bwd kernel-only cases."""
    from diffdrr_tpu.ops.pallas import joseph as J
    from diffdrr_tpu.ops.pallas import siddon as S

    sv, tv, weights = ray_inputs(drr)
    tile, ky, zw, zc = drr.pallas_cfg[AXIS]
    H, W = drr.detector.height, drr.detector.width
    dims = drr.density.shape
    other = tuple(d for d in range(3) if d != AXIS)
    perm3 = (AXIS,) + other
    quad = "siddon" if renderer == "siddon" else "joseph"
    h = 1.0 if renderer == "siddon" else float(drr.joseph_steps[AXIS])
    n_steps = int(-(-dims[AXIS] // h))
    vol = drr._pvols[AXIS]
    rays = J._prep_rays(sv, tv, weights, perm3, dims, H, W, tile,
                        drr.voxel_shift, h, 1e-8, quadrature=quad)
    _, n_tiles_img, _ = J._plan_tiles_cached(H, W, tile)
    TR = tile * tile
    n_tiles = 1 * n_tiles_img
    starts = J._compute_starts(rays, n_tiles, TR, n_steps, h, vol.shape[1],
                               vol.shape[2], ky, zw, zc, quadrature=quad)
    starts = jax.lax.stop_gradient(starts)
    resident = J._resolve_resident(None, drr.density, AXIS, ky, zw, False,
                                   drr.pallas_storage, None, vol)
    kw = dict(n_tiles=n_tiles, TR=TR, n_planes=n_steps, h=h, ky=ky, zw=zw,
              zc=zc, precision=drr.pallas_precision, blend=False,
              n_ch=None, resident=resident, interpret=False)
    return J, S, vol, rays, starts, kw, (sv, tv, weights, perm3, dims, H, W,
                                         tile, h, quad)


def run_case(name):
    kind, renderer = name.split("_", 1)
    drr = make_drr(renderer)
    print(name, "cfg", drr.pallas_cfg[AXIS], flush=True)

    if kind == "full":
        def step(rot):
            img = drr(rot, TRANS, parameterization="euler_angles",
                      convention="ZXY", axis=AXIS)
            return jnp.mean(img)

        tm = timed_scan(step, ROT0)
    elif kind == "fwdbwd":
        def step(rot):
            img = drr(rot, TRANS, parameterization="euler_angles",
                      convention="ZXY", axis=AXIS)
            return jnp.mean(img)

        def vg(rot):
            val, g = jax.value_and_grad(step)(rot)
            return val + 1e-3 * jnp.mean(g)

        tm = timed_scan(vg, ROT0)
    elif kind == "corebwd":
        # value_and_grad of the render CORE only (voxel-space rays held as
        # the differentiated inputs): fwdbwd minus the pose/detector chain.
        sv, tv, weights = ray_inputs(drr)

        def core(s, t):
            img = drr.render(drr.density, s, t, axis=AXIS)
            return jnp.mean(img)

        # render takes WORLD source/target: pass the world-space rays.
        pose = convert(ROT0, TRANS, parameterization="euler_angles",
                       convention="ZXY")
        src, tgt = drr.detector(pose, None)

        def step(eps):
            s = src * (1.0 + eps * 1e-9)
            t = tgt * (1.0 + eps * 1e-9)
            val, (gs, gt_) = jax.value_and_grad(core, argnums=(0, 1))(s, t)
            return val + 1e-9 * (jnp.mean(gs) + jnp.mean(gt_))

        tm = timed_scan(step, jnp.float32(0.0))
    elif kind == "prep":
        from diffdrr_tpu.ops.pallas import joseph as J

        tile, ky, zw, zc = drr.pallas_cfg[AXIS]
        H, W = drr.detector.height, drr.detector.width
        dims = drr.density.shape
        perm3 = (AXIS,) + tuple(d for d in range(3) if d != AXIS)
        quad = "siddon" if renderer == "siddon" else "joseph"
        h = 1.0 if renderer == "siddon" else float(drr.joseph_steps[AXIS])
        n_steps = int(-(-dims[AXIS] // h))
        vol = drr._pvols[AXIS]
        _, n_tiles_img, _ = J._plan_tiles_cached(H, W, tile)

        def step(rot):
            pose = convert(rot, TRANS, parameterization="euler_angles",
                           convention="ZXY")
            source, target = drr.detector(pose, None)
            weights = jnp.linalg.norm(target - source, axis=-1)[:, None, :]
            sv = drr.affine_inverse(source)
            tv = drr.affine_inverse(target)
            rays = J._prep_rays(sv, tv, weights, perm3, dims, H, W, tile,
                                drr.voxel_shift, h, 1e-8, quadrature=quad)
            starts = J._compute_starts(
                rays, n_tiles_img, tile * tile, n_steps, h, vol.shape[1],
                vol.shape[2], ky, zw, zc, quadrature=quad)
            return jnp.mean(rays) + 1e-9 * jnp.sum(starts)

        tm = timed_scan(step, ROT0)
    elif kind in ("kernel", "bwdrays", "fgrad", "vjprays", "tileg"):
        J, S, vol, rays, starts, kw, prep_args = joseph_bits(drr, renderer)
        (sv, tv, weights, perm3, dims, H, W, tile, h, quad) = prep_args
        TR = kw["TR"]

        if kind == "kernel":
            if renderer == "siddon":
                skw = dict(ky=kw["ky"], zw=kw["zw"], zc=kw["zc"],
                           precision=kw["precision"])

                def step(eps):
                    r = rays.at[J._SC].mul(1.0 + eps * 1e-9)
                    import functools as ft
                    out = jax.pure_callback  # noqa placeholder never used
                    kern = ft.partial(S._fwd_kernel,
                                      resident=kw["resident"], reduce="sum",
                                      **skw)
                    from jax.experimental import pallas as pl
                    from jax.experimental.pallas import tpu as pltpu
                    out = pl.pallas_call(
                        kern,
                        grid=(kw["n_tiles"],),
                        in_specs=J._common_specs(kw["n_planes"], TR) + [
                            pl.BlockSpec(memory_space=pl.ANY)],
                        out_specs=pl.BlockSpec((1, TR), lambda t: (0, t),
                                               memory_space=pltpu.VMEM),
                        out_shape=jax.ShapeDtypeStruct(
                            (1, kw["n_tiles"] * TR), jnp.float32),
                        scratch_shapes=[
                            J._win_scratch(vol, kw["ky"], kw["zw"], False,
                                           kw["resident"]),
                            pltpu.VMEM((1, TR), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,)),
                        ],
                        **J._vmem_params(kw["resident"], vol),
                    )(starts, r, vol)
                    return jnp.mean(out)
            else:
                def step(eps):
                    r = rays.at[J._SC].mul(1.0 + eps * 1e-9)
                    out = J._fwd_call(vol, r, starts, None, reduce="sum",
                                      **kw)
                    return jnp.mean(out)

            tm = timed_scan(step, jnp.float32(0.0))
        elif kind == "bwdrays":
            g_tiled = jnp.ones((1, kw["n_tiles"] * TR), jnp.float32)
            if renderer == "siddon":
                import functools as ft
                from jax.experimental import pallas as pl
                from jax.experimental.pallas import tpu as pltpu

                def step(eps):
                    g = g_tiled * (1.0 + eps * 1e-9)
                    kern = ft.partial(S._bwd_rays_kernel,
                                      resident=kw["resident"],
                                      ky=kw["ky"], zw=kw["zw"], zc=kw["zc"],
                                      precision=kw["precision"])
                    out = pl.pallas_call(
                        kern,
                        grid=(kw["n_tiles"],),
                        in_specs=J._common_specs(kw["n_planes"], TR) + [
                            pl.BlockSpec((1, TR), lambda t: (0, t),
                                         memory_space=pltpu.VMEM),
                            pl.BlockSpec(memory_space=pl.ANY)],
                        out_specs=pl.BlockSpec((J._NROWS, TR),
                                               lambda t: (0, t),
                                               memory_space=pltpu.VMEM),
                        out_shape=jax.ShapeDtypeStruct(
                            (J._NROWS, kw["n_tiles"] * TR), jnp.float32),
                        scratch_shapes=[
                            J._win_scratch(vol, kw["ky"], kw["zw"], False,
                                           kw["resident"]),
                            pltpu.VMEM((16, TR), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,)),
                        ],
                        **J._vmem_params(kw["resident"], vol),
                    )(starts, rays, g, vol)
                    return jnp.mean(out)
            else:
                def step(eps):
                    g = g_tiled * (1.0 + eps * 1e-9)
                    out = J._bwd_rays_call(vol, rays, starts, g, None, **kw)
                    return jnp.mean(out)

            tm = timed_scan(step, jnp.float32(0.0))
        elif kind == "fgrad":
            # Fused value+gradient march (round 4) in isolation.
            def step(eps):
                r = rays.at[J._SC].mul(1.0 + eps * 1e-9)
                out = J._fwdgrad_call(vol, r, starts, reduce="sum", **kw)
                return jnp.mean(out)

            tm = timed_scan(step, jnp.float32(0.0))
        elif kind == "vjprays":
            d_rays = jnp.ones_like(rays)

            def prep(s, t, w):
                return J._prep_rays(s, t, w, perm3, dims, H, W, tile,
                                    drr.voxel_shift, h, 1e-8, quadrature=quad)

            _, pullback = jax.vjp(prep, sv, tv, weights)

            def step(eps):
                ds, dt, dw = pullback(d_rays * (1.0 + eps * 1e-9))
                return jnp.mean(ds) + jnp.mean(dt) + jnp.mean(dw)

            tm = timed_scan(step, jnp.float32(0.0))
        else:  # tileg
            perm, n_tiles_img, _ = J._plan_tiles_cached(H, W, tile)
            _, tile_g = J._tile_permutes(perm, 1, H * W, TR, n_tiles_img)
            g = jnp.ones((1, 1, H * W), jnp.float32)

            def step(eps):
                return jnp.mean(tile_g(g * (1.0 + eps * 1e-9)))

            tm = timed_scan(step, jnp.float32(0.0))
    else:
        raise SystemExit(f"unknown case kind {kind}")

    print(f"{name}: {tm*1e3:.3f} ms", flush=True)


CASES = [
    "full_joseph", "prep_joseph", "kernel_joseph", "fwdbwd_joseph",
    "bwdrays_joseph", "vjprays_joseph", "tileg_joseph",
    "full_siddon", "prep_siddon", "kernel_siddon", "fwdbwd_siddon",
    "bwdrays_siddon", "vjprays_siddon",
]

if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--one":
        run_case(args[1])
    else:
        import subprocess
        names = args or CASES
        for n in names:
            subprocess.run([sys.executable, __file__, "--one", n],
                           check=False)
