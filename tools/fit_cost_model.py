"""Fit the Pallas tile-selection cost-model constants from sweep data.

Reads ``tools/sweep_tile.py`` output lines (``name: X ms``) and solves a
non-negative least-squares fit of the planner's per-ray-per-plane cost model
(``DRR._plan_pallas``, diffdrr_tpu/drr.py) against the measured times:

    t / pad  ~=  s*mxu_elems + A*vpu_elems + B*dma_bytes + C*fixed

where (A, B, C) = s * (_COST_VPU_ELEM, _COST_DMA_BYTE, _COST_FIXED_STEP).
Prints the fitted constants, predicted-vs-measured per config, and the tile
the planner would auto-select per renderer under the new constants.

Usage:
    python tools/fit_cost_model.py /tmp/sweep_fused.log
    python tools/fit_cost_model.py --demo   # fit against pasted numbers
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Run the geometry planning on CPU — no TPU needed.
import jax

jax.config.update("jax_platforms", "cpu")

from diffdrr_tpu import DRR, load_example_ct  # noqa: E402

BENCH_GEOM = dict(sdd=1020.0, height=200, delx=2.0)
MARCH_AXIS = 2  # the sweep renders with axis=2


def model_terms(drr, axis=MARCH_AXIS):
    """The planner's cost-model components for drr's chosen cfg.

    Delegates to ``diffdrr_tpu.drr.pallas_cost_terms`` — the SAME function
    the planner uses — so fitted constants always refer to the live model.
    """
    from diffdrr_tpu.drr import pallas_cost_terms
    from diffdrr_tpu.ops.pallas.joseph import (_RESIDENT_BUDGET,
                                               _resident_bytes)

    tile, ky, zw, zc = drr.pallas_cfg[axis]
    itm = 2 if drr.pallas_storage == "bf16" else 4
    res = _resident_bytes(drr.density.shape, axis, ky, zw, False,
                          itm) <= _RESIDENT_BUDGET
    mxu, vpu, dma, fixed, pad = pallas_cost_terms(
        drr.renderer_name, tile, ky, zw, zc,
        drr.detector.height, drr.detector.width, drr.pallas_storage,
        resident=res)
    return np.array([mxu, vpu, dma, fixed]), pad, (tile, ky, zw, zc)


def parse_sweep(path):
    """-> {config_name: ms} from 'name: 12.3 ms' lines (last wins)."""
    out = {}
    pat = re.compile(r"^(\w+):\s+([\d.]+)\s*ms")
    with open(path) as f:
        for line in f:
            m = pat.match(line.strip())
            if m:
                out[m.group(1)] = float(m.group(2))
    return out


def config_kwargs(name):
    """Sweep config name -> (DRR kwargs, volume z-extent).

    Mirrors tools/sweep_tile.py; a ``_v512`` suffix marks the 512^3
    streaming-volume sweep (nonzero DMA column).
    """
    m = re.match(r"(joseph|siddon)_t(\d+)(?:_fp(\d+))?(_v512)?$", name)
    if not m:
        return None
    kw = dict(renderer=m.group(1), pallas_tile=int(m.group(2)))
    if m.group(3):
        kw["pallas_fp_scale"] = int(m.group(3)) / 10.0
    return kw, (512 if m.group(4) else 133)


def nnls(A, b):
    """Tiny projected-gradient NNLS (avoids a scipy dependency)."""
    x = np.maximum(np.linalg.lstsq(A, b, rcond=None)[0], 0.0)
    L = np.linalg.norm(A.T @ A, 2)
    for _ in range(20000):
        x = np.maximum(x - (A.T @ (A @ x - b)) / L, 0.0)
    return x


def main(argv):
    measured = {}
    if argv and argv[0] != "--demo":
        measured = parse_sweep(argv[0])
    measured = {k: v for k, v in measured.items()
                if config_kwargs(k) is not None}
    if len(measured) < 4:
        print(f"need >=4 measured configs, have {len(measured)}: "
              f"{sorted(measured)}", file=sys.stderr)
        return 1

    subjects = {}

    def subject_for(z):
        if z not in subjects:
            subjects[z] = load_example_ct(
                shape=(512, 512, z),
                **({"spacing": (0.703125,) * 3} if z == 512 else {}))
        return subjects[z]

    rows, times, names, cfgs = [], [], [], {}
    for name, ms in sorted(measured.items()):
        kw, z = config_kwargs(name)
        drr = DRR(subject_for(z), **BENCH_GEOM, **kw)
        terms, pad, cfg = model_terms(drr)
        # Times are per-frame; the model is per-ray-per-plane x n_planes.
        # Normalizing both volumes to the same per-plane basis keeps rows
        # comparable: divide by the march-plane count ratio vs the 133 CT.
        plane_ratio = z / 133.0
        rows.append(terms)
        times.append(ms / pad / plane_ratio)
        names.append(name)
        cfgs[name] = cfg
    subject = subject_for(133)
    A, b = np.asarray(rows), np.asarray(times)
    # Column scaling for conditioning.
    scale = A.max(axis=0)
    x = nnls(A / scale, b) / scale
    s = max(x[0], 1e-12)
    const = dict(_COST_VPU_ELEM=x[1] / s, _COST_DMA_BYTE=x[2] / s,
                 _COST_FIXED_STEP=x[3] / s)
    print("fitted constants (relative to 1.0/MXU-elem):")
    for k, v in const.items():
        print(f"  {k} = {v:.1f}")
    print("\nconfig                cfg(t,ky,zw,zc)        measured   predicted")
    pred = A @ x
    for i, name in enumerate(names):
        print(f"{name:21s} {str(cfgs[name]):22s} {measured[name]:8.3f}ms "
              f"{pred[i] * (measured[name] / b[i]):9.3f}ms")
    # Which tile would the planner now pick per renderer?
    print("\nauto-selection under fitted constants (cost per tile):")
    for renderer in ("joseph", "siddon"):
        costs = {}
        for tile in (16, 32, 64):
            name = f"{renderer}_t{tile}"
            try:
                drr = DRR(subject, **BENCH_GEOM,
                          renderer=renderer, pallas_tile=tile)
            except Exception as e:  # window too big etc.
                print(f"  {name}: plan failed ({e})")
                continue
            terms, pad, _ = model_terms(drr)
            costs[tile] = float(terms @ x) * pad
        if not costs:
            print(f"  {renderer}: no tile plan succeeded")
            continue
        best = min(costs, key=costs.get)
        pretty = ", ".join(f"t{t}={c:.3g}" for t, c in sorted(costs.items()))
        print(f"  {renderer}: picks t{best}   ({pretty})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
