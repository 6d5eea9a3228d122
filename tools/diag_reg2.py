"""Endgame-metric shootout for full-scale registration: which similarity
metric has a clean, monotone landscape with sub-mm discrimination near the
true pose at 256^2 on the 512-volume phantom?

For each candidate metric, prints score(true) and the drop for small pose
offsets (0.5/1.8 mm translations, 5/20 mrad rotations). A usable endgame
metric needs: score(true) = max, strictly positive drops, and a nonzero
depth drop at 1.8 mm.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct
from diffdrr_tpu.metrics import (
    MultiscaleNormalizedCrossCorrelation2d,
    NormalizedCrossCorrelation2d,
    GradientNormalizedCrossCorrelation2d,
)
from diffdrr_tpu.profiling import enable_compilation_cache

enable_compilation_cache()

height, vol = 256, 512
subject = load_example_ct(shape=(vol, vol, max(16, vol // 4)))
drr = DRR(subject, sdd=1020.0, height=height, delx=2.0,
          renderer="trilinear")

rot_true = jnp.asarray([[0.0, np.pi / 2, 0.0]], jnp.float32)
trans_true = jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32)

METRICS = {
    "patch13_vf1e-3": MultiscaleNormalizedCrossCorrelation2d(
        [None, 13], [0.5, 0.5], var_floor=1e-3),
    "patch13_vf1e-4": MultiscaleNormalizedCrossCorrelation2d(
        [None, 13], [0.5, 0.5], var_floor=1e-4),
    "patch13_vf1e-2": MultiscaleNormalizedCrossCorrelation2d(
        [None, 13], [0.5, 0.5], var_floor=1e-2),
    "global_ncc": NormalizedCrossCorrelation2d(),
    "grad_ncc": GradientNormalizedCrossCorrelation2d(),
    "neg_mse": None,  # handled specially
}

OFFSETS = [
    ("rot_x +0.005", (0, 0.005, 0), (0, 0, 0)),
    ("rot_x +0.02", (0, 0.02, 0), (0, 0, 0)),
    ("trans_x +0.5", (0, 0, 0), (0.5, 0, 0)),
    ("trans_x +1.8", (0, 0, 0), (1.8, 0, 0)),
    ("depth +0.5", (0, 0, 0), (0, 0.5, 0)),
    ("depth +1.8", (0, 0, 0), (0, 1.8, 0)),
    ("depth -1.8", (0, 0, 0), (0, -1.8, 0)),
    ("trans_z +1.8", (0, 0, 0), (0, 0, 1.8)),
]


def make_score(metric):
    @jax.jit
    def score(drr, rot, trans):
        img = drr(rot, trans, parameterization="euler_angles",
                  convention="ZXY")
        tgt = drr(rot_true, trans_true, parameterization="euler_angles",
                  convention="ZXY")
        if metric is None:
            return -jnp.mean((img - tgt) ** 2)
        return metric(img, tgt)[0]
    return score


for mname, metric in METRICS.items():
    score = make_score(metric)
    s0 = float(score(drr, rot_true, trans_true))
    print(f"\n{mname}: score(true) = {s0:.6f}", flush=True)
    for name, drot, dtrans in OFFSETS:
        r = rot_true + jnp.asarray([drot], jnp.float32)
        t = trans_true + jnp.asarray([dtrans], jnp.float32)
        s = float(score(drr, r, t))
        print(f"  {name:14s} drop {s0 - s:+.3e}", flush=True)
