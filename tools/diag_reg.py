"""Diagnose the full-scale registration plateau: is the ~1.8 mm residual a
metric blind spot (score flat along some pose directions) or an optimizer
stall (score still has headroom at the found pose)?

Prints score at the true pose and the score drop for +-1.8 mm / +-0.02 rad
offsets along each of the 6 pose axes, under the exact experiment metric
(multiscale patch NCC, var_floor as given).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct
from diffdrr_tpu.metrics import MultiscaleNormalizedCrossCorrelation2d
from diffdrr_tpu.profiling import enable_compilation_cache

enable_compilation_cache()

var_floor = float(sys.argv[1]) if len(sys.argv) > 1 else 1e-3
height = int(sys.argv[2]) if len(sys.argv) > 2 else 256
vol = int(sys.argv[3]) if len(sys.argv) > 3 else 512

subject = load_example_ct(shape=(vol, vol, max(16, vol // 4)))
drr = DRR(subject, sdd=1020.0, height=height, delx=2.0,
          renderer="trilinear")
metric = MultiscaleNormalizedCrossCorrelation2d(
    [None, 13], [0.5, 0.5], var_floor=var_floor)

rot_true = jnp.asarray([[0.0, np.pi / 2, 0.0]], jnp.float32)
trans_true = jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32)


@jax.jit
def score(drr, rot, trans):
    img = drr(rot, trans, parameterization="euler_angles", convention="ZXY")
    tgt = drr(rot_true, trans_true, parameterization="euler_angles",
              convention="ZXY")
    return metric(img, tgt)[0]


s0 = float(score(drr, rot_true, trans_true))
print(f"var_floor={var_floor}  score(true pose) = {s0:.6f}", flush=True)

for name, drot, dtrans in [
    ("rot_z +0.02", (0.02, 0, 0), (0, 0, 0)),
    ("rot_x +0.02", (0, 0.02, 0), (0, 0, 0)),
    ("rot_y +0.02", (0, 0, 0.02), (0, 0, 0)),
    ("trans_x +1.8", (0, 0, 0), (1.8, 0, 0)),
    ("trans_y(depth) +1.8", (0, 0, 0), (0, 1.8, 0)),
    ("trans_z +1.8", (0, 0, 0), (0, 0, 1.8)),
    ("trans_y(depth) +10", (0, 0, 0), (0, 10.0, 0)),
]:
    r = rot_true + jnp.asarray([drot], jnp.float32)
    t = trans_true + jnp.asarray([dtrans], jnp.float32)
    s = float(score(drr, r, t))
    print(f"  {name:22s} score {s:.6f}  drop {s0 - s:+.6f}", flush=True)
