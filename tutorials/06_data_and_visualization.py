"""Data pipeline and visualization: HU physics, structures, meshes, movies.

Covers the reference's ``metamorphasis.ipynb`` (morphing the bone
attenuation multiplier), per-structure channel rendering, mesh extraction
(Surface Nets and marching cubes), and optimization-trace animation.

Run:  python tutorials/06_data_and_visualization.py [--tpu]
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if "--tpu" not in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg")

import numpy as np
import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct, convert

# ---------------------------------------------------------------------------
# 1. The HU -> density transfer. CT scans store Hounsfield units; rendering
# wants linear attenuation. `read`/`load_example_ct` apply a 3-segment
# piecewise map (air / soft tissue / bone), and `bone_attenuation_multiplier`
# morphs the bone contribution — the reference's "metamorphasis" knob for
# emphasizing bone vs soft tissue in the DRR.
# ---------------------------------------------------------------------------
rot = jnp.array([[0.0, np.pi / 2, 0.0]])
trans = jnp.array([[0.0, 850.0, 0.0]])
H = 48

imgs = {}
for bam in [0.5, 1.0, 2.0]:
    subject = load_example_ct(shape=(48, 48, 24),
                              bone_attenuation_multiplier=bam)
    drr = DRR(subject, sdd=1020.0, height=H, delx=8.0)
    imgs[bam] = np.asarray(
        drr(rot, trans, parameterization="euler_angles", convention="ZXY")
    )[0, 0]
    contrast = imgs[bam].max() / imgs[bam].mean()
    print(f"bone_attenuation_multiplier={bam}: mean {imgs[bam].mean():.3f} "
          f"bone contrast {contrast:.1f}x")
# Densities are min-max normalized after the bone multiply (reference
# data.py:214-227), so a higher multiplier raises bone CONTRAST over soft
# tissue, not absolute intensity:
assert (imgs[2.0].max() / imgs[2.0].mean()
        > imgs[0.5].max() / imgs[0.5].mean())

# ---------------------------------------------------------------------------
# 2. Per-structure channels. With a labelmap, `mask_to_channels=True`
# renders each structure's contribution into its own output channel
# (channel 0 = background) — the basis for structure-aware losses.
# ---------------------------------------------------------------------------
subject = load_example_ct(shape=(48, 48, 24))
print("structures:", list(subject.structures["name"])
      if subject.structures is not None else None)
drr = DRR(subject, sdd=1020.0, height=H, delx=8.0)
channels = drr(rot, trans, parameterization="euler_angles", convention="ZXY",
               mask_to_channels=True)
n_structures = int(np.asarray(subject.mask.data).max()) + 1
assert channels.shape == (1, n_structures, H, H)
total = drr(rot, trans, parameterization="euler_angles", convention="ZXY")
np.testing.assert_allclose(
    np.asarray(channels.sum(axis=1, keepdims=True)), np.asarray(total),
    rtol=1e-3, atol=1e-3 * float(np.asarray(total).max()),
)
print("per-structure channels sum to the full DRR: OK")

# Maximum-intensity projection (reducefn="max"): the radiologist's MIP view
# instead of the line integral. On TPU this stays on the Pallas kernel path
# for joseph/siddon renderers.
mip = drr(rot, trans, parameterization="euler_angles", convention="ZXY",
          reducefn="max")
assert mip.shape == total.shape
assert float(jnp.max(mip)) <= float(jnp.max(total))
print("MIP render (reducefn='max'): OK")

# ---------------------------------------------------------------------------
# 3. Meshes. Extract bone surfaces with either mesher and export OBJ:
# Surface Nets (smoothed, quad-dominant) or marching cubes (edge-exact).
# ---------------------------------------------------------------------------
from diffdrr_tpu.viz import drr_to_mesh, labelmap_to_mesh, img_to_mesh

mesh_sn = drr_to_mesh(subject, method="surface_nets", threshold=300.0)
mesh_mc = drr_to_mesh(subject, method="marching_cubes", threshold=300.0)
print(f"surface nets: {mesh_sn.n_faces} faces; "
      f"marching cubes: {mesh_mc.n_faces} faces")
assert mesh_sn.n_faces > 0 and mesh_mc.n_faces > 0

heart = labelmap_to_mesh(subject, labels=4)
with tempfile.TemporaryDirectory() as td:
    heart.save_obj(Path(td) / "heart.obj")
    print("OBJ export: OK")

# Camera geometry for scene display: frustum + detector plane + principal ray
pose = convert(rot, trans, parameterization="euler_angles", convention="ZXY")
frustum, det_verts, principal = img_to_mesh(drr, pose)
assert np.allclose(frustum.vertices[0], principal[0])  # apex == source

# ---------------------------------------------------------------------------
# 4. Animating an optimization. `animate` re-renders each row of a
# registration trace into a GIF (the reference's movie-making path).
# ---------------------------------------------------------------------------
from diffdrr_tpu.viz import animate

import pandas as pd

r, t = np.asarray(rot)[0], np.asarray(trans)[0]
trace = pd.DataFrame(
    [[r[0] + 0.02 * k, r[1], r[2], t[0], t[1], t[2]] for k in range(3)],
    columns=["r1", "r2", "r3", "tx", "ty", "tz"],
)
with tempfile.TemporaryDirectory() as td:
    out = Path(td) / "reg.gif"
    animate(out, trace, drr, verbose=False,
            parameterization="euler_angles", convention="ZXY")
    assert out.exists() and out.stat().st_size > 0
    print("animation GIF: OK")

print("tutorial 06: all checks passed")
