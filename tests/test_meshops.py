"""Mesh post-processing parity: clean / fill_holes / decimate / largest.

Reference pipeline: /root/reference/diffdrr/visualization.py:246-279
(extract_largest -> smooth -> decimate_pro(0.25) -> fill_holes(100) ->
clean, via pyvista/vtk). Here the algorithms are native QEM + NumPy.
"""

import numpy as np
import pytest

from diffdrr_tpu import meshops
from diffdrr_tpu.viz import Mesh, surface_nets


def sphere_mesh(n=48, r=18.0, smooth=5):
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - (n - 1) / 2
    vol = r - np.sqrt((g**2).sum(0))
    return surface_nets(vol, 0.0, smooth_iters=smooth), (n - 1) / 2, r


def edge_use_counts(faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return counts


def test_clean_merges_duplicates_and_drops_degenerates():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 0], [1, 0, 0],
                  [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [3, 4, 5], [0, 0, 1]], np.int64)
    out = meshops.clean(Mesh(v, f))
    assert out.n_vertices == 4
    assert out.n_faces == 2
    # Faces still reference the same geometry.
    assert np.allclose(np.sort(out.vertices, axis=0),
                       np.sort(np.unique(v, axis=0), axis=0))


def test_clean_empty_mesh():
    out = meshops.clean(Mesh(np.zeros((0, 3), np.float32),
                             np.zeros((0, 3), np.int64)))
    assert out.n_vertices == 0 and out.n_faces == 0


def test_fill_holes_closes_open_tetra_watertight():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 2, 1], [0, 1, 3], [1, 2, 3]], np.int64)  # one face open
    out = meshops.fill_holes(Mesh(v, f), hole_size=10.0)
    assert out.n_vertices == 5  # centroid fan adds one vertex
    assert out.n_faces == 6
    # Watertight: every edge used exactly twice...
    assert (edge_use_counts(out.faces) == 2).all()
    # ...with consistent winding: each undirected edge appears once per
    # direction (a,b) and (b,a).
    e = np.concatenate([out.faces[:, [0, 1]], out.faces[:, [1, 2]],
                        out.faces[:, [2, 0]]])
    _, c = np.unique(e, axis=0, return_counts=True)
    assert (c == 1).all()


def test_fill_holes_respects_hole_size():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 2, 1], [0, 1, 3], [1, 2, 3]], np.int64)
    out = meshops.fill_holes(Mesh(v, f), hole_size=0.1)  # hole radius ~0.5
    assert out.n_faces == 3  # untouched


def test_extract_largest():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 2, 1], [0, 1, 3], [1, 2, 3], [0, 3, 2]], np.int64)
    v2 = np.vstack([v, v + 10.0]).astype(np.float32)
    f2 = np.vstack([f, f[:1] + 4]).astype(np.int64)  # small island: 1 face
    out = meshops.extract_largest(Mesh(v2, f2))
    assert out.n_faces == 4
    assert out.n_vertices == 4
    assert out.vertices.max() < 5


@pytest.mark.parametrize("use_native", [False, True])
def test_decimate_sphere_quality(use_native):
    if use_native and not _native_ok():
        pytest.skip("no native decimate (no compiler)")
    m, c, r = sphere_mesh()
    out = meshops.decimate(m, 0.5, use_native=use_native)
    assert out.n_faces <= int(m.n_faces * 0.5) + 2
    assert out.n_faces >= int(m.n_faces * 0.4)  # didn't over-collapse
    rad = np.linalg.norm(out.vertices - c, axis=1)
    # Surface stays on the sphere (voxel-scale tolerance).
    assert np.abs(rad - r).mean() < 0.05
    assert np.abs(rad - r).max() < 0.5
    # Still a closed 2-manifold.
    assert (edge_use_counts(out.faces) == 2).all()


def test_decimate_native_matches_python_semantics():
    if not _native_ok():
        pytest.skip("no native decimate (no compiler)")
    m, c, r = sphere_mesh(n=24, r=9.0)
    a = meshops.decimate(m, 0.5, use_native=True)
    b = meshops.decimate(m, 0.5, use_native=False)
    # Identical algorithm: same counts, same quality to float noise.
    assert a.n_faces == b.n_faces
    assert a.n_vertices == b.n_vertices
    ra = np.abs(np.linalg.norm(a.vertices - c, axis=1) - r).mean()
    rb = np.abs(np.linalg.norm(b.vertices - c, axis=1) - r).mean()
    assert abs(ra - rb) < 0.02


def test_decimate_preserves_boundary():
    # Open flat grid patch: the boundary penalty must keep the border frame
    # in place while interior vertices collapse.
    n = 12
    gx, gy = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32), indexing="ij")
    v = np.stack([gx.ravel(), gy.ravel(), np.zeros(n * n, np.float32)], 1)
    f = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = (i * n + j, i * n + j + 1, (i + 1) * n + j,
                          (i + 1) * n + j + 1)
            f += [(a, b, d), (a, d, c)]
    m = Mesh(v, np.asarray(f, np.int64))
    out = meshops.decimate(m, 0.6, use_native=False)
    assert out.n_faces <= int(m.n_faces * 0.4) + 2
    # All surviving vertices stay in the original plane and bounding box.
    assert np.abs(out.vertices[:, 2]).max() < 1e-3
    assert out.vertices[:, :2].min() > -0.5
    assert out.vertices[:, :2].max() < n - 0.5
    # The 4 corners are pinned by crossing boundary constraint planes.
    for corner in ([0, 0], [0, n - 1], [n - 1, 0], [n - 1, n - 1]):
        d = np.linalg.norm(out.vertices[:, :2] - corner, axis=1).min()
        assert d < 0.51, corner


def test_decimate_rejects_bad_reduction():
    m, _, _ = sphere_mesh(n=16, r=6.0, smooth=0)
    with pytest.raises(ValueError):
        meshops.decimate(m, 1.0)


def test_drr_to_mesh_pipeline_runs_with_postprocessing():
    from diffdrr_tpu import load_example_ct
    from diffdrr_tpu.viz import drr_to_mesh

    subject = load_example_ct(shape=(64, 64, 32))
    mesh = drr_to_mesh(subject, method="marching_cubes", threshold=300.0)
    assert mesh.n_faces > 0
    # decimate_pro(0.25)-equivalent ran: strictly fewer faces than raw.
    raw = drr_to_mesh(subject, method="marching_cubes", threshold=300.0,
                      decimate_reduction=0.0, extract_largest=False,
                      fill_hole_size=0.0)
    assert mesh.n_faces < raw.n_faces


def _native_ok():
    from diffdrr_tpu.native import native_available

    return native_available("decimate")
