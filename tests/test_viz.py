"""Visualization tests: plots render, meshes extract (native + numpy paths)."""

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct, convert
from diffdrr_tpu.viz import (
    Mesh,
    plot_drr,
    plot_mask,
    plot_img_and_mask,
    animate,
    surface_nets,
    _surface_nets_numpy,
    marching_cubes,
    _marching_cubes_numpy,
    drr_to_mesh,
    labelmap_to_mesh,
    img_to_mesh,
    visualize_scene,
)
from diffdrr_tpu.native import native_available


@pytest.fixture(scope="module")
def scene():
    subject = load_example_ct(shape=(48, 48, 24))
    drr = DRR(subject, sdd=600.0, height=16, delx=4.0)
    rot = jnp.asarray([[0.0, np.pi / 2, 0.0]], jnp.float32)
    trans = jnp.asarray([[0.0, 300.0, 0.0]], jnp.float32)
    img = drr(rot, trans, parameterization="euler_angles", convention="ZXY")
    return subject, drr, rot, trans, img


def _sphere(n=24, r=8.0):
    x, y, z = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    c = (n - 1) / 2
    return (r - np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)).astype(
        np.float32
    )


def test_surface_nets_sphere_geometry():
    vol = _sphere()
    mesh = surface_nets(vol, level=0.0, smooth_iters=5)
    assert mesh.n_vertices > 100
    assert mesh.n_faces > 100
    # Vertices lie near the r=8 sphere around the center.
    c = (24 - 1) / 2
    radii = np.linalg.norm(mesh.vertices - c, axis=1)
    assert abs(np.mean(radii) - 8.0) < 0.75
    assert np.std(radii) < 0.5
    # Valid face indices.
    assert mesh.faces.min() >= 0
    assert mesh.faces.max() < mesh.n_vertices


def test_numpy_fallback_close_to_native():
    vol = _sphere(16, 5.0)
    a = _surface_nets_numpy(vol, 0.0)
    assert a.n_vertices > 0 and a.n_faces > 0
    if native_available("surface_nets"):
        b = surface_nets(vol, 0.0, smooth_iters=0)
        # Same cells -> same vertex count; ordering matches (x, y, z) scan.
        assert a.n_vertices == b.n_vertices
        np.testing.assert_allclose(
            np.sort(a.vertices.round(0), axis=0),
            np.sort(b.vertices.round(0), axis=0),
            atol=1.0,
        )


def test_marching_cubes_watertight_oriented_sphere():
    vol = _sphere()
    mesh = marching_cubes(vol, level=0.0)
    assert mesh.n_faces > 100
    # Watertight: every undirected edge is shared by exactly two faces.
    F = mesh.faces
    e = np.sort(np.concatenate([F[:, [0, 1]], F[:, [1, 2]], F[:, [2, 0]]]), axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert (counts == 2).all()
    # Consistently outward-oriented: signed volume ~ (4/3) pi r^3.
    V = mesh.vertices.astype(np.float64) - (24 - 1) / 2
    signed6 = np.einsum(
        "ij,ij->i", V[F[:, 0]], np.cross(V[F[:, 1]], V[F[:, 2]])
    ).sum()
    assert abs(signed6 / 6 - 4 / 3 * np.pi * 8**3) < 0.03 * 4 / 3 * np.pi * 8**3
    # Surface area near analytic.
    area = 0.5 * np.linalg.norm(
        np.cross(V[F[:, 1]] - V[F[:, 0]], V[F[:, 2]] - V[F[:, 0]]), axis=1
    ).sum()
    assert abs(area - 4 * np.pi * 8**2) < 0.03 * 4 * np.pi * 8**2


def test_marching_cubes_distinct_from_surface_nets():
    # The defining structural difference: MC vertices lie ON grid edges
    # (at most one fractional coordinate); Surface Nets vertices sit at
    # cell-interior averaged positions (generically all three fractional).
    vol = _sphere()
    mc = marching_cubes(vol, level=0.0)
    frac = np.abs(mc.vertices - np.round(mc.vertices)) > 1e-5
    assert frac.sum(axis=1).max() <= 1
    sn = surface_nets(vol, level=0.0, smooth_iters=0)
    frac_sn = np.abs(sn.vertices - np.round(sn.vertices)) > 1e-5
    assert (frac_sn.sum(axis=1) >= 2).mean() > 0.9


def test_marching_cubes_numpy_matches_native():
    vol = _sphere(16, 5.0)
    a = _marching_cubes_numpy(vol, 0.0)
    assert a.n_vertices > 0 and a.n_faces > 0
    if native_available("marching_cubes"):
        b = marching_cubes(vol, 0.0)
        assert a.n_vertices == b.n_vertices and a.n_faces == b.n_faces
        # Identical vertex sets (ordering differs).
        sa = {tuple(r) for r in np.round(a.vertices.astype(np.float64), 4)}
        sb = {tuple(r) for r in np.round(b.vertices.astype(np.float64), 4)}
        assert sa == sb


def test_drr_to_mesh_marching_cubes_method(scene):
    subject, *_ = scene
    mesh = drr_to_mesh(subject, method="marching_cubes", threshold=300.0)
    assert mesh.n_faces > 0
    sn = drr_to_mesh(subject, method="surface_nets", threshold=300.0)
    # The two flavors produce structurally different meshes.
    assert mesh.n_vertices != sn.n_vertices
    with pytest.raises(ValueError):
        drr_to_mesh(subject, method="bogus")


def test_drr_to_mesh_world_coords(scene):
    subject, *_ = scene
    mesh = drr_to_mesh(subject, threshold=300.0, smooth_iters=2)
    assert mesh.n_faces > 0
    # World coordinates: inside the (centered) volume bounds.
    (xmin, xmax), (ymin, ymax), (zmin, zmax) = subject.volume.get_bounds()
    assert mesh.vertices[:, 0].min() >= xmin - 1
    assert mesh.vertices[:, 0].max() <= xmax + 1


def test_labelmap_to_mesh(scene):
    subject, *_ = scene
    mesh = labelmap_to_mesh(subject, labels=4, smooth_iters=2)  # heart
    assert mesh.n_faces > 0


def test_mesh_save_obj(tmp_path, scene):
    subject, *_ = scene
    mesh = labelmap_to_mesh(subject, labels=5, smooth_iters=0)
    out = tmp_path / "spine.obj"
    mesh.save_obj(out)
    text = out.read_text()
    assert text.count("\nf ") + text.startswith("f ") == mesh.n_faces


def test_plot_functions(scene):
    subject, drr, rot, trans, img = scene
    axs = plot_drr(np.asarray(img), title="test")
    assert len(axs) == 1
    chans = drr(rot, trans, parameterization="euler_angles", convention="ZXY",
                mask_to_channels=True)
    axs = plot_mask(np.asarray(chans))
    assert len(axs) == 1
    plot_img_and_mask(np.asarray(img), np.asarray(chans))


def test_animate(tmp_path, scene):
    import pandas as pd

    subject, drr, rot, trans, img = scene
    df = pd.DataFrame(
        {
            "r1": [0.0, 0.01],
            "r2": [np.pi / 2, np.pi / 2 + 0.01],
            "r3": [0.0, 0.0],
            "tx": [0.0, 1.0],
            "ty": [300.0, 300.0],
            "tz": [0.0, 0.0],
        }
    )
    out = animate(tmp_path / "run", df, drr, ground_truth=np.asarray(img)[0, 0],
                  verbose=False)
    assert out.exists()
    assert out.stat().st_size > 1000


def test_img_to_mesh_and_scene(scene):
    subject, drr, rot, trans, img = scene
    pose = convert(rot, trans, parameterization="euler_angles", convention="ZXY")
    frustum, det, ray = img_to_mesh(drr, pose)
    assert frustum.n_vertices == 5
    # Frustum apex is the X-ray source.
    source, _ = drr.detector(pose, None)
    np.testing.assert_allclose(frustum.vertices[0], np.asarray(source)[0, 0],
                               atol=1e-3)
    mesh = labelmap_to_mesh(subject, labels=5, smooth_iters=0)
    ax = visualize_scene(mesh, (frustum, det, ray))
    assert ax is not None


def test_visualize_scene_camera_only_autoscales(scene):
    """A camera-only scene must autoscale to the frustum extent (regression:
    axes stayed at matplotlib's default [0,1] and the plot was blank)."""
    subject, drr, rot, trans, img = scene
    pose = convert(rot, trans, parameterization="euler_angles",
                   convention="ZXY")
    frustum, det, ray = img_to_mesh(drr, pose)
    ax = visualize_scene((frustum, det, ray))
    lo, hi = ax.get_xlim3d()
    span = np.asarray(frustum.vertices)
    assert hi - lo > 0.5 * (span[:, 0].max() - span[:, 0].min())


def test_drr_to_mesh_smooth_iters_honored(scene):
    """An explicit smooth_iters must reach BOTH meshers (regression:
    marching_cubes silently dropped it)."""
    subject, *_ = scene
    m0 = drr_to_mesh(subject, method="marching_cubes", threshold=300.0,
                     smooth_iters=0)
    m5 = drr_to_mesh(subject, method="marching_cubes", threshold=300.0,
                     smooth_iters=5)
    assert m0.n_vertices == m5.n_vertices
    assert not np.allclose(m0.vertices, m5.vertices)


def test_add_image_composes_scene(tmp_path):
    """add_image paints the rendered DRR onto the detector plane of an
    existing 3D axis and expands (never shrinks) the scene bounds
    (reference: visualization.py:420-426)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from diffdrr_tpu import DRR, load_example_ct, convert
    from diffdrr_tpu.viz import add_image, drr_to_mesh, visualize_scene

    subject = load_example_ct(shape=(48, 48, 24))
    drr = DRR(subject, sdd=800.0, height=16, delx=8.0)
    pose = convert(
        jnp.asarray([[0.0, np.pi / 2, 0.0]], jnp.float32),
        jnp.asarray([[0.0, 400.0, 0.0]], jnp.float32),
        parameterization="euler_angles", convention="ZXY",
    )
    mesh = drr_to_mesh(subject, threshold=0.4)
    ax = visualize_scene(mesh)
    n_before = len(ax.collections) + len(ax.lines)
    ax = add_image(drr, pose, ax)
    assert len(ax.collections) + len(ax.lines) > n_before
    # Scene bounds must now include the source point (frustum apex).
    src = np.asarray(drr.detector(pose, None)[0])[0, 0]
    xlim, ylim, zlim = ax.get_xlim3d(), ax.get_ylim3d(), ax.get_zlim3d()
    for c, (lo, hi) in zip(src, (xlim, ylim, zlim)):
        assert lo - 1e-3 <= c <= hi + 1e-3
    # Second camera composes onto the same axis without error.
    pose2 = convert(
        jnp.asarray([[0.3, np.pi / 2, 0.2]], jnp.float32),
        jnp.asarray([[10.0, 380.0, -5.0]], jnp.float32),
        parameterization="euler_angles", convention="ZXY",
    )
    add_image(drr, pose2, ax, texture=False)
    plt.close("all")
