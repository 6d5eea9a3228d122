"""HTML scene export (reference visualize_scene parity surface).

No browser in this environment, so these tests validate the generated
artifact structurally: the embedded geometry decodes back to the scene
that went in, and the document is self-contained (no external resources).
"""

import base64
import json
import re

import numpy as np
import pytest

from diffdrr_tpu.scene_html import export_scene_html, visualize_scene_html
from diffdrr_tpu.viz import Mesh


def _scene_json(html_text):
    m = re.search(r"const SCENE = (\{.*?\});\n", html_text, re.S)
    assert m, "SCENE payload missing"
    return json.loads(m.group(1))


def _tetra():
    v = np.array([[0, 0, 0], [60, 0, 0], [0, 60, 0], [0, 0, 60]], np.float32)
    f = np.array([[0, 2, 1], [0, 1, 3], [1, 2, 3], [0, 3, 2]], np.int64)
    return Mesh(v, f)


def test_export_scene_roundtrips_geometry(tmp_path):
    mesh = _tetra()
    ray = np.array([[0, 0, 0], [0, 200, 0]], np.float32)
    p = export_scene_html(tmp_path / "s.html", meshes=[mesh],
                          cameras=[{"frustum": _tetra(), "ray": ray}])
    text = p.read_text()
    scene = _scene_json(text)
    kinds = [it["type"] for it in scene["items"]]
    assert kinds == ["mesh", "mesh", "lines"]

    it = scene["items"][0]
    pos = np.frombuffer(base64.b64decode(it["positions"]), np.float32)
    np.testing.assert_array_equal(pos.reshape(-1, 3), mesh.vertices)
    idx = np.frombuffer(base64.b64decode(it["indices"]), np.uint32)
    np.testing.assert_array_equal(idx.reshape(-1, 3), mesh.faces)
    nrm = np.frombuffer(base64.b64decode(it["normals"]),
                        np.float32).reshape(-1, 3)
    assert np.allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-5)

    ln = scene["items"][2]
    np.testing.assert_array_equal(
        np.frombuffer(base64.b64decode(ln["positions"]),
                      np.float32).reshape(-1, 3), ray)


def test_export_is_self_contained(tmp_path):
    p = export_scene_html(tmp_path / "s.html", meshes=[_tetra()])
    text = p.read_text()
    # No external fetches: all src/href attributes would be a regression.
    assert not re.search(r'(src|href)\s*=\s*["\']\s*http', text)
    assert "<script>" in text and "</script>" in text
    # Vanilla-WebGL viewer bits present.
    for needle in ["getContext(\"webgl\"", "OES_element_index_uint",
                   "drawElements", "addEventListener(\"wheel\""]:
        assert needle in text, needle
    # No GLSL ES 1.00-invalid matrix-from-matrix constructor.
    assert "mat3(" not in text


def test_visualize_scene_html_end_to_end(tmp_path):
    import jax.numpy as jnp

    from diffdrr_tpu import DRR, load_example_ct
    from diffdrr_tpu.pose import convert

    subject = load_example_ct(shape=(64, 64, 32))
    drr = DRR(subject, sdd=1020.0, height=32, delx=12.0,
              renderer="trilinear")
    pose = convert(jnp.asarray([[0.0, np.pi / 2, 0.0]], jnp.float32),
                   jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32),
                   parameterization="euler_angles", convention="ZXY")
    p = visualize_scene_html(drr, pose, tmp_path / "scene.html",
                             threshold=300.0, max_faces=5000)
    scene = _scene_json(p.read_text())
    kinds = [it["type"] for it in scene["items"]]
    assert kinds == ["mesh", "mesh", "texquad", "lines"]
    anatomy = scene["items"][0]
    assert 0 < anatomy["nIndices"] <= 3 * 5000 + 6
    quad = scene["items"][2]
    assert quad["texW"] == 32 and quad["texH"] == 32
    tex = np.frombuffer(base64.b64decode(quad["texture"]), np.uint8)
    assert tex.size == 32 * 32 * 4
    assert tex.max() == 255  # normalized DRR reaches full scale
    corners = np.frombuffer(base64.b64decode(quad["corners"]),
                            np.float32).reshape(4, 3)
    # Detector corners sit sdd/2-ish from the isocenter translation.
    assert np.isfinite(corners).all()


def test_visualize_scene_html_labelmap(tmp_path):
    import jax.numpy as jnp

    from diffdrr_tpu import DRR, load_example_ct
    from diffdrr_tpu.pose import convert

    subject = load_example_ct(shape=(64, 64, 32))
    drr = DRR(subject, sdd=1020.0, height=32, delx=12.0,
              renderer="trilinear")
    pose = convert(jnp.asarray([[0.0, np.pi / 2, 0.0]], jnp.float32),
                   jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32),
                   parameterization="euler_angles", convention="ZXY")
    p = visualize_scene_html(drr, pose, tmp_path / "lab.html", labelmap=True,
                             texture=False, max_faces=2000)
    scene = _scene_json(p.read_text())
    kinds = [it["type"] for it in scene["items"]]
    assert kinds == ["mesh", "mesh", "lines"]
