"""bench.py --smoke: the full benchmark harness on tiny CPU shapes.

Guards the driver's end-of-round TPU bench against API drift — every metric
builds and runs end-to-end, just at meaningless sizes.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

EXPECTED_METRICS = {
    "siddon_fwd_200",
    "siddon_fwd_posebwd_200",
    "joseph_fwd_200",
    "joseph_fwd_posebwd_200",
    "trilinear_kernel_fwd_200_n500",
    "trilinear_fwd_posebwd_200_n500",
    "trilinear_fwd_200_n500_literal",
    "siddon_fwd_1000",
    "siddon_fwd_200_512cube",
    "joseph_fwd_200_512cube",
    "joseph_sparse_p10_200",
    "registration_iters_per_s_200",
    "scaling",
}


@pytest.mark.slow
def test_bench_smoke_emits_full_metric_set():
    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, str(repo / "bench.py"), "--smoke"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = proc.stdout.strip().splitlines()
    # Contract: the LAST line is compact (always fits the driver's tail
    # capture — round 4's inline `extra` outgrew it); the line before
    # carries the full detail, also written to BENCH_DETAIL.json.
    out = json.loads(lines[-1])
    assert out["smoke"] is True
    assert out["unit"] == "rays/s" and out["value"] > 0
    assert "errors" not in out, out["errors"]
    assert "extra" not in out  # compact line must stay small
    detail = json.loads(lines[-2])
    assert set(detail["extra"]) == EXPECTED_METRICS
    for name, m in detail["extra"].items():
        if name == "scaling":
            assert m.get("scaling_efficiency", 0) > 0, m
            continue
        assert m.get("ms", m.get("ms_per_iter")) > 0, name


def test_api_docs_generator_covers_public_surface():
    """docs/API.md generator runs and includes the key public symbols."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import gen_api_docs

    text = gen_api_docs.render()
    for sym in ["class DRR", "class Detector", "class RigidTransform",
                "def convert", "def siddon_raycast", "def trilinear_raycast",
                "def joseph_pallas_raycast", "def slab_sharded_siddon",
                "class CheckpointManager", "def drr_to_mesh",
                "class Registration", "def optimize_multistart",
                "def decimate", "def visualize_scene_html"]:
        assert sym in text, f"missing from API docs: {sym}"
