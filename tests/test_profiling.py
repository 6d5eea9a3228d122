"""Profiling hooks: trace capture, annotations, static cost report."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct
from diffdrr_tpu.profiling import annotate, render_cost, trace


def test_trace_writes_profile(tmp_path):
    log_dir = str(tmp_path / "trace")
    with trace(log_dir):
        x = jnp.ones((64, 64))
        jax.block_until_ready(jnp.dot(x, x))
    found = []
    for root, _, files in os.walk(log_dir):
        found += [f for f in files if f.endswith((".pb", ".json.gz", ".xplane.pb"))]
    assert found, "profiler produced no trace files"


def test_annotate_composes_with_jit():
    @jax.jit
    def f(x):
        with annotate("double"):
            return x * 2.0

    out = f(jnp.arange(4.0))
    np.testing.assert_allclose(np.asarray(out), [0.0, 2.0, 4.0, 6.0])


def test_render_cost_report():
    subject = load_example_ct(shape=(64, 64, 32))
    drr = DRR(subject, sdd=800.0, height=32, delx=2.0, renderer="joseph")
    rc = render_cost(drr)
    assert rc.rays == 32 * 32
    assert rc.n_tiles >= 1 and rc.n_steps >= 1
    assert rc.mxu_flops > 0 and rc.dma_bytes > 0
    assert "joseph" in str(rc)

    drr_s = DRR(subject, sdd=800.0, height=32, delx=2.0, renderer="siddon")
    rc_s = render_cost(drr_s, axis=rc.axis)
    # Exact Siddon pays two one-hot contractions per slab vs one tent matmul
    # (same window if the planner chose the same tile); compare PER STEP —
    # joseph's spacing-matched stride can march fewer planes.
    if rc_s.tile == rc.tile and rc_s.window == rc.window:
        assert (rc_s.mxu_flops / rc_s.n_steps
                == 2 * rc.mxu_flops / rc.n_steps)


def test_enable_compilation_cache(tmp_path):
    import glob
    import jax
    import jax.numpy as jnp

    from diffdrr_tpu.profiling import enable_compilation_cache

    d = enable_compilation_cache(str(tmp_path / "cache"), min_compile_secs=0.0)
    f = jax.jit(lambda x: (x @ x).sum() * 3)
    f(jnp.ones((32, 32))).block_until_ready()
    assert len(glob.glob(d + "/*")) >= 1
