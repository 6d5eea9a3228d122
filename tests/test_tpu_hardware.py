"""Hardware-only parity assertions (run: DIFFDRR_TPU_TESTS=1 pytest -m tpu).

Interpret-mode kernel tests execute DMAs synchronously and compile through
a different path, so they cannot catch wait-ordering races or Mosaic
miscompiles — these tests assert VALUES on the real chip. The
dynamic-roll regression (test_dynamic_roll_power_of_two_widths) is the
canonical example: pltpu.roll with a runtime shift silently produced
garbage at non-power-of-two lane widths (384) on v5e while interpret mode
passed.

Timing is bench.py's job; everything here is correctness.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct, convert

pytestmark = pytest.mark.tpu

TRANS = None
ROT = None


def _inputs():
    global TRANS, ROT
    if TRANS is None:
        TRANS = jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32)
        ROT = jnp.asarray([[0.01, np.pi / 2 + 0.02, -0.01]], jnp.float32)
    return ROT, TRANS


@pytest.fixture(scope="module")
def subject():
    return load_example_ct(shape=(256, 256, 133))


def _kernel_vs_oracle(drr, rot, trans, tol_fwd=5e-3, **kw):
    img = drr(rot, trans, parameterization="euler_angles", convention="ZXY",
              axis=2, **kw)
    ora = drr(rot, trans, parameterization="euler_angles", convention="ZXY",
              axis=2, force_xla=True, **kw)
    rel = float(jnp.abs(img - ora).max() / jnp.abs(ora).max())
    assert rel < tol_fwd, f"fwd rel {rel}"


@pytest.mark.parametrize("renderer", ["siddon", "joseph", "trilinear"])
def test_forward_parity_on_hardware(subject, renderer):
    rot, trans = _inputs()
    drr = DRR(subject, sdd=1020.0, height=96, delx=4.0, renderer=renderer)
    # bf16-compute tolerance (default precision policy)
    _kernel_vs_oracle(drr, rot, trans)


@pytest.mark.parametrize("renderer", ["siddon", "joseph"])
def test_pose_gradient_parity_on_hardware(subject, renderer):
    """precision="highest" removes bf16 rounding: parity must be tight."""
    rot, trans = _inputs()
    drr = DRR(subject, sdd=1020.0, height=96, delx=4.0, renderer=renderer,
              precision="highest")

    def loss(r, d, fx):
        return jnp.mean(d(r, trans, parameterization="euler_angles",
                          convention="ZXY", axis=2, force_xla=fx))

    g = np.asarray(jax.jit(jax.grad(lambda r, d: loss(r, d, False)))(rot, drr))
    go = np.asarray(jax.jit(jax.grad(lambda r, d: loss(r, d, True)))(rot, drr))
    rel = np.abs(g - go).max() / (np.abs(go).max() + 1e-12)
    # 2e-3: kernel and oracle are ~3e-4 / ~7e-4 from the CPU truth each
    # (measured round 3); the absolute check below is the strong gate.
    assert rel < 2e-3, (rel, g, go)


def test_pose_gradient_absolute_vs_cpu(subject):
    """ABSOLUTE pose-gradient correctness: TPU kernel vs a CPU-subprocess
    oracle gradient.

    Round-3 regression guard: kernel-vs-oracle parity ON the TPU shares the
    upstream pose->detector->affine chain, so a corruption there (the bf16
    default-matmul bug, ~100% rel error before _precision.f32_matmuls) is
    invisible to relative checks. The CPU subprocess shares NOTHING.
    """
    import subprocess
    import sys

    rot, trans = _inputs()
    drr = DRR(subject, sdd=1020.0, height=96, delx=4.0, renderer="joseph",
              precision="highest")

    def loss(r, d):
        return jnp.mean(d(r, trans, parameterization="euler_angles",
                          convention="ZXY", axis=2))

    g = np.asarray(jax.jit(jax.grad(loss))(rot, drr))

    code = """
import sys, numpy as np
sys.path.insert(0, {root!r})
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from diffdrr_tpu import DRR, load_example_ct
subject = load_example_ct(shape=(256, 256, 133))
rot = jnp.asarray([[0.01, np.pi / 2 + 0.02, -0.01]], jnp.float32)
trans = jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32)
drr = DRR(subject, sdd=1020.0, height=96, delx=4.0, renderer="joseph",
          precision="highest")
def loss(r, d):
    return jnp.mean(d(r, trans, parameterization="euler_angles",
                      convention="ZXY", axis=2, force_xla=True))
g = np.asarray(jax.jit(jax.grad(loss))(rot, drr))
print("GOLD", " ".join(repr(float(v)) for v in g.ravel()))
"""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", code.format(root=root)],
                         capture_output=True, text=True, timeout=900,
                         env={**os.environ, "DIFFDRR_TPU_TESTS": ""})
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("GOLD")][0]
    gc = np.asarray([float(v) for v in line.split()[1:]]).reshape(g.shape)
    rel = np.abs(g - gc).max() / (np.abs(gc).max() + 1e-12)
    assert rel < 2e-3, (rel, g, gc)


@pytest.mark.parametrize("renderer", ["siddon", "joseph"])
def test_volume_gradient_parity_on_hardware(subject, renderer):
    """Exercises the RMW double-buffer _bwd_vol DMA pipelines on real DMAs
    (the ADVICE round-2 validation gate)."""
    rot, trans = _inputs()
    drr = DRR(subject, sdd=1020.0, height=64, delx=6.0, renderer=renderer,
              precision="highest")
    pose = convert(rot, trans, parameterization="euler_angles",
                   convention="ZXY")
    src, tgt = drr.detector(pose, None)

    def loss(dens, d, fx):
        return jnp.mean(d.render(dens, src, tgt, axis=2, force_xla=fx) ** 2)

    gk = np.asarray(jax.jit(
        lambda dens, d: jax.grad(loss)(dens, d, False))(drr.density, drr))
    go = np.asarray(jax.jit(
        lambda dens, d: jax.grad(loss)(dens, d, True))(drr.density, drr))
    rel = np.abs(gk - go).max() / (np.abs(go).max() + 1e-12)
    assert rel < 1e-3, rel


@pytest.mark.parametrize("renderer", ["siddon", "joseph"])
def test_mip_gradient_on_hardware(subject, renderer):
    """In-kernel argmax-gated MIP backward vs the oracle max-VJP."""
    rot, trans = _inputs()
    drr = DRR(subject, sdd=1020.0, height=64, delx=6.0, renderer=renderer,
              precision="highest")

    def loss(r, d, fx):
        return jnp.mean(d(r, trans, parameterization="euler_angles",
                          convention="ZXY", axis=2, reducefn="max",
                          force_xla=fx))

    g = np.asarray(jax.jit(jax.grad(lambda r, d: loss(r, d, False)))(rot, drr))
    go = np.asarray(jax.jit(jax.grad(lambda r, d: loss(r, d, True)))(rot, drr))
    rel = np.abs(g - go).max() / (np.abs(go).max() + 1e-12)
    assert rel < 5e-3, (rel, g, go)


def test_dynamic_roll_power_of_two_widths():
    """Regression: Mosaic's dynamic pltpu.roll silently miscompiles at
    non-power-of-two lane widths (384) on v5e. The kernels now refuse such
    windows (_validate_z_window); this asserts the widths we DO use are
    exact on hardware."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def mk(W):
        def kernel(shift_ref, x_ref, o_ref):
            o_ref[...] = pltpu.roll(x_ref[...], -shift_ref[0], axis=1)

        return jax.jit(lambda shift, x: pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, W), jnp.float32),
        )(shift, x))

    rng = np.random.default_rng(0)
    for W in (128, 256, 512):
        x = jnp.asarray(rng.standard_normal((16, W)), jnp.float32)
        for s in (1, 127, W - 3):
            got = np.asarray(mk(W)(jnp.asarray([s], jnp.int32), x))
            np.testing.assert_array_equal(got, np.roll(np.asarray(x), -s, 1))


def test_planner_never_emits_rollable_non_pow2_zw(subject):
    """Every planned config must satisfy the roll-width constraint."""
    for h, dx in ((64, 6.0), (96, 4.0), (200, 2.0), (200, 1.0)):
        for r in ("siddon", "joseph", "trilinear"):
            drr = DRR(subject, sdd=1020.0, height=h, delx=dx, renderer=r)
            for cfg in drr.pallas_cfg:
                if cfg is None:
                    continue
                tile, ky, zw, zc = cfg
                lanes = zw // 128
                assert zc == zw or (lanes & (lanes - 1)) == 0, cfg


def test_registration_loss_gradients_sane_on_hardware(subject):
    """Round-4 lesson: value parity is not enough — the multiscale-NCC
    registration loss must have BOUNDED values and CPU-consistent pose
    gradients on the real chip (the bf16-conv NCC bug produced scores of
    -2053 and diverging translations while every value-parity suite was
    green)."""
    from diffdrr_tpu.metrics import MultiscaleNormalizedCrossCorrelation2d

    rot, trans = _inputs()
    drr = DRR(subject, sdd=1020.0, height=64, delx=6.0, renderer="joseph")
    metric = MultiscaleNormalizedCrossCorrelation2d([None, 13], [0.5, 0.5])
    target = drr(rot, trans, parameterization="euler_angles",
                 convention="ZXY", axis=2)

    def loss(r, t):
        img = drr(r, t, parameterization="euler_angles", convention="ZXY",
                  axis=2)
        return jnp.mean(metric(img, target))

    rot0 = rot + jnp.asarray([[0.02, -0.015, 0.01]], jnp.float32)
    trans0 = trans + jnp.asarray([[8.0, -12.0, 5.0]], jnp.float32)
    v, (gr, gt) = jax.jit(
        lambda r, t: jax.value_and_grad(loss, argnums=(0, 1))(r, t)
    )(rot0, trans0)
    v = float(v)
    assert -1.001 <= v <= 1.001, v
    assert bool(jnp.isfinite(gr).all()) and bool(jnp.isfinite(gt).all())

    # CPU truth for the same loss (subprocess would be cleaner, but the
    # platform is process-wide here; compare against stored CPU values
    # computed by the same code path under tests/conftest on CPU runs is
    # not possible — so bound the magnitudes instead and check the descent
    # direction actually reduces the loss).
    step_r = 1e-3 * gr / (jnp.linalg.norm(gr) + 1e-12)
    step_t = 0.5 * gt / (jnp.linalg.norm(gt) + 1e-12)
    v2 = float(loss(rot0 + step_r, trans0 + step_t))
    assert v2 > v, (v, v2)  # ascending the NCC gradient improves similarity


@pytest.mark.parametrize("renderer", ["siddon", "joseph"])
def test_streaming_window_parity_on_hardware(subject, renderer):
    """Force the non-VMEM-resident path (per-plane HBM window DMAs) on a
    volume that would normally be resident. Round-4 motivation: the
    512^3 streaming regime was the first hardware exercise of this path
    and surfaced two latent correctness bugs — it must stay covered
    without needing a 512^3 volume in the test."""
    rot, trans = _inputs()
    drr = DRR(subject, sdd=1020.0, height=64, delx=6.0, renderer=renderer)
    img = drr(rot, trans, parameterization="euler_angles", convention="ZXY",
              axis=2, resident=False)
    ora = drr(rot, trans, parameterization="euler_angles", convention="ZXY",
              axis=2, force_xla=True)
    rel = float(jnp.abs(img - ora).max() / jnp.abs(ora).max())
    assert rel < 5e-3, rel


def test_sparse_render_matches_dense_gather_on_hardware(subject):
    """p_subsample rendering (any strategy) must equal the dense render
    gathered at the sampled pixels — on the real chip, where the round-4
    sparse sweep ran its strategy timings."""
    rot, trans = _inputs()
    drr_d = DRR(subject, sdd=1020.0, height=64, delx=6.0, renderer="joseph")
    drr_s = DRR(subject, sdd=1020.0, height=64, delx=6.0, renderer="joseph",
                p_subsample=0.1)
    dense = drr_d(rot, trans, parameterization="euler_angles",
                  convention="ZXY", axis=2)
    sparse = drr_s(rot, trans, parameterization="euler_angles",
                   convention="ZXY", axis=2)
    # Reference semantics (drr.py:142-147): sparse output is the FULL
    # image with sampled rays scattered in and zeros elsewhere.
    idx = np.asarray(drr_s.detector.subsamples[-1])
    got = np.asarray(sparse)[0, 0].ravel()
    want = np.asarray(dense)[0, 0].ravel()
    np.testing.assert_allclose(got[idx], want[idx],
                               atol=5e-3 * np.abs(want).max())
    mask = np.ones(got.shape, bool)
    mask[idx] = False
    assert np.abs(got[mask]).max() == 0.0
