"""Profiling and observability hooks.

The reference has no profiling subsystem (SURVEY.md §5: benchmarking is
manual ``%timeit`` in notebooks). Here profiling is first-class: thin wrappers
over ``jax.profiler`` for capturing XLA/TPU traces viewable in Perfetto /
TensorBoard, plus a static per-render cost report derived from the same
planning model the Pallas dispatcher uses.

Typical use::

    from diffdrr_tpu.profiling import trace, annotate

    with trace("/tmp/drr-trace"):
        with annotate("render-200"):
            img = drr(rot, trans, parameterization="euler_angles",
                      convention="ZXY")
            jax.block_until_ready(img)

On the axon TPU tunnel, device-side traces require profiler support in the
tunnel; the wrappers degrade to no-ops with a warning rather than failing.
"""

from __future__ import annotations

import contextlib
import warnings
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

import jax

__all__ = ["trace", "annotate", "render_cost", "RenderCost",
           "enable_compilation_cache"]


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace of the enclosed block into ``log_dir``.

    Degrades to a no-op (with a warning) if the backend/profiler is
    unavailable — e.g. tunneled devices without profiler support — so
    instrumented scripts stay runnable everywhere.
    """
    started = False
    try:
        jax.profiler.start_trace(
            log_dir, create_perfetto_link=create_perfetto_link)
        started = True
    except Exception as e:  # pragma: no cover - backend-dependent
        warnings.warn(f"jax.profiler trace unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover
                warnings.warn(f"jax.profiler stop_trace failed: {e}")


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Label the enclosed dispatches in profiler timelines.

    Works under ``jit`` tracing (the annotation is baked into the HLO via
    ``jax.named_scope``) and around eager dispatches
    (``jax.profiler.TraceAnnotation``).
    """
    with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
        yield


@dataclass
class RenderCost:
    """Static per-render cost estimate for a DRR's Pallas fast path."""

    renderer: str
    axis: int
    tile: int
    window: tuple  # (ky, zw, zc)
    n_tiles: int
    n_steps: int  # plane-march steps per render (per tile)
    mxu_flops: float  # dense tent-contraction FLOPs per render
    dma_bytes: float  # HBM->VMEM window traffic per render (streaming mode)
    rays: int

    def __str__(self) -> str:
        return (
            f"{self.renderer} axis={self.axis} tile={self.tile} "
            f"window(ky,zw,zc)={self.window} tiles={self.n_tiles} "
            f"steps={self.n_steps} mxu={self.mxu_flops / 1e9:.2f} GFLOP "
            f"dma={self.dma_bytes / 1e6:.1f} MB rays={self.rays}"
        )


def render_cost(drr, axis: Optional[int] = None) -> RenderCost:
    """Static cost report for one forward render on the Pallas path.

    Uses the same planned windows as the dispatcher (``drr.pallas_cfg``); the
    MXU number is the *dense* tent-contraction work — the price of the
    gather-free formulation — not the O(rays x planes) useful samples.
    """
    if axis is None:
        axis = drr.march_axis
    cfg = drr.pallas_cfg[axis]
    if cfg is None:
        raise ValueError(f"no Pallas config for axis {axis} (window too big)")
    tile, ky, zw, zc = cfg
    H, W = drr.detector.height, drr.detector.width
    n_tiles = -(-H // tile) * -(-W // tile)
    dims = drr.density.shape
    step = (drr.joseph_steps[axis]
            if drr.renderer_name in ("joseph", "trilinear") else 1)
    n_steps = -(-int(dims[axis]) // step)
    TR = tile * tile
    n_mm = 2 if drr.renderer_name == "siddon" else 1
    mxu = 2.0 * ky * zc * (n_mm * TR) * n_steps * n_tiles
    bytes_el = 2 if drr.pallas_storage == "bf16" else 4
    dma = float(ky * zw * bytes_el) * n_steps * n_tiles
    return RenderCost(
        renderer=drr.renderer_name, axis=axis, tile=tile,
        window=(ky, zw, zc), n_tiles=n_tiles, n_steps=n_steps,
        mxu_flops=float(mxu), dma_bytes=dma, rays=H * W,
    )


def enable_compilation_cache(directory: Optional[str] = None,
                             min_compile_secs: float = 1.0) -> str:
    """Persist compiled XLA executables across processes.

    Pallas kernel compiles go through a remote compile server and can take
    20-90 s each (CLAUDE.md); the persistent cache lets every process that
    compiles the same (shapes, config) reuse the executable — registration
    CLIs, tools/sweep_tile.py subprocesses, and bench.py all benefit on
    repeat runs. Call BEFORE the first jit of interest. Returns the cache
    directory. Safe to call on backends that cannot serialize executables
    (entries are simply not written).
    """
    import os

    import jax

    if directory is None:
        directory = os.path.join(
            os.path.expanduser("~"), ".cache", "diffdrr_tpu", "xla_cache")
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return directory
