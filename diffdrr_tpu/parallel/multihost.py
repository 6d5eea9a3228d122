"""Multi-host (DCN) distribution: process bootstrap + global array assembly.

The reference is single-process (SURVEY §2.2); this module is the TPU-native
multi-host entry path. Topology model (the standard JAX recipe):

  * every host process calls :func:`initialize_distributed` first — this
    wires the JAX distributed runtime so ``jax.devices()`` spans all hosts;
  * a :class:`jax.sharding.Mesh` built from the global device list lays
    collectives over ICI within a slice and DCN across slices;
  * per-host input batches (poses, measured images) are assembled into
    global sharded arrays with :func:`local_batch_to_global`, so each host
    feeds only its own shard — no host ever materializes the global batch.

All functions degrade gracefully to single-process use (the unit tests and
the virtual CPU mesh), so the same program runs unchanged from a laptop to a
multi-host slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "global_mesh",
    "local_batch_to_global",
    "process_local_slice",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Wire the JAX distributed runtime (call once, before any jax op).

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly for other setups. A no-op when the runtime is already
    initialized or when running single-process with no coordinator.
    """
    if coordinator_address is None and num_processes in (None, 1):
        return  # single process: nothing to wire
    # NOTE: nothing here may touch the XLA backend before initialize() —
    # even jax.process_count()/jax.devices() would initialize it and make
    # distributed startup illegal.
    try:
        is_init = jax.distributed.is_initialized()
    except AttributeError:  # older jax
        is_init = getattr(jax.distributed.global_state, "client", None) is not None
    if is_init:
        return  # already wired by the launcher
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:  # already initialized by the launcher
        if "already" not in str(e).lower():
            raise


def global_mesh(
    axis_shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("data", "rays"),
) -> Mesh:
    """Mesh over ALL devices across ALL hosts.

    Defaults to ``(n_processes, devices_per_process)`` when two axis names
    are given — the natural layout where the batch axis crosses DCN and the
    ray axis stays on ICI.
    """
    devices = jax.devices()
    n = len(devices)
    if axis_shape is None:
        per_proc = max(1, n // max(1, jax.process_count()))
        if len(axis_names) == 2 and n % per_proc == 0:
            axis_shape = (n // per_proc, per_proc)
        else:
            axis_shape = (1,) * (len(axis_names) - 1) + (n,)
    mesh_devices = np.asarray(devices).reshape(axis_shape)
    return Mesh(mesh_devices, axis_names)


def process_local_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this process's contiguous share of a global batch."""
    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n_proc} processes"
        )
    size = global_batch // n_proc
    return jax.process_index() * size, size


def local_batch_to_global(
    mesh: Mesh,
    spec: P,
    local_data: jnp.ndarray,
) -> jax.Array:
    """Assemble per-process local data into one global sharded array.

    ``local_data`` is this process's share of the global batch (leading-axis
    slice); the returned array is globally sharded per ``spec`` without any
    host ever holding the full batch (jax.make_array_from_process_local_data).
    """
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_data)
    )
