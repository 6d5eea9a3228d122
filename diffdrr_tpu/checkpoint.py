"""Checkpoint / resume for long-running optimizations (orbax-backed).

The reference has no training checkpoints (SURVEY §5: only gradient
checkpointing and the ``persistent`` buffer flag). This module adds the
production counterpart for the workloads that actually run long — iterative
reconstruction (SURVEY §3.4) and pose-regressor training (§3.5): step-indexed
checkpoints of arbitrary pytrees of arrays, with retention, atomic writes,
and sharding-preserving restore on a device mesh (orbax restores each leaf
with the sharding of the matching leaf in the ``like`` pytree, so a
checkpoint written on one mesh layout can be resumed on another).

Everything here is a thin, stable facade over ``orbax.checkpoint`` so user
code does not churn with orbax API changes.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

__all__ = [
    "CheckpointManager",
    "save_pytree",
    "load_pytree",
]


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_pytree(path: str, state: Any) -> None:
    """One-shot atomic save of a pytree of arrays/scalars to ``path``."""
    ocp = _ocp()
    path = os.path.abspath(os.fspath(path))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_pytree(path: str, like: Optional[Any] = None) -> Any:
    """Load a pytree saved by :func:`save_pytree`.

    ``like`` (a pytree of arrays or ShapeDtypeStructs with the target
    structure) restores leaves with matching dtype/sharding; without it the
    raw stored tree (dicts/lists of numpy arrays) is returned.
    """
    ocp = _ocp()
    path = os.path.abspath(os.fspath(path))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, like) if like is not None else (
            ckptr.restore(path))


class CheckpointManager:
    """Step-indexed checkpoints with retention, for resumable optimizations.

    >>> mgr = CheckpointManager(workdir, max_to_keep=3)
    >>> start, state = mgr.latest(like=state) or (0, state)   # resume
    >>> for step in range(start, n_steps):
    ...     state = update(state)
    ...     mgr.maybe_save(step + 1, state, every=50)
    >>> mgr.close()
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        ocp = _ocp()
        self.directory = os.path.abspath(os.fspath(directory))
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        ocp = _ocp()
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def maybe_save(self, step: int, state: Any, every: int) -> bool:
        """Save iff ``step`` is a multiple of ``every`` (and every > 0)."""
        if every > 0 and step % every == 0:
            self.save(step, state)
            return True
        return False

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: int, like: Any) -> Any:
        ocp = _ocp()
        return self._mgr.restore(step, args=ocp.args.StandardRestore(like))

    def latest(self, like: Any) -> Optional[Tuple[int, Any]]:
        """(step, state) of the newest checkpoint, or None if none exist."""
        step = self.latest_step()
        if step is None:
            return None
        return step, self.restore(step, like)

    def wait(self) -> None:
        """Block until any in-flight async save has landed on disk."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
