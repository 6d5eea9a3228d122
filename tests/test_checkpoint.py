"""Checkpoint/resume subsystem (orbax facade) — SURVEY §5 checkpoint row."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from diffdrr_tpu.checkpoint import CheckpointManager, save_pytree, load_pytree


def _tree_allclose(a, b):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_save_load_roundtrip(tmp_path):
    state = {
        "density": jnp.arange(24.0, dtype=jnp.float32).reshape(2, 3, 4),
        "opt": {"count": jnp.int32(7), "mu": jnp.ones((3,), jnp.bfloat16)},
    }
    path = str(tmp_path / "ckpt")
    save_pytree(path, state)
    back = load_pytree(path, like=jax.tree_util.tree_map(jnp.zeros_like, state))
    _tree_allclose(state, back)
    assert back["opt"]["mu"].dtype == jnp.bfloat16


def test_optax_state_roundtrip(tmp_path):
    params = jnp.ones((5, 5), jnp.float32)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    g = jnp.full_like(params, 0.1)
    updates, opt_state = tx.update(g, opt_state, params)
    params = optax.apply_updates(params, updates)

    path = str(tmp_path / "opt")
    save_pytree(path, {"params": params, "opt_state": opt_state})
    like = {"params": jnp.zeros_like(params), "opt_state": tx.init(params)}
    back = load_pytree(path, like=like)
    # Resumed optimization must continue identically to the uninterrupted run.
    u1, s1 = tx.update(g, opt_state, params)
    u2, s2 = tx.update(g, back["opt_state"], back["params"])
    _tree_allclose(u1, u2)
    _tree_allclose(s1, s2)


def test_manager_retention_and_resume(tmp_path):
    state = {"x": jnp.zeros((4,), jnp.float32)}
    with CheckpointManager(str(tmp_path / "mgr"), max_to_keep=2) as mgr:
        assert mgr.latest(like=state) is None
        for step in range(1, 7):
            state = {"x": state["x"] + 1.0}
            saved = mgr.maybe_save(step, state, every=2)
            assert saved == (step % 2 == 0)
        mgr.wait()
        assert mgr.latest_step() == 6
        step, back = mgr.latest(like={"x": jnp.zeros((4,), jnp.float32)})
        assert step == 6
        np.testing.assert_allclose(np.asarray(back["x"]), 6.0)
        # Retention: only the last two survive.
        mgr2_steps = sorted(
            int(p.name) for p in (tmp_path / "mgr").iterdir()
            if p.name.isdigit()
        )
        assert mgr2_steps == [4, 6]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_restore_preserves_sharding(tmp_path):
    """A checkpoint restores with the sharding of the ``like`` leaves — the
    multi-chip resume story (write on one layout, resume on another)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("d",))
    sharded = jax.device_put(
        jnp.arange(64.0, dtype=jnp.float32).reshape(8, 8),
        NamedSharding(mesh, P("d", None)),
    )
    path = str(tmp_path / "sharded")
    save_pytree(path, {"w": sharded})

    # Restore onto a DIFFERENT layout (shard columns instead of rows).
    like = {
        "w": jax.device_put(
            jnp.zeros((8, 8), jnp.float32), NamedSharding(mesh, P(None, "d"))
        )
    }
    back = load_pytree(path, like=like)
    np.testing.assert_allclose(np.asarray(back["w"]), np.asarray(sharded))
    assert back["w"].sharding == like["w"].sharding
