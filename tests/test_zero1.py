"""ZeRO-1 optimizer-state sharding (parallel/mesh.py zero1_opt_shardings).

The reference replicates optimizer state per DDP rank (steps/trainer.py:46);
here the param-shaped moments are sharded over the mesh's data axis.  The
transformation is layout-only, so the sharded trajectory must match the
replicated one bit-for-bit.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models.voicecraft import init_params
from voicecraft_tpu.parallel.mesh import (
    make_mesh, shard_params, param_shardings, shard_batch,
    zero1_opt_shardings)
from voicecraft_tpu.training.optim import scaled_adam, adamw_reference
from voicecraft_tpu.training.step import (make_train_step,
                                          make_train_step_two_phase)

from __graft_entry__ import _synthetic_batch


def _cfg():
    return dataclasses.replace(tiny_test(), compute_dtype="float32")


def _run(cfg, tx, mesh, zero1: bool, n_steps=3, B=8, two_phase=False):
    params = init_params(cfg, jax.random.PRNGKey(0))
    batch = _synthetic_batch(cfg, B=B, Sx=16, y_len=40, seed=5)
    param_sh = opt_sh = None
    if mesh is not None:
        params = shard_params(params, mesh)
        param_sh = param_shardings(params, mesh)
        batch = shard_batch(batch, mesh)
    opt_state = jax.jit(tx.init)(params)
    if mesh is not None and zero1:
        opt_sh = zero1_opt_shardings(params, opt_state, mesh)
        assert opt_sh is not None
        opt_state = jax.device_put(opt_state, opt_sh)
    make = make_train_step_two_phase if two_phase else make_train_step
    step = make(cfg, tx, param_shardings=param_sh, opt_shardings=opt_sh)
    losses = []
    for i in range(n_steps):
        params, opt_state, m = step(params, opt_state, batch,
                                    jax.random.PRNGKey(100 + i))
        losses.append(float(np.asarray(m["loss"])))
    return params, opt_state, losses


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_zero1_moments_are_data_sharded():
    cfg = _cfg()
    mesh = make_mesh(4, 2)
    params = shard_params(init_params(cfg, jax.random.PRNGKey(0)), mesh)
    tx = scaled_adam(lr=0.05)
    opt_state = jax.jit(tx.init)(params)
    sh = zero1_opt_shardings(params, opt_state, mesh)
    assert sh is not None
    # every param-shaped moment big enough to split carries a 'data' axis
    n_sharded = 0
    for leaf_sh, leaf in zip(jax.tree.leaves(sh), jax.tree.leaves(opt_state)):
        spec = leaf_sh.spec
        if "data" in jax.tree.leaves(tuple(spec)):
            n_sharded += 1
            ax = tuple(spec).index("data")
            assert leaf.shape[ax] % 4 == 0
    assert n_sharded >= 10  # delta+exp_avg_sq for every major tensor
    placed = jax.device_put(opt_state, sh)
    # each device holds a proper slice of the big moments, not a replica
    n_split = 0
    for leaf in jax.tree.leaves(placed):
        if (not leaf.sharding.is_fully_replicated
                and leaf.addressable_shards[0].data.shape != leaf.shape):
            n_split += 1
    assert n_split >= 10


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("opt", ["scaled_adam", "adamw"])
def test_zero1_trajectory_matches_replicated(opt):
    cfg = _cfg()
    mesh = make_mesh(4, 2)
    make_tx = (lambda: scaled_adam(lr=0.05)) if opt == "scaled_adam" else \
        (lambda: adamw_reference(1e-3))
    p_repl, _, l_repl = _run(cfg, make_tx(), mesh, zero1=False)
    p_z1, opt_z1, l_z1 = _run(cfg, make_tx(), mesh, zero1=True)

    assert l_repl == l_z1, (l_repl, l_z1)
    for a, b in zip(jax.tree.leaves(p_repl), jax.tree.leaves(p_z1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the state stayed sharded through the jitted steps (the constraint held)
    flat_sh = jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding.spec, opt_z1))
    assert any("data" in jax.tree.leaves(tuple(s)) for s in flat_sh)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_zero1_two_phase_trajectory_matches_replicated():
    """The >400M production path (two-phase step, trainer auto-selects it)
    holds the same layout-only invariant — up to f32 accumulation order.

    Unlike the fused step (bit-exact above), the standalone update
    executable partitions ScaledAdam's global reductions (model norm,
    param_rms) along the data-sharded moments, so partial sums arrive in
    a different order than the replicated layout's; measured drift is
    ~1e-7/step (ulp-level) at highest matmul precision.  Same physics as
    the tie-awareness note in CLAUDE.md — not a semantic difference.
    """
    cfg = _cfg()
    mesh = make_mesh(4, 2)
    p_repl, _, l_repl = _run(cfg, scaled_adam(lr=0.05), mesh, zero1=False,
                             two_phase=True)
    p_z1, opt_z1, l_z1 = _run(cfg, scaled_adam(lr=0.05), mesh, zero1=True,
                              two_phase=True)
    np.testing.assert_allclose(l_repl, l_z1, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_repl), jax.tree.leaves(p_z1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    flat_sh = jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding.spec, opt_z1))
    assert any("data" in jax.tree.leaves(tuple(s)) for s in flat_sh)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_zero1_multi_transform_mtp_only():
    """--mtp-only wraps the optimizer in optax.multi_transform; given the
    trainer's labels pytree, ZeRO-1 recurses into the masked ScaledAdam
    (whose state holds one _LeafState per TRAINED leaf) and shards the head
    moments — exactly the >400M graft runs where optimizer memory matters."""
    import optax
    cfg = dataclasses.replace(_cfg(), n_mtp=2)
    mesh = make_mesh(4, 2)
    params = shard_params(init_params(cfg, jax.random.PRNGKey(0)), mesh)
    labels = {k: jax.tree.map(
        lambda _: "train" if k == "mtp_heads" else "freeze", v)
        for k, v in params.items()}
    tx = optax.multi_transform(
        {"train": scaled_adam(lr=0.05), "freeze": optax.set_to_zero()},
        labels)
    opt_state = jax.jit(tx.init)(params)
    assert zero1_opt_shardings(params, opt_state, mesh) is None  # no labels
    sh = zero1_opt_shardings(params, opt_state, mesh, labels=labels)
    assert sh is not None
    placed = jax.device_put(opt_state, sh)
    inner = placed.inner_states["train"].inner_state
    n_split = sum(
        1 for leaf in jax.tree.leaves(inner)
        if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated
        and leaf.addressable_shards[0].data.shape != leaf.shape)
    assert n_split >= 4    # delta+exp_avg_sq of the mtp head tensors
    # the sharded masked state still drives updates: frozen subtree zero,
    # trained subtree live
    grads = jax.tree.map(jnp.ones_like, params)
    upd, _ = jax.jit(tx.update)(grads, placed, params)
    assert float(jnp.abs(jax.tree.leaves(upd["mtp_heads"])[0]).max()) > 0
    assert all(float(jnp.abs(l).max()) == 0
               for l in jax.tree.leaves(upd["decoder"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_zero1_unsupported_state_returns_none():
    import optax
    cfg = _cfg()
    mesh = make_mesh(4, 2)
    params = shard_params(init_params(cfg, jax.random.PRNGKey(0)), mesh)
    tx = optax.sgd(1e-2)
    opt_state = jax.jit(tx.init)(params)
    assert zero1_opt_shardings(params, opt_state, mesh) is None
