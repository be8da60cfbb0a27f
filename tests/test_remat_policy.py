"""Remat-policy parity (config.ModelConfig.train_remat).

Rematerialisation is a scheduling choice, not a math change: every policy
("none", "full", "dots", "attn", "attn_ffn1") must produce bit-identical
loss and gradients in f32 — the backward recomputes exactly the forward's
ops with the same rng.
"""

import dataclasses

import numpy as np
import jax
import pytest

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models import voicecraft as vc

from __graft_entry__ import _synthetic_batch

POLICIES = ["full", "dots", "attn", "attn_ffn1", "none"]


def _loss_and_grads(cfg, params, batch, rng):
    def loss_fn(p):
        out = vc.forward_train(p, cfg, batch, rng=rng,
                               remat=cfg.train_remat != "none")
        return out["loss"]
    return jax.jit(jax.value_and_grad(loss_fn))(params)


@pytest.mark.parametrize("train_attn", ["dense", "chunked"])
def test_remat_policies_bitwise_identical(train_attn):
    base = dataclasses.replace(tiny_test(), compute_dtype="float32",
                               train_attn=train_attn)
    params = vc.init_params(base, jax.random.PRNGKey(0))
    batch = _synthetic_batch(base, B=4, Sx=16, y_len=40, seed=7)
    rng = jax.random.PRNGKey(3)

    ref_loss = ref_grads = None
    for pol in POLICIES:
        cfg = dataclasses.replace(base, train_remat=pol)
        loss, grads = _loss_and_grads(cfg, params, batch, rng)
        loss = float(np.asarray(loss))
        if ref_loss is None:
            ref_loss, ref_grads = loss, grads
            continue
        assert loss == ref_loss, (pol, loss, ref_loss)
        for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(grads)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=pol)
