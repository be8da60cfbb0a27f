"""The jitted training step: forward + loss + grads + ScaledAdam/AdamW update.

Replaces the reference's autocast/GradScaler/DDP step (steps/trainer.py:82-160):
bf16 compute needs no loss scaling, gradient sync is implicit in the sharded
batch dimension, and the metric all-reduces (trainer.py:100-103) are just the
unsharded outputs of the jitted function.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from ..models.voicecraft import TrainBatch, forward_train


def make_train_step(cfg: ModelConfig, tx: optax.GradientTransformation,
                    remat: bool = True):
    """Returns jitted step(params, opt_state, batch, rng) ->
    (params, opt_state, metrics).

    NaN-batch protection (reference trainer.py:98-109): when the loss is
    non-finite the update is skipped wholesale and ``metrics['is_nan']`` is 1
    — all data-parallel shards see the same global loss, so they skip
    together, exactly like the reference's all-reduced is_nan flag.
    """

    def step(params, opt_state, batch: TrainBatch, rng):
        def loss_fn(p):
            out = forward_train(p, cfg, batch, rng=rng, remat=remat)
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        ok = jnp.isfinite(loss)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        keep = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new, old)
        params = keep(new_params, params)
        opt_state = keep(new_opt_state, opt_state)

        metrics = {
            "loss": loss,
            "top10acc": out["top10acc"],
            "top10acc_by_codebook": out["top10acc_by_codebook"],
            "effective_ntoken": out["effective_ntoken"],
            "is_nan": jnp.logical_not(ok).astype(jnp.float32),
        }
        return params, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1))
