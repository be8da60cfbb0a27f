"""The jitted training step: forward + loss + grads + ScaledAdam/AdamW update.

Replaces the reference's autocast/GradScaler/DDP step (steps/trainer.py:82-160):
bf16 compute needs no loss scaling, gradient sync is implicit in the sharded
batch dimension, and the metric all-reduces (trainer.py:100-103) are just the
unsharded outputs of the jitted function.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from ..models.voicecraft import TrainBatch, forward_train


def _constrain(tree, shardings):
    if shardings is None:
        return tree
    return jax.lax.with_sharding_constraint(tree, shardings)


def make_train_step(cfg: ModelConfig, tx: optax.GradientTransformation,
                    remat: bool = True, grad_accum: int = 1,
                    normalize_loss: bool = False,
                    param_shardings=None, opt_shardings=None):
    """Returns jitted step(params, opt_state, batch, rng) ->
    (params, opt_state, metrics).

    NaN-batch protection (reference trainer.py:98-109): when the loss is
    non-finite the update is skipped wholesale and ``metrics['is_nan']`` is 1
    — all data-parallel shards see the same global loss, so they skip
    together, exactly like the reference's all-reduced is_nan flag.

    grad_accum > 1 splits the batch into ``grad_accum`` stripes along the
    batch dim (batch size must be divisible; the trainer pads with
    fully-masked rows) and SUMS gradients across microbatches, matching the
    reference's raw-sum loss backward for ScaledAdam
    (steps/trainer.py:87-141).

    ``normalize_loss`` differentiates loss/effective_ntoken instead of the
    raw summed loss — the reference backprops the normalized loss for every
    optimizer except ScaledAdam (steps/trainer.py:139-141).  Reported metrics
    carry the raw loss either way.
    """

    def grads_of(params, batch, rng):
        def loss_fn(p):
            out = forward_train(p, cfg, batch, rng=rng, remat=remat)
            l = out["loss"]
            if normalize_loss:
                l = l / jnp.maximum(out["effective_ntoken"], 1).astype(l.dtype)
            return l, out
        (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return (out["loss"], out), grads

    def step(params, opt_state, batch: TrainBatch, rng):
        if grad_accum <= 1:
            (loss, out), grads = grads_of(params, batch, rng)
        else:
            B = batch.x.shape[0]
            assert B % grad_accum == 0, (B, grad_accum)
            mb = jax.tree.map(
                lambda x: x.reshape(grad_accum, B // grad_accum, *x.shape[1:]),
                batch)
            rngs = jax.random.split(rng, grad_accum)

            mtp = cfg.n_mtp > 0

            def micro(carry, inp):
                gsum, loss_sum, acc_sum, acc_cb_sum, ntok_sum, xtra = carry
                b, r = inp
                (l, out), g = grads_of(params, b, r)
                if mtp:
                    xtra = (xtra[0] + out["mtp_loss"],
                            xtra[1] + out["mtp_top1acc"])
                return (jax.tree.map(jnp.add, gsum, g), loss_sum + l,
                        acc_sum + out["top10acc"],
                        acc_cb_sum + out["top10acc_by_codebook"],
                        ntok_sum + out["effective_ntoken"], xtra), None

            zero_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params)
            K = cfg.n_codebooks
            init = (zero_g, jnp.float32(0), jnp.float32(0),
                    jnp.zeros((K,), jnp.float32), jnp.int32(0),
                    (jnp.float32(0), jnp.zeros((cfg.n_mtp,), jnp.float32))
                    if mtp else ())
            (grads, loss, acc, acc_cb, ntok, xtra), _ = jax.lax.scan(
                micro, init, (mb, rngs))
            out = {"top10acc": acc, "top10acc_by_codebook": acc_cb,
                   "effective_ntoken": ntok}
            if mtp:
                out["mtp_loss"] = xtra[0]
                out["mtp_top1acc"] = xtra[1] / grad_accum
        ok = jnp.isfinite(loss)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        keep = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new, old)
        # ZeRO-1 (parallel/mesh.py zero1_opt_shardings): pin the layouts so
        # GSPMD keeps moments data-sharded and params replicated-over-data
        params = _constrain(keep(new_params, params), param_shardings)
        opt_state = _constrain(keep(new_opt_state, opt_state), opt_shardings)

        metrics = {
            "loss": loss,
            "top10acc": out["top10acc"],
            "top10acc_by_codebook": out["top10acc_by_codebook"],
            "effective_ntoken": out["effective_ntoken"],
            "is_nan": jnp.logical_not(ok).astype(jnp.float32),
        }
        for k in ("mtp_loss", "mtp_top1acc"):
            if k in out:
                metrics[k] = out[k]
        return params, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1))


def make_train_step_two_phase(cfg: ModelConfig,
                              tx: optax.GradientTransformation,
                              remat: bool = True, grad_accum: int = 1,
                              normalize_loss: bool = False,
                              param_shardings=None, opt_shardings=None):
    """Memory-lean variant: gradients and the optimizer update run as two
    separate executables, so activations and the f32 optimizer temporaries
    never coexist in HBM.  Enables single-chip 830M training on 16 GB
    (the fused step needs params+grads+opt-state+activations at once).

    Same semantics as make_train_step; ~one extra dispatch per step.
    """

    def objective(out):
        l = out["loss"]
        if normalize_loss:  # reference steps/trainer.py:139-141
            l = l / jnp.maximum(out["effective_ntoken"], 1).astype(l.dtype)
        return l

    def grads_fn(params, batch: TrainBatch, rng):
        if grad_accum <= 1:
            def loss_fn(p):
                out = forward_train(p, cfg, batch, rng=rng, remat=remat)
                return objective(out), out
            (_, out), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return grads, out["loss"], out
        B = batch.x.shape[0]
        assert B % grad_accum == 0, (B, grad_accum)
        mb = jax.tree.map(
            lambda x: x.reshape(grad_accum, B // grad_accum, *x.shape[1:]),
            batch)
        rngs = jax.random.split(rng, grad_accum)

        mtp = cfg.n_mtp > 0

        def micro(carry, inp):
            gsum, loss_sum, acc_sum, acc_cb, ntok, xtra = carry
            b, r = inp

            def loss_fn(p):
                out = forward_train(p, cfg, b, rng=r, remat=remat)
                return objective(out), out
            (_, out), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            if mtp:
                xtra = (xtra[0] + out["mtp_loss"],
                        xtra[1] + out["mtp_top1acc"])
            return (jax.tree.map(jnp.add, gsum, g), loss_sum + out["loss"],
                    acc_sum + out["top10acc"],
                    acc_cb + out["top10acc_by_codebook"],
                    ntok + out["effective_ntoken"], xtra), None

        zero_g = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                              params)
        K = cfg.n_codebooks
        init = (zero_g, jnp.float32(0), jnp.float32(0),
                jnp.zeros((K,), jnp.float32), jnp.int32(0),
                (jnp.float32(0), jnp.zeros((cfg.n_mtp,), jnp.float32))
                if mtp else ())
        (grads, loss, acc, acc_cb, ntok, xtra), _ = jax.lax.scan(
            micro, init, (mb, rngs))
        out = {"top10acc": acc, "top10acc_by_codebook": acc_cb,
               "effective_ntoken": ntok}
        if mtp:
            out["mtp_loss"] = xtra[0]
            out["mtp_top1acc"] = xtra[1] / grad_accum
        return grads, loss, out

    def update_fn(params, opt_state, grads, loss):
        ok = jnp.isfinite(loss)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new, old)
        return (_constrain(keep(new_params, params), param_shardings),
                _constrain(keep(new_opt_state, opt_state), opt_shardings))

    grads_jit = jax.jit(grads_fn)
    update_jit = jax.jit(update_fn, donate_argnums=(0, 1, 2))

    def step(params, opt_state, batch, rng):
        grads, loss, out = grads_jit(params, batch, rng)
        params, opt_state = update_jit(params, opt_state, grads, loss)
        metrics = {
            "loss": loss,
            "top10acc": out["top10acc"],
            "top10acc_by_codebook": out["top10acc_by_codebook"],
            "effective_ntoken": out["effective_ntoken"],
            "is_nan": jnp.logical_not(jnp.isfinite(loss)).astype(jnp.float32),
        }
        for k in ("mtp_loss", "mtp_top1acc"):
            if k in out:
                metrics[k] = out[k]
        return params, opt_state, metrics

    return step
