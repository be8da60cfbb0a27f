"""ScaledAdam optimizer + Eden schedule, as optax-style pure transformations.

Faithful reimplementation of the reference's icefall optimizer
(steps/optim.py:129-807): per-tensor rms-scaled updates, a separately-learned
per-tensor scale updated every ``size_update_period`` steps, and median-history
adaptive gradient clipping.

TPU-first differences from the reference:
  * no ``BatchedOptimizer`` stacking (steps/optim.py:29-127) — that trick cut
    CUDA kernel-launch counts; XLA fuses the per-leaf update lattice anyway.
  * the whole update is one jittable pure function over the grads/params/state
    pytrees; state lives on device and shards with the params.
  * Eden's epoch input is derived from the step (the reference trainer drives
    ``step_epoch(step // pseudo_epoch_size + 1)``, steps/trainer.py:70-71), so
    the lr is a pure function of the step counter.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


# ==============================================================================
# Eden schedule (reference steps/optim.py:759-807)
# ==============================================================================

def eden_schedule(base_lr: float, lr_batches: float, lr_epochs: float,
                  warmup_batches: float,
                  pseudo_epoch_size: int = 3000) -> Callable:
    """lr(step) = base * ((step²+B²)/B²)^-.25 * ((epoch²+E²)/E²)^-.25 * warmup,
    epoch = step // pseudo_epoch_size + 1 (reference steps/trainer.py:70-71),
    warmup ramps linearly 0.5 -> 1 over ``warmup_batches``."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / pseudo_epoch_size) + 1.0
        factor = (((step ** 2 + lr_batches ** 2) / lr_batches ** 2) ** -0.25
                  * ((epoch ** 2 + lr_epochs ** 2) / lr_epochs ** 2) ** -0.25)
        warmup = jnp.where(step >= warmup_batches, 1.0,
                           0.5 + 0.5 * step / jnp.maximum(warmup_batches, 1.0))
        return base_lr * factor * warmup

    return schedule


def linear_warmup_decay(base_lr: float, total_steps: int,
                        warmup_steps: float) -> Callable:
    """AdamW companion schedule (reference steps/trainer.py:438-444)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        up = step / jnp.maximum(warmup_steps, 1.0)
        down = (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1.0)
        return base_lr * jnp.clip(jnp.where(step < warmup_steps, up, down), 0.0)

    return schedule


# ==============================================================================
# ScaledAdam
# ==============================================================================

class _LeafState(NamedTuple):
    delta: jnp.ndarray          # momentum buffer, shape of p
    exp_avg_sq: jnp.ndarray     # shape of p
    param_rms: jnp.ndarray      # keepdims scalar per tensor ([] for scalars)
    scale_exp_avg_sq: jnp.ndarray
    scale_grads: jnp.ndarray    # [size_update_period, *param_rms.shape]


class ScaledAdamState(NamedTuple):
    step: jnp.ndarray                 # int32 scalar
    model_norms: jnp.ndarray          # [clipping_update_period]
    model_norm_threshold: jnp.ndarray # f32 scalar
    leaves: tuple                     # flat tuple of _LeafState, params order


def scaled_adam(lr: Callable | float,
                betas=(0.9, 0.95),
                clipping_scale: Optional[float] = 2.0,
                scalar_lr_scale: float = 0.1,
                eps: float = 1e-8,
                param_min_rms: float = 1e-5,
                param_max_rms: float = 3.0,
                scalar_max: float = 10.0,
                size_update_period: int = 4,
                clipping_update_period: int = 600,
                ) -> optax.GradientTransformation:
    """Build the ScaledAdam transformation.  ``update`` requires params."""
    beta1, beta2 = betas
    lr_fn = lr if callable(lr) else (lambda _: jnp.asarray(lr, jnp.float32))

    def _rms(p):
        axes = tuple(range(p.ndim))
        return jnp.sqrt(jnp.mean(p.astype(jnp.float32) ** 2, axis=axes,
                                 keepdims=True)).reshape(p.ndim * (1,))

    def init(params):
        def leaf_init(p):
            scalar = p.size == 1
            rms = (jnp.zeros(p.ndim * (1,), jnp.float32) if scalar
                   else _rms(p))
            return _LeafState(
                delta=jnp.zeros_like(p, dtype=jnp.float32),
                exp_avg_sq=jnp.zeros_like(p, dtype=jnp.float32),
                param_rms=rms,
                scale_exp_avg_sq=jnp.zeros_like(rms),
                scale_grads=jnp.zeros((size_update_period,) + rms.shape,
                                      jnp.float32),
            )

        flat = jax.tree.leaves(params)
        return ScaledAdamState(
            step=jnp.zeros((), jnp.int32),
            model_norms=jnp.zeros((clipping_update_period,), jnp.float32),
            model_norm_threshold=jnp.asarray(jnp.inf, jnp.float32),
            leaves=tuple(leaf_init(p) for p in flat),
        )

    def update(grads, state: ScaledAdamState, params):
        assert params is not None
        step = state.step
        cur_lr = lr_fn(step)

        gflat, treedef = jax.tree.flatten(grads)
        pflat = jax.tree.leaves(params)
        gflat = [g.astype(jnp.float32) for g in gflat]
        pflat = [p.astype(jnp.float32) for p in pflat]
        assert len(gflat) == len(state.leaves) == len(pflat)

        # ---- adaptive clipping (reference optim.py:316-412) ----
        if clipping_scale is not None:
            tot_sumsq = sum(
                jnp.sum(g ** 2) if p.size == 1
                else jnp.sum((g * st.param_rms) ** 2)
                for g, st, p in zip(gflat, state.leaves, pflat))
            tot_norm = jnp.sqrt(tot_sumsq)
            slot = jnp.mod(step, clipping_update_period)
            model_norms = state.model_norms.at[slot].set(tot_norm)
            # refresh threshold every clipping_update_period steps (step>0)
            srt = jnp.sort(model_norms)
            median = srt[min(clipping_update_period - 1,
                             (clipping_update_period // 4) * 2)]
            refresh = (slot == 0) & (step > 0)
            threshold = jnp.where(refresh, clipping_scale * median,
                                  state.model_norm_threshold)
            clip = jnp.where(
                (step == 0) | (step < clipping_update_period),
                1.0,
                jnp.minimum(1.0, threshold / (tot_norm + 1e-20)))
        else:
            model_norms = state.model_norms
            threshold = state.model_norm_threshold
            clip = jnp.asarray(1.0)

        slot4 = jnp.mod(step, size_update_period)
        is_rms_step = slot4 == size_update_period - 1
        size_step = (step + 1) // size_update_period
        beta2_corr = beta2 ** size_update_period
        bc2_size = 1.0 - beta2_corr ** size_step.astype(jnp.float32)
        bc2_main = 1.0 - beta2 ** (step.astype(jnp.float32) + 1.0)

        def leaf_update(g, st: _LeafState, p):
            # The reference applies the adaptive clip ONLY to the scale-grads
            # recording (optim.py:497-510 reads the locally-clipped grad), while
            # _step/_step_scalar (optim.py:612,646) re-read the raw p.grad for
            # exp_avg_sq and the main update.  Mirror that exactly.
            g_clip = g * clip
            delta = st.delta * beta1

            if p.size == 1:  # scalar path (reference optim.py:639-661)
                eas = st.exp_avg_sq * beta2 + (1 - beta2) * g * g
                denom = jnp.sqrt(eas / bc2_main) + eps
                delta = delta + g / denom * (-cur_lr * scalar_lr_scale
                                             * (1 - beta1))
                new_p = jnp.clip(p, -scalar_max, scalar_max) + delta
                return _LeafState(delta, eas, st.param_rms,
                                  st.scale_exp_avg_sq, st.scale_grads), new_p - p

            axes = tuple(range(p.ndim))
            # record the scale gradient this step (optim.py:506-510) — the
            # only consumer of the clipped grad
            sg = jnp.sum(p * g_clip, axis=axes, keepdims=True)
            scale_grads = st.scale_grads.at[slot4].set(sg)

            # refresh param_rms every size_update_period steps (optim.py:511-517)
            new_rms = jnp.sqrt(jnp.mean(p ** 2, axis=axes, keepdims=True))
            param_rms = jnp.where(is_rms_step, new_rms, st.param_rms)

            # size (scale) update (optim.py:531-596), active when
            # step % P == P-1 and step > 0
            seas = st.scale_exp_avg_sq * beta2_corr + \
                jnp.mean(scale_grads ** 2, axis=0) * (1 - beta2_corr)
            denom_s = jnp.sqrt(seas) + eps
            scale_step = (-cur_lr * scalar_lr_scale * jnp.sqrt(bc2_size)
                          * jnp.sum(scale_grads, axis=0) / denom_s)
            scale_step = jnp.where(param_rms < param_min_rms, 0.0, scale_step)
            scale_step = jnp.where(param_rms > param_max_rms,
                                   -cur_lr * scalar_lr_scale
                                   * size_update_period, scale_step)
            do_size = is_rms_step & (step > 0)
            scale_exp_avg_sq = jnp.where(do_size, seas, st.scale_exp_avg_sq)
            delta = delta + jnp.where(do_size, p * scale_step * (1 - beta1),
                                      0.0)

            # main step (optim.py:598-637)
            eas = st.exp_avg_sq * beta2 + (1 - beta2) * g * g
            eas_used = jnp.where(bc2_main < 0.99, eas / bc2_main, eas)
            denom = jnp.sqrt(eas_used) + eps
            alpha = -cur_lr * (1 - beta1) * jnp.maximum(param_rms,
                                                        param_min_rms)
            delta = delta + (g / denom) * alpha
            return _LeafState(delta, eas, param_rms, scale_exp_avg_sq,
                              scale_grads), delta

        results = [leaf_update(g, st, p)
                   for g, st, p in zip(gflat, state.leaves, pflat)]
        new_leaves = tuple(r[0] for r in results)
        updates = treedef.unflatten([r[1] for r in results])

        new_state = ScaledAdamState(step + 1, model_norms, threshold,
                                    new_leaves)
        return updates, new_state

    return optax.GradientTransformation(init, update)


def adamw_reference(lr: Callable | float, weight_decay: float = 1e-2
                    ) -> optax.GradientTransformation:
    """The reference's AdamW fallback (steps/trainer.py:436) via optax."""
    return optax.adamw(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=weight_decay)
