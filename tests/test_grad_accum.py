"""Gradient accumulation + batch padding semantics."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.data import spans
from voicecraft_tpu.models import voicecraft as vc
from voicecraft_tpu.training.optim import scaled_adam
from voicecraft_tpu.training.step import make_train_step
from voicecraft_tpu.training.trainer import _pad_batch


def _batch(cfg, B=4, seed=0):
    rng = np.random.default_rng(seed)
    K = cfg.n_codebooks
    comps, xs = [], []
    for _ in range(B):
        y = rng.integers(0, cfg.audio_vocab_size, (K, 60)).astype(np.int32)
        mi, nmi = spans.sample_mask_intervals(rng, 60, cfg)
        comps.append(spans.compose_sequence(y, mi, nmi, cfg))
        xs.append(rng.integers(0, cfg.text_vocab_size, 12).astype(np.int32))
    Sy = max(c.length for c in comps)
    y_tok = np.full((B, K, Sy), cfg.audio_pad_token, np.int32)
    midx = np.full((B, Sy), -1, np.int32)
    tval = np.zeros((B, K, Sy), bool)
    for b, c in enumerate(comps):
        y_tok[b, :, :c.length] = c.tokens
        midx[b, :c.length] = c.mask_emb_idx
        tval[b, :, :c.length] = spans.target_valid_from_real(c.real)
    return vc.TrainBatch(jnp.asarray(np.stack(xs)), jnp.full((B,), 12),
                         jnp.asarray(y_tok),
                         jnp.asarray([c.length for c in comps]),
                         jnp.asarray(midx), jnp.asarray(tval))


def test_padded_rows_contribute_nothing():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = vc.init_params(cfg, jax.random.PRNGKey(0))
    b = _batch(cfg, B=3)
    out1 = vc.forward_train(params, cfg, b, remat=False)
    out2 = vc.forward_train(params, cfg, _pad_batch(b, 6), remat=False)
    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                               rtol=1e-5)
    assert int(out1["effective_ntoken"]) == int(out2["effective_ntoken"])


def test_grad_accum_runs_and_aggregates():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = vc.init_params(cfg, jax.random.PRNGKey(0))
    tx = scaled_adam(lr=0.01, clipping_scale=None)
    b = _batch(cfg, B=4)

    step1 = make_train_step(cfg, tx, remat=False, grad_accum=1)
    step2 = make_train_step(cfg, tx, remat=False, grad_accum=2)

    # the step donates params/opt_state buffers — use fresh copies per call
    cp = lambda: jax.tree.map(jnp.copy, params)
    pa = cp()
    p1, s1, m1 = step1(pa, tx.init(pa), b, jax.random.PRNGKey(1))
    pb = cp()
    p2, s2, m2 = step2(pb, tx.init(pb), b, jax.random.PRNGKey(1))

    # same token counts; losses are microbatch-mean-summed (reference
    # semantics) so they differ slightly, but both finite and same scale
    assert int(m1["effective_ntoken"]) == int(m2["effective_ntoken"])
    l1, l2 = float(m1["loss"]), float(m2["loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    assert abs(l1 - l2) / l1 < 0.2
    # both updates moved the params
    d1 = float(jnp.abs(p1["mask_emb"] - params["mask_emb"]).max())
    d2 = float(jnp.abs(p2["mask_emb"] - params["mask_emb"]).max())
    assert d1 > 0 and d2 > 0


def test_normalize_loss_scales_grads_by_ntok():
    """Non-ScaledAdam optimizers backprop loss/effective_ntoken (reference
    steps/trainer.py:139-141): with SGD(lr=1) the update is -grad, so the
    normalized step's update must equal raw/ntok.  Reported loss stays raw."""
    import optax
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = vc.init_params(cfg, jax.random.PRNGKey(3))
    b = _batch(cfg, B=2, seed=5)
    tx = optax.sgd(1.0)

    cp = lambda: jax.tree.map(jnp.copy, params)
    pa = cp()
    p_raw, _, m_raw = make_train_step(cfg, tx, remat=False)(
        pa, tx.init(pa), b, jax.random.PRNGKey(1))
    pb = cp()
    p_nrm, _, m_nrm = make_train_step(cfg, tx, remat=False,
                                      normalize_loss=True)(
        pb, tx.init(pb), b, jax.random.PRNGKey(1))

    ntok = float(m_raw["effective_ntoken"])
    assert ntok > 1
    np.testing.assert_allclose(float(m_nrm["loss"]), float(m_raw["loss"]),
                               rtol=1e-6)  # metrics stay raw
    u_raw = np.asarray(p_raw["mask_emb"] - params["mask_emb"])
    u_nrm = np.asarray(p_nrm["mask_emb"] - params["mask_emb"])
    # scaling the loss reschedules the backward; f32 accumulation order
    # shifts tiny elements by ~1e-7 absolute
    np.testing.assert_allclose(u_nrm, u_raw / ntok, rtol=1e-3, atol=3e-7)
