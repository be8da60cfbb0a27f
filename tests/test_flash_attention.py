"""Flash / chunked attention vs the dense reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voicecraft_tpu.ops.attention import mha, segment_padding_bias
from voicecraft_tpu.ops.flash_attention import (
    flash_prefix_attention, chunked_attention)


def _inputs(B=2, S=256, D=64, x_pad=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    x_lens = jnp.asarray([40, 64], jnp.int32)[:B]
    y_lens = jnp.asarray([150, 190], jnp.int32)[:B]
    return q, k, v, x_lens, y_lens, x_pad


def _dense(q, k, v, x_lens, y_lens, x_pad, nhead):
    S = q.shape[1]
    bias = segment_padding_bias(S, x_pad, x_lens, y_lens)
    return mha(q, k, v, bias, nhead)


def test_flash_matches_dense_interpret():
    q, k, v, x_lens, y_lens, x_pad = _inputs()
    want = _dense(q, k, v, x_lens, y_lens, x_pad, nhead=4)
    got = flash_prefix_attention(q, k, v, x_lens, y_lens, x_pad, nhead=4,
                                 block_q=64, block_k=64, interpret=True)
    # padding-row outputs are garbage in both; compare valid query rows only
    valid_q = np.zeros((2, 256), bool)
    for b in range(2):
        valid_q[b, :int(x_lens[b])] = True
        valid_q[b, x_pad:x_pad + int(y_lens[b])] = True
    np.testing.assert_allclose(np.asarray(got)[valid_q],
                               np.asarray(want)[valid_q], atol=2e-5)


def test_chunked_matches_dense():
    q, k, v, x_lens, y_lens, x_pad = _inputs(seed=3)
    want = _dense(q, k, v, x_lens, y_lens, x_pad, nhead=4)
    got = chunked_attention(q, k, v, x_lens, y_lens, x_pad, nhead=4, chunk=64)
    valid_q = np.zeros((2, 256), bool)
    for b in range(2):
        valid_q[b, :int(x_lens[b])] = True
        valid_q[b, x_pad:x_pad + int(y_lens[b])] = True
    np.testing.assert_allclose(np.asarray(got)[valid_q],
                               np.asarray(want)[valid_q], atol=2e-5)


def test_chunked_gradients_match_dense():
    q, k, v, x_lens, y_lens, x_pad = _inputs(B=1, S=128, D=32, seed=5)

    def loss_dense(q, k, v):
        o = _dense(q, k, v, x_lens[:1], y_lens[:1], x_pad, nhead=2)
        # restrict to valid rows so padding garbage doesn't leak into grads
        return jnp.sum(o[:, :40] ** 2) + jnp.sum(o[:, 64:64 + 60] ** 2)

    def loss_chunked(q, k, v):
        o = chunked_attention(q, k, v, x_lens[:1], y_lens[:1], x_pad,
                              nhead=2, chunk=32)
        return jnp.sum(o[:, :40] ** 2) + jnp.sum(o[:, 64:64 + 60] ** 2)

    g1 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_chunked, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_forward_train_chunked_matches_dense():
    import dataclasses
    from voicecraft_tpu.config import tiny_test
    from voicecraft_tpu.models import voicecraft as vc
    from tests.test_grad_accum import _batch

    cfg_d = dataclasses.replace(tiny_test(), compute_dtype="float32")
    cfg_c = dataclasses.replace(cfg_d, train_attn="chunked")
    params = vc.init_params(cfg_d, jax.random.PRNGKey(2))
    b = _batch(cfg_d, B=2, seed=8)
    out_d = vc.forward_train(params, cfg_d, b, remat=False)
    out_c = vc.forward_train(params, cfg_c, b, remat=False)
    np.testing.assert_allclose(float(out_c["loss"]), float(out_d["loss"]),
                               rtol=1e-4)


def test_prefill_with_flash_callable_matches_dense():
    """trm.prefill accepts a callable attention (the long-prompt flash
    wiring): outputs and cache must match the dense-bias path."""
    import jax
    import jax.numpy as jnp
    from voicecraft_tpu.models import transformer as trm
    from voicecraft_tpu.ops.attention import NEG_INF
    from voicecraft_tpu.ops.flash_attention import flash_prefix_attention

    B, S, D, H, L = 2, 128, 64, 4, 2
    x_pad = 48
    rng = np.random.default_rng(0)
    params = trm.init_stack(jax.random.PRNGKey(0), L, D, 4 * D)
    x = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
    x_lens = jnp.asarray([30, 41], jnp.int32)
    y_lens = jnp.asarray([60, 70], jnp.int32)

    jj = jnp.arange(S)
    key_valid = ((jj[None, :] < x_lens[:, None])
                 | ((jj[None, :] >= x_pad)
                    & (jj[None, :] < x_pad + y_lens[:, None])))
    allowed = (jj[None, :] <= jj[:, None])[None] & key_valid[:, None, :]
    bias = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)[:, None]

    cache0 = trm.init_kv_cache(L, B, S, H, D // H, jnp.float32)
    h_dense, c_dense = trm.prefill(params, x, bias, cache0, H)

    attn = lambda q, k, v: flash_prefix_attention(
        q, k, v, x_lens, y_lens, x_pad, H, block_q=64, block_k=64,
        interpret=True)
    h_flash, c_flash = trm.prefill(params, x, attn,
                                   trm.init_kv_cache(L, B, S, H, D // H,
                                                     jnp.float32), H)
    np.testing.assert_allclose(np.asarray(h_flash), np.asarray(h_dense),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(c_flash), np.asarray(c_dense),
                               rtol=2e-4, atol=2e-4)
