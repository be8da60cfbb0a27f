"""Weight-only fp8 quantization quality tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models.voicecraft import init_params, apply_heads
from voicecraft_tpu.models import transformer as trm
from voicecraft_tpu.utils.quantize import quantize_decoder_fp8, dequant_dot, _quantize_matrix


def test_dequant_dot_accuracy():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    q = _quantize_matrix(w)
    y = dequant_dot(x, q)
    want = x @ w
    # fp8 e4m3 has ~2 decimal digits; relative error well under 5%
    rel = float(jnp.linalg.norm(y - want) / jnp.linalg.norm(want))
    assert rel < 0.05, rel


def test_fp8_decode_step_close_to_bf16():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_decoder_fp8(params)

    cache = jax.random.normal(jax.random.PRNGKey(2),
                              (cfg.num_decoder_layers, 2, 1, 32,
                               cfg.nhead, cfg.head_dim)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, cfg.d_model))
    h1, _ = trm.decode_step_fast(params["decoder"], x, cache,
                                 jnp.asarray(8), cfg.nhead)
    h2, _ = trm.decode_step_fast(qparams["decoder"], x, cache,
                                 jnp.asarray(8), cfg.nhead)
    rel = float(jnp.linalg.norm(h1 - h2) / jnp.linalg.norm(h1))
    assert rel < 0.05, rel

    l1 = apply_heads(params["heads"], h1)
    l2 = apply_heads(qparams["heads"], h2)
    # logits stay close enough that top-1 rarely flips on a tiny random model
    agree = float(jnp.mean(jnp.argmax(l1, -1) == jnp.argmax(l2, -1)))
    assert agree >= 0.75, agree
