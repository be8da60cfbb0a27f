"""Fused Pallas FFN kernel vs the XLA composition it replaces, in
interpret mode on CPU (numerics) — the TPU win is measured by
bench.py / PERF.md."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voicecraft_tpu.ops import fused_decode as fd
from voicecraft_tpu.utils.quantize import _quantize_matrix


def _mk(B=1, D=256, F=1024, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, D)), dtype)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.05, dtype)
    b1 = jnp.asarray(rng.standard_normal((F,)) * 0.01, dtype)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.05, dtype)
    b2 = jnp.asarray(rng.standard_normal((D,)) * 0.01, dtype)
    return x, w1, b1, w2, b2


def _fused_interp(x, w1, b1, w2, b2, tile_f):
    # route pallas_call through the interpreter (no TPU in CI)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        return fd.fused_ffn(x, w1, b1, w2, b2, tile_f=tile_f)


def test_fused_ffn_matches_xla_dense():
    x, w1, b1, w2, b2 = _mk()
    want = fd.ffn_reference(x, w1, b1, w2, b2)
    got = _fused_interp(x, w1, b1, w2, b2, tile_f=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_ffn_matches_xla_fp8():
    x, w1, b1, w2, b2 = _mk(seed=3)
    q1, q2 = _quantize_matrix(w1), _quantize_matrix(w2)
    want = fd.ffn_reference(x, q1, b1, q2, b2)
    got = _fused_interp(x, q1, b1, q2, b2, tile_f=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_fused_ffn_batch_rows():
    x, w1, b1, w2, b2 = _mk(B=4, seed=5)
    want = fd.ffn_reference(x, w1, b1, w2, b2)
    got = _fused_interp(x, w1, b1, w2, b2, tile_f=512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_ffn_rejects_non_relu_models():
    """The Pallas fused FFN hard-codes relu; decode_step_fast must reject a
    model built with another activation with a clear error instead of a
    KeyError on the activation-encoded first-projection key."""
    import dataclasses
    from voicecraft_tpu.config import tiny_test
    from voicecraft_tpu.models import transformer as trm
    from voicecraft_tpu.models.voicecraft import init_params
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32",
                              ffn_activation="doubleswish")
    params = init_params(cfg, jax.random.PRNGKey(0))
    cache = trm.init_kv_cache(cfg.num_decoder_layers, 1, 32, cfg.nhead,
                              cfg.head_dim, jnp.float32)
    x_t = jnp.zeros((1, 1, cfg.d_model), jnp.float32)
    with pytest.raises(ValueError, match="relu"):
        trm.decode_step_fast(params["decoder"], x_t, cache,
                             jnp.asarray(4), cfg.nhead, fused_ffn=True)
