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


def test_pack_qkv_exactness_and_decode_parity():
    """Packed [D,3D] qkv quantization is column-exact vs separate matrices,
    and greedy decode with packed params matches unpacked fp8 params."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from voicecraft_tpu.config import tiny_test
    from voicecraft_tpu.models.voicecraft import init_params, SamplingConfig
    from voicecraft_tpu.inference.tts import inference_tts
    from voicecraft_tpu.utils.quantize import quantize_decoder_fp8

    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(11))
    qp = quantize_decoder_fp8(params)
    qpk = quantize_decoder_fp8(params, pack_qkv=True)

    a, ak = qp["decoder"]["layers"]["attn"], qpk["decoder"]["layers"]["attn"]
    D = params["decoder"]["layers"]["attn"]["wq"].shape[-1]
    np.testing.assert_array_equal(
        np.asarray(ak["wqkv"]["q"][..., :D]), np.asarray(a["wq"]["q"]))
    np.testing.assert_array_equal(
        np.asarray(ak["wqkv"]["q"][..., 2 * D:]), np.asarray(a["wv"]["q"]))
    np.testing.assert_array_equal(
        np.asarray(ak["wqkv"]["scale"][..., D:2 * D]),
        np.asarray(a["wk"]["scale"]))

    rng = np.random.default_rng(2)
    x = rng.integers(0, cfg.text_vocab_size, 9).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size, (4, 16)).astype(np.int32)
    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))
    full1, gen1 = inference_tts(qp, cfg, x, y, scfg, seed=0)
    full2, gen2 = inference_tts(qpk, cfg, x, y, scfg, seed=0)
    assert gen1.shape == gen2.shape
    np.testing.assert_array_equal(gen1, gen2)
