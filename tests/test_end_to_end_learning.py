"""The full-loop test: train until a continuation is memorised, then greedy
TTS must reproduce it token-for-token.

This exercises training composition, the loss/target alignment, ScaledAdam,
and the KV-slab decode loop *against each other* — if any of them were
misaligned (off-by-one targets, wrong eog handling, cache corruption), the
decoded tokens could not match the trained continuation.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.data import spans
from voicecraft_tpu.models import voicecraft as vc
from voicecraft_tpu.training.optim import scaled_adam
from voicecraft_tpu.training.step import make_train_step
from voicecraft_tpu.inference.tts import inference_tts
from voicecraft_tpu.models.voicecraft import SamplingConfig


@pytest.mark.parametrize("toolbox", [{}, {"norm": "basicnorm",
                                         "ffn_activation": "doubleswish"}],
                         ids=["layernorm_relu", "basicnorm_doubleswish"])
def test_memorize_and_decode(toolbox):
    """The toolbox variant additionally proves the icefall norm/activation
    family (models/scaling.py) trains end-to-end: BasicNorm's learnable eps
    and DoubleSwish's custom-vjp derivative sit inside ScaledAdam + the
    jitted train step, and decode dispatch matches training."""
    cfg = dataclasses.replace(
        tiny_test(), compute_dtype="float32", d_model=128,
        audio_embedding_dim=128, num_decoder_layers=2, nhead=4, **toolbox)
    rng = np.random.default_rng(0)
    K = cfg.n_codebooks

    # T_cont must exceed the TTS min-length guard (eog banned for the first
    # encodec_sr//5 = 10 steps, reference voicecraft.py:1024-1025)
    T_prompt, T_cont = 12, 16
    x = rng.integers(0, cfg.text_vocab_size, 8).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size,
                     (K, T_prompt + T_cont)).astype(np.int32)

    # train on the exact delayed layout TTS decode produces: one segment,
    # no mask spans — delayed(prompt ++ continuation ++ eog).  (The default
    # multi-span layout inserts [eog, mask] between prompt and continuation,
    # which TTS decode does not — that mismatch is the reference's known
    # "early stopping issue", config.py:58.)
    seg = np.concatenate([y, np.full((K, 1), cfg.eog, np.int32)], axis=1)
    tokens = spans._delayed_np(seg, cfg.empty_token)        # [K, T+1+K]
    from voicecraft_tpu.ops.patterns import real_token_mask
    real = real_token_mask(seg.shape[1], K, tokens.shape[1])
    S = tokens.shape[1]
    # decode-faithfulness quirk (reference voicecraft.py:1037-1039, kept for
    # parity): the first K-1 generated columns have rows q > step forced to
    # empty_token, clobbering the delayed prompt-tail tokens.  Mirror that in
    # the training grid so the memoriser sees exactly what decode will feed.
    P = T_prompt + 1  # TTS prefix length (delayed prompt cut, +1 lead col)
    for j in range(K - 1):
        for q in range(j + 1, K):
            tokens[q, P + j] = cfg.empty_token
            real[q, P + j] = False
    batch = vc.TrainBatch(
        jnp.asarray(x[None]), jnp.asarray([len(x)]),
        jnp.asarray(tokens[None]), jnp.asarray([S]),
        jnp.asarray(np.full((1, S), -1, np.int32)),
        jnp.asarray(spans.target_valid_from_real(real)[None]))

    params = vc.init_params(cfg, jax.random.PRNGKey(3))
    tx = scaled_adam(lr=0.03, clipping_scale=None)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, remat=False)

    key = jax.random.PRNGKey(0)
    loss = None
    for i in range(300):
        params, opt_state, m = step(params, opt_state, batch,
                                    jax.random.fold_in(key, i))
        if i % 100 == 99:
            loss = float(m["loss"]) / float(m["effective_ntoken"])
    assert loss is not None and loss < 0.1, f"did not memorise: loss {loss}"

    # greedy TTS from the prompt must reproduce the memorised continuation
    scfg = SamplingConfig(temperature=0.0, silence_tokens=())
    full, gen = inference_tts(params, cfg, x, y[:, :T_prompt], scfg, seed=0)
    assert gen.shape == (K, T_cont), (gen.shape, (K, T_cont))
    np.testing.assert_array_equal(gen, y[:, T_prompt:])
