"""Best-of-N batched TTS decode tests."""

import dataclasses

import numpy as np
import jax

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models.voicecraft import init_params, SamplingConfig
from voicecraft_tpu.inference.tts import inference_tts, inference_tts_batch


def _setup():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(5))
    rng = np.random.default_rng(2)
    x = rng.integers(0, cfg.text_vocab_size, 10).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size, (cfg.n_codebooks, 24)).astype(np.int32)
    return cfg, params, x, y


def test_greedy_batch_equals_single():
    """With top_k=1 all rows follow the same trajectory; the batched result
    must equal the single-sample decode exactly."""
    cfg, params, x, y = _setup()
    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))
    _, gen1 = inference_tts(params, cfg, x, y, scfg, seed=0)
    _, genB = inference_tts_batch(params, cfg, x, y, scfg,
                                  batch_size=3, seed=0)
    assert genB.shape == gen1.shape, (genB.shape, gen1.shape)
    np.testing.assert_array_equal(genB, gen1)


def test_stochastic_batch_valid():
    cfg, params, x, y = _setup()
    scfg = SamplingConfig(top_k=20, top_p=0.95, temperature=1.0,
                          stop_repetition=3, silence_tokens=(5, 7))
    full, gen = inference_tts_batch(params, cfg, x, y, scfg,
                                    batch_size=4, seed=3)
    K = cfg.n_codebooks
    assert full.shape[0] == K and full.shape[1] == 24 + gen.shape[1]
    np.testing.assert_array_equal(full[:, :24], y)
    # generated tokens are real codec tokens (no special ids after unshift
    # except possibly none — unshift strips the cascade)
    assert gen.size == 0 or gen.max() < cfg.card
    # determinism
    _, gen2 = inference_tts_batch(params, cfg, x, y, scfg,
                                  batch_size=4, seed=3)
    np.testing.assert_array_equal(gen, gen2)
