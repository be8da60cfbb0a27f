"""Speculative multi-stream serving (make_spec_serving_loop).

The verification contract, per lane: greedy output must be token-identical
to the PLAIN serving loop (f32 compute — greedy ignores RNG, so the spec
path's per-token-index key schedule doesn't matter), and sampled output
must be invariant to the draft count tau (the key schedule is keyed on the
token index, so acceptance patterns cannot change the draw).

Each lane writes its accepted block at its own compact slab offset
(transformer.decode_step_multi_block scatter); these tests exercise lanes
of different prompt/text lengths so the per-lane offsets genuinely diverge.
"""

import dataclasses

import numpy as np
import jax
import pytest

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models.voicecraft import SamplingConfig, init_params
from voicecraft_tpu.inference.serving import serve_tts_batch


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32", n_mtp=3)
    params = init_params(cfg, jax.random.PRNGKey(42))
    rng = np.random.default_rng(0)
    reqs = []
    for b in range(2):
        x = rng.integers(0, cfg.text_vocab_size, 8 + 4 * b).astype(np.int32)
        y = rng.integers(0, cfg.audio_vocab_size,
                         (cfg.n_codebooks, 16 + 8 * b)).astype(np.int32)
        reqs.append((x, y))
    return cfg, params, reqs


def test_spec_serving_greedy_matches_plain(setup):
    cfg, params, reqs = setup
    g = SamplingConfig(temperature=0.0, silence_tokens=())
    plain = serve_tts_batch(params, cfg, reqs, g, seed=5)
    spec = serve_tts_batch(params, cfg, reqs, g, seed=5, spec=4)
    for (fp, gp), (fs, gs), (x, y) in zip(plain, spec, reqs):
        np.testing.assert_array_equal(gp, gs)
        np.testing.assert_array_equal(fp, fs)
        # prompt preserved verbatim at the head of full
        np.testing.assert_array_equal(fs[:, :y.shape[1]], y)


def test_spec_serving_sampled_invariant_to_tau(setup):
    cfg, params, reqs = setup
    s = SamplingConfig(top_k=10, top_p=0.9, temperature=1.0,
                       stop_repetition=3, silence_tokens=(5, 7))
    o2 = serve_tts_batch(params, cfg, reqs, s, seed=11, spec=2)
    o4 = serve_tts_batch(params, cfg, reqs, s, seed=11, spec=4)
    for (f2, g2), (f4, g4) in zip(o2, o4):
        np.testing.assert_array_equal(g2, g4)
        np.testing.assert_array_equal(f2, f4)


def test_spec_serving_requires_mtp_heads(setup):
    cfg, params, reqs = setup
    bare = {k: v for k, v in params.items() if k != "mtp_heads"}
    with pytest.raises(ValueError, match="mtp_heads"):
        serve_tts_batch(bare, cfg, reqs, SamplingConfig(), spec=4)
