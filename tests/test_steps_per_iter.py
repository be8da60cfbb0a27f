"""Multi-step decode-loop body (steps_per_iter) must be output-identical.

make_decode_loop(steps_per_iter=k) runs k gated decode sub-steps per
while-loop iteration; sub-steps after `done` (or past the gen_max budget)
still run the forward but freeze all bookkeeping state and write only to
the frozen next-free slab slot, which key validity (j < pos) never reads.
Token output must therefore match the k=1 loop exactly (f32 compute — the
usual bf16 tie-flip caveat applies otherwise).

Measured perf-neutral on TPU (PERF.md negative results) — this test exists
so the machinery stays correct, not because it is a speed lever.
"""

import dataclasses

import numpy as np
import jax
import pytest

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.data import spans
from voicecraft_tpu.models.voicecraft import SamplingConfig, init_params
from voicecraft_tpu.inference.tts import inference_tts, run_decode


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(42))
    x = np.random.default_rng(0).integers(
        0, cfg.text_vocab_size, 12).astype(np.int32)
    y = np.random.default_rng(1).integers(
        0, cfg.audio_vocab_size, (cfg.n_codebooks, 30)).astype(np.int32)
    return cfg, params, x, y


@pytest.mark.parametrize("scfg", [
    SamplingConfig(temperature=0.0, silence_tokens=()),
    SamplingConfig(top_k=10, top_p=0.9, temperature=1.0,
                   stop_repetition=3, silence_tokens=(5, 7)),
], ids=["greedy", "sampled"])
def test_tts_identical_across_k(setup, scfg):
    cfg, params, x, y = setup
    full1, gen1 = inference_tts(params, cfg, x, y, scfg, seed=7,
                                steps_per_iter=1)
    for k in (2, 4):
        fullk, genk = inference_tts(params, cfg, x, y, scfg, seed=7,
                                    steps_per_iter=k)
        np.testing.assert_array_equal(gen1, genk)
        np.testing.assert_array_equal(full1, fullk)


def test_multi_span_edit_identical_across_k(setup):
    """Queue-feed (span transition) steps must stay correct inside a
    grouped body, including when a transition lands mid-group."""
    cfg, params, x, y = setup
    scfg = SamplingConfig(top_k=10, top_p=0.9, temperature=1.0,
                          silence_tokens=(5, 7))
    prefix, queue_ids = spans.compose_edit_prefix(y, [(5, 12), (20, 25)], cfg)
    outs = {}
    for k in (1, 3):
        outs[k] = run_decode(params, cfg, is_tts=False, x_tokens=x,
                             prefix=prefix, queue_mask_ids=queue_ids,
                             n_spans=2, scfg=scfg, seed=3, steps_per_iter=k)
    assert len(outs[1]) == len(outs[3]) == 2
    for a, b in zip(outs[1], outs[3]):
        np.testing.assert_array_equal(a, b)
