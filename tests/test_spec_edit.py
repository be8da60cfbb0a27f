"""Speculative multi-span editing (make_spec_edit_loop).

The contract extends the TTS spec loop's to the editing mode: greedy
output token-identical to the plain editing decode loop (f32), including
span-transition feed passes (the two queued mask/empty embeddings ride a
tau-wide block with the write pointer advancing only 2 — the rewind
trick); sampled output is keyed per token index and invariant to tau.
"""

import dataclasses

import numpy as np
import jax
import pytest

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models.voicecraft import SamplingConfig, init_params
from voicecraft_tpu.inference.editing import inference_edit


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32", n_mtp=3)
    params = init_params(cfg, jax.random.PRNGKey(42))
    rng = np.random.default_rng(0)
    x = rng.integers(0, cfg.text_vocab_size, 12).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size,
                     (cfg.n_codebooks, 30)).astype(np.int32)
    return cfg, params, x, y


@pytest.mark.parametrize("ivs", [[(5, 12)], [(5, 12), (20, 25)]],
                         ids=["one-span", "two-spans"])
def test_spec_edit_greedy_matches_plain(setup, ivs):
    cfg, params, x, y = setup
    g = SamplingConfig(temperature=0.0, silence_tokens=())
    plain = inference_edit(params, cfg, x, y, ivs, g, seed=3)
    for tau in (2, 4):
        spec = inference_edit(params, cfg, x, y, ivs, g, seed=3, spec=tau)
        np.testing.assert_array_equal(spec, plain)
    # unedited regions preserved verbatim
    np.testing.assert_array_equal(plain[:, :ivs[0][0]], y[:, :ivs[0][0]])


def test_spec_edit_sampled_invariant_to_tau(setup):
    cfg, params, x, y = setup
    s = SamplingConfig(top_k=10, top_p=0.9, temperature=1.0,
                       silence_tokens=(5, 7))
    ivs = [(5, 12), (20, 25)]
    o2 = inference_edit(params, cfg, x, y, ivs, s, seed=3, spec=2)
    o4 = inference_edit(params, cfg, x, y, ivs, s, seed=3, spec=4)
    np.testing.assert_array_equal(o2, o4)


def test_spec_edit_requires_mtp_heads(setup):
    cfg, params, x, y = setup
    bare = {k: v for k, v in params.items() if k != "mtp_heads"}
    with pytest.raises(ValueError, match="mtp_heads"):
        inference_edit(bare, cfg, x, y, [(5, 12)], SamplingConfig(), spec=4)
    with pytest.raises(ValueError, match="n_mtp"):
        inference_edit(params, cfg, x, y, [(5, 12)], SamplingConfig(),
                       spec=5)
