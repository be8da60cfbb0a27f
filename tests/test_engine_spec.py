"""Speculative continuous batching (engine.make_spec_burst_fn).

The verification contract carries over from spec serving: greedy output
per request must be token-identical to the PLAIN engine and to
single-stream decode (f32 compute), including through mid-flight lane
refill — acceptance patterns, lane placement, and draft count must be
invisible in the tokens.
"""

import dataclasses

import numpy as np
import jax
import pytest

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models.voicecraft import SamplingConfig, init_params
from voicecraft_tpu.inference.engine import ContinuousBatcher
from voicecraft_tpu.inference.tts import inference_tts


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32", n_mtp=3)
    params = init_params(cfg, jax.random.PRNGKey(42))
    rng = np.random.default_rng(0)
    reqs = [(rng.integers(0, cfg.text_vocab_size, 8 + b).astype(np.int32),
             rng.integers(0, cfg.audio_vocab_size,
                          (cfg.n_codebooks, 14 + 4 * b)).astype(np.int32))
            for b in range(4)]
    return cfg, params, reqs


def test_spec_engine_greedy_matches_plain_and_single(setup):
    """4 requests over 2 lanes (forces refill), tau=4."""
    cfg, params, reqs = setup
    g = SamplingConfig(temperature=0.0, silence_tokens=())

    eng_s = ContinuousBatcher(params, cfg, lanes=2, x_pad=32, y_pad=64,
                              gen_max=128, burst=16, scfg=g, seed=3, spec=4)
    ids_s = [eng_s.submit(x, y) for x, y in reqs]
    res_s = eng_s.run()

    eng_p = ContinuousBatcher(params, cfg, lanes=2, x_pad=32, y_pad=64,
                              gen_max=128, burst=16, scfg=g, seed=3)
    ids_p = [eng_p.submit(x, y) for x, y in reqs]
    res_p = eng_p.run()

    for rid_s, rid_p, (x, y) in zip(ids_s, ids_p, reqs):
        np.testing.assert_array_equal(res_s[rid_s][1], res_p[rid_p][1])
        np.testing.assert_array_equal(res_s[rid_s][0], res_p[rid_p][0])
        _, g1 = inference_tts(params, cfg, x, y, g, seed=0)
        np.testing.assert_array_equal(res_s[rid_s][1], g1)


def test_spec_engine_sampled_invariant_to_tau_and_lanes(setup):
    """Sampled output keys RNG on (request id, token index): identical for
    any draft count AND any lane count / admission order."""
    cfg, params, reqs = setup
    s = SamplingConfig(top_k=10, top_p=0.9, temperature=1.0,
                       stop_repetition=3, silence_tokens=(5, 7))
    outs = []
    for spec, lanes in ((2, 2), (4, 2), (4, 3)):
        eng = ContinuousBatcher(params, cfg, lanes=lanes, x_pad=32, y_pad=64,
                                gen_max=128, burst=16, scfg=s, seed=3,
                                spec=spec)
        ids = [eng.submit(x, y) for x, y in reqs]
        res = eng.run()
        outs.append([res[r][1] for r in ids])
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(outs[0], outs[2]):
        np.testing.assert_array_equal(a, b)


def test_spec_engine_requires_mtp_heads(setup):
    cfg, params, reqs = setup
    bare = {k: v for k, v in params.items() if k != "mtp_heads"}
    with pytest.raises(ValueError, match="mtp_heads"):
        ContinuousBatcher(bare, cfg, lanes=2, spec=4)


def test_spec_engine_gen_max_cap_matches_plain(setup):
    """Lanes that hit the gen_max cap (no eog) must retire with the SAME
    rows in both modes — regression for the off-by-one that leaked one
    unverified draft row into capped spec results."""
    cfg, params, reqs = setup
    g = SamplingConfig(temperature=0.0, silence_tokens=())
    # long text => forced-eog point far beyond gen_max => cap triggers
    rng = np.random.default_rng(9)
    x = rng.integers(0, cfg.text_vocab_size, 24).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size,
                     (cfg.n_codebooks, 16)).astype(np.int32)
    outs = {}
    for spec in (0, 4):
        eng = ContinuousBatcher(params, cfg, lanes=1, x_pad=32, y_pad=64,
                                gen_max=32, burst=8, scfg=g, seed=3,
                                spec=spec)
        rid = eng.submit(x, y)
        outs[spec] = eng.run()[rid]
    np.testing.assert_array_equal(outs[0][1], outs[4][1])
    np.testing.assert_array_equal(outs[0][0], outs[4][0])


def test_spec_rejects_too_few_mtp_heads(setup):
    """tau-1 beyond the checkpoint's n_mtp must raise, not silently
    broadcast one head's drafts across the missing offsets."""
    cfg, params, reqs = setup          # n_mtp == 3
    with pytest.raises(ValueError, match="n_mtp"):
        ContinuousBatcher(params, cfg, lanes=2, spec=5)
    from voicecraft_tpu.inference.serving import serve_tts_batch
    with pytest.raises(ValueError, match="n_mtp"):
        serve_tts_batch(params, cfg, reqs[:2], SamplingConfig(), spec=5)
    from voicecraft_tpu.inference.tts import inference_tts_spec
    with pytest.raises(ValueError, match="n_mtp"):
        inference_tts_spec(params, cfg, reqs[0][0], reqs[0][1],
                           SamplingConfig(), n_draft=5)


def test_spec_engine_special_first():
    """special_first=1 checkpoints through the SPEC engine and spec
    serving: prompt segment of ``full`` must be the raw y and greedy
    tokens must match single-stream decode."""
    from voicecraft_tpu.inference.serving import serve_tts_batch
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32",
                              special_first=1, n_mtp=3)
    params = init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(13)
    K = cfg.n_codebooks
    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))
    x = rng.integers(0, cfg.text_vocab_size, 8).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size - cfg.n_special,
                     (K, 14)).astype(np.int32)
    full1, gen1 = inference_tts(params, cfg, x, y, scfg, seed=0)

    eng = ContinuousBatcher(params, cfg, lanes=2, x_pad=32, y_pad=64,
                            gen_max=256, burst=16, scfg=scfg, seed=0,
                            spec=4)
    rid = eng.submit(x, y)
    fullE, genE = eng.run()[rid]
    np.testing.assert_array_equal(genE, gen1)
    np.testing.assert_array_equal(fullE, full1)
    np.testing.assert_array_equal(fullE[:, :y.shape[1]], y)

    (fullS, genS), = serve_tts_batch(params, cfg, [(x, y)], scfg, seed=0,
                                     spec=4)
    np.testing.assert_array_equal(genS, gen1)
    np.testing.assert_array_equal(fullS[:, :y.shape[1]], y)
