"""Speculative multi-stream speech editing (make_spec_serving_edit_loop).

The contract composes the two tiers it unifies: per lane, greedy output is
token-identical to the PLAIN batched edit loop AND to the single-stream
inference_edit(spec=tau) (f32); sampled output is invariant to tau (keys
are per (lane seed, recorded-token index)).  Lanes with different span
schedules de-synchronise: one lane runs span-transition FEED passes while
another verifies drafts inside the same tau-block — the situation this
loop exists to handle.
"""

import dataclasses

import numpy as np
import jax
import pytest

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models.voicecraft import SamplingConfig, init_params
from voicecraft_tpu.inference.editing import inference_edit
from voicecraft_tpu.inference.serving import serve_edit_batch


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32", n_mtp=3)
    params = init_params(cfg, jax.random.PRNGKey(42))
    rng = np.random.default_rng(3)
    K = cfg.n_codebooks
    reqs = []
    # lane 0: one span; lane 1: two spans (feed passes desync it from the
    # others); lane 2: span near the end — three different schedules
    specs = [(20, [(5, 9)]),
             (34, [(4, 8), (16, 22)]),
             (26, [(18, 24)])]
    for b, (T, intervals) in enumerate(specs):
        x = rng.integers(0, cfg.text_vocab_size, 9 + 3 * b).astype(np.int32)
        y = rng.integers(0, cfg.audio_vocab_size, (K, T)).astype(np.int32)
        reqs.append((x, y, intervals))
    return cfg, params, reqs


def test_spec_edit_serving_greedy_matches_plain_and_single(setup):
    cfg, params, reqs = setup
    g = SamplingConfig(top_k=1, silence_tokens=(5, 7))
    plain = serve_edit_batch(params, cfg, reqs, g, seed=0)
    stats: dict = {}
    spec = serve_edit_batch(params, cfg, reqs, g, seed=0, spec=4,
                            stats=stats)
    assert stats["spec"] == 4 and stats["tok_per_pass"] is not None
    for b, ((x, y, ivs), p, s) in enumerate(zip(reqs, plain, spec)):
        np.testing.assert_array_equal(s, p, err_msg=f"lane {b} vs plain")
        single = inference_edit(params, cfg, x, y, ivs, g, seed=0, spec=4)
        np.testing.assert_array_equal(s, single,
                                      err_msg=f"lane {b} vs single spec")


def test_spec_edit_serving_sampled_invariant_to_tau(setup):
    cfg, params, reqs = setup
    s = SamplingConfig(top_k=10, top_p=0.9, temperature=1.0,
                       stop_repetition=3, silence_tokens=(5, 7))
    o2 = serve_edit_batch(params, cfg, reqs, s, seed=11, spec=2)
    o4 = serve_edit_batch(params, cfg, reqs, s, seed=11, spec=4)
    for b, c in zip(o2, o4):
        np.testing.assert_array_equal(b, c)


def test_spec_edit_serving_preserves_unedited_frames(setup):
    cfg, params, reqs = setup
    s = SamplingConfig(top_k=10, top_p=0.9, temperature=1.0,
                       silence_tokens=(5, 7))
    outs = serve_edit_batch(params, cfg, reqs, s, seed=7, spec=4)
    for (x, y, intervals), res in zip(reqs, outs):
        iv = sorted(intervals)
        np.testing.assert_array_equal(res[:, :iv[0][0]], y[:, :iv[0][0]])
        tail = y.shape[1] - iv[-1][1]
        if tail:
            np.testing.assert_array_equal(res[:, -tail:], y[:, -tail:])


def test_spec_edit_serving_stochastic_smoke(setup):
    """Stochastic verification composes per-lane: the wave completes and
    unedited frames are untouched (distribution-exactness is pinned by
    test_spec_stochastic.py on the shared core)."""
    cfg, params, reqs = setup
    s = SamplingConfig(top_k=10, top_p=0.9, temperature=1.0,
                       silence_tokens=(5, 7), spec_sampling="stochastic")
    outs = serve_edit_batch(params, cfg, reqs, s, seed=13, spec=4)
    for (x, y, intervals), res in zip(reqs, outs):
        iv = sorted(intervals)
        assert res.shape[0] == cfg.n_codebooks
        np.testing.assert_array_equal(res[:, :iv[0][0]], y[:, :iv[0][0]])


def test_spec_edit_serving_per_lane_seeds(setup):
    cfg, params, reqs = setup
    s = SamplingConfig(top_k=10, top_p=0.9, temperature=1.0,
                       silence_tokens=(5, 7))
    a = serve_edit_batch(params, cfg, [reqs[0], reqs[1]], s, seeds=[3, 9],
                         spec=2)
    b = serve_edit_batch(params, cfg, [reqs[0], reqs[2]], s, seeds=[3, 4],
                         spec=2)
    np.testing.assert_array_equal(a[0], b[0])


def test_spec_edit_serving_requires_mtp_heads(setup):
    cfg, params, reqs = setup
    bare = {k: v for k, v in params.items() if k != "mtp_heads"}
    with pytest.raises(ValueError, match="mtp_heads"):
        serve_edit_batch(bare, cfg, reqs, SamplingConfig(), spec=4)
