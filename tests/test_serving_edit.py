"""Multi-stream speech-editing serving (serve_edit_batch): each lane must
match the single-sample edit decode of the same request exactly (greedy,
f32), including multi-span requests whose feed schedules de-synchronise the
lanes, and unedited frames must be preserved verbatim."""

import dataclasses

import numpy as np
import jax
import pytest

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models.voicecraft import init_params, SamplingConfig
from voicecraft_tpu.inference.editing import inference_edit
from voicecraft_tpu.inference.serving import serve_edit_batch


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(3)
    K = cfg.n_codebooks
    reqs = []
    # lane 0: one span; lane 1: two spans (different lengths); lane 2:
    # span reaching near the end — three genuinely different schedules
    specs = [(20, [(5, 9)]),
             (34, [(4, 8), (16, 22)]),
             (26, [(18, 24)])]
    for b, (T, intervals) in enumerate(specs):
        x = rng.integers(0, cfg.text_vocab_size, 9 + 3 * b).astype(np.int32)
        y = rng.integers(0, cfg.audio_vocab_size, (K, T)).astype(np.int32)
        reqs.append((x, y, intervals))
    return cfg, params, reqs


def test_edit_serving_lanes_match_single_greedy(setup):
    cfg, params, reqs = setup
    g = SamplingConfig(top_k=1, silence_tokens=(5, 7))
    outs = serve_edit_batch(params, cfg, reqs, g, seed=0)
    assert len(outs) == len(reqs)
    for b, (x, y, intervals) in enumerate(reqs):
        single = inference_edit(params, cfg, x, y, intervals, g, seed=0)
        np.testing.assert_array_equal(outs[b], single, err_msg=f"lane {b}")


def test_edit_serving_preserves_unedited_frames(setup):
    cfg, params, reqs = setup
    s = SamplingConfig(top_k=10, top_p=0.9, temperature=1.0,
                       stop_repetition=3, silence_tokens=(5, 7))
    stats: dict = {}
    outs = serve_edit_batch(params, cfg, reqs, s, seed=11, stats=stats)
    assert stats["frames"] > 0 and stats["seconds"] > 0
    for (x, y, intervals), res in zip(reqs, outs):
        iv = sorted(intervals)
        y_len = y.shape[1]
        starts = [a for a, _ in iv]
        ends = [e for _, e in iv]
        # head segment verbatim
        np.testing.assert_array_equal(res[:, :starts[0]], y[:, :starts[0]])
        # tail segment verbatim
        tail = y_len - ends[-1]
        if tail:
            np.testing.assert_array_equal(res[:, -tail:], y[:, -tail:])


def test_edit_serving_special_first(setup):
    """special_first: the loop samples in the +n_special space; the splice
    must return raw-space codes with unedited frames untouched."""
    cfg, params, _ = setup
    cfg2 = dataclasses.replace(cfg, special_first=1)
    params2 = init_params(cfg2, jax.random.PRNGKey(7))
    rng = np.random.default_rng(5)
    K = cfg2.n_codebooks
    reqs = []
    for b in range(2):
        x = rng.integers(0, cfg2.text_vocab_size, 8 + 3 * b).astype(np.int32)
        y = rng.integers(0, cfg2.audio_vocab_size - cfg2.n_special,
                         (K, 20 + 6 * b)).astype(np.int32)
        reqs.append((x, y, [(6, 11)]))
    g = SamplingConfig(top_k=1, silence_tokens=(5, 7))
    outs = serve_edit_batch(params2, cfg2, reqs, g, seed=0)
    for (x, y, intervals), res in zip(reqs, outs):
        single = inference_edit(params2, cfg2, x, y, intervals, g, seed=0)
        np.testing.assert_array_equal(res, single)
        np.testing.assert_array_equal(res[:, :6], y[:, :6])


def test_edit_serving_per_lane_seeds(setup):
    """Mixed per-request seeds in one wave: each lane's draw must depend
    only on its own seed (same request, same seed -> same output across
    waves with different partners)."""
    cfg, params, reqs = setup
    s = SamplingConfig(top_k=10, top_p=0.9, temperature=1.0,
                       silence_tokens=(5, 7))
    a = serve_edit_batch(params, cfg, [reqs[0], reqs[1]], s, seeds=[3, 9])
    b = serve_edit_batch(params, cfg, [reqs[0], reqs[2]], s, seeds=[3, 4])
    np.testing.assert_array_equal(a[0], b[0])
