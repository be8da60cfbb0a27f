"""Multi-stream serving decode: each lane must match the single-sample
decode of the same request exactly (greedy)."""

import dataclasses

import numpy as np
import jax

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models.voicecraft import init_params, SamplingConfig
from voicecraft_tpu.inference.tts import inference_tts
from voicecraft_tpu.inference.serving import serve_tts_batch


def test_serving_lanes_match_single_greedy():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(4)
    K = cfg.n_codebooks
    reqs = []
    for b in range(3):
        x = rng.integers(0, cfg.text_vocab_size, 8 + 3 * b).astype(np.int32)
        y = rng.integers(0, cfg.audio_vocab_size, (K, 15 + 7 * b)).astype(np.int32)
        reqs.append((x, y))

    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))
    batch_out = serve_tts_batch(params, cfg, reqs, scfg, seed=0)

    for b, (x, y) in enumerate(reqs):
        full1, gen1 = inference_tts(params, cfg, x, y, scfg, seed=0)
        fullB, genB = batch_out[b]
        assert genB.shape == gen1.shape, (b, genB.shape, gen1.shape)
        np.testing.assert_array_equal(genB, gen1, err_msg=f"lane {b}")
        np.testing.assert_array_equal(fullB[:, :y.shape[1]], y)


def test_serving_special_first_matches_single():
    """special_first=1: the model samples in the +n_special space; the
    result assembly must unshift gen and leave the raw prompt untouched."""
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32",
                              special_first=1)
    params = init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(11)
    K = cfg.n_codebooks
    reqs = []
    for b in range(2):
        x = rng.integers(0, cfg.text_vocab_size, 8 + 3 * b).astype(np.int32)
        y = rng.integers(0, cfg.audio_vocab_size - cfg.n_special,
                         (K, 15 + 7 * b)).astype(np.int32)
        reqs.append((x, y))

    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))
    batch_out = serve_tts_batch(params, cfg, reqs, scfg, seed=0)
    for b, (x, y) in enumerate(reqs):
        full1, gen1 = inference_tts(params, cfg, x, y, scfg, seed=0)
        fullB, genB = batch_out[b]
        np.testing.assert_array_equal(genB, gen1, err_msg=f"lane {b}")
        np.testing.assert_array_equal(fullB[:, :y.shape[1]], y)
        np.testing.assert_array_equal(fullB, full1, err_msg=f"lane {b}")


def test_serving_stochastic_independent_lanes():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(5)
    K = cfg.n_codebooks
    x = rng.integers(0, cfg.text_vocab_size, 10).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size, (K, 20)).astype(np.int32)
    # identical requests in different lanes draw independent samples
    scfg = SamplingConfig(top_k=20, temperature=1.0, silence_tokens=(5, 7))
    out = serve_tts_batch(params, cfg, [(x, y), (x, y)], scfg, seed=9)
    g0, g1 = out[0][1], out[1][1]
    assert g0.shape != g1.shape or not np.array_equal(g0, g1)


def test_serving_fp8_kv_cache_runs():
    """kv_dtype='float8_e4m3fn': serving decodes stay deterministic and
    well-formed with the slab stored in fp8."""
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(4)
    K = cfg.n_codebooks
    x = rng.integers(0, cfg.text_vocab_size, 9).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size, (K, 18)).astype(np.int32)
    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))
    out1 = serve_tts_batch(params, cfg, [(x, y)], scfg, seed=0,
                           kv_dtype="float8_e4m3fn")
    out2 = serve_tts_batch(params, cfg, [(x, y)], scfg, seed=0,
                           kv_dtype="float8_e4m3fn")
    full, gen = out1[0]
    np.testing.assert_array_equal(gen, out2[0][1])
    np.testing.assert_array_equal(full[:, :y.shape[1]], y)
    assert gen.shape[0] == K and (gen >= 0).all() and (gen < cfg.card).all()


def test_serving_per_request_seeds():
    """A wave can mix per-request seeds: each lane's stream is keyed on
    its OWN seed (fold_in(PRNGKey(seed_b), b)), so changing one request's
    seed changes only that request's draw, deterministically."""
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(6)
    K = cfg.n_codebooks
    x = rng.integers(0, cfg.text_vocab_size, 10).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size, (K, 20)).astype(np.int32)
    reqs = [(x, y), (x, y)]
    scfg = SamplingConfig(top_k=20, temperature=1.0, silence_tokens=(5, 7))

    a = serve_tts_batch(params, cfg, reqs, scfg, seeds=[3, 5])
    b = serve_tts_batch(params, cfg, reqs, scfg, seeds=[3, 9])
    # lane 0 kept its seed -> identical draw; lane 1 changed -> different
    np.testing.assert_array_equal(a[0][1], b[0][1])
    g1a, g1b = a[1][1], b[1][1]
    assert g1a.shape != g1b.shape or not np.array_equal(g1a, g1b)
    # full determinism for an identical wave
    c = serve_tts_batch(params, cfg, reqs, scfg, seeds=[3, 5])
    np.testing.assert_array_equal(a[1][1], c[1][1])
