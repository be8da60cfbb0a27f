"""Continuous-batching engine: greedy per-request outputs must match the
single-sample decode, including requests admitted mid-flight into freed
lanes."""

import dataclasses

import numpy as np
import jax

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models.voicecraft import init_params, SamplingConfig
from voicecraft_tpu.inference.tts import inference_tts
from voicecraft_tpu.inference.engine import ContinuousBatcher


def test_engine_matches_single_with_refill():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(6)
    K = cfg.n_codebooks
    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))

    # 5 requests of varying length into 2 lanes -> at least 3 refills
    reqs = []
    for i in range(5):
        x = rng.integers(0, cfg.text_vocab_size, 6 + 2 * i).astype(np.int32)
        y = rng.integers(0, cfg.audio_vocab_size,
                         (K, 12 + 5 * i)).astype(np.int32)
        reqs.append((x, y))

    eng = ContinuousBatcher(params, cfg, lanes=2, x_pad=32, y_pad=64,
                            gen_max=256, burst=16, scfg=scfg, seed=0)
    ids = [eng.submit(x, y) for x, y in reqs]
    results = eng.run()
    assert set(results) == set(ids)

    for rid, (x, y) in zip(ids, reqs):
        full1, gen1 = inference_tts(params, cfg, x, y, scfg, seed=0)
        fullE, genE = results[rid]
        assert genE.shape == gen1.shape, (rid, genE.shape, gen1.shape)
        np.testing.assert_array_equal(genE, gen1, err_msg=f"req {rid}")
        np.testing.assert_array_equal(fullE[:, :y.shape[1]], y)


def test_engine_special_first():
    """special_first=1 checkpoints: _retire must unshift gen before
    concatenating so the prompt segment of ``full`` is the raw y."""
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32",
                              special_first=1)
    params = init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(13)
    K = cfg.n_codebooks
    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))
    x = rng.integers(0, cfg.text_vocab_size, 8).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size - cfg.n_special,
                     (K, 14)).astype(np.int32)

    eng = ContinuousBatcher(params, cfg, lanes=2, x_pad=32, y_pad=64,
                            gen_max=256, burst=16, scfg=scfg, seed=0)
    rid = eng.submit(x, y)
    results = eng.run()
    full1, gen1 = inference_tts(params, cfg, x, y, scfg, seed=0)
    fullE, genE = results[rid]
    np.testing.assert_array_equal(genE, gen1)
    np.testing.assert_array_equal(fullE, full1)
    np.testing.assert_array_equal(fullE[:, :y.shape[1]], y)


def test_engine_fp8_kv_cache():
    """fp8 KV slab: outputs stay well-formed and deterministic; greedy codes
    should agree with the exact decode at a high rate (fp8 only perturbs
    attention over the cached prompt)."""
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(6)
    K = cfg.n_codebooks
    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))
    reqs = []
    for i in range(3):
        x = rng.integers(0, cfg.text_vocab_size, 6 + 2 * i).astype(np.int32)
        y = rng.integers(0, cfg.audio_vocab_size, (K, 12 + 5 * i)).astype(np.int32)
        reqs.append((x, y))

    def run_engine():
        eng = ContinuousBatcher(params, cfg, lanes=2, x_pad=32, y_pad=64,
                                gen_max=256, burst=16, scfg=scfg, seed=0,
                                kv_dtype="float8_e4m3fn")
        ids = [eng.submit(x, y) for x, y in reqs]
        return ids, eng.run()

    ids, results = run_engine()
    ids2, results2 = run_engine()
    assert set(results) == set(ids)
    for rid, rid2, (x, y) in zip(ids, ids2, reqs):
        fullE, genE = results[rid]
        # deterministic across runs
        np.testing.assert_array_equal(genE, results2[rid2][1])
        # prompt untouched, gen in the unshifted space, plausible length
        np.testing.assert_array_equal(fullE[:, :y.shape[1]], y)
        assert genE.shape[0] == K and 0 <= genE.shape[1] < 256
        assert (genE < cfg.card).all() and (genE >= 0).all()

    # fp8 KV perturbs only the attention reads: after one burst the logits
    # must stay close to the exact-cache engine's (token-level agreement is
    # meaningless at random init where greedy margins are ~1e-3)
    lane_logits = {}
    for kv in (None, "float8_e4m3fn"):
        eng = ContinuousBatcher(params, cfg, lanes=1, x_pad=32, y_pad=64,
                                gen_max=256, burst=8, scfg=scfg, seed=0,
                                kv_dtype=kv)
        eng.submit(*reqs[0])
        eng._admit()
        eng._cache, eng._lanes, eng._gen_buf, _ = eng._burst_fn(
            eng.params, eng._cache, eng._lanes, eng._gen_buf,
            jax.numpy.asarray(1, jax.numpy.int32))
        lane_logits[kv] = np.asarray(eng._lanes.logits[0])
    ref, fp8 = lane_logits[None], lane_logits["float8_e4m3fn"]
    denom = np.maximum(np.abs(ref).max(), 1e-6)
    rel = np.abs(fp8 - ref).max() / denom
    assert rel < 0.25, f"fp8 KV logits far from exact: rel {rel:.3f}"
    assert rel > 0, "fp8 path identical to exact — kv_dtype not applied?"
