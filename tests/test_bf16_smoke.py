"""Production-dtype smoke: every decode path must RUN under bf16 compute.

The parity suite pins f32 (exact greedy equality); under bf16, argmax
tie-flips make exact cross-path comparisons physically meaningless at
random init (CLAUDE.md).  These tests assert the weaker production
contract instead: bf16 compute works end-to-end on each path, shapes are
sane, prompts are preserved, and same-seed reruns of the SAME path are
deterministic.
"""

import dataclasses

import numpy as np
import jax
import pytest

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models.voicecraft import SamplingConfig, init_params
from voicecraft_tpu.inference.tts import inference_tts, inference_tts_spec
from voicecraft_tpu.inference.serving import serve_tts_batch
from voicecraft_tpu.inference.engine import ContinuousBatcher


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(tiny_test(), n_mtp=2)   # bf16 default
    assert cfg.compute_dtype == "bfloat16"
    params = init_params(cfg, jax.random.PRNGKey(42))
    rng = np.random.default_rng(0)
    x = rng.integers(0, cfg.text_vocab_size, 10).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size,
                     (cfg.n_codebooks, 20)).astype(np.int32)
    scfg = SamplingConfig(top_k=10, top_p=0.9, temperature=1.0,
                          stop_repetition=3, silence_tokens=(5, 7))
    return cfg, params, x, y, scfg


def test_bf16_single_and_spec(setup):
    cfg, params, x, y, scfg = setup
    full, gen = inference_tts(params, cfg, x, y, scfg, seed=7)
    assert gen.shape[0] == cfg.n_codebooks and gen.shape[1] > 0
    np.testing.assert_array_equal(full[:, :y.shape[1]], y)
    full2, gen2 = inference_tts(params, cfg, x, y, scfg, seed=7)
    np.testing.assert_array_equal(gen, gen2)   # same-seed determinism

    fs, gs, st = inference_tts_spec(params, cfg, x, y, scfg, n_draft=3,
                                    seed=7, return_stats=True)
    assert gs.shape[0] == cfg.n_codebooks and st["passes"] >= 1
    np.testing.assert_array_equal(fs[:, :y.shape[1]], y)


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="CPU XLA lacks the bf16xbf16->f32 dot these paths emit "
           "(CLAUDE.md gotcha); runs on a real TPU backend")
def test_bf16_serving_and_engine_spec(setup):
    cfg, params, x, y, scfg = setup
    reqs = [(x, y), (x[:8].copy(), y[:, :16].copy())]
    outs = serve_tts_batch(params, cfg, reqs, scfg, seed=5, spec=3,
                           kv_dtype="float8_e4m3fn")
    for (f, g), (xi, yi) in zip(outs, reqs):
        np.testing.assert_array_equal(f[:, :yi.shape[1]], yi)
        assert g.shape[0] == cfg.n_codebooks

    eng = ContinuousBatcher(params, cfg, lanes=2, x_pad=32, y_pad=64,
                            gen_max=128, burst=16, scfg=scfg, seed=5,
                            spec=3, kv_dtype="float8_e4m3fn")
    ids = [eng.submit(xi, yi) for xi, yi in reqs]
    res = eng.run()
    for rid, (xi, yi) in zip(ids, reqs):
        f, g = res[rid]
        np.testing.assert_array_equal(f[:, :yi.shape[1]], yi)
        assert g.shape[0] == cfg.n_codebooks
