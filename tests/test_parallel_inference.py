"""Sharded inference: the decode loop under a ('data','model') mesh with
tensor-parallel params must reproduce the single-device greedy output.

This is the multi-chip serving path: batch-1 decode is weight-read-bound, so
TP over the model axis divides per-chip bytes (latency scales with chips).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models.voicecraft import init_params, SamplingConfig
from voicecraft_tpu.inference.tts import inference_tts
from voicecraft_tpu.parallel.mesh import make_mesh, shard_params


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_decode_matches_single():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(11))
    rng = np.random.default_rng(3)
    x = rng.integers(0, cfg.text_vocab_size, 9).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size,
                     (cfg.n_codebooks, 20)).astype(np.int32)
    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))

    full1, gen1 = inference_tts(params, cfg, x, y, scfg, seed=0)

    mesh = make_mesh(2, 4)   # dp=2, tp=4
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        # fresh geometry key so the decode loop recompiles under the mesh
        full2, gen2 = inference_tts(sharded, cfg, x, y, scfg, seed=0,
                                    gen_max=256 + 128)

    assert gen2.shape == gen1.shape, (gen2.shape, gen1.shape)
    np.testing.assert_array_equal(gen2, gen1)
    np.testing.assert_array_equal(full2, full1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_serving_matches_single():
    from voicecraft_tpu.inference.serving import serve_tts_batch
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(11))
    rng = np.random.default_rng(4)
    reqs = []
    for b in range(2):
        x = rng.integers(0, cfg.text_vocab_size, 8 + b).astype(np.int32)
        yy = rng.integers(0, cfg.audio_vocab_size,
                          (cfg.n_codebooks, 14 + 6 * b)).astype(np.int32)
        reqs.append((x, yy))
    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))

    singles = [inference_tts(params, cfg, x, y, scfg, seed=0)
               for x, y in reqs]

    mesh = make_mesh(4, 2)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        outs = serve_tts_batch(sharded, cfg, reqs, scfg, seed=0,
                               pads=(32, 64, 256))

    for (f1, g1), (f2, g2) in zip(singles, outs):
        np.testing.assert_array_equal(g1, g2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_lane_sharded_serving_matches_unsharded():
    """Scale-out serving: lanes committed to P('data') over a (4,2) mesh
    (each data group decodes its own lanes; params also TP over 'model')
    must reproduce the unsharded serve_tts_batch outputs."""
    from voicecraft_tpu.inference.serving import serve_tts_batch
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(11))
    rng = np.random.default_rng(5)
    reqs = []
    for b in range(4):
        x = rng.integers(0, cfg.text_vocab_size, 8 + b).astype(np.int32)
        yy = rng.integers(0, cfg.audio_vocab_size,
                          (cfg.n_codebooks, 14 + 4 * b)).astype(np.int32)
        reqs.append((x, yy))
    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))
    pads = (32, 64, 256)

    base = serve_tts_batch(params, cfg, reqs, scfg, seed=0, pads=pads)

    mesh = make_mesh(4, 2)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        outs = serve_tts_batch(sharded, cfg, reqs, scfg, seed=0, pads=pads,
                               mesh=mesh)
    for (f1, g1), (f2, g2) in zip(base, outs):
        np.testing.assert_array_equal(g1, g2)
        np.testing.assert_array_equal(f1, f2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_lane_sharded_spec_serving_matches_unsharded():
    """Speculative serving under the mesh: per-lane scatter writes and the
    MTP verify loop must survive GSPMD lane sharding unchanged."""
    from voicecraft_tpu.inference.serving import serve_tts_batch
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32", n_mtp=2)
    params = init_params(cfg, jax.random.PRNGKey(11))
    rng = np.random.default_rng(6)
    reqs = []
    for b in range(4):
        x = rng.integers(0, cfg.text_vocab_size, 8 + b).astype(np.int32)
        yy = rng.integers(0, cfg.audio_vocab_size,
                          (cfg.n_codebooks, 14 + 4 * b)).astype(np.int32)
        reqs.append((x, yy))
    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))
    pads = (32, 64, 256)

    base = serve_tts_batch(params, cfg, reqs, scfg, seed=0, pads=pads,
                           spec=3)

    mesh = make_mesh(4, 2)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        outs = serve_tts_batch(sharded, cfg, reqs, scfg, seed=0, pads=pads,
                               spec=3, mesh=mesh)
    for (f1, g1), (f2, g2) in zip(base, outs):
        np.testing.assert_array_equal(g1, g2)
        np.testing.assert_array_equal(f1, f2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_lane_sharded_engine_matches_unsharded():
    """Continuous batching under the mesh: the engine's lane state, ring
    slab, and admission prefills shard over 'data' (ContinuousBatcher
    (mesh=...)) and must reproduce the unsharded results — including a
    refill wave (more requests than lanes)."""
    from voicecraft_tpu.inference.engine import ContinuousBatcher
    from voicecraft_tpu.models.voicecraft import SamplingConfig
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(11))
    rng = np.random.default_rng(9)
    reqs = []
    for b in range(6):                       # 6 requests over 4 lanes
        x = rng.integers(0, cfg.text_vocab_size, 8 + b % 3).astype(np.int32)
        yy = rng.integers(0, cfg.audio_vocab_size,
                          (cfg.n_codebooks, 14 + 4 * (b % 2))).astype(np.int32)
        reqs.append((x, yy))
    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))

    def run(mesh, prms):
        eng = ContinuousBatcher(prms, cfg, lanes=4, x_pad=32, y_pad=64,
                                gen_max=128, burst=16, scfg=scfg, seed=3,
                                mesh=mesh)
        ids = [eng.submit(x, y) for x, y in reqs]
        res = eng.run()
        return [res[i] for i in ids]

    base = run(None, params)
    mesh = make_mesh(4, 2)
    with jax.set_mesh(mesh):
        outs = run(mesh, shard_params(params, mesh))
    for (f1, g1), (f2, g2) in zip(base, outs):
        np.testing.assert_array_equal(g1, g2)
        np.testing.assert_array_equal(f1, f2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_streaming_matches_unsharded():
    """stream_tts over a lane-sharded engine: streamed frames must equal
    the unsharded stream's, chunk for chunk."""
    from voicecraft_tpu.inference.streaming import stream_tts
    from voicecraft_tpu.models.voicecraft import SamplingConfig
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(11))
    rng = np.random.default_rng(10)
    x = rng.integers(0, cfg.text_vocab_size, 10).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size,
                     (cfg.n_codebooks, 20)).astype(np.int32)
    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))

    plain = list(stream_tts(params, cfg, x, y, scfg, seed=3, burst=16))
    mesh = make_mesh(4, 2)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        meshed = list(stream_tts(sharded, cfg, x, y, scfg, seed=3, burst=16,
                                 mesh=mesh, lanes=4))
    np.testing.assert_array_equal(meshed[-1]["gen"], plain[-1]["gen"])
    s1 = np.concatenate([c["frames"] for c in plain], axis=1)
    s2 = np.concatenate([c["frames"] for c in meshed], axis=1)
    np.testing.assert_array_equal(s1, s2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_lane_sharded_edit_serving_matches_unsharded():
    """Batched editing under the mesh: span-queue state, per-lane compact
    gen_cnt scatter, and the mask-embedding prefill must survive GSPMD
    lane sharding unchanged."""
    from voicecraft_tpu.inference.serving import serve_edit_batch
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(11))
    rng = np.random.default_rng(8)
    reqs = []
    for b in range(4):
        x = rng.integers(0, cfg.text_vocab_size, 8 + b).astype(np.int32)
        yy = rng.integers(0, cfg.audio_vocab_size,
                          (cfg.n_codebooks, 20 + 4 * b)).astype(np.int32)
        iv = [(5, 9)] if b % 2 == 0 else [(3, 6), (12, 16)]
        reqs.append((x, yy, iv))
    scfg = SamplingConfig(top_k=1, silence_tokens=(5, 7))
    pads = (32, 64, 256)

    base = serve_edit_batch(params, cfg, reqs, scfg, seed=0, pads=pads)

    mesh = make_mesh(4, 2)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        outs = serve_edit_batch(sharded, cfg, reqs, scfg, seed=0, pads=pads,
                                mesh=mesh)
    for r1, r2 in zip(base, outs):
        np.testing.assert_array_equal(r1, r2)
