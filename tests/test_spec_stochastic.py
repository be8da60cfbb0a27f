"""Stochastic speculative SAMPLING (spec_sampling="stochastic").

The core contract is distribution-exactness: the per-row rejection step
must emit tokens distributed exactly as the plain loop's sampling
distribution p, whatever the draft distribution q proposes.  The unit
test below verifies that empirically on the verify core itself; the e2e
tests cover acceptance on a memorised model (q ~= p -> high acceptance
under temperature sampling, where exact-match verify would reject) and
machinery integration across single-stream / serving / engine.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models import voicecraft as vc
from voicecraft_tpu.models.voicecraft import SamplingConfig
from voicecraft_tpu.inference.spec_common import (stochastic_row_verify,
                                                  _filtered,
                                                  use_stochastic_verify)
from voicecraft_tpu.inference.tts import inference_tts, inference_tts_spec

from tests.test_spec_decode import memorised  # noqa: F401  (pytest fixture)


def test_row_verify_preserves_target_distribution():
    """Emitted raw tokens ~ p exactly, for drafts from a DIFFERENT q."""
    K, card = 2, 12
    rng = np.random.default_rng(0)
    la = jnp.asarray(rng.normal(0, 1.5, (K, card)).astype(np.float32))
    dlg = jnp.asarray(rng.normal(0, 1.5, (K, card)).astype(np.float32))
    scfg = SamplingConfig(top_k=0, top_p=1.0, temperature=1.0,
                          spec_sampling="stochastic")
    p = np.asarray(jax.nn.softmax(_filtered(scfg, la), axis=-1))
    overridden = jnp.zeros((K,), bool)

    n = 40000
    keys = jax.random.split(jax.random.PRNGKey(1), n)

    def one(key):
        kd, kv = jax.random.split(key)
        d_tok = jax.random.categorical(
            kd, _filtered(scfg, dlg), axis=-1).astype(jnp.int32)
        raw, ok = stochastic_row_verify(kv, la, dlg, d_tok, overridden,
                                        scfg)
        return raw, ok

    raws, oks = jax.jit(jax.vmap(one))(keys)
    raws = np.asarray(raws)
    for k in range(K):
        freq = np.bincount(raws[:, k], minlength=card) / n
        tv = 0.5 * np.abs(freq - p[k]).sum()
        assert tv < 0.02, (k, tv, freq, p[k])
    # sanity: acceptance is the p/q overlap, strictly between 0 and 1 here
    acc = float(np.asarray(oks).mean())
    assert 0.05 < acc < 0.95, acc


def test_row_verify_overridden_rows_always_accept():
    K, card = 3, 8
    rng = np.random.default_rng(2)
    la = jnp.asarray(rng.normal(0, 1, (K, card)).astype(np.float32))
    dlg = jnp.asarray(rng.normal(0, 1, (K, card)).astype(np.float32))
    scfg = SamplingConfig(top_k=0, top_p=1.0, temperature=1.0,
                          spec_sampling="stochastic")
    overridden = jnp.asarray([False, True, True])
    keys = jax.random.split(jax.random.PRNGKey(3), 2000)

    def one(key):
        # adversarial draft: a token p assigns little mass to
        d_tok = jnp.argmin(la, axis=-1).astype(jnp.int32)
        return stochastic_row_verify(key, la, dlg, d_tok, overridden, scfg)

    raws, oks = jax.jit(jax.vmap(one))(keys)
    raws = np.asarray(raws)
    # slot acceptance is decided ONLY by the non-overridden row:
    # P(accept) = min(1, p(d)/q(d)) exactly
    accept_rate = float(np.asarray(oks).mean())
    p = np.asarray(jax.nn.softmax(_filtered(scfg, la), -1))
    q = np.asarray(jax.nn.softmax(_filtered(scfg, dlg), -1))
    d0 = int(np.argmin(np.asarray(la)[0]))
    expected = min(1.0, p[0, d0] / q[0, d0])
    assert abs(accept_rate - expected) < 0.04, (accept_rate, expected)
    # overridden rows emit fresh p-draws regardless of the draft
    for k in (1, 2):
        freq = np.bincount(raws[:, k], minlength=p.shape[1]) / raws.shape[0]
        assert 0.5 * np.abs(freq - p[k]).sum() < 0.04, k


def test_accepted_slots_match_fed_embeddings():
    """The core soundness invariant of ANY speculative pass: every accepted
    slot's EMITTED row equals the row that was FED to the block forward —
    otherwise later slots (and the carried h/logits) were conditioned on a
    token that was never emitted.  Exact mode enforces this by definition;
    stochastic mode must enforce it explicitly because the finaliser can
    rewrite the raw draw (row-0 stop check, eog cascade) on slots whose p/q
    rows all auto-accepted.  Lanes are forged into exactly those states:
    mid-eog-cascade, at the length cap, and in the forced-empty window."""
    from voicecraft_tpu.inference.spec_common import (make_lane_sampler,
                                                      spec_verify_pass)
    from voicecraft_tpu.models.voicecraft import MAX_POS, sine_table

    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32", n_mtp=3)
    params = vc.init_params(cfg, jax.random.PRNGKey(0))
    K, D, card = cfg.n_codebooks, cfg.d_model, cfg.audio_vocab_size + cfg.n_special
    cap_mult = cfg.encodec_sr // 5
    tau, B = 4, 4
    scfg = SamplingConfig(top_k=0, top_p=1.0, temperature=1.0,
                          silence_tokens=(), spec_sampling="stochastic")
    sample_lanes = make_lane_sampler(cfg, scfg, cap_mult)
    pe = jnp.asarray(sine_table(MAX_POS, D), jnp.float32)
    alpha_a = params["alpha_audio"].astype(jnp.float32)

    # lane 0: mid-cascade; lane 1: clean; lane 2: at the length cap
    # (y_pos > x_len*cap_mult fires the row-0 stop rewrite every slot);
    # lane 3: early span (forced-empty rows active)
    eog = jnp.zeros((B, K), bool).at[0, 0].set(True)
    cng = jnp.asarray([20, 20, 20, 1], jnp.int32)
    x_lens = jnp.asarray([40, 40, 1, 40], jnp.int32)
    y_pos0 = jnp.asarray([30, 30, cap_mult + 1, 30], jnp.int32)

    def one_pass(key):
        k_lg, k_h, k_tok = jax.random.split(key, 3)
        logits = jax.random.normal(k_lg, (B, K, card), jnp.float32) * 2.0
        h = jax.random.normal(k_h, (B, D), jnp.float32)
        tok_key = lambda i: jax.vmap(
            lambda b: jax.random.fold_in(jax.random.fold_in(k_tok, b), i))(
            jnp.arange(B))
        out = spec_verify_pass(
            params, cfg, sample_lanes, tau=tau,
            gate=jnp.ones((B,), bool), tok_key=tok_key, y_pos0=y_pos0,
            x_lens=x_lens, logits=logits, h=h, eog=eog, cng=cng,
            consec=jnp.zeros((B,), jnp.int32),
            prev=jnp.full((B,), -1, jnp.int32), t=jnp.asarray(0, jnp.int32),
            accept_cap=10_000, pe=pe, alpha_a=alpha_a, dtype=jnp.float32,
            forward=lambda feed: feed, scfg=scfg, is_tts=True,
            cap_mult=cap_mult, pending=jnp.zeros((B, K), jnp.int32),
            has_pending=jnp.zeros((B,), bool))
        return out["blk"], out["tokens_fed"], out["n_acc"]

    one_jit = jax.jit(one_pass)
    for trial in range(24):
        blk, fed, n_acc = jax.tree.map(
            np.asarray, one_jit(jax.random.PRNGKey(100 + trial)))
        for b in range(B):
            for i in range(1, int(n_acc[b])):
                np.testing.assert_array_equal(
                    blk[b, i], fed[b, i],
                    err_msg=f"trial {trial} lane {b} slot {i}: emitted != fed")


def test_use_stochastic_verify_gating():
    g = SamplingConfig(temperature=0.0, spec_sampling="stochastic")
    s = SamplingConfig(temperature=1.0, spec_sampling="stochastic")
    e = SamplingConfig(temperature=1.0, spec_sampling="exact")
    assert not use_stochastic_verify(g, 4)      # greedy -> exact path
    assert not use_stochastic_verify(s, 1)      # no drafts
    assert not use_stochastic_verify(e, 4)
    assert use_stochastic_verify(s, 4)


def test_stochastic_spec_acceptance_on_memorised(memorised):  # noqa: F811
    """Under temperature sampling on a memorised model, q ~= p so the
    stochastic verifier accepts most drafts — where exact-match verify
    of greedy drafts against sampled tokens would reject far more."""
    cfg, params, x, y, T_prompt = memorised
    scfg = SamplingConfig(temperature=0.8, top_k=0, silence_tokens=(),
                          spec_sampling="stochastic")
    full, gen, st = inference_tts_spec(
        params, cfg, x, y[:, :T_prompt], scfg, n_draft=4, seed=5,
        return_stats=True)
    assert st["tokens_per_pass"] >= 2.0, st
    # the memorised continuation dominates the sampled distribution, so
    # most emitted tokens should match it
    T = min(gen.shape[1], y.shape[1] - T_prompt)
    assert T > 10
    agree = (gen[:, :T] == y[:, T_prompt:T_prompt + T]).mean()
    assert agree > 0.8, agree


def test_stochastic_spec_serving_and_engine_run():
    """Machinery integration: stochastic verify + pending-token carry
    through lockstep spec serving and the spec engine (with refill)."""
    from voicecraft_tpu.inference.serving import serve_tts_batch
    from voicecraft_tpu.inference.engine import ContinuousBatcher
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32", n_mtp=2)
    params = vc.init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(8)
    reqs = []
    for b in range(3):
        xx = rng.integers(0, cfg.text_vocab_size, 8 + b).astype(np.int32)
        yy = rng.integers(0, cfg.audio_vocab_size,
                          (cfg.n_codebooks, 14)).astype(np.int32)
        reqs.append((xx, yy))
    scfg = SamplingConfig(top_k=10, top_p=0.9, temperature=1.0,
                          silence_tokens=(5, 7),
                          spec_sampling="stochastic")

    outs = serve_tts_batch(params, cfg, reqs[:2], scfg, seed=3,
                           pads=(32, 64, 128), spec=3)
    assert len(outs) == 2
    for full, gen in outs:
        assert gen.shape[0] == cfg.n_codebooks

    eng = ContinuousBatcher(params, cfg, lanes=2, x_pad=32, y_pad=64,
                            gen_max=128, burst=9, scfg=scfg, seed=3,
                            spec=3)
    ids = [eng.submit(xx, yy) for xx, yy in reqs]      # 3 reqs, 2 lanes
    res = eng.run()
    assert set(ids) <= set(res)
    for i in ids:
        assert res[i][1].shape[0] == cfg.n_codebooks


def test_stochastic_greedy_falls_back_to_exact(memorised):  # noqa: F811
    """temperature<=0 disables stochastic verify; output must be
    bit-identical to the plain greedy loop."""
    cfg, params, x, y, T_prompt = memorised
    scfg = SamplingConfig(temperature=0.0, silence_tokens=(),
                          spec_sampling="stochastic")
    _, gen_p = inference_tts(params, cfg, x, y[:, :T_prompt], scfg, seed=0)
    _, gen_s = inference_tts_spec(params, cfg, x, y[:, :T_prompt], scfg,
                                  n_draft=4, seed=0)
    np.testing.assert_array_equal(gen_s, gen_p)


def test_stochastic_spec_editing_runs_multispan():
    """Stochastic verification + the edit loop's span machinery: pending
    captures never collide with span transitions (they're mutually
    exclusive), feed passes preserve pending, and the run completes with
    unedited regions intact."""
    from voicecraft_tpu.inference.editing import inference_edit
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32", n_mtp=3)
    params = vc.init_params(cfg, jax.random.PRNGKey(42))
    rng = np.random.default_rng(1)
    x = rng.integers(0, cfg.text_vocab_size, 12).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size,
                     (cfg.n_codebooks, 30)).astype(np.int32)
    s = SamplingConfig(top_k=10, top_p=0.9, temperature=1.0,
                       silence_tokens=(5, 7), spec_sampling="stochastic")
    ivs = [(5, 12), (20, 25)]
    out = inference_edit(params, cfg, x, y, ivs, s, seed=3, spec=3)
    assert out.shape[0] == cfg.n_codebooks and out.shape[1] > 0
    np.testing.assert_array_equal(out[:, :ivs[0][0]], y[:, :ivs[0][0]])
    # greedy fallback stays bit-identical to the plain edit loop
    g = SamplingConfig(temperature=0.0, silence_tokens=(),
                      spec_sampling="stochastic")
    plain = inference_edit(params, cfg, x, y, ivs,
                           dataclasses.replace(g, spec_sampling="exact"),
                           seed=3)
    spec = inference_edit(params, cfg, x, y, ivs, g, seed=3, spec=3)
    np.testing.assert_array_equal(spec, plain)
