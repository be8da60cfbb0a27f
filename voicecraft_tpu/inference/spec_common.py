"""Shared core of one verified speculative pass over B lanes.

ALL FOUR speculative decoders — single-stream TTS
(models.voicecraft.make_spec_decode_loop), multi-span editing
(models.voicecraft.make_spec_edit_loop), lockstep spec serving
(serving.make_spec_serving_loop) and the spec continuous-batching engine
(engine.make_spec_burst_fn) — run the same per-pass algorithm: sample the
true next token per lane exactly as the plain loop would, draft tau-1 more
from the MTP heads, run ONE block forward, then accept per lane the prefix
the plain loop would have emitted.  They differ only in lane gating
(done-mask vs active/retire vs the edit loop's feed passes), RNG keying,
caps, and cache/record plumbing — so THIS function owns the verify
semantics and the callers own the plumbing.  Divergence here is what
bit-exactness contracts die of; fix verify behaviour in one place.

The single-stream loops call it with B=1 ([None]-lifted scalar state); the
edit loop additionally passes ``mix_emb`` to substitute the span-transition
feed embeddings and reads the raw block outputs (``h_blk``/``logits_blk``)
to seed the next pass after a feed (its gate is off during feeds, so the
gate-frozen ``*_next`` fields would be stale there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models.voicecraft import (SamplingConfig, _adjust_and_sample,
                                 _adjust_logits, _finalize_sample,
                                 apply_heads, embed_audio_tokens)
from ..ops.sampling import top_k_top_p_filter

# fold_in salts separating the stochastic-verify RNG consumers at one
# token index: draft proposals, accept/residual draws
_SALT_DRAFT = 101
_SALT_VERIFY = 103


def make_lane_sampler(cfg: ModelConfig, scfg: SamplingConfig, cap_mult: int,
                      is_tts: bool = True):
    """vmapped _adjust_and_sample over lanes (all args per-lane)."""
    return jax.vmap(
        lambda rng, lg, eog, cng, cs, pt, yp, xl: _adjust_and_sample(
            cfg, scfg, is_tts, cap_mult, rng, lg, eog, cng, cs, pt, yp, xl))


def use_stochastic_verify(scfg: SamplingConfig, tau: int) -> bool:
    """Stochastic speculative sampling applies when requested, sampling is
    actually stochastic (temperature > 0), and there are drafts to verify."""
    return (scfg.spec_sampling == "stochastic" and scfg.temperature > 0
            and tau > 1)


def _filtered(scfg: SamplingConfig, logits):
    """The sampling distribution in logit space (temperature scaling then
    top-k/top-p filtering — the exact transform sample_tokens draws from)."""
    lg = logits if scfg.temperature == 1.0 else logits / scfg.temperature
    return top_k_top_p_filter(lg, scfg.top_k, scfg.top_p)


def _filtered_draft(scfg: SamplingConfig, logits):
    """The draft PROPOSAL distribution q: like _filtered but with the
    draft temperature (spec_draft_temperature; < 0 -> the sampling
    temperature).  q is a free choice — any proposal keeps the verifier
    distribution-exact — so sharpening it tunes the acceptance profile
    (see SamplingConfig.spec_draft_temperature)."""
    td = (scfg.spec_draft_temperature if scfg.spec_draft_temperature >= 0
          else scfg.temperature)
    td = max(td, 1e-3)          # near-greedy floor keeps logq finite
    lg = logits if td == 1.0 else logits / td
    return top_k_top_p_filter(lg, scfg.top_k, scfg.top_p)


def _vfold(keys, salt: int):
    return jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, salt)


def stochastic_row_verify(key, la, dlg, d_tok, overridden,
                          scfg: SamplingConfig):
    """Per-codebook-row speculative-sampling verification for ONE lane.

    la [K, card]: the plain loop's ADJUSTED logits at this slot (the target
    distribution is p = softmax(filter(la/T))).  dlg [K, card]: the raw MTP
    draft logits the proposal was sampled from (q = softmax(filter(dlg/T))).
    d_tok [K]: the proposed draft tokens.  overridden [K]: rows the
    finaliser either forces deterministically (forced empties, the
    cascade's rows <= n_eog) or replaces with the raw draw (the cascade's
    rows > n_eog) — the p/q accept test is meaningless there, so they take
    a fresh p-draw, which preserves the raw law in both cases.

    Classic rejection step (PAPERS.md arXiv 2211.17192 / 2302.01318),
    per row: accept d w.p. min(1, p(d)/q(d)); otherwise draw from the
    residual max(p - q, 0)/Z.  The returned raw row is distributed EXACTLY
    as p either way.  ok = all non-overridden rows accepted.  NOTE: ok is
    necessary but not sufficient for slot acceptance — the caller
    additionally requires finalise(raw) == fed draft row-wise, because a
    fresh f_tok draw on a cascade row (or a finaliser rewrite such as the
    row-0 stop check) changes the emitted value away from the embedding
    the block forward consumed.
    """
    K = la.shape[0]
    kp, kr, kf = jax.random.split(key, 3)
    logp = jax.nn.log_softmax(_filtered(scfg, la), axis=-1)
    logq = jax.nn.log_softmax(_filtered_draft(scfg, dlg), axis=-1)
    lp_d = jnp.take_along_axis(logp, d_tok[:, None], axis=-1)[:, 0]
    lq_d = jnp.take_along_axis(logq, d_tok[:, None], axis=-1)[:, 0]
    u = jax.random.uniform(kp, (K,), minval=1e-20)
    accept = jnp.log(u) < (lp_d - lq_d)
    resid = jnp.log(jnp.maximum(jnp.exp(logp) - jnp.exp(logq), 1e-30))
    r_tok = jax.random.categorical(kr, resid, axis=-1).astype(jnp.int32)
    f_tok = jax.random.categorical(kf, logp, axis=-1).astype(jnp.int32)
    raw = jnp.where(overridden, f_tok,
                    jnp.where(accept, d_tok, r_tok)).astype(jnp.int32)
    ok = jnp.all(accept | overridden)
    return raw, ok


def spec_verify_pass(params, cfg: ModelConfig, sample_lanes, *,
                     tau: int, gate, tok_key, y_pos0, x_lens,
                     logits, h, eog, cng, consec, prev, t,
                     accept_cap, pe, alpha_a, dtype, forward,
                     bench_mode: bool = False,
                     force_accept: bool = False,
                     mix_emb=None,
                     scfg: SamplingConfig = None,
                     is_tts: bool = True, cap_mult: int = None,
                     pending=None, has_pending=None):
    """One verified tau-token pass for B lanes.

    gate [B]: lanes that participate (others are frozen: they emit empty
    tokens, keep their state, and their slab writes land beyond their
    validity).  tok_key(i) -> [B, 2] per-lane PRNG keys for token index
    t + i (the caller owns the keying scheme).  accept_cap: accepted token
    index bound — accept token i only while t + i < accept_cap.
    forward(feed [B, tau, D]) -> h_blk [B, tau, D] runs the block through
    the decoder (the caller owns cache layout and write plumbing).
    mix_emb(emb [B, tau, D]) -> [B, tau, D]: optional hook applied to the
    token embeddings BEFORE the positional term — the edit loop uses it to
    substitute its span-transition feed embeddings on feed passes (whose
    lanes are gated off, so verification ignores them).

    With ``scfg.spec_sampling == "stochastic"`` (and temperature > 0,
    tau > 1): drafts are SAMPLED from the MTP distributions and verified
    by per-row rejection sampling (stochastic_row_verify) — the emitted
    token law is exactly the plain loop's.  A rejected slot's corrected
    raw token cannot be emitted in this pass (its fed embedding was the
    draft's), so it is carried as ``pending`` [B, K] / ``has_pending``
    [B] and becomes the next pass's slot-0 token (fed, finalised, and
    emitted there via _adjust_and_sample's raw_override).  Callers must
    thread pending/has_pending through their loop state; ``cap_mult`` and
    ``is_tts`` are required then.

    Returns dict with: blk [B, tau, K] emitted rows (rows >= n_acc are
    garbage and must be overwritten or never read), n_acc [B], eog / cng /
    consec / prev (final verify-carry state), logits_next [B, K, card]
    (f32), h_next [B, D] (f32) — next-state fields are gate-frozen already
    — plus the RAW block outputs h_blk [B, tau, D] / logits_blk
    [B, tau, K, card] for callers whose gated-off lanes still need them
    (the edit loop's feed branch), and pending / has_pending in
    stochastic mode.
    """
    K = cfg.n_codebooks
    B = logits.shape[0]
    empty_row = jnp.full((B, K), cfg.empty_token, jnp.int32)
    stochastic = (scfg is not None and use_stochastic_verify(scfg, tau)
                  and pending is not None)
    if stochastic:
        assert not force_accept, \
            "force_accept ceilings use exact verification"
        assert cap_mult is not None

    # -- token 0: the true next token, exactly as the plain loop emits --
    # (in stochastic mode a pending corrected token from the previous
    # pass's rejection substitutes for the draw — same finalisation path)
    if stochastic:
        ov_sampler = jax.vmap(
            lambda rng, lg, eog_, cng_, cs, pt, yp, xl, use, tok:
            _adjust_and_sample(cfg, scfg, is_tts, cap_mult, rng, lg, eog_,
                               cng_, cs, pt, yp, xl,
                               raw_override=(use, tok)))
        t0, eog0, consec0, prev0 = ov_sampler(
            tok_key(0), logits.astype(jnp.float32), eog, cng, consec, prev,
            y_pos0, x_lens, gate & has_pending, pending)
    else:
        t0, eog0, consec0, prev0 = sample_lanes(
            tok_key(0), logits.astype(jnp.float32), eog, cng, consec, prev,
            y_pos0, x_lens)
    if bench_mode:
        eog0 = jnp.zeros_like(eog0)
        t0 = jnp.where(t0 >= cfg.audio_vocab_size, 0, t0)
    t0 = jnp.where(gate[:, None], t0, empty_row)
    eog0 = jnp.where(gate[:, None], eog0, eog)

    # -- drafts from the MTP heads at the last accepted hidden --
    if tau > 1:
        mtp = jax.tree.map(lambda x: x[:tau - 1], params["mtp_heads"])
        h_c = h.astype(dtype)
        d_logits = jax.vmap(lambda hd: apply_heads(hd, h_c))(mtp)
        if stochastic:
            # sample proposals from q = the filtered MTP distribution —
            # acceptance then tracks the p/q overlap instead of p(argmax)
            def draw_draft(j):
                keys = _vfold(tok_key(j + 1), _SALT_DRAFT)
                lg = _filtered_draft(scfg, d_logits[j])    # [B, K, card]
                return jax.vmap(
                    lambda k_, l_: jax.random.categorical(k_, l_, axis=-1)
                )(keys, lg).astype(jnp.int32)
            drafts = jnp.stack([draw_draft(j) for j in range(tau - 1)])
        else:
            drafts = jnp.argmax(d_logits, axis=-1).astype(jnp.int32)
        # mirror the deterministic forced-empty rule on draft rows
        # (reference voicecraft.py:1037-1039): rows > cur_num_gen are
        # forced empty by the verifier, so draft them as empty too
        cng_d = cng[None, :, None] + 1 + jnp.arange(tau - 1)[:, None, None]
        drafts = jnp.where(jnp.arange(K)[None, None, :] > cng_d,
                           cfg.empty_token, drafts)
        tokens = jnp.concatenate([t0[None], drafts], axis=0)
    else:
        tokens = t0[None]
    tokens_b = tokens.transpose(1, 0, 2)                  # [B, tau, K]

    # -- one block forward for all lanes --
    emb = embed_audio_tokens(
        params["audio_emb"], tokens_b.transpose(0, 2, 1)).astype(dtype)
    if mix_emb is not None:
        emb = mix_emb(emb)
    pos_grid = y_pos0[:, None] + jnp.arange(tau)[None, :]
    feed = emb + alpha_a * jnp.take(pe, pos_grid, axis=0)
    h_blk = forward(feed)                                 # [B, tau, D]
    logits_blk = apply_heads(params["heads"], h_blk)      # [B, tau, K, card]

    # -- verify drafts per lane against the plain-loop emission --
    emitted = [t0]
    alive = gate & jnp.logical_not(jnp.all(eog0, axis=1))
    st = (eog0,
          cng + gate.astype(jnp.int32),
          jnp.where(gate, consec0, consec),
          jnp.where(gate, prev0, prev))
    n_acc = gate.astype(jnp.int32)
    pend_out, has_pend_out = pending, jnp.zeros((B,), bool)
    for i in range(1, tau):
        eog_c, cng_c, consec_c, prev_c = st
        if stochastic:
            la_i = jax.vmap(
                lambda lg, e, cg, cs, pt: _adjust_logits(
                    cfg, scfg, is_tts, lg, e, cg, cs, pt))(
                logits_blk[:, i - 1].astype(jnp.float32), eog_c, cng_c,
                consec_c, prev_c)
            overridden = ((eog_c.sum(axis=1) > 0)[:, None]
                          | (jnp.arange(K)[None, :] > cng_c[:, None]))
            raw_i, ok_i = jax.vmap(
                lambda k_, la_, dq_, dt_, ov_: stochastic_row_verify(
                    k_, la_, dq_, dt_, ov_, scfg))(
                _vfold(tok_key(i), _SALT_VERIFY), la_i, d_logits[i - 1],
                tokens_b[:, i], overridden)
            ti, eog_i, consec_i, prev_i = jax.vmap(
                lambda la_, s_, e, cg, cs, pt, yp, xl: _finalize_sample(
                    cfg, scfg, is_tts, cap_mult, la_, s_, e, cg, cs, pt,
                    yp, xl))(
                la_i, raw_i, eog_c, cng_c, consec_c, prev_c, y_pos0 + i,
                x_lens)
            # A slot may only be accepted when the FINALISED token equals
            # the FED draft row-wise (exact mode's rule).  Finalisation can
            # rewrite the raw value — the row-0 stop check (argmax-eog /
            # length cap) and the eog cascade, whose rows > n_eog keep the
            # fresh f_tok draw — and emitting a value that differs from the
            # embedding the block forward consumed would condition every
            # later slot (and the carried h/logits) on the wrong token,
            # silently breaking distribution-exactness at span/utterance
            # tails.  raw_i is still a valid p-draw for this position, so
            # the ordinary rejection path below carries it as pending and
            # the next pass feeds + finalises + emits it as slot 0.
            match = ok_i & jnp.all(ti == tokens_b[:, i], axis=1)
        else:
            ti, eog_i, consec_i, prev_i = sample_lanes(
                tok_key(i), logits_blk[:, i - 1], eog_c, cng_c,
                consec_c, prev_c, y_pos0 + i, x_lens)
            match = jnp.all(ti == tokens_b[:, i], axis=1)
        if bench_mode:
            eog_i = jnp.zeros_like(eog_i)
            ti = jnp.where(ti >= cfg.audio_vocab_size, 0, ti)
        if force_accept:   # bench ceiling: simulated 100% acceptance
            match = jnp.ones((B,), bool)
            ti = tokens_b[:, i]
        accept = alive & match & (t + i < accept_cap)
        if stochastic:
            # first rejected slot: its corrected raw token was verified
            # against the wrong-embedding-free logits (the prefix was all
            # accepted), so it is a valid draw for this position — carry
            # it; the next pass feeds + finalises + emits it as slot 0
            capture = alive & jnp.logical_not(match) & (t + i < accept_cap)
            pend_out = jnp.where(capture[:, None], raw_i, pend_out)
            has_pend_out = has_pend_out | capture
        emitted.append(jnp.where(accept[:, None], ti, 0))
        n_acc = n_acc + accept.astype(jnp.int32)
        st = (jnp.where(accept[:, None], eog_i, eog_c),
              jnp.where(accept, cng_c + 1, cng_c),
              jnp.where(accept, consec_i, consec_c),
              jnp.where(accept, prev_i, prev_c))
        alive = alive & accept & jnp.logical_not(jnp.all(eog_i, axis=1))

    eog_f, cng_f, consec_f, prev_f = st

    # -- the last accepted position's outputs seed the next pass --
    last = jnp.maximum(n_acc - 1, 0)
    logits_next = jnp.take_along_axis(
        logits_blk, last[:, None, None, None], axis=1)[:, 0]
    h_next = jnp.take_along_axis(h_blk, last[:, None, None], axis=1)[:, 0]
    logits_next = jnp.where(gate[:, None, None],
                            logits_next.astype(logits.dtype), logits)
    h_next = jnp.where(gate[:, None], h_next.astype(jnp.float32),
                       h.astype(jnp.float32))

    out = {"blk": jnp.stack(emitted, axis=1), "n_acc": n_acc,
           "eog": eog_f, "cng": cng_f, "consec": consec_f, "prev": prev_f,
           "logits_next": logits_next, "h_next": h_next,
           "h_blk": h_blk, "logits_blk": logits_blk,
           # the rows actually FED to the block forward — every accepted
           # slot's emitted row must equal its fed row (tested invariant)
           "tokens_fed": tokens_b}
    if stochastic:
        out["pending"] = pend_out
        out["has_pending"] = jnp.where(gate, has_pend_out, has_pending)
    elif pending is not None:
        out["pending"] = pending
        out["has_pending"] = has_pending
    return out
