"""Continuous-batching TTS engine: lanes retire and refill mid-flight.

serving.py decodes a fixed batch in lockstep — fine when requests arrive
together, but a long request holds every lane hostage.  This engine runs the
decoder in bursts of T steps; between bursts, finished lanes are retired and
queued requests are prefilled into the freed lanes.

Lanes carry their own step counters, but the KV slab's generated region is a
RING indexed by a single global step clock: every lane writes its current
token's k/v at ring slot (gstep mod W) in its own batch row, so the cache
write is ONE uniform dynamic_update_slice per step — identical cost to
lockstep serving — and per-lane history selection is index arithmetic
(slot age <= lane's step count).  Earlier designs paid ~3 ms/step at 830M /
16 lanes for per-lane offset bookkeeping (a burst-local recent buffer, a
three-part attention, and a per-lane flush scatter); the ring removes all
three.

Per-lane slab layout (shared column space, per-lane validity):
    [ text 0..x_len_b | pad .. x_pad | prompt 0..prefix_len_b | pad .. y_pad |
      ring of W generated slots, lane-valid where age <= t_b ]

Burst granularity trades host round-trips (expensive over a TPU tunnel)
against admission latency: T=32-64 steps ~= 0.6-1.3 s of audio per burst at
830M.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import (Any, Callable, Dict, List, NamedTuple, Optional, Tuple)

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..data import spans
from ..models import transformer as trm
from ..models.embedding import sine_table
from ..models.voicecraft import (MAX_POS, SamplingConfig, _adjust_and_sample,
                                 apply_heads, embed_audio_tokens)
from ..ops import patterns
from ..ops.attention import NEG_INF


class LaneState(NamedTuple):
    active: jnp.ndarray       # [B] bool
    t: jnp.ndarray            # [B] generated steps so far
    x_lens: jnp.ndarray       # [B]
    prefix_lens: jnp.ndarray  # [B]
    codebook_eog: jnp.ndarray # [B, K]
    consec: jnp.ndarray       # [B]
    prev: jnp.ndarray         # [B]
    finish_t: jnp.ndarray     # [B], -1 until the eog cascade completes
    logits: jnp.ndarray       # [B, K, card] next-slot predictions
    h: jnp.ndarray            # [B, D] last hidden (spec-mode MTP drafts)
    admit_id: jnp.ndarray     # [B] admission counter (spec-mode RNG keying)
    pending: jnp.ndarray      # [B, K] stochastic-spec corrected token
    has_pending: jnp.ndarray  # [B] bool
    rng: jnp.ndarray
    gstep: jnp.ndarray        # scalar: global steps taken (ring write clock)


def _empty_lanes(B: int, K: int, card: int, D: int, seed: int) -> LaneState:
    return LaneState(
        active=jnp.zeros((B,), bool),
        t=jnp.zeros((B,), jnp.int32),
        x_lens=jnp.ones((B,), jnp.int32),
        prefix_lens=jnp.ones((B,), jnp.int32),
        codebook_eog=jnp.zeros((B, K), bool),
        consec=jnp.zeros((B,), jnp.int32),
        prev=jnp.full((B,), -1, jnp.int32),
        finish_t=jnp.full((B,), -1, jnp.int32),
        logits=jnp.zeros((B, K, card), jnp.float32),
        h=jnp.zeros((B, D), jnp.float32),
        admit_id=jnp.zeros((B,), jnp.int32),
        pending=jnp.zeros((B, K), jnp.int32),
        has_pending=jnp.zeros((B,), bool),
        rng=jax.random.PRNGKey(seed),
        gstep=jnp.asarray(0, jnp.int32))


def _ring_attention(q, k_cache, v_cache, k_new, v_new, nhead, x_lens, x_pad,
                    prefix_lens, y_start, W, gstep, t_lane):
    """Decode attention over the ring slab + self.

    The generated region [y_start, y_start+W) is a RING indexed by the
    global step clock: every lane writes its step-g token at ring slot
    g mod W, so the write is one uniform dynamic_update_slice (like
    lockstep serving) and per-lane history selection is pure index
    arithmetic: slot r's last write was age(r) = 1 + ((gstep-1-r) mod W)
    steps ago; it belongs to lane b's live history iff age <= t_lane_b.
    (A lane only ever reads its own batch row, so rows never mix.)

    q [B,1,D]; k_cache/v_cache [B,S,H,Dh]; k_new/v_new [B,1,H,Dh];
    gstep: scalar global steps completed BEFORE this one; t_lane [B].
    """
    B, S_max, H, Dh = k_cache.shape
    qh = q.reshape(B, 1, H, Dh)
    scale = 1.0 / jnp.sqrt(Dh).astype(jnp.float32)

    lg = jnp.einsum("bqhd,bkhd->bhqk", qh, k_cache,
                    preferred_element_type=jnp.float32) * scale
    j = jnp.arange(S_max)[None, :]
    r = j - y_start
    age = 1 + jnp.mod(gstep - 1 - r, W)
    valid = ((j < x_lens[:, None])
             | ((j >= x_pad) & (j < x_pad + prefix_lens[:, None]))
             | ((j >= y_start) & (age <= t_lane[:, None])
                & (gstep >= age)))
    lg = jnp.where(valid[:, None, None, :], lg, NEG_INF)

    lg_s = jnp.einsum("bqhd,bkhd->bhqk", qh, k_new,
                      preferred_element_type=jnp.float32) * scale
    allq = jnp.concatenate([lg, lg_s], axis=-1)
    probs = jax.nn.softmax(allq, axis=-1).astype(v_cache.dtype)
    out = (jnp.einsum("bhqk,bkhd->bqhd", probs[..., :-1], v_cache,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bhqk,bkhd->bqhd", probs[..., -1:], v_new,
                        preferred_element_type=jnp.float32)).astype(v_cache.dtype)
    return out.reshape(B, 1, H * Dh)


def _lane_decode_step(params, x_t, cache, nhead, x_lens, x_pad, prefix_lens,
                      y_start, W, gstep, t_lane):
    """One burst step against the ring slab: read-only in the layer scan,
    ONE uniform dynamic_update_slice at ring slot gstep mod W afterwards
    (write-once, same structure as transformer.decode_step_fast — per-lane
    scatters into the slab were ~6x slower, and the earlier burst-local
    recent-buffer + per-lane flush cost ~3 ms/step at 16 lanes)."""
    L, _, B, S_max, H, Dh = cache.shape

    def body(carry, scanned):
        h_in = carry
        layer_p, layer_cache = scanned
        h = trm.layer_norm(layer_p["ln1"], h_in)
        q, k, v = trm.qkv_proj(layer_p["attn"], h)
        k_new = k.reshape(B, 1, H, Dh)
        v_new = v.reshape(B, 1, H, Dh)
        a = _ring_attention(
            q, layer_cache[0].astype(q.dtype), layer_cache[1].astype(q.dtype),
            k_new, v_new, nhead, x_lens, x_pad, prefix_lens, y_start,
            W, gstep, t_lane)
        a = trm._proj(a, layer_p["attn"]["out"]["w"], layer_p["attn"]["out"]["b"])
        x1 = h_in + a
        h2 = trm.layer_norm(layer_p["ln2"], x1)
        h2 = trm.ffn_block(layer_p["ffn"], h2)
        return x1 + h2, jnp.stack([k_new, v_new], 0).astype(cache.dtype)

    x, kv_new = jax.lax.scan(body, x_t, (params["layers"], cache))
    cache = jax.lax.dynamic_update_slice(
        cache, kv_new, (0, 0, 0, y_start + jnp.mod(gstep, W), 0, 0))
    return trm.layer_norm(params["final_ln"], x), cache


def make_burst_fn(cfg: ModelConfig, *, batch_size: int, x_pad: int,
                  y_pad: int, gen_max: int, burst: int,
                  scfg: SamplingConfig, donate_gen: bool = True):
    """Jitted: run ``burst`` decode steps for all active lanes.

    Returns fn(params, cache, lanes, gen_buf [B, gen_max, K])
      -> (cache, lanes, gen_buf).

    ``donate_gen=False`` keeps the gen_buf input buffer alive (output is a
    fresh buffer): required by the pipelined streaming loop, which reads
    burst N's gen_buf on the host while burst N+1 runs — donating it there
    raises FailedPrecondition on the TPU backend (donation requested while
    the host still holds the previous output).  Costs one [B, gen_max, K]
    int32 device copy per burst (~2 MB at 32 lanes; negligible)."""
    K, D = cfg.n_codebooks, cfg.d_model
    B = batch_size
    dtype = jnp.dtype(cfg.compute_dtype)
    cap_mult = cfg.encodec_sr // 5
    y_start = x_pad + y_pad
    pe_np = sine_table(MAX_POS, D)

    sample_lane = jax.vmap(
        lambda rng, lg, eog, cng, cs, pt, yp, xl: _adjust_and_sample(
            cfg, scfg, True, cap_mult, rng, lg, eog, cng, cs, pt, yp, xl),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0))

    def burst_fn(params, cache, lanes: LaneState, gen_buf, max_bursts):
        pe = jnp.asarray(pe_np).astype(dtype)
        alpha_a = params["alpha_audio"].astype(dtype)
        L_, _, B_, S_, H_, Dh_ = cache.shape
        W = S_ - y_start                       # ring width (>= gen_max + 1)

        def one_burst(cache, lanes, gen_buf):
            t_start = lanes.t
            # in-burst sample buffer at the uniform index j: per-lane
            # scatters into [B, gen_max, K] every step serialize badly; a
            # uniform dynamic_update_slice + one per-lane flush per burst
            # doesn't
            gen_recent0 = jnp.zeros((B_, burst, K), jnp.int32)

            def step(carry, j):
                cache, gen_recent, s = carry
                rng, step_rng = jax.random.split(s.rng)
                lane_rngs = jax.random.split(step_rng, B)
                y_pos = s.prefix_lens + s.t
                samples, new_eog, consec, prev = sample_lane(
                    lane_rngs, s.logits, s.codebook_eog, s.t, s.consec,
                    s.prev, y_pos, s.x_lens)
                live = s.active & jnp.logical_not(jnp.all(s.codebook_eog, 1))
                samples = jnp.where(live[:, None], samples, cfg.empty_token)
                new_eog = jnp.where(live[:, None], new_eog, s.codebook_eog)
                consec = jnp.where(live, consec, s.consec)
                prev = jnp.where(live, prev, s.prev)

                lane_done = jnp.all(new_eog, axis=1) & live
                finish_t = jnp.where(lane_done, s.t, s.finish_t)

                gen_recent = jax.lax.dynamic_update_slice(
                    gen_recent, samples[:, None, :], (0, j, 0))

                feed_emb = embed_audio_tokens(
                    params["audio_emb"], samples[:, :, None])[:, 0].astype(dtype)
                feed = feed_emb + alpha_a * jnp.take(
                    pe, jnp.minimum(y_pos, MAX_POS - 1), axis=0)
                # dead lanes' ring writes are garbage in their own row only.
                # NOTE: frozen lanes DO attend that garbage — their age
                # window (age <= t) keeps sliding onto post-freeze slots as
                # gstep advances.  Correctness holds because frozen lanes'
                # logits/samples are discarded (the `live` gating above and
                # the flush keep-mask), NOT because the window excludes the
                # garbage; never read a frozen lane's hidden state.
                h, cache = _lane_decode_step(
                    params["decoder"], feed[:, None, :], cache,
                    cfg.nhead, s.x_lens, x_pad, s.prefix_lens, y_start,
                    W, s.gstep, s.t)
                logits = apply_heads(params["heads"], h)[:, 0]
                logits = jnp.where(live[:, None, None], logits, s.logits)

                t = jnp.where(live, jnp.minimum(s.t + 1, gen_max - 1), s.t)
                new_s = LaneState(s.active, t, s.x_lens, s.prefix_lens,
                                  new_eog, consec, prev, finish_t, logits,
                                  s.h, s.admit_id, s.pending,
                                  s.has_pending, rng, s.gstep + 1)
                return (cache, gen_recent, new_s), None

            (cache, gen_recent, new_lanes), _ = jax.lax.scan(
                step, (cache, gen_recent0, lanes), jnp.arange(burst))

            # flush sampled rows into gen_buf: lane b advanced
            # (new_t - t_start) steps this burst; rows beyond that in the
            # recent window hold dead-lane padding and must not overwrite
            def flush_gen(g, rec, t0, n_adv):
                idx = jnp.minimum(t0 + jnp.arange(burst), gen_max - 1)
                keep = jnp.arange(burst) < n_adv
                cur = g[idx]
                return g.at[idx].set(jnp.where(keep[:, None], rec, cur))
            gen_buf = jax.vmap(flush_gen)(gen_buf, gen_recent, t_start,
                                          new_lanes.t - t_start)
            return cache, new_lanes, gen_buf

        # device-side drain: keep bursting until a lane finishes (the host
        # only needs control for retire/admit) or max_bursts runs out —
        # each host round-trip over the TPU tunnel costs ~a burst's compute
        def drain_cond(state):
            n, cache, lanes, gen_buf = state
            finished = lanes.active & jnp.all(lanes.codebook_eog, axis=1)
            capped = lanes.active & (lanes.t >= gen_max - 1)
            return ((n < max_bursts) & jnp.any(lanes.active)
                    & jnp.logical_not(jnp.any(finished | capped)))

        def drain_body(state):
            n, cache, lanes, gen_buf = state
            cache, lanes, gen_buf = one_burst(cache, lanes, gen_buf)
            return n + 1, cache, lanes, gen_buf

        # always run at least one burst, then drain while nothing retires
        cache, lanes, gen_buf = one_burst(cache, lanes, gen_buf)
        _, cache, lanes, gen_buf = jax.lax.while_loop(
            drain_cond, drain_body, (jnp.asarray(1, jnp.int32), cache,
                                     lanes, gen_buf))

        # packed per-lane status [B, 4]: one host transfer per call instead
        # of several eager dispatches (eager ops over a TPU tunnel are the
        # dominant cost at small burst sizes)
        status = jnp.stack(
            [lanes.active.astype(jnp.int32), lanes.t, lanes.finish_t,
             jnp.all(lanes.codebook_eog, axis=1).astype(jnp.int32)], axis=1)
        return cache, lanes, gen_buf, status

    return jax.jit(burst_fn,
                   donate_argnums=(1, 3) if donate_gen else (1,))


def make_spec_burst_fn(cfg: ModelConfig, *, batch_size: int, n_draft: int,
                       x_pad: int, y_pad: int, gen_max: int, burst: int,
                       scfg: SamplingConfig, force_accept: bool = False,
                       donate_gen: bool = True):
    """Jitted: speculative burst — verified tau-token passes for all lanes.

    Speculative continuous batching: each device pass feeds every live lane
    its true next token + ``n_draft - 1`` MTP drafts through ONE block
    forward and accepts per lane the prefix the plain loop would emit
    (serving.make_spec_serving_loop semantics, with the engine's
    admit/retire lane management around it).  Unlike the plain engine's
    ring slab, accepted tokens stay COMPACT per lane — each pass scatters
    its block at per-lane offsets (transformer.decode_step_multi_block) so
    variable acceptance never fragments lane history.

    Per-token RNG is fold_in(fold_in(rng, admit_id_b), t_b + i): keyed on
    the admission (not the lane), so output is independent of lane
    placement, refill timing, and n_draft.

    Returns fn(params, cache, lanes, gen_buf [B, gen_max + tau, K],
               max_bursts) -> (cache, lanes, gen_buf, status [B,4]).
    """
    from .spec_common import make_lane_sampler, spec_verify_pass
    K, D = cfg.n_codebooks, cfg.d_model
    B = batch_size
    tau = n_draft
    dtype = jnp.dtype(cfg.compute_dtype)
    cap_mult = cfg.encodec_sr // 5
    y_start = x_pad + y_pad
    passes = max(1, burst // tau)
    pe_np = sine_table(MAX_POS, D)

    sample_lanes = make_lane_sampler(cfg, scfg, cap_mult)

    def burst_fn(params, cache, lanes: LaneState, gen_buf, max_bursts):
        pe = jnp.asarray(pe_np).astype(dtype)
        alpha_a = params["alpha_audio"].astype(dtype)
        lane_ids = jnp.arange(B)

        def one_pass(cache, s: LaneState, gen_buf):
            # cap at gen_max - 1 rows, matching the plain burst fn's
            # t = min(t + 1, gen_max - 1) freeze — capped lanes must
            # retire with identical row counts in both modes
            live = (s.active & jnp.logical_not(jnp.all(s.codebook_eog, 1))
                    & (s.t < gen_max - 1))
            req_keys = jax.vmap(
                lambda aid: jax.random.fold_in(s.rng, aid))(s.admit_id)

            def tok_key(i):
                return jax.vmap(jax.random.fold_in)(req_keys, s.t + i)

            cell = {}

            def forward(feed):
                h_blk, cell["cache"] = trm.decode_step_multi_block(
                    params["decoder"], feed, cache, y_start + s.t,
                    cfg.nhead, s.x_lens, x_pad, s.prefix_lens, y_start,
                    gen_lens=s.t)
                return h_blk

            out = spec_verify_pass(
                params, cfg, sample_lanes, tau=tau, gate=live,
                tok_key=tok_key,
                y_pos0=jnp.minimum(s.prefix_lens + s.t, MAX_POS - tau - 1),
                x_lens=s.x_lens, logits=s.logits, h=s.h,
                eog=s.codebook_eog, cng=s.t, consec=s.consec, prev=s.prev,
                t=s.t, accept_cap=gen_max - 1, pe=pe, alpha_a=alpha_a,
                dtype=dtype, forward=forward, force_accept=force_accept,
                scfg=scfg, is_tts=True, cap_mult=cap_mult,
                pending=s.pending, has_pending=s.has_pending)

            # unconditional scatter: frozen lanes write their (empty-token)
            # block at rows >= t, which retirement/streaming never read —
            # same argument as the slab writes
            r_idx = s.t[:, None] + jnp.arange(tau)[None, :]
            gen_buf = gen_buf.at[lane_ids[:, None], r_idx].set(out["blk"])

            t_new = s.t + out["n_acc"]
            done_now = live & jnp.all(out["eog"], axis=1)
            finish_t = jnp.where(done_now, t_new - 1, s.finish_t)

            new_s = LaneState(s.active, t_new, s.x_lens, s.prefix_lens,
                              out["eog"], out["consec"], out["prev"],
                              finish_t, out["logits_next"], out["h_next"],
                              s.admit_id, out["pending"],
                              out["has_pending"], s.rng, s.gstep + 1)
            return cell["cache"], new_s, gen_buf

        def one_burst(cache, lanes, gen_buf):
            def step(carry, _):
                cache, s, gen_buf = carry
                cache, s, gen_buf = one_pass(cache, s, gen_buf)
                return (cache, s, gen_buf), None
            (cache, lanes, gen_buf), _ = jax.lax.scan(
                step, (cache, lanes, gen_buf), None, length=passes)
            return cache, lanes, gen_buf

        def drain_cond(state):
            n, cache, lanes, gen_buf = state
            finished = lanes.active & jnp.all(lanes.codebook_eog, axis=1)
            capped = lanes.active & (lanes.t >= gen_max - 1)
            return ((n < max_bursts) & jnp.any(lanes.active)
                    & jnp.logical_not(jnp.any(finished | capped)))

        def drain_body(state):
            n, cache, lanes, gen_buf = state
            cache, lanes, gen_buf = one_burst(cache, lanes, gen_buf)
            return n + 1, cache, lanes, gen_buf

        cache, lanes, gen_buf = one_burst(cache, lanes, gen_buf)
        _, cache, lanes, gen_buf = jax.lax.while_loop(
            drain_cond, drain_body, (jnp.asarray(1, jnp.int32), cache,
                                     lanes, gen_buf))

        status = jnp.stack(
            [lanes.active.astype(jnp.int32), lanes.t, lanes.finish_t,
             jnp.all(lanes.codebook_eog, axis=1).astype(jnp.int32)], axis=1)
        return cache, lanes, gen_buf, status

    return jax.jit(burst_fn,
                   donate_argnums=(1, 3) if donate_gen else (1,))


def make_prefill_batch_fn(cfg: ModelConfig, *, batch_size: int, x_pad: int,
                          y_pad: int, s_max: int,
                          kv_dtype: Optional[str] = None):
    """Jitted: prefill a WAVE of admissions in one call.

    fn(params, cache, lanes, admit [B] bool, x_tokens [B,x_pad], x_lens [B],
       y_prefix [B,K,y_pad], prefix_lens [B]) -> (cache, lanes).

    All B lanes are prefilled (static shapes); only lanes with ``admit``
    True have their cache slab and lane state overwritten.  One dispatch
    admits a whole wave instead of B sequential host round-trips.
    """
    K, D = cfg.n_codebooks, cfg.d_model
    H, Dh, L = cfg.nhead, cfg.head_dim, cfg.num_decoder_layers
    B = batch_size
    dtype = jnp.dtype(cfg.compute_dtype)
    cache_dtype = jnp.dtype(kv_dtype) if kv_dtype else dtype
    Sp = x_pad + y_pad
    pe_np = sine_table(MAX_POS, D)

    def prefill(params, cache, lanes: LaneState, admit, x_tokens, x_lens,
                y_prefix, prefix_lens, admit_ids):
        pe = jnp.asarray(pe_np).astype(dtype)
        x_emb = jnp.take(params["text_emb"]["weight"], x_tokens, axis=0).astype(dtype)
        x_in = x_emb + params["alpha_text"].astype(dtype) * pe[:x_pad]
        y_emb = embed_audio_tokens(params["audio_emb"], y_prefix).astype(dtype)
        y_in = y_emb + params["alpha_audio"].astype(dtype) * pe[:y_pad]
        xy = jnp.concatenate([x_in, y_in], axis=1)           # [B, Sp, D]

        from ..ops.flash_attention import (flash_prefix_attention,
                                           use_flash_prefill)
        if use_flash_prefill(Sp):
            bias = lambda q, k, v: flash_prefix_attention(
                q, k, v, x_lens, prefix_lens, x_pad, cfg.nhead)
        else:
            jj = jnp.arange(Sp)
            key_valid = ((jj[None, :] < x_lens[:, None])
                         | ((jj[None, :] >= x_pad)
                            & (jj[None, :] < x_pad + prefix_lens[:, None])))
            allowed = (jj[None, :] <= jj[:, None])[None] & key_valid[:, None, :]
            bias = jnp.where(allowed, 0.0,
                             NEG_INF).astype(jnp.float32)[:, None]

        new_cache = trm.init_kv_cache(L, B, s_max, H, Dh, cache_dtype)
        h, new_cache = trm.prefill(params["decoder"], xy, bias, new_cache,
                                   cfg.nhead)
        last_idx = x_pad + prefix_lens - 1                   # [B]
        h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)
        logits0 = apply_heads(params["heads"], h_last)[:, 0]  # [B, K, card]

        m = admit
        cache = jnp.where(m[None, None, :, None, None, None], new_cache,
                          cache)
        lanes = LaneState(
            active=jnp.where(m, True, lanes.active),
            t=jnp.where(m, 0, lanes.t),
            x_lens=jnp.where(m, x_lens, lanes.x_lens),
            prefix_lens=jnp.where(m, prefix_lens, lanes.prefix_lens),
            codebook_eog=jnp.where(m[:, None], False, lanes.codebook_eog),
            consec=jnp.where(m, 0, lanes.consec),
            prev=jnp.where(m, -1, lanes.prev),
            finish_t=jnp.where(m, -1, lanes.finish_t),
            logits=jnp.where(m[:, None, None],
                             logits0.astype(lanes.logits.dtype),
                             lanes.logits),
            h=jnp.where(m[:, None], h_last[:, 0].astype(jnp.float32),
                        lanes.h),
            admit_id=jnp.where(m, admit_ids, lanes.admit_id),
            pending=jnp.where(m[:, None], 0, lanes.pending),
            has_pending=jnp.where(m, False, lanes.has_pending),
            rng=lanes.rng,
            gstep=lanes.gstep)
        return cache, lanes

    return jax.jit(prefill, donate_argnums=(1, 2))


def make_prefill_lane_fn(cfg: ModelConfig, *, x_pad: int, y_pad: int,
                         s_max: int, kv_dtype: Optional[str] = None):
    """Jitted: prefill ONE lane (the common mid-flight refill case).

    The wave prefill (make_prefill_batch_fn) computes a [B, Sp] forward and
    rewrites the whole [L,2,B,S_max] cache through a jnp.where — fine for the
    startup wave, wasteful when a single lane frees: at 32 lanes / 830M
    that's ~an extra 85 ms of prefill FLOPs plus a multi-GB cache rewrite
    per admission.  This variant computes [1, Sp] and writes one lane's slab
    with a dynamic_update_slice.

    fn(params, cache, lanes, lane_idx (scalar), x_tokens [1,x_pad], x_len,
       y_prefix [1,K,y_pad], prefix_len) -> (cache, lanes).
    """
    K, D = cfg.n_codebooks, cfg.d_model
    H, Dh, L = cfg.nhead, cfg.head_dim, cfg.num_decoder_layers
    dtype = jnp.dtype(cfg.compute_dtype)
    cache_dtype = jnp.dtype(kv_dtype) if kv_dtype else dtype
    Sp = x_pad + y_pad
    pe_np = sine_table(MAX_POS, D)

    def prefill(params, cache, lanes: LaneState, lane_idx, x_tokens, x_len,
                y_prefix, prefix_len, admit_id):
        pe = jnp.asarray(pe_np).astype(dtype)
        x_emb = jnp.take(params["text_emb"]["weight"], x_tokens, axis=0).astype(dtype)
        x_in = x_emb + params["alpha_text"].astype(dtype) * pe[:x_pad]
        y_emb = embed_audio_tokens(params["audio_emb"], y_prefix).astype(dtype)
        y_in = y_emb + params["alpha_audio"].astype(dtype) * pe[:y_pad]
        xy = jnp.concatenate([x_in, y_in], axis=1)           # [1, Sp, D]

        from ..ops.flash_attention import (flash_prefix_attention,
                                           use_flash_prefill)
        x_lens1 = jnp.atleast_1d(x_len)
        p_lens1 = jnp.atleast_1d(prefix_len)
        if use_flash_prefill(Sp):
            bias = lambda q, k, v: flash_prefix_attention(
                q, k, v, x_lens1, p_lens1, x_pad, cfg.nhead)
        else:
            jj = jnp.arange(Sp)
            key_valid = jnp.where(jj < x_pad, jj < x_len,
                                  jj < x_pad + prefix_len)
            allowed = (jj[None, :] <= jj[:, None]) & key_valid[None, :]
            bias = jnp.where(allowed, 0.0,
                             NEG_INF).astype(jnp.float32)[None, None]

        lane_cache = trm.init_kv_cache(L, 1, s_max, H, Dh, cache_dtype)
        h, lane_cache = trm.prefill(params["decoder"], xy, bias, lane_cache,
                                    cfg.nhead)
        h_last = jax.lax.dynamic_slice_in_dim(h, x_pad + prefix_len - 1, 1,
                                              axis=1)
        logits0 = apply_heads(params["heads"], h_last)[:, 0]  # [1, K, card]

        cache = jax.lax.dynamic_update_slice(
            cache, lane_cache, (0, 0, lane_idx, 0, 0, 0))
        b = lane_idx
        lanes = LaneState(
            active=lanes.active.at[b].set(True),
            t=lanes.t.at[b].set(0),
            x_lens=lanes.x_lens.at[b].set(x_len),
            prefix_lens=lanes.prefix_lens.at[b].set(prefix_len),
            codebook_eog=lanes.codebook_eog.at[b].set(False),
            consec=lanes.consec.at[b].set(0),
            prev=lanes.prev.at[b].set(-1),
            finish_t=lanes.finish_t.at[b].set(-1),
            logits=lanes.logits.at[b].set(
                logits0[0].astype(lanes.logits.dtype)),
            h=lanes.h.at[b].set(h_last[0, 0].astype(jnp.float32)),
            admit_id=lanes.admit_id.at[b].set(admit_id),
            pending=lanes.pending.at[b].set(0),
            has_pending=lanes.has_pending.at[b].set(False),
            rng=lanes.rng,
            gstep=lanes.gstep)
        return cache, lanes

    return jax.jit(prefill, donate_argnums=(1, 2))


@lru_cache(maxsize=8)
def _cached_burst_fn(cfg, lanes, x_pad, y_pad, gen_max, burst, scfg,
                     donate_gen=True):
    return make_burst_fn(cfg, batch_size=lanes, x_pad=x_pad, y_pad=y_pad,
                         gen_max=gen_max, burst=burst, scfg=scfg,
                         donate_gen=donate_gen)


@lru_cache(maxsize=8)
def _cached_spec_burst_fn(cfg, lanes, n_draft, x_pad, y_pad, gen_max, burst,
                          scfg, force_accept=False, donate_gen=True):
    return make_spec_burst_fn(cfg, batch_size=lanes, n_draft=n_draft,
                              x_pad=x_pad, y_pad=y_pad, gen_max=gen_max,
                              burst=burst, scfg=scfg,
                              force_accept=force_accept,
                              donate_gen=donate_gen)


@lru_cache(maxsize=8)
def _cached_prefill_batch_fn(cfg, lanes, x_pad, y_pad, s_max, kv_dtype):
    return make_prefill_batch_fn(cfg, batch_size=lanes, x_pad=x_pad,
                                 y_pad=y_pad, s_max=s_max, kv_dtype=kv_dtype)


@lru_cache(maxsize=8)
def _cached_prefill_lane_fn(cfg, x_pad, y_pad, s_max, kv_dtype):
    return make_prefill_lane_fn(cfg, x_pad=x_pad, y_pad=y_pad, s_max=s_max,
                                kv_dtype=kv_dtype)


@dataclass
class ContinuousBatcher:
    """Host-side orchestrator: admit requests into free lanes between bursts.

    Usage:
        eng = ContinuousBatcher(params, cfg, lanes=8)
        ids = [eng.submit(x_tokens, y_codes) for ...]
        results = eng.run()           # {id: (full_codes, gen_codes)}

    A request submitted with ``on_rows`` streams: after every burst the
    engine syncs back (drain cap 1 while any streaming request is live) and
    invokes ``on_rows(rows)`` with the lane's delayed-space rows so far
    ([t, K] int32, monotone prefix-stable — see inference/streaming.py for
    the frame/audio conversion).  Streaming trades the drain loop's saved
    host round-trips for per-burst latency, by design.
    """

    params: Any
    cfg: ModelConfig
    lanes: int = 8
    x_pad: int = 128
    y_pad: int = 192
    gen_max: int = 768
    # retirement-detection granularity, denominated in generated TOKENS for
    # every mode (a spec engine runs burst//spec verify passes per burst);
    # see PERF.md round-4 engine table for the measured burst sensitivity
    # under steady refill churn
    burst: int = 48
    scfg: SamplingConfig = field(default_factory=SamplingConfig)
    seed: int = 1
    # 'float8_e4m3fn' stores the KV slab (and the in-burst recent buffer) in
    # fp8 — every decode step reads the whole [B, S_max] slab, so this halves
    # the dominant HBM traffic vs bf16 at a small attention-precision cost.
    kv_dtype: Optional[str] = None
    # spec=TAU (>1): speculative continuous batching — verified TAU-token
    # passes per lane (make_spec_burst_fn); needs params['mtp_heads'].
    spec: int = 0
    # bench only: simulated 100% draft acceptance (throughput ceiling)
    spec_force_accept: bool = False
    # multi-chip scale-out: a Mesh with a 'data' axis shards lanes (and the
    # KV slab's batch dim) across chips — every per-lane op stays local and
    # only the burst's tiny status/all-done reductions cross chips; params
    # may additionally be tensor-parallel over 'model' (parallel/mesh.py).
    # lanes must be divisible by the data axis size.
    mesh: Any = None
    # streaming-mode burst pipelining (run one burst ahead of the host so
    # callback + readback hide behind device compute).  False = synchronous
    # per-burst processing — the pre-pipelining behavior, kept for A/B
    # measurement (bench.py --stream --stream-no-pipeline) and as an escape
    # hatch for consumers that need zero retirement staleness.
    pipeline: bool = True

    def __post_init__(self):
        cfg = self.cfg
        K = cfg.n_codebooks
        if self.spec > 1:
            from ..models.voicecraft import check_mtp_heads
            check_mtp_heads(self.params, self.spec,
                            None if self.spec_force_accept else self.scfg)
        if self.spec > 1:
            # compact per-lane offsets: slab slack is one block, not a ring
            self._s_max = self.x_pad + self.y_pad + self.gen_max + self.spec
            # ``burst`` is token-denominated (make_spec_burst_fn runs
            # burst//tau verify passes per burst); _burst_iters is the
            # MINIMUM guaranteed token advance per burst (1 token/pass),
            # used for the drain cap below
            self._burst_iters = max(1, self.burst // self.spec)
            self._make_burst = lambda donate: _cached_spec_burst_fn(
                cfg, self.lanes, self.spec, self.x_pad, self.y_pad,
                self.gen_max, self.burst, self.scfg,
                self.spec_force_accept, donate)
            self._burst_fn = self._make_burst(True)
        else:
            # ring width W = gen_max + burst keeps every live lane's history
            # strictly inside the ring (t_b <= gen_max - 1 < W)
            self._s_max = self.x_pad + self.y_pad + self.gen_max + self.burst
            self._burst_iters = self.burst
            # jitted fns are cached on geometry so short-lived batchers (e.g.
            # one per streaming HTTP request) don't re-trace/re-compile
            self._make_burst = lambda donate: _cached_burst_fn(
                cfg, self.lanes, self.x_pad, self.y_pad, self.gen_max,
                self.burst, self.scfg, donate)
            self._burst_fn = self._make_burst(True)
        self._prefill_fn = _cached_prefill_batch_fn(
            cfg, self.lanes, self.x_pad, self.y_pad, self._s_max,
            self.kv_dtype)
        self._prefill_lane_fn = _cached_prefill_lane_fn(
            cfg, self.x_pad, self.y_pad, self._s_max, self.kv_dtype)
        cache_dtype = (jnp.dtype(self.kv_dtype) if self.kv_dtype
                       else jnp.dtype(cfg.compute_dtype))
        self._cache = trm.init_kv_cache(
            cfg.num_decoder_layers, self.lanes, self._s_max, cfg.nhead,
            cfg.head_dim, cache_dtype)
        self._lanes = _empty_lanes(self.lanes, K, cfg.card, cfg.d_model,
                                   self.seed)
        self._gen_buf = jnp.zeros(
            (self.lanes, self.gen_max + max(self.spec, 0), K), jnp.int32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            assert self.lanes % self.mesh.shape["data"] == 0, \
                (self.lanes, dict(self.mesh.shape))
            ns = lambda spec: NamedSharding(self.mesh, spec)
            # cache [L, 2, B, S, H, Dh]: batch dim is axis 2
            self._cache = jax.device_put(self._cache, ns(P(None, None,
                                                           "data")))
            self._gen_buf = jax.device_put(self._gen_buf, ns(P("data")))
            repl = {"rng", "gstep"}     # the only non-[B]-leading fields
            self._lanes = LaneState(**{
                f: jax.device_put(v, ns(P()) if f in repl else ns(P("data")))
                for f, v in self._lanes._asdict().items()})
        self._queue: List[Tuple[int, np.ndarray, np.ndarray]] = []
        self._lane_req: List[Optional[int]] = [None] * self.lanes
        self._retired: set = set()
        self._req_y: Dict[int, np.ndarray] = {}
        self._results: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._stream_cbs: Dict[int, Callable] = {}
        self._stream_sent: Dict[int, int] = {}
        self._next_id = 0

    def submit(self, x_tokens: np.ndarray, y_codes: np.ndarray,
               on_rows: Optional[Callable] = None) -> int:
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, np.asarray(x_tokens, np.int32),
                            np.asarray(y_codes, np.int32)))
        self._req_y[rid] = np.asarray(y_codes, np.int32)
        if on_rows is not None:
            self._stream_cbs[rid] = on_rows
            self._stream_sent[rid] = 0
        return rid

    # ---- internals -----------------------------------------------------------

    def _admit(self):
        """Admit queued requests into free lanes.

        Big waves (more than half the lanes — in practice the startup wave)
        run as ONE jitted batch prefill; small refill waves use the
        single-lane prefill, which skips the [B, Sp] forward and the
        whole-cache rewrite."""
        cfg = self.cfg
        K = cfg.n_codebooks
        B = self.lanes
        pending = []      # (lane, rid, x, prefix)
        for b in range(self.lanes):
            # lane occupancy is tracked host-side (_lane_req) — no device read
            if self._lane_req[b] is not None or not self._queue:
                continue
            rid, x, y = self._queue.pop(0)
            prefix = spans.compose_tts_prefix(
                y + (cfg.n_special if cfg.special_first else 0), cfg)
            assert len(x) <= self.x_pad and prefix.length <= self.y_pad, \
                (len(x), prefix.length, self.x_pad, self.y_pad)
            pending.append((b, rid, x, prefix))
        if not pending:
            return
        if len(pending) > self.lanes // 2:
            admit = np.zeros((B,), bool)
            admit_ids = np.zeros((B,), np.int32)
            xt = np.full((B, self.x_pad), cfg.text_pad_token, np.int32)
            x_lens = np.ones((B,), np.int32)
            yt = np.full((B, K, self.y_pad), cfg.empty_token, np.int32)
            p_lens = np.ones((B,), np.int32)
            for b, rid, x, prefix in pending:
                admit[b] = True
                admit_ids[b] = rid       # request id keys spec-mode RNG
                xt[b, :len(x)] = x
                x_lens[b] = len(x)
                yt[b, :, :prefix.length] = prefix.tokens
                p_lens[b] = prefix.length
            self._cache, self._lanes = self._prefill_fn(
                self.params, self._cache, self._lanes, jnp.asarray(admit),
                jnp.asarray(xt), jnp.asarray(x_lens), jnp.asarray(yt),
                jnp.asarray(p_lens), jnp.asarray(admit_ids))
        else:
            for b, rid, x, prefix in pending:
                xt = np.full((1, self.x_pad), cfg.text_pad_token, np.int32)
                xt[0, :len(x)] = x
                yt = np.full((1, K, self.y_pad), cfg.empty_token, np.int32)
                yt[0, :, :prefix.length] = prefix.tokens
                self._cache, self._lanes = self._prefill_lane_fn(
                    self.params, self._cache, self._lanes,
                    jnp.asarray(b, jnp.int32), jnp.asarray(xt),
                    jnp.asarray(len(x), jnp.int32), jnp.asarray(yt),
                    jnp.asarray(prefix.length, jnp.int32),
                    jnp.asarray(rid, jnp.int32))
        for b, rid, _, _ in pending:
            self._lane_req[b] = rid

    def _retire(self, status: np.ndarray, gen_src, lane_map) -> None:
        """Retire finished lanes using ONE consistent burst snapshot:
        ``status`` [B, 4], ``gen_src`` (the device gen_buf the status
        describes), and ``lane_map`` (lane -> rid AT THAT BURST).  With the
        streaming pipeline the snapshot is one burst behind the device, so
        a rid may already be retired (skip via _retired) and a lane may
        already hold a NEWER request (only free it if it still holds the
        snapshot's rid)."""
        active, t, finish_t, eog_all = status.T
        K = self.cfg.n_codebooks
        for b in range(self.lanes):
            rid = lane_map[b]
            if rid is None or rid in self._retired or not active[b]:
                continue
            done = eog_all[b] or t[b] >= self.gen_max - 1
            if not done:
                continue
            # In BOTH modes t counts written rows (valid rows are [0, t));
            # t+1 on a gen_max-capped lane read one unwritten/unverified
            # row past the end (zeros in plain mode, a rejected draft in
            # spec mode) — the eog path is unaffected (finish_t >= 0).
            n = int(finish_t[b]) + 1 if finish_t[b] >= 0 else int(t[b])
            # fetch only the finished lane's rows (rare; bounded transfer)
            rows = np.asarray(gen_src[b])[:n]
            if rows.shape[0] <= K:
                gen = np.zeros((K, 0), np.int32)
            else:
                gen = patterns.unshift_span(rows.T).astype(np.int32)
            y = self._req_y[rid]
            # gen is in the +n_special sampling space when special_first;
            # y is the caller's raw prompt — unshift gen BEFORE concatenating
            # so the prompt segment of ``full`` is untouched
            if self.cfg.special_first:
                gen = gen - self.cfg.n_special
            full = np.concatenate([y, gen], axis=1)
            self._results[rid] = (full, gen)
            self._retired.add(rid)
            self._stream_cbs.pop(rid, None)
            self._stream_sent.pop(rid, None)
            if self._lane_req[b] == rid:
                self._lane_req[b] = None
                self._lanes = self._lanes._replace(
                    active=self._lanes.active.at[b].set(False))

    def _emit_stream(self, status: np.ndarray, gen_src, lane_map) -> None:
        """Invoke streaming callbacks with each live streaming lane's
        delayed rows so far (monotone, prefix-stable).  Snapshot semantics
        as in :meth:`_retire`."""
        t, finish_t = status[:, 1], status[:, 2]
        for b in range(self.lanes):
            rid = lane_map[b]
            if rid is None or rid not in self._stream_cbs:
                continue
            # cap at the retirement row count so streamed rows are always a
            # prefix of the final result (rows past the eog cascade are
            # frozen-lane noise)
            n = int(t[b]) if finish_t[b] < 0 else min(int(t[b]),
                                                      int(finish_t[b]) + 1)
            if n <= self._stream_sent[rid]:
                continue
            rows = np.asarray(gen_src[b])[:n]          # [n, K]
            self._stream_sent[rid] = n
            self._stream_cbs[rid](rows)

    def _process_burst(self, pending) -> None:
        """Host-side consumption of one finished burst's snapshot — the
        status readback here is what blocks on the device."""
        status_dev, gen_src, lane_map = pending
        status = np.asarray(status_dev)        # [B, 4]: single transfer
        self._emit_stream(status, gen_src, lane_map)
        self._retire(status, gen_src, lane_map)

    def run(self) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
        """Drain the queue; returns {request_id: (full_codes, gen_codes)}.

        After _admit() either the queue is empty or every lane is busy, and
        a lane only frees when one finishes — which is exactly the drain
        loop's exit condition.  So the device can always drain until a
        retirement: syncing back after every burst (the old
        queue-non-empty policy) bought no earlier admissions, only ~1 host
        round-trip per burst over the TPU tunnel.

        Streaming requests need per-burst readbacks, but NOT synchronous
        ones: the loop runs one burst AHEAD of the host (VERDICT r03 #4) —
        burst N+1 is dispatched (async) before burst N's status/rows are
        read back, so callback + readback time hides behind device compute
        instead of stalling it.  Costs: one burst of retirement staleness
        (a finished lane decodes ~one extra burst of ignored rows; its
        replacement admits one iteration later) and a gen_buf copy per
        burst — made inside a non-donating burst-fn variant, NOT an eager
        jnp.copy: the eager copy held a read on the buffer the next
        dispatch donates, which the TPU backend rejects with
        FailedPrecondition (measured round 5; CPU tolerates it).  Streamed
        output is unchanged — rows pass through the same monotone
        prefix-stable snapshots."""
        # non-streaming drain cap: enough bursts to cover gen_max even at
        # the minimum guaranteed advance (1 token per spec verify pass)
        full_cap = -(-self.gen_max // self._burst_iters) + 1
        pending = None          # in-flight burst's (status, gen_src, map)
        while self._queue or any(r is not None for r in self._lane_req):
            self._admit()
            streaming = (any(rid in self._stream_cbs
                             for rid in self._lane_req if rid is not None)
                         or any(rid in self._stream_cbs
                                for rid, _, _ in self._queue))
            # gen_buf may only be donated when nothing else references it:
            # a pipelined snapshot (``pending``) holds the PREVIOUS burst's
            # output, which is exactly this call's gen_buf input.
            donate = pending is None and not (streaming and self.pipeline)
            self._cache, self._lanes, self._gen_buf, status = \
                self._make_burst(donate)(
                    self.params, self._cache, self._lanes, self._gen_buf,
                    jnp.asarray(1 if streaming else full_cap, jnp.int32))
            self._status = status
            if streaming and not self.pipeline:
                self._process_burst((status, self._gen_buf,
                                     list(self._lane_req)))
            elif streaming:
                # the non-donating burst fn keeps this output buffer valid
                # across the NEXT dispatch — no host-side copy needed
                new_pending = (status, self._gen_buf, list(self._lane_req))
                if pending is not None:
                    self._process_burst(pending)   # overlaps next burst
                pending = new_pending
            else:
                if pending is not None:
                    self._process_burst(pending)
                    pending = None
                self._process_burst((status, self._gen_buf,
                                     list(self._lane_req)))
        if pending is not None:
            self._process_burst(pending)
        out, self._results = self._results, {}
        # nothing in flight can reference pre-run rids any more; without
        # this a long-lived batcher leaks one set entry per request served
        self._retired.clear()
        return out
