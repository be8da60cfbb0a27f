"""Multi-stream TTS serving: N *distinct* prompts decoded in lockstep.

This is the production-serving path the reference lacks entirely (its batch
mode, voicecraft.py:1156-1439, runs N samples of ONE prompt and keeps the
first finisher).  Here each lane carries its own text/prompt/lengths and
per-lane stopping state; batch-1 decode is HBM-bandwidth-bound (every step
reads all weights), so N lanes cost roughly the same wall-clock per step and
aggregate throughput scales ~linearly until the MXU saturates.

Slab layout per lane b (uniform write pointer across lanes):
    [ text 0..x_len_b | pad .. x_pad | prompt 0..prefix_len_b | pad .. y_pad |
      generated tokens ... ]
Per-lane validity masks carve out the pads (ops/attention.py
decode_attention_multi).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..data import spans
from ..models import transformer as trm
from ..models.embedding import sine_table
from ..models.voicecraft import (
    MAX_POS, SamplingConfig, _adjust_and_sample, apply_heads,
    embed_audio_tokens)
from ..ops import patterns
from ..ops.attention import NEG_INF


class ServingState(NamedTuple):
    cache: jnp.ndarray
    logits: jnp.ndarray          # [B, K, card]
    rng: jnp.ndarray             # [B, 2] per-lane keys (per-request seeds)
    t: jnp.ndarray               # decode step counter (uniform)
    gen_buf: jnp.ndarray         # [gen_max, B, K]
    codebook_eog: jnp.ndarray    # [B, K]
    consec_silence: jnp.ndarray  # [B]
    prev_token: jnp.ndarray      # [B]
    finish_t: jnp.ndarray        # [B] step index of cascade completion (-1)
    done: jnp.ndarray            # [B]


def make_serving_tts_loop(cfg: ModelConfig, *, batch_size: int, x_pad: int,
                          y_pad: int, gen_max: int, scfg: SamplingConfig,
                          kv_dtype: Optional[str] = None):
    """Returns jitted fn(params, x_tokens [B,x_pad], x_lens [B],
    y_prefix [B,K,y_pad], prefix_lens [B], lane_seeds [B])
      -> (gen_buf [gen_max,B,K], finish_t [B]).

    Each lane's RNG stream is fold_in(PRNGKey(lane_seeds[b]), b): requests
    keep their OWN seeds when batched (the micro-batcher can mix seeds in
    one wave), while identical requests sharing a seed in different lanes
    still draw independently (the lane fold).

    ``kv_dtype='float8_e4m3fn'`` stores the KV slab in fp8 — multi-lane
    decode reads the whole [B, S_max] slab every step, so this halves the
    dominant HBM traffic at a small attention-precision cost (serving mode).
    """
    K, D = cfg.n_codebooks, cfg.d_model
    H, Dh, L = cfg.nhead, cfg.head_dim, cfg.num_decoder_layers
    B = batch_size
    dtype = jnp.dtype(cfg.compute_dtype)
    cache_dtype = jnp.dtype(kv_dtype) if kv_dtype else dtype
    cap_mult = cfg.encodec_sr // 5
    y_start = x_pad + y_pad
    s_max = y_start + gen_max
    pe_np = sine_table(MAX_POS, D)

    sample_lane = jax.vmap(
        lambda rng, lg, eog, cng, cs, pt, yp, xl: _adjust_and_sample(
            cfg, scfg, True, cap_mult, rng, lg, eog, cng, cs, pt, yp, xl),
        in_axes=(0, 0, 0, None, 0, 0, 0, 0))

    def decode(params, x_tokens, x_lens, y_prefix, prefix_lens, lane_seeds):
        pe = jnp.asarray(pe_np).astype(dtype)
        alpha_a = params["alpha_audio"].astype(dtype)
        lane_keys = jax.vmap(
            lambda s, b: jax.random.fold_in(jax.random.PRNGKey(s), b))(
                lane_seeds, jnp.arange(B))

        x_emb = jnp.take(params["text_emb"]["weight"], x_tokens, axis=0).astype(dtype)
        x_in = x_emb + params["alpha_text"].astype(dtype) * pe[:x_pad]
        y_emb = embed_audio_tokens(params["audio_emb"], y_prefix).astype(dtype)
        y_in = y_emb + alpha_a * pe[:y_pad]
        xy = jnp.concatenate([x_in, y_in], axis=1)          # [B, y_start, D]

        from ..ops.flash_attention import (flash_prefix_attention,
                                           use_flash_prefill)
        if use_flash_prefill(y_start):
            bias = lambda q, k, v: flash_prefix_attention(
                q, k, v, x_lens, prefix_lens, x_pad, cfg.nhead)
        else:
            jj = jnp.arange(y_start)
            key_valid = ((jj[None, :] < x_lens[:, None])
                         | ((jj[None, :] >= x_pad)
                            & (jj[None, :] < x_pad + prefix_lens[:, None])))
            allowed = (jj[None, :] <= jj[:, None])[None] & key_valid[:, None, :]
            bias = jnp.where(allowed, 0.0,
                             NEG_INF).astype(jnp.float32)[:, None]

        cache = trm.init_kv_cache(L, B, s_max, H, Dh, cache_dtype)
        h, cache = trm.prefill(params["decoder"], xy, bias, cache, cfg.nhead)
        last_idx = x_pad + prefix_lens - 1                   # [B]
        h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)
        logits0 = apply_heads(params["heads"], h_last)[:, 0]  # [B, K, card]

        state = ServingState(
            cache=cache, logits=logits0, rng=lane_keys,
            t=jnp.asarray(0, jnp.int32),
            gen_buf=jnp.zeros((gen_max, B, K), jnp.int32),
            codebook_eog=jnp.zeros((B, K), bool),
            consec_silence=jnp.zeros((B,), jnp.int32),
            prev_token=jnp.full((B,), -1, jnp.int32),
            finish_t=jnp.full((B,), -1, jnp.int32),
            done=jnp.zeros((B,), bool))

        def cond(s: ServingState):
            return jnp.logical_not(jnp.all(s.done)) & (s.t < gen_max)

        def body(s: ServingState) -> ServingState:
            pairs = jax.vmap(lambda k: jax.random.split(k, 2))(s.rng)
            rng, lane_rngs = pairs[:, 0], pairs[:, 1]        # [B, 2] each
            y_pos = prefix_lens + s.t                        # [B]
            samples, new_eog, new_consec, new_prev = sample_lane(
                lane_rngs, s.logits, s.codebook_eog, s.t,
                s.consec_silence, s.prev_token, y_pos, x_lens)
            # freeze finished lanes: emit empties, keep eog all-True
            samples = jnp.where(s.done[:, None],
                                jnp.full((B, K), cfg.empty_token, jnp.int32),
                                samples)
            new_eog = jnp.where(s.done[:, None], s.codebook_eog, new_eog)
            lane_complete = jnp.all(new_eog, axis=1) & jnp.logical_not(s.done)
            finish_t = jnp.where(lane_complete, s.t, s.finish_t)
            done = s.done | lane_complete

            gen_buf = jax.lax.dynamic_update_slice(
                s.gen_buf, samples[None], (s.t, 0, 0))

            feed_emb = embed_audio_tokens(
                params["audio_emb"], samples[:, :, None])[:, 0].astype(dtype)
            feed = feed_emb + alpha_a * jnp.take(pe, y_pos, axis=0)
            h, cache = trm.decode_step_multi(
                params["decoder"], feed[:, None, :], s.cache,
                y_start + s.t, cfg.nhead, x_lens, x_pad, prefix_lens, y_start)
            logits = apply_heads(params["heads"], h)[:, 0]

            return ServingState(cache, logits, rng, s.t + 1, gen_buf,
                                new_eog, new_consec, new_prev, finish_t, done)

        final = jax.lax.while_loop(cond, body, state)
        return final.gen_buf, final.finish_t

    return jax.jit(decode)


class SpecServingState(NamedTuple):
    cache: jnp.ndarray
    logits: jnp.ndarray          # [B, K, card] main-head logits, next slot
    h: jnp.ndarray               # [B, D] hidden at last accepted position
    rng: jnp.ndarray             # [B, 2] per-request keys (token-index fold)
    t: jnp.ndarray               # [B] accepted generated tokens per lane
    gen_buf: jnp.ndarray         # [gen_max + tau, B, K]
    codebook_eog: jnp.ndarray    # [B, K]
    cur_num_gen: jnp.ndarray     # [B]
    consec_silence: jnp.ndarray  # [B]
    prev_token: jnp.ndarray      # [B]
    n_passes: jnp.ndarray        # scalar
    pending: jnp.ndarray         # [B, K] stochastic-verify corrected token
    has_pending: jnp.ndarray     # [B]
    done: jnp.ndarray            # [B]


def make_spec_serving_loop(cfg: ModelConfig, *, batch_size: int, n_draft: int,
                           x_pad: int, y_pad: int, gen_max: int,
                           scfg: SamplingConfig,
                           kv_dtype: Optional[str] = None,
                           bench_mode: bool = False,
                           force_accept: bool = False):
    """Speculative multi-stream TTS: N distinct prompts, tau tokens per lane
    per verified pass.

    Combines make_serving_tts_loop (per-lane prompts/validity) with
    models.voicecraft.make_spec_decode_loop (MTP drafts + verify): each pass
    feeds every lane its true next token plus ``n_draft - 1`` MTP-head
    drafts through ONE block forward, then accepts per lane exactly the
    prefix the plain loop would have emitted.  Lanes accept different
    counts, so each lane writes its block at its own compact slab offset
    (transformer.decode_step_multi_block scatter) and slab validity stays
    per-lane length arithmetic.  Per-lane outputs are token-identical to
    the plain serving loop under f32 compute for greedy sampling; for
    temperature>0 the RNG schedule is per-(lane, token-index) fold_in, so
    sampled output is draw-equivalent and INDEPENDENT of n_draft and of
    acceptance patterns (tests/test_serving_spec.py).

    A pass costs ~the same weight+slab HBM time as one lockstep step
    (multi-lane decode is bandwidth-bound) plus tau× the MXU FLOPs, so
    aggregate throughput ≈ lockstep × mean tokens/pass.

    ``force_accept``/``bench_mode`` mirror make_spec_decode_loop (bench
    ceilings only).  Requires params["mtp_heads"] when n_draft > 1.

    Returns jitted fn(params, x_tokens [B,x_pad], x_lens [B],
                      y_prefix [B,K,y_pad], prefix_lens [B], lane_seeds [B])
      -> (gen_buf [gen_max+tau, B, K], t [B], n_passes).
    """
    from .spec_common import make_lane_sampler, spec_verify_pass
    assert n_draft >= 1
    K, D = cfg.n_codebooks, cfg.d_model
    H, Dh, L = cfg.nhead, cfg.head_dim, cfg.num_decoder_layers
    B = batch_size
    tau = n_draft
    dtype = jnp.dtype(cfg.compute_dtype)
    cache_dtype = jnp.dtype(kv_dtype) if kv_dtype else dtype
    cap_mult = cfg.encodec_sr // 5
    y_start = x_pad + y_pad
    s_max = y_start + gen_max + tau
    pe_np = sine_table(MAX_POS, D)

    sample_lanes = make_lane_sampler(cfg, scfg, cap_mult)

    def decode(params, x_tokens, x_lens, y_prefix, prefix_lens, lane_seeds):
        # per-(request, token-index) keys: requests keep their own seeds
        # when batched; the lane fold keeps identical same-seed requests
        # in different lanes independent
        req_keys = jax.vmap(
            lambda sd, b: jax.random.fold_in(jax.random.PRNGKey(sd), b))(
                lane_seeds, jnp.arange(B))
        pe = jnp.asarray(pe_np).astype(dtype)
        alpha_a = params["alpha_audio"].astype(dtype)

        # ---- prefill (identical to make_serving_tts_loop) ----
        x_emb = jnp.take(params["text_emb"]["weight"], x_tokens, axis=0).astype(dtype)
        x_in = x_emb + params["alpha_text"].astype(dtype) * pe[:x_pad]
        y_emb = embed_audio_tokens(params["audio_emb"], y_prefix).astype(dtype)
        y_in = y_emb + alpha_a * pe[:y_pad]
        xy = jnp.concatenate([x_in, y_in], axis=1)

        from ..ops.flash_attention import (flash_prefix_attention,
                                           use_flash_prefill)
        if use_flash_prefill(y_start):
            bias = lambda q, k, v: flash_prefix_attention(
                q, k, v, x_lens, prefix_lens, x_pad, cfg.nhead)
        else:
            jj = jnp.arange(y_start)
            key_valid = ((jj[None, :] < x_lens[:, None])
                         | ((jj[None, :] >= x_pad)
                            & (jj[None, :] < x_pad + prefix_lens[:, None])))
            allowed = (jj[None, :] <= jj[:, None])[None] & key_valid[:, None, :]
            bias = jnp.where(allowed, 0.0,
                             NEG_INF).astype(jnp.float32)[:, None]

        cache = trm.init_kv_cache(L, B, s_max, H, Dh, cache_dtype)
        h, cache = trm.prefill(params["decoder"], xy, bias, cache, cfg.nhead)
        last_idx = x_pad + prefix_lens - 1
        h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)
        logits0 = apply_heads(params["heads"], h_last)[:, 0]   # [B, K, card]

        state = SpecServingState(
            cache=cache, logits=logits0,
            h=h_last[:, 0].astype(jnp.float32), rng=req_keys,
            t=jnp.zeros((B,), jnp.int32),
            gen_buf=jnp.zeros((gen_max + tau, B, K), jnp.int32),
            codebook_eog=jnp.zeros((B, K), bool),
            cur_num_gen=jnp.zeros((B,), jnp.int32),
            consec_silence=jnp.zeros((B,), jnp.int32),
            prev_token=jnp.full((B,), -1, jnp.int32),
            n_passes=jnp.asarray(0, jnp.int32),
            pending=jnp.zeros((B, K), jnp.int32),
            has_pending=jnp.zeros((B,), bool),
            done=jnp.zeros((B,), bool))

        lane_ids = jnp.arange(B)

        def cond(s: SpecServingState):
            return jnp.logical_not(jnp.all(s.done))

        def body(s: SpecServingState) -> SpecServingState:
            active = jnp.logical_not(s.done)                   # [B]

            def tok_key(i):
                # per-(request, token-index): invariant to acceptance
                # patterns and draft count
                return jax.vmap(jax.random.fold_in)(s.rng, s.t + i)

            cell = {}

            def forward(feed):
                h_blk, cell["cache"] = trm.decode_step_multi_block(
                    params["decoder"], feed, s.cache, y_start + s.t,
                    cfg.nhead, x_lens, x_pad, prefix_lens, y_start,
                    gen_lens=s.t)
                return h_blk

            out = spec_verify_pass(
                params, cfg, sample_lanes, tau=tau, gate=active,
                tok_key=tok_key, y_pos0=prefix_lens + s.t, x_lens=x_lens,
                logits=s.logits, h=s.h, eog=s.codebook_eog,
                cng=s.cur_num_gen, consec=s.consec_silence,
                prev=s.prev_token, t=s.t, accept_cap=gen_max, pe=pe,
                alpha_a=alpha_a, dtype=dtype, forward=forward,
                bench_mode=bench_mode, force_accept=force_accept,
                scfg=scfg, is_tts=True, cap_mult=cap_mult,
                pending=s.pending, has_pending=s.has_pending)

            # -- record accepted prefixes; garbage rows beyond n_acc are
            #    overwritten by later passes or never read (rows < t only) --
            r_idx = s.t[:, None] + jnp.arange(tau)[None, :]    # [B, tau]
            gen_buf = s.gen_buf.at[r_idx, lane_ids[:, None]].set(out["blk"])

            t_new = s.t + out["n_acc"]
            done = s.done | (active & jnp.all(out["eog"], axis=1)) \
                | (t_new >= gen_max)

            return SpecServingState(
                cache=cell["cache"], logits=out["logits_next"],
                h=out["h_next"], rng=s.rng, t=t_new, gen_buf=gen_buf,
                codebook_eog=out["eog"], cur_num_gen=out["cng"],
                consec_silence=out["consec"], prev_token=out["prev"],
                n_passes=s.n_passes + 1, pending=out["pending"],
                has_pending=out["has_pending"], done=done)

        final = jax.lax.while_loop(cond, body, state)
        return final.gen_buf, final.t, final.n_passes

    return jax.jit(decode)


@lru_cache(maxsize=8)
def _get_spec_serving_loop(cfg, B, n_draft, x_pad, y_pad, gen_max, scfg,
                           kv_dtype=None):
    return make_spec_serving_loop(cfg, batch_size=B, n_draft=n_draft,
                                  x_pad=x_pad, y_pad=y_pad, gen_max=gen_max,
                                  scfg=scfg, kv_dtype=kv_dtype)


@lru_cache(maxsize=8)
def _get_serving_loop(cfg, B, x_pad, y_pad, gen_max, scfg, kv_dtype=None):
    return make_serving_tts_loop(cfg, batch_size=B, x_pad=x_pad, y_pad=y_pad,
                                 gen_max=gen_max, scfg=scfg,
                                 kv_dtype=kv_dtype)


def _ceil(v, m):
    return (v + m - 1) // m * m


def serve_tts_batch(params, cfg: ModelConfig,
                    requests: Sequence[Tuple[np.ndarray, np.ndarray]],
                    scfg: SamplingConfig = SamplingConfig(),
                    seed: int = 1,
                    pads: Optional[Tuple[int, int, int]] = None,
                    kv_dtype: Optional[str] = None,
                    spec: int = 0,
                    mesh=None,
                    seeds: Optional[Sequence[int]] = None,
                    stats: Optional[dict] = None,
                    ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Decode a batch of (x_tokens [Lx], y_codes [K, T]) requests.

    ``seeds``: optional per-request seeds (len == len(requests)) — each
    lane's RNG stream is fold_in(PRNGKey(seeds[b]), b), so a wave can mix
    requests with different seeds; identical same-seed requests in
    different lanes still draw independently.  Default: ``seed`` for all.

    ``spec=TAU`` (>1) uses verified speculative decoding over all lanes
    (make_spec_serving_loop): requires params["mtp_heads"]; greedy per-lane
    output matches the plain serving loop (f32), sampled output uses the
    per-token-index key schedule and is invariant to TAU.

    ``mesh``: a Mesh with a 'data' axis for multi-chip scale-out — lane
    inputs are committed to P('data') shardings so each data-group decodes
    its own lanes (params may additionally be tensor-parallel over 'model',
    parallel/mesh.py); GSPMD keeps every per-lane op local and only the
    loop's all-lanes-done reduction crosses chips.  B must be divisible by
    the data axis size.  Lockstep serving is embarrassingly parallel over
    lanes, so aggregate throughput scales ~linearly with data-parallel
    chips (tests/test_parallel_inference.py).

    ``stats``: optional dict filled in-place with the wave's telemetry —
    {"frames": total generated rows, "seconds": wall time of the decode
    loop (timed through the host readback — block_until_ready can return
    early on this backend), "spec": the mode used, "tok_per_pass": mean
    accepted tokens per speculative pass (None for plain)}.  Feed these to
    :class:`voicecraft_tpu.inference.autospec.AutoSpecPolicy` for online
    plain-vs-spec mode selection.

    Returns [(full_codes, generated_codes)] per request, reference
    inference_tts output semantics per lane.
    """
    import time as _time
    from .loader import _cpu_dtype_fix
    cfg = _cpu_dtype_fix(cfg)   # CPU XLA can't do bf16 dots at B>1
    K = cfg.n_codebooks
    B = len(requests)
    prefixes = [spans.compose_tts_prefix(
        y + (cfg.n_special if cfg.special_first else 0), cfg)
        for _, y in requests]
    x_lens = np.asarray([len(x) for x, _ in requests], np.int32)
    p_lens = np.asarray([p.length for p in prefixes], np.int32)
    cap = cfg.encodec_sr // 5
    if pads is None:
        x_pad = _ceil(int(x_lens.max()), 32)
        y_pad = _ceil(int(p_lens.max()), 64)
        gen_max = _ceil(int((x_lens * cap - p_lens).max()) + K + 8, 128)
    else:
        x_pad, y_pad, gen_max = pads

    xt = np.full((B, x_pad), cfg.text_pad_token, np.int32)
    yt = np.full((B, K, y_pad), cfg.empty_token, np.int32)
    for b, ((x, _), p) in enumerate(zip(requests, prefixes)):
        xt[b, :len(x)] = x
        yt[b, :, :p.length] = p.tokens

    lane_seeds = np.asarray(
        [seed] * B if seeds is None else list(seeds), np.int32)
    assert lane_seeds.shape == (B,), (lane_seeds.shape, B)

    def lane_args():
        arrs = (jnp.asarray(xt), jnp.asarray(x_lens), jnp.asarray(yt),
                jnp.asarray(p_lens), jnp.asarray(lane_seeds))
        if mesh is None:
            return arrs
        from jax.sharding import NamedSharding, PartitionSpec as P
        assert B % mesh.shape["data"] == 0, (B, dict(mesh.shape))
        return tuple(jax.device_put(
            a, NamedSharding(mesh, P(*(["data"] + [None] * (a.ndim - 1)))))
            for a in arrs)

    t0 = _time.perf_counter()
    tok_per_pass = None
    if spec > 1:
        from ..models.voicecraft import check_mtp_heads
        check_mtp_heads(params, spec, scfg)
        loop = _get_spec_serving_loop(cfg, B, spec, x_pad, y_pad, gen_max,
                                      scfg, kv_dtype)
        gen_buf, t_acc, n_passes = loop(params, *lane_args())
        gen_buf = np.asarray(gen_buf)
        n_rows = np.asarray(t_acc)
        np_ = int(n_passes)
        if np_ > 0:
            tok_per_pass = float(n_rows.mean()) / np_
    else:
        loop = _get_serving_loop(cfg, B, x_pad, y_pad, gen_max, scfg,
                                 kv_dtype)
        gen_buf, finish_t = loop(params, *lane_args())
        gen_buf = np.asarray(gen_buf)
        finish_t = np.asarray(finish_t)
        n_rows = np.where(finish_t >= 0, finish_t + 1, gen_buf.shape[0])
    if stats is not None:
        stats.update(frames=int(n_rows.sum()),
                     seconds=_time.perf_counter() - t0,
                     spec=spec, tok_per_pass=tok_per_pass)

    out = []
    for b, (x, y) in enumerate(requests):
        n = int(n_rows[b])
        rows = gen_buf[:n, b]                                # [n, K]
        if rows.shape[0] <= K:
            gen = np.zeros((K, 0), np.int32)
        else:
            gen = patterns.unshift_span(rows.T).astype(np.int32)
        # the model samples in the +n_special space when special_first; the
        # caller's y is raw, so unshift gen before concatenating (mirrors
        # inference_tts, which shifts y up front and subtracts at the end)
        if cfg.special_first:
            gen = gen - cfg.n_special
        full = np.concatenate([y, gen], axis=1)
        out.append((full, gen))
    return out


# ==============================================================================
# multi-stream speech editing: N distinct edit requests decoded in lockstep
# ==============================================================================

class EditServingState(NamedTuple):
    cache: jnp.ndarray
    logits: jnp.ndarray          # [B, K, card]
    rng: jnp.ndarray             # [B, 2] per-lane keys
    t: jnp.ndarray               # global step counter (uniform write pointer)
    gen_buf: jnp.ndarray         # [gen_max, B, K] recorded tokens per lane
    span_buf: jnp.ndarray        # [gen_max, B] span index of each recording
    gen_cnt: jnp.ndarray         # [B] recorded tokens per lane (!= t: feeds)
    codebook_eog: jnp.ndarray    # [B, K]
    cur_num_gen: jnp.ndarray     # [B] tokens generated in the current span
    consec_silence: jnp.ndarray  # [B]
    prev_token: jnp.ndarray      # [B]
    span_idx: jnp.ndarray        # [B] current generated-span index
    queue: jnp.ndarray           # [B, 2, D] pending mask/empty feed embeds
    queue_len: jnp.ndarray       # [B]
    done: jnp.ndarray            # [B]


def make_serving_edit_loop(cfg: ModelConfig, *, batch_size: int, x_pad: int,
                           y_pad: int, gen_max: int, scfg: SamplingConfig,
                           max_spans: Optional[int] = None,
                           kv_dtype: Optional[str] = None,
                           bench_mode: bool = False):
    """Multi-stream speech editing: N *distinct* edit requests in lockstep.

    The single-sample edit decode (models/voicecraft.py make_decode_loop,
    is_tts=False; reference voicecraft.py:561-906) interleaves recorded
    sampling steps with 2-deep queued mask/empty feed steps at span
    transitions, so lanes de-synchronise logically — but every step (feed
    or record) writes exactly one KV row, so the SLAB write pointer stays
    uniform across lanes (y_start + t) and lockstep batching works exactly
    like TTS serving: per-lane validity masks carve the pads
    (decode_step_multi) and all span machinery vectorises as [B] state.
    Recorded tokens land at per-lane compact offsets (gen_buf scatter at
    gen_cnt[b]), so variable feed schedules never fragment a lane's output.

    Frozen lanes (all spans done, or the per-lane gen_max budget reached)
    keep writing garbage rows at the uniform pointer; correctness follows
    from the same argument as the engine's ring slab: only the lane's OWN
    attention reads them, and a frozen lane's samples/state updates are
    gated off (`active`) — its recorded prefix is already final.

    Returns jitted fn(params, x_tokens [B,x_pad], x_lens [B],
      y_prefix [B,K,y_pad], prefix_lens [B], mask_emb_idx [B,y_pad],
      queue_mask_ids [B,max_spans], n_spans [B], lane_seeds [B])
      -> (gen_buf [gen_max,B,K], span_buf [gen_max,B], gen_cnt [B]).
    """
    from ..models.voicecraft import init_params  # noqa: F401 (docs only)
    K, D = cfg.n_codebooks, cfg.d_model
    H, Dh, L = cfg.nhead, cfg.head_dim, cfg.num_decoder_layers
    B = batch_size
    dtype = jnp.dtype(cfg.compute_dtype)
    cache_dtype = jnp.dtype(kv_dtype) if kv_dtype else dtype
    cap_mult = 10                                  # editing cap, voicecraft.py:751
    if max_spans is None:
        max_spans = cfg.max_n_spans
    y_start = x_pad + y_pad
    # 2 feed steps per span transition ride the same uniform pointer
    t_max = gen_max + 2 * (max_spans - 1)
    s_max = y_start + t_max
    pe_np = sine_table(MAX_POS, D)

    from ..models.voicecraft import _adjust_and_sample
    sample_lane = jax.vmap(
        lambda rng, lg, eog, cng, cs, pt, yp, xl: _adjust_and_sample(
            cfg, scfg, False, cap_mult, rng, lg, eog, cng, cs, pt, yp, xl))

    def decode(params, x_tokens, x_lens, y_prefix, prefix_lens,
               mask_emb_idx, queue_mask_ids, n_spans, lane_seeds):
        pe = jnp.asarray(pe_np).astype(dtype)
        alpha_a = params["alpha_audio"].astype(dtype)
        lane_keys = jax.vmap(
            lambda s, b: jax.random.fold_in(jax.random.PRNGKey(s), b))(
                lane_seeds, jnp.arange(B))
        lane_ids = jnp.arange(B)

        # ---- prefill (TTS serving prefill + mask-embedding substitution,
        # models/voicecraft.py make_decode_loop prefill) ----
        x_emb = jnp.take(params["text_emb"]["weight"], x_tokens,
                         axis=0).astype(dtype)
        x_in = x_emb + params["alpha_text"].astype(dtype) * pe[:x_pad]
        y_emb = embed_audio_tokens(params["audio_emb"], y_prefix).astype(dtype)
        is_mask = mask_emb_idx >= 0                          # [B, y_pad]
        mask_vecs = jnp.take(params["mask_emb"],
                             jnp.maximum(mask_emb_idx, 0),
                             axis=0).astype(dtype)           # [B, y_pad, D]
        y_emb = jnp.where(is_mask[..., None], mask_vecs, y_emb)
        y_in = y_emb + alpha_a * pe[:y_pad]
        xy = jnp.concatenate([x_in, y_in], axis=1)

        from ..ops.flash_attention import (flash_prefix_attention,
                                           use_flash_prefill)
        if use_flash_prefill(y_start):
            bias = lambda q, k, v: flash_prefix_attention(
                q, k, v, x_lens, prefix_lens, x_pad, cfg.nhead)
        else:
            jj = jnp.arange(y_start)
            key_valid = ((jj[None, :] < x_lens[:, None])
                         | ((jj[None, :] >= x_pad)
                            & (jj[None, :] < x_pad + prefix_lens[:, None])))
            allowed = (jj[None, :] <= jj[:, None])[None] & key_valid[:, None, :]
            bias = jnp.where(allowed, 0.0,
                             NEG_INF).astype(jnp.float32)[:, None]

        cache = trm.init_kv_cache(L, B, s_max, H, Dh, cache_dtype)
        h, cache = trm.prefill(params["decoder"], xy, bias, cache, cfg.nhead)
        last_idx = x_pad + prefix_lens - 1
        h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)
        logits0 = apply_heads(params["heads"], h_last)[:, 0]

        empty_emb = embed_audio_tokens(
            params["audio_emb"],
            jnp.full((1, K, 1), cfg.empty_token,
                     jnp.int32))[0, 0].astype(dtype)         # [D]

        state = EditServingState(
            cache=cache, logits=logits0, rng=lane_keys,
            t=jnp.asarray(0, jnp.int32),
            gen_buf=jnp.zeros((gen_max, B, K), jnp.int32),
            span_buf=jnp.zeros((gen_max, B), jnp.int32),
            gen_cnt=jnp.zeros((B,), jnp.int32),
            codebook_eog=jnp.zeros((B, K), bool),
            cur_num_gen=jnp.zeros((B,), jnp.int32),
            consec_silence=jnp.zeros((B,), jnp.int32),
            prev_token=jnp.full((B,), -1, jnp.int32),
            span_idx=jnp.zeros((B,), jnp.int32),
            queue=jnp.zeros((B, 2, D), dtype),
            queue_len=jnp.zeros((B,), jnp.int32),
            done=jnp.zeros((B,), bool))

        def cond(s: EditServingState):
            return jnp.logical_not(jnp.all(s.done)) & (s.t < t_max)

        def body(s: EditServingState) -> EditServingState:
            # vectorised transliteration of make_decode_loop's substep; the
            # `active` gating there (written for steps_per_iter sub-steps
            # past done/budget, documented output-identical) is exactly the
            # frozen-lane gating lockstep needs
            active = jnp.logical_not(s.done) & (s.gen_cnt < gen_max)  # [B]
            pairs = jax.vmap(lambda k: jax.random.split(k, 2))(s.rng)
            rng, step_rngs = pairs[:, 0], pairs[:, 1]
            feeding = s.queue_len > 0                                  # [B]
            y_pos = prefix_lens + s.t                                  # [B]

            samples, new_eog, new_consec, new_prev = sample_lane(
                step_rngs, s.logits, s.codebook_eog, s.cur_num_gen,
                s.consec_silence, s.prev_token, y_pos, x_lens)
            if bench_mode:
                # benchmarking: never terminate, run every lane to budget
                new_eog = jnp.zeros_like(new_eog)
                samples = jnp.where(samples >= cfg.audio_vocab_size,
                                    0, samples)

            span_complete = (jnp.all(new_eog, axis=1)
                             & jnp.logical_not(feeding) & active)
            record = jnp.logical_not(feeding) & active

            # per-lane compact recording (clamped: frozen lanes at budget
            # gather/rewrite their last slot, a no-op since record=False)
            w_idx = jnp.minimum(s.gen_cnt, gen_max - 1)
            old_rows = s.gen_buf[w_idx, lane_ids]                      # [B, K]
            gen_buf = s.gen_buf.at[w_idx, lane_ids].set(
                jnp.where(record[:, None], samples, old_rows))
            old_span = s.span_buf[w_idx, lane_ids]
            span_buf = s.span_buf.at[w_idx, lane_ids].set(
                jnp.where(record, s.span_idx, old_span))
            gen_cnt = s.gen_cnt + record.astype(jnp.int32)

            sample_emb = embed_audio_tokens(
                params["audio_emb"], samples[:, :, None])[:, 0].astype(dtype)
            feed_emb = jnp.where(feeding[:, None], s.queue[:, 0], sample_emb)

            # queue management (voicecraft.py:838-858): on span completion
            # with spans remaining, enqueue [mask_emb(next), empty_emb]
            more_spans = (s.span_idx + 1) < n_spans
            start_next = span_complete & more_spans
            next_mask_id = queue_mask_ids[
                lane_ids, jnp.minimum(s.span_idx + 1, max_spans - 1)]
            new_queue = jnp.stack(
                [jnp.take(params["mask_emb"], next_mask_id,
                          axis=0).astype(dtype),
                 jnp.broadcast_to(empty_emb, (B, D))], axis=1)  # [B, 2, D]
            consume = feeding & active
            shifted = jnp.stack([s.queue[:, 1], s.queue[:, 1]], axis=1)
            queue = jnp.where(start_next[:, None, None], new_queue,
                              jnp.where(consume[:, None, None], shifted,
                                        s.queue))
            queue_len = jnp.where(start_next, 2,
                                  jnp.where(consume, s.queue_len - 1,
                                            s.queue_len))

            done = s.done | (span_complete & jnp.logical_not(more_spans))
            span_idx = s.span_idx + start_next.astype(jnp.int32)

            # per-span resets; frozen/feeding lanes keep their state
            keep = feeding | jnp.logical_not(active)
            codebook_eog = jnp.where(span_complete[:, None],
                                     jnp.zeros_like(new_eog),
                                     jnp.where(keep[:, None],
                                               s.codebook_eog, new_eog))
            cur_num_gen = jnp.where(span_complete, 0,
                                    jnp.where(keep, s.cur_num_gen,
                                              s.cur_num_gen + 1))
            consec = jnp.where(span_complete, 0,
                               jnp.where(keep, s.consec_silence, new_consec))
            prev = jnp.where(span_complete, -1,
                             jnp.where(keep, s.prev_token, new_prev))

            feed = feed_emb + alpha_a * jnp.take(pe, y_pos, axis=0)
            h, cache = trm.decode_step_multi(
                params["decoder"], feed[:, None, :], s.cache,
                y_start + s.t, cfg.nhead, x_lens, x_pad, prefix_lens,
                y_start)
            logits = apply_heads(params["heads"], h)[:, 0]

            return EditServingState(cache, logits, rng, s.t + 1, gen_buf,
                                    span_buf, gen_cnt, codebook_eog,
                                    cur_num_gen, consec, prev, span_idx,
                                    queue, queue_len, done)

        final = jax.lax.while_loop(cond, body, state)
        return final.gen_buf, final.span_buf, final.gen_cnt

    return jax.jit(decode)


class SpecEditServingState(NamedTuple):
    cache: jnp.ndarray
    logits: jnp.ndarray          # [B, K, card] main-head logits, next slot
    h: jnp.ndarray               # [B, D] hidden at last consumed position
    rng: jnp.ndarray             # [B, 2] per-lane keys (token-index fold)
    t: jnp.ndarray               # [B] slab rows past y_start (feeds + accepted)
    gen_buf: jnp.ndarray         # [gen_max + tau, B, K]
    span_buf: jnp.ndarray        # [gen_max + tau, B]
    gen_cnt: jnp.ndarray         # [B] recorded tokens per lane
    codebook_eog: jnp.ndarray    # [B, K]
    cur_num_gen: jnp.ndarray     # [B]
    consec_silence: jnp.ndarray  # [B]
    prev_token: jnp.ndarray      # [B]
    span_idx: jnp.ndarray        # [B]
    queue: jnp.ndarray           # [B, 2, D] pending mask/empty feed embeds
    queue_len: jnp.ndarray       # [B]
    n_passes: jnp.ndarray        # scalar
    pending: jnp.ndarray         # [B, K] stochastic-verify corrected token
    has_pending: jnp.ndarray     # [B]
    done: jnp.ndarray            # [B]


def make_spec_serving_edit_loop(cfg: ModelConfig, *, batch_size: int,
                                n_draft: int, x_pad: int, y_pad: int,
                                gen_max: int, scfg: SamplingConfig,
                                max_spans: Optional[int] = None,
                                kv_dtype: Optional[str] = None,
                                bench_mode: bool = False):
    """Speculative multi-stream speech editing: N distinct edit requests,
    tau tokens per lane per verified pass.

    Vectorises make_spec_edit_loop (models/voicecraft.py) over lanes the
    way make_spec_serving_loop vectorises the single-stream TTS spec loop:
    the verify semantics live in inference/spec_common.spec_verify_pass and
    this loop owns only the plumbing.  The one genuinely new situation is
    that lanes can be in DIFFERENT modes within one pass — lane A runs a
    sampling pass (drafts verified, advances by its accepted count) while
    lane B runs a span-transition FEED pass (its two queued embeddings ride
    slots 0-1 of the same tau-block via the ``mix_emb`` hook, advancing by
    exactly 2; slots 2.. are rewind-trick garbage).  Because lanes advance
    at different rates, each lane writes its block at its own compact slab
    offset (transformer.decode_step_multi_block, offsets = y_start + t_b)
    and validity stays per-lane length arithmetic — exactly the spec-TTS
    serving story, with ``t_b`` counting feeds + accepted tokens.

    Feed lanes are gated OFF in the verify core (their sampling state is
    frozen); their next pass is seeded from the RAW block outputs at slot 1
    (the empty embedding's logits open the next span, matching the plain
    loop).  Greedy per-lane output is token-identical to the plain batched
    edit loop AND to inference_edit(spec=) in f32; stochastic verification
    composes per-lane by the same argument as the single-stream loop
    (a pending capture and a span completion are mutually exclusive).

    Returns jitted fn(params, x_tokens [B,x_pad], x_lens [B],
      y_prefix [B,K,y_pad], prefix_lens [B], mask_emb_idx [B,y_pad],
      queue_mask_ids [B,max_spans], n_spans [B], lane_seeds [B])
      -> (gen_buf [gen_max+tau,B,K], span_buf [gen_max+tau,B], gen_cnt [B],
          n_passes).

    Matches reference voicecraft.py:561-906 editing semantics per lane.
    """
    from .spec_common import make_lane_sampler, spec_verify_pass
    assert n_draft >= 2, "spec editing needs n_draft >= 2 (feed pass)"
    K, D = cfg.n_codebooks, cfg.d_model
    H, Dh, L = cfg.nhead, cfg.head_dim, cfg.num_decoder_layers
    B = batch_size
    tau = n_draft
    dtype = jnp.dtype(cfg.compute_dtype)
    cache_dtype = jnp.dtype(kv_dtype) if kv_dtype else dtype
    cap_mult = 10                                  # editing cap, voicecraft.py:751
    if max_spans is None:
        max_spans = cfg.max_n_spans
    y_start = x_pad + y_pad
    s_max = y_start + gen_max + tau + 2 * (max_spans - 1)
    pe_np = sine_table(MAX_POS, D)
    sample_lanes = make_lane_sampler(cfg, scfg, cap_mult, is_tts=False)

    def decode(params, x_tokens, x_lens, y_prefix, prefix_lens,
               mask_emb_idx, queue_mask_ids, n_spans, lane_seeds):
        pe = jnp.asarray(pe_np).astype(dtype)
        alpha_a = params["alpha_audio"].astype(dtype)
        lane_keys = jax.vmap(
            lambda s, b: jax.random.fold_in(jax.random.PRNGKey(s), b))(
                lane_seeds, jnp.arange(B))
        lane_ids = jnp.arange(B)

        # ---- prefill (identical to make_serving_edit_loop) ----
        x_emb = jnp.take(params["text_emb"]["weight"], x_tokens,
                         axis=0).astype(dtype)
        x_in = x_emb + params["alpha_text"].astype(dtype) * pe[:x_pad]
        y_emb = embed_audio_tokens(params["audio_emb"], y_prefix).astype(dtype)
        is_mask = mask_emb_idx >= 0                          # [B, y_pad]
        mask_vecs = jnp.take(params["mask_emb"],
                             jnp.maximum(mask_emb_idx, 0),
                             axis=0).astype(dtype)           # [B, y_pad, D]
        y_emb = jnp.where(is_mask[..., None], mask_vecs, y_emb)
        y_in = y_emb + alpha_a * pe[:y_pad]
        xy = jnp.concatenate([x_in, y_in], axis=1)

        from ..ops.flash_attention import (flash_prefix_attention,
                                           use_flash_prefill)
        if use_flash_prefill(y_start):
            bias = lambda q, k, v: flash_prefix_attention(
                q, k, v, x_lens, prefix_lens, x_pad, cfg.nhead)
        else:
            jj = jnp.arange(y_start)
            key_valid = ((jj[None, :] < x_lens[:, None])
                         | ((jj[None, :] >= x_pad)
                            & (jj[None, :] < x_pad + prefix_lens[:, None])))
            allowed = (jj[None, :] <= jj[:, None])[None] & key_valid[:, None, :]
            bias = jnp.where(allowed, 0.0,
                             NEG_INF).astype(jnp.float32)[:, None]

        cache = trm.init_kv_cache(L, B, s_max, H, Dh, cache_dtype)
        h, cache = trm.prefill(params["decoder"], xy, bias, cache, cfg.nhead)
        last_idx = x_pad + prefix_lens - 1
        h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)
        logits0 = apply_heads(params["heads"], h_last)[:, 0]

        empty_emb = embed_audio_tokens(
            params["audio_emb"],
            jnp.full((1, K, 1), cfg.empty_token,
                     jnp.int32))[0, 0].astype(dtype)         # [D]

        state = SpecEditServingState(
            cache=cache, logits=logits0,
            h=h_last[:, 0].astype(jnp.float32), rng=lane_keys,
            t=jnp.zeros((B,), jnp.int32),
            gen_buf=jnp.zeros((gen_max + tau, B, K), jnp.int32),
            span_buf=jnp.zeros((gen_max + tau, B), jnp.int32),
            gen_cnt=jnp.zeros((B,), jnp.int32),
            codebook_eog=jnp.zeros((B, K), bool),
            cur_num_gen=jnp.zeros((B,), jnp.int32),
            consec_silence=jnp.zeros((B,), jnp.int32),
            prev_token=jnp.full((B,), -1, jnp.int32),
            span_idx=jnp.zeros((B,), jnp.int32),
            queue=jnp.zeros((B, 2, D), dtype),
            queue_len=jnp.zeros((B,), jnp.int32),
            n_passes=jnp.asarray(0, jnp.int32),
            pending=jnp.zeros((B, K), jnp.int32),
            has_pending=jnp.zeros((B,), bool),
            done=jnp.zeros((B,), bool))

        def cond(s: SpecEditServingState):
            return jnp.logical_not(jnp.all(s.done))

        def body(s: SpecEditServingState) -> SpecEditServingState:
            # ~done implies gen_cnt < gen_max (budget sets done below), but
            # keep the active guard self-evident
            active = jnp.logical_not(s.done) & (s.gen_cnt < gen_max)  # [B]
            feeding = (s.queue_len > 0) & active
            gate = active & jnp.logical_not(feeding)

            def tok_key(i):
                # per-(lane, recorded-token-index): invariant to acceptance
                # patterns and tau, the single-stream spec-edit schedule
                return jax.vmap(jax.random.fold_in)(s.rng, s.gen_cnt + i)

            # feed lanes substitute [mask_emb(next), empty_emb, 0...] for
            # their token embeddings; their verify lanes are gated off
            feed_emb = jnp.concatenate(
                [s.queue, jnp.zeros((B, tau - 2, D), dtype)], axis=1)
            mix = lambda e: jnp.where(feeding[:, None, None], feed_emb, e)

            cell = {}

            def forward(feed):
                h_blk, cell["cache"] = trm.decode_step_multi_block(
                    params["decoder"], feed, s.cache, y_start + s.t,
                    cfg.nhead, x_lens, x_pad, prefix_lens, y_start,
                    gen_lens=s.t)
                return h_blk

            out = spec_verify_pass(
                params, cfg, sample_lanes, tau=tau, gate=gate,
                tok_key=tok_key, y_pos0=prefix_lens + s.t, x_lens=x_lens,
                logits=s.logits, h=s.h, eog=s.codebook_eog,
                cng=s.cur_num_gen, consec=s.consec_silence,
                prev=s.prev_token, t=s.gen_cnt, accept_cap=gen_max, pe=pe,
                alpha_a=alpha_a, dtype=dtype, forward=forward,
                mix_emb=mix, bench_mode=bench_mode, scfg=scfg,
                is_tts=False, cap_mult=cap_mult,
                pending=s.pending, has_pending=s.has_pending)

            # -- record accepted prefixes at per-lane compact offsets;
            #    rows >= n_acc are garbage beyond the lane's validity,
            #    overwritten by later passes or never read --
            r_idx = s.gen_cnt[:, None] + jnp.arange(tau)[None, :]  # [B, tau]
            gen_buf = s.gen_buf.at[r_idx, lane_ids[:, None]].set(out["blk"])
            span_buf = s.span_buf.at[r_idx, lane_ids[:, None]].set(
                jnp.broadcast_to(s.span_idx[:, None], (B, tau)))
            gen_cnt = s.gen_cnt + out["n_acc"]

            # -- span transition bookkeeping (voicecraft.py:827-858),
            #    vectorised; all accepted slots of a pass share span_idx
            #    because `alive` kills slots after an accepted all-eog --
            eog_f = out["eog"]
            span_complete = gate & jnp.all(eog_f, axis=1)
            more_spans = (s.span_idx + 1) < n_spans
            start_next = span_complete & more_spans
            next_mask_id = queue_mask_ids[
                lane_ids, jnp.minimum(s.span_idx + 1, max_spans - 1)]
            new_queue = jnp.stack(
                [jnp.take(params["mask_emb"], next_mask_id,
                          axis=0).astype(dtype),
                 jnp.broadcast_to(empty_emb, (B, D))], axis=1)  # [B, 2, D]
            # a feed pass consumes BOTH queued embeddings in one block
            queue = jnp.where(start_next[:, None, None], new_queue, s.queue)
            queue_len = jnp.where(start_next, 2,
                                  jnp.where(feeding, 0, s.queue_len))
            done = (s.done | (span_complete & jnp.logical_not(more_spans))
                    | (gen_cnt >= gen_max))
            span_idx = s.span_idx + start_next.astype(jnp.int32)

            # per-span resets; feed/frozen lanes' verify-carry state is
            # already gate-frozen by the verify core
            codebook_eog = jnp.where(span_complete[:, None],
                                     jnp.zeros_like(eog_f), eog_f)
            cur_num_gen = jnp.where(span_complete, 0, out["cng"])
            consec = jnp.where(span_complete, 0, out["consec"])
            prev = jnp.where(span_complete, -1, out["prev"])

            # -- per-lane advance + next-pass seeding: feed lanes advance 2
            #    and hand over the SECOND feed's raw outputs (the empty
            #    embedding's logits open the next span); sampling lanes use
            #    the gate-aware *_next fields --
            n_adv = jnp.where(feeding, 2, out["n_acc"])
            logits_next = jnp.where(
                feeding[:, None, None],
                out["logits_blk"][:, 1].astype(s.logits.dtype),
                out["logits_next"])
            h_next = jnp.where(feeding[:, None],
                               out["h_blk"][:, 1].astype(jnp.float32),
                               out["h_next"])

            return SpecEditServingState(
                cache=cell["cache"], logits=logits_next, h=h_next,
                rng=s.rng, t=s.t + n_adv, gen_buf=gen_buf,
                span_buf=span_buf, gen_cnt=gen_cnt,
                codebook_eog=codebook_eog, cur_num_gen=cur_num_gen,
                consec_silence=consec, prev_token=prev, span_idx=span_idx,
                queue=queue, queue_len=queue_len,
                n_passes=s.n_passes + 1, pending=out["pending"],
                has_pending=out["has_pending"], done=done)

        final = jax.lax.while_loop(cond, body, state)
        return (final.gen_buf, final.span_buf, final.gen_cnt,
                final.n_passes)

    return jax.jit(decode)


@lru_cache(maxsize=8)
def _get_serving_edit_loop(cfg, B, x_pad, y_pad, gen_max, scfg, max_spans,
                           kv_dtype=None):
    return make_serving_edit_loop(cfg, batch_size=B, x_pad=x_pad,
                                  y_pad=y_pad, gen_max=gen_max, scfg=scfg,
                                  max_spans=max_spans, kv_dtype=kv_dtype)


@lru_cache(maxsize=8)
def _get_spec_serving_edit_loop(cfg, B, n_draft, x_pad, y_pad, gen_max,
                                scfg, max_spans, kv_dtype=None):
    return make_spec_serving_edit_loop(
        cfg, batch_size=B, n_draft=n_draft, x_pad=x_pad, y_pad=y_pad,
        gen_max=gen_max, scfg=scfg, max_spans=max_spans, kv_dtype=kv_dtype)


def serve_edit_batch(params, cfg: ModelConfig,
                     requests: Sequence[Tuple[np.ndarray, np.ndarray,
                                              Sequence[Tuple[int, int]]]],
                     scfg: SamplingConfig = SamplingConfig(),
                     seed: int = 1,
                     pads: Optional[Tuple[int, int, int]] = None,
                     kv_dtype: Optional[str] = None,
                     spec: int = 0,
                     mesh=None,
                     seeds: Optional[Sequence[int]] = None,
                     stats: Optional[dict] = None) -> List[np.ndarray]:
    """Decode a batch of (x_tokens [Lx], y_codes [K,T], mask_intervals)
    speech-editing requests in one lockstep wave.

    The reference (and our single-stream driver) edits one utterance at a
    time; batch-1 decode is weight-bandwidth-bound, so a RealEdit-style
    corpus pays the full weight-streaming cost per row.  This serves N
    distinct edit requests — each with its own transcript, codes, and span
    set — for ~the cost of one (inference/serving.py module docstring).

    Per-request outputs carry the semantics of :func:`inference_edit`:
    unedited frames preserved verbatim, generated spans spliced between
    them.  Greedy per-lane output matches the single-stream edit decode
    (f32; cross-batch reduction ties aside, CLAUDE.md).  ``seeds``/
    ``mesh``/``stats`` as in :func:`serve_tts_batch`.

    ``spec=TAU`` (>=2) uses verified speculative decoding over all lanes
    (make_spec_serving_edit_loop): requires params["mtp_heads"]; greedy
    per-lane output matches the plain lanes AND inference_edit(spec=)
    (f32); sampled output uses the per-token-index key schedule and is
    invariant to TAU.

    Returns [spliced_codes [K, T']] per request.
    """
    import time as _time
    from .loader import _cpu_dtype_fix
    cfg = _cpu_dtype_fix(cfg)   # CPU XLA can't do bf16 dots at B>1
    K = cfg.n_codebooks
    B = len(requests)
    shifted, intervals_l, comps, queue_ids_l = [], [], [], []
    for x, y, intervals in requests:
        assert len(intervals) >= 1, "editing needs at least one mask span"
        y = y + cfg.n_special if cfg.special_first else y
        iv = sorted((int(s), int(e)) for s, e in intervals)
        prefix, qids = spans.compose_edit_prefix(y, iv, cfg)
        shifted.append(y)
        intervals_l.append(iv)
        comps.append(prefix)
        queue_ids_l.append(qids)

    x_lens = np.asarray([len(x) for x, _, _ in requests], np.int32)
    p_lens = np.asarray([c.length for c in comps], np.int32)
    n_spans = np.asarray([len(iv) for iv in intervals_l], np.int32)
    if pads is None:
        x_pad = _ceil(int(x_lens.max()), 32)
        y_pad = _ceil(int(p_lens.max()), 64)
        # per-request budget, the run_decode formula (inference/tts.py)
        caps = [max(int(xl) * 10 - int(pl) + K + 8, 2 * K + 8)
                + 3 * (int(m) - 1)
                for xl, pl, m in zip(x_lens, p_lens, n_spans)]
        gen_max = _ceil(max(caps), 128)
    else:
        x_pad, y_pad, gen_max = pads

    max_spans = cfg.max_n_spans
    xt = np.full((B, x_pad), cfg.text_pad_token, np.int32)
    yt = np.full((B, K, y_pad), cfg.empty_token, np.int32)
    mi = np.full((B, y_pad), -1, np.int32)
    qm = np.zeros((B, max_spans), np.int32)
    for b, ((x, _, _), c, qids) in enumerate(zip(requests, comps,
                                                 queue_ids_l)):
        xt[b, :len(x)] = x
        yt[b, :, :c.length] = c.tokens
        mi[b, :c.length] = c.mask_emb_idx
        for j, v in enumerate(qids[:max_spans]):
            qm[b, j] = v

    lane_seeds = np.asarray(
        [seed] * B if seeds is None else list(seeds), np.int32)
    assert lane_seeds.shape == (B,), (lane_seeds.shape, B)

    arrs = (jnp.asarray(xt), jnp.asarray(x_lens), jnp.asarray(yt),
            jnp.asarray(p_lens), jnp.asarray(mi), jnp.asarray(qm),
            jnp.asarray(n_spans), jnp.asarray(lane_seeds))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        assert B % mesh.shape["data"] == 0, (B, dict(mesh.shape))
        arrs = tuple(jax.device_put(
            a, NamedSharding(mesh, P(*(["data"] + [None] * (a.ndim - 1)))))
            for a in arrs)

    t0 = _time.perf_counter()
    tok_per_pass = None
    if spec > 1:
        from ..models.voicecraft import check_mtp_heads
        check_mtp_heads(params, spec, scfg)
        loop = _get_spec_serving_edit_loop(cfg, B, spec, x_pad, y_pad,
                                           gen_max, scfg, max_spans,
                                           kv_dtype)
        gen_buf, span_buf, gen_cnt, n_passes = loop(params, *arrs)
        np_ = int(n_passes)
        gen_cnt = np.asarray(gen_cnt)
        if np_ > 0:
            tok_per_pass = float(gen_cnt.mean()) / np_
    else:
        loop = _get_serving_edit_loop(cfg, B, x_pad, y_pad, gen_max, scfg,
                                      max_spans, kv_dtype)
        gen_buf, span_buf, gen_cnt = loop(params, *arrs)
        gen_cnt = np.asarray(gen_cnt)
    gen_buf = np.asarray(gen_buf)
    span_buf = np.asarray(span_buf)
    if stats is not None:
        stats.update(frames=int(gen_cnt.sum()),
                     seconds=_time.perf_counter() - t0,
                     spec=spec, tok_per_pass=tok_per_pass)

    out = []
    for b, (y, iv) in enumerate(zip(shifted, intervals_l)):
        rows = gen_buf[:gen_cnt[b], b]                       # [n, K]
        span_of = span_buf[:gen_cnt[b], b]
        gen_spans = []
        for j in range(len(iv)):
            rj = rows[span_of == j]
            if rj.shape[0] <= K:
                gen_spans.append(np.zeros((K, 0), np.int32))
            else:
                gen_spans.append(patterns.unshift_span(rj.T).astype(np.int32))
        # splice: unedited segments verbatim, generated spans between
        # (inference/editing.py result assembly)
        y_len = y.shape[1]
        starts = [s for s, _ in iv]
        ends = [e for _, e in iv]
        non_mask = list(zip([0] + ends, starts + [y_len]))
        parts = []
        for j, (lo, hi) in enumerate(non_mask[:-1]):
            parts.append(y[:, lo:hi])
            parts.append(gen_spans[j])
        lo, hi = non_mask[-1]
        parts.append(y[:, lo:hi])
        res = np.concatenate(parts, axis=1)
        if cfg.special_first:
            res = res - cfg.n_special
        out.append(res)
    return out
