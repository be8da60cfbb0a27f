"""VoiceCraft model core — functional JAX/TPU implementation.

Reimplements the reference ``VoiceCraft`` module (models/voicecraft.py:90-1439)
as pure functions over a parameter pytree.  The architecture is identical
(per-codebook summed embeddings, learned mask embeddings, sine positional
embeddings with learnable alpha, pre-norm transformer decoder, per-codebook
2-layer GELU prediction heads); the *mechanics* are redesigned for XLA:

  * Training: the reference's host-side span machinery
    (rearrange/shift/insert_mask/cat_y + remove_mask/revert_pattern,
    voicecraft.py:239-404,519-534) collapses to a single identity once you
    observe that for the delayed pattern, "revert logits and align with
    targets" is exactly next-token prediction in the *delayed* space
    restricted to slots holding real tokens (see ops/patterns.py).  The host
    composes one [B, K, S] token grid + validity masks (data/spans.py) and the
    device runs one fused forward + shifted masked cross-entropy.

  * Inference: the reference's unbounded ``past = cat(past, present)`` loop
    with per-step mask rebuilds (voicecraft.py:1068-1120) becomes a
    ``lax.while_loop`` over a single jit-compiled decode step with a
    preallocated KV slab and static shapes.  Multi-span editing's
    "feed [last, mask, empty] 3-token resume" (voicecraft.py:838-858) is
    expressed as a 2-deep embedding feed queue — feeding tokens one at a time
    through the causal KV cache is mathematically identical to feeding 3 at
    once.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.attention import segment_padding_bias, NEG_INF
from ..ops.sampling import sample as sample_tokens
from .embedding import sine_table, init_token_embedding
from . import transformer as trm

BAN = -10000.0  # reference's in-place logit ban value (voicecraft.py:722-723)

MAX_POS = 4096  # positional table size (reference buffer starts at 4000 and
                # auto-extends, embedding.py:67; we keep it static)


# ==============================================================================
# parameters
# ==============================================================================

def init_params(cfg: ModelConfig, key) -> dict:
    """Initialise the full parameter pytree (reference voicecraft.py:137-185)."""
    dtype = jnp.dtype(cfg.param_dtype)
    keys = jax.random.split(key, 6 + cfg.n_codebooks)
    K, D, card = cfg.n_codebooks, cfg.d_model, cfg.card
    half = cfg.audio_vocab_size // 2

    audio_emb = jnp.stack(
        [jax.random.normal(keys[2 + k], (card, D), dtype)
         for k in range(K)], axis=0)                       # [K, card, D]

    # prediction heads: Linear(D, half) -> GELU -> Linear(half, card)
    # (reference voicecraft.py:181-185); torch Linear default init
    def head_init(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        b1 = 1.0 / np.sqrt(D)
        b2 = 1.0 / np.sqrt(half)
        return {
            "w1": jax.random.uniform(k1, (D, half), dtype, -b1, b1),
            "b1": jax.random.uniform(k2, (half,), dtype, -b1, b1),
            "w2": jax.random.uniform(k3, (half, card), dtype, -b2, b2),
            "b2": jax.random.uniform(k4, (card,), dtype, -b2, b2),
        }

    heads = [head_init(k) for k in jax.random.split(keys[3 + K], K)]
    heads = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *heads)

    params = {
        "text_emb": init_token_embedding(keys[0], cfg.n_text_tokens, D, dtype),
        "audio_emb": audio_emb,
        "mask_emb": jax.random.normal(keys[1], (cfg.max_n_spans, D), dtype),
        "alpha_text": jnp.ones((), dtype),
        "alpha_audio": jnp.ones((), dtype),
        "decoder": trm.init_stack(keys[2 + K], cfg.num_decoder_layers, D,
                                  cfg.ffn_dim, dtype, norm=cfg.norm,
                                  activation=cfg.ffn_activation),
        "heads": heads,
    }
    if cfg.n_mtp > 0:
        params["mtp_heads"] = init_mtp_heads(cfg, keys[4 + K])
    return params


def check_mtp_heads(params, n_draft: int, scfg=None) -> None:
    """Validate that a checkpoint can drive n_draft-token speculative decode.

    Without this, ``mtp_heads[:n_draft-1]`` on a checkpoint with fewer head
    groups silently BROADCASTS one head's drafts across the missing offsets
    (numpy-style), collapsing acceptance to ~plain speed with no error.

    With ``scfg``, also warn when sampling temperature > 0: verification
    accepts a draft only when the SAMPLED token equals the greedy MTP
    argmax on all codebook rows, so under temperature sampling acceptance
    is near zero even with well-trained heads and --spec becomes pure
    per-pass overhead.  Speculative speedup is effectively greedy-only.
    """
    if n_draft <= 1:
        return
    if "mtp_heads" not in params:
        raise ValueError("speculative decoding needs params['mtp_heads'] "
                         "(train with n_mtp > 0)")
    n = jax.tree.leaves(params["mtp_heads"])[0].shape[0]
    if n_draft - 1 > n:
        raise ValueError(
            f"n_draft={n_draft} needs {n_draft - 1} MTP head groups, but "
            f"the checkpoint has n_mtp={n}")
    if (scfg is not None and scfg.temperature > 0
            and scfg.spec_sampling == "exact"):
        import warnings
        warnings.warn(
            f"speculative decoding (n_draft={n_draft}) with "
            f"temperature={scfg.temperature} > 0: exact-match verification "
            "of greedy drafts against sampled tokens rejects almost "
            "everything, so --spec will only add per-pass overhead.  Use "
            "temperature <= 0 (greedy), or spec_sampling='stochastic' "
            "(--spec-sampling stochastic) for distribution-exact "
            "speculative SAMPLING with real acceptance.",
            stacklevel=2)


def init_mtp_heads(cfg: ModelConfig, key) -> dict:
    """Multi-token-prediction heads: same 2-layer-GELU structure as the main
    prediction heads, stacked [n_mtp, K, ...]; group j predicts the token at
    offset j+2 in the delayed space (the main heads predict offset +1).

    Kept OUTSIDE the reference parameter surface: adding them to an existing
    checkpoint changes no reference-compatible weights (PAPERS.md
    arXiv 2410.13839 trains such heads on top of a frozen AR model)."""
    dtype = jnp.dtype(cfg.param_dtype)
    K, D, card = cfg.n_codebooks, cfg.d_model, cfg.card
    half = cfg.audio_vocab_size // 2

    def head_init(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        b1 = 1.0 / np.sqrt(D)
        b2 = 1.0 / np.sqrt(half)
        return {
            "w1": jax.random.uniform(k1, (D, half), dtype, -b1, b1),
            "b1": jax.random.uniform(k2, (half,), dtype, -b1, b1),
            "w2": jax.random.uniform(k3, (half, card), dtype, -b2, b2),
            "b2": jax.random.uniform(k4, (card,), dtype, -b2, b2),
        }

    groups = []
    for kj in jax.random.split(key, cfg.n_mtp):
        heads = [head_init(k) for k in jax.random.split(kj, K)]
        groups.append(jax.tree.map(lambda *xs: jnp.stack(xs, 0), *heads))
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *groups)


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


# ==============================================================================
# embedding helpers
# ==============================================================================

def embed_audio_tokens(table: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    """Sum per-codebook embeddings: table [K, card, D], tokens [B, K, T]
    -> [B, T, D]  (reference voicecraft.py:311-315)."""
    embs = jax.vmap(lambda tab, tok: jnp.take(tab, tok, axis=0))(
        table, tokens.transpose(1, 0, 2))                  # [K, B, T, D]
    return embs.sum(axis=0)


def apply_heads(heads, h: jnp.ndarray) -> jnp.ndarray:
    """h [..., D] -> logits [..., K, card] in f32
    (reference voicecraft.py:181-185,515).  Supports weight-only fp8 heads
    (utils/quantize.py): per-output-column scales applied after the einsum."""
    def _mm(x, w, spec):
        if isinstance(w, dict):
            y = jnp.einsum(spec, x, w["q"].astype(x.dtype),
                           preferred_element_type=jnp.float32)
            return y * w["scale"][:, 0].astype(jnp.float32)
        return jnp.einsum(spec, x, w.astype(x.dtype),
                          preferred_element_type=jnp.float32)

    h1 = _mm(h, heads["w1"], "...d,kdh->...kh") + heads["b1"].astype(jnp.float32)
    h1 = jax.nn.gelu(h1, approximate=False)
    logits = _mm(h1.astype(h.dtype), heads["w2"], "...kh,khc->...kc")
    return logits + heads["b2"].astype(jnp.float32)


def _dropout(x, rate, rng):
    if rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


# ==============================================================================
# training forward
# ==============================================================================

class TrainBatch(NamedTuple):
    """Device-side batch contract (composed on host by data/spans.py).

    x:            [B, Sx]  int32 text tokens (padded with text_pad_token)
    x_lens:       [B]      int32
    y_tokens:     [B, K, Sy] int32 composed delayed sequence: spans rearranged,
                  delay-interleaved, eog/eos appended, mask placeholders at
                  span joints, padded with audio_pad_token
    y_lens:       [B]      int32 composed lengths
    mask_emb_idx: [B, Sy]  int32, mask-embedding index at mask slots, -1 else
    target_valid: [B, K, Sy] bool, True where position p's *next* slot (p+1)
                  holds a real token of the same span (the CE target mask)
    """
    x: jnp.ndarray
    x_lens: jnp.ndarray
    y_tokens: jnp.ndarray
    y_lens: jnp.ndarray
    mask_emb_idx: jnp.ndarray
    target_valid: jnp.ndarray


def forward_train(params, cfg: ModelConfig, batch: TrainBatch,
                  rng=None, remat: bool = True) -> dict:
    """Training forward + loss (reference voicecraft.py:472-559).

    Returns dict(loss, top10acc, top10acc_by_codebook [K], effective_ntoken),
    matching the reference's metric semantics: per-codebook mean CE weighted
    by codebook_weight x ntokens, micro top-10 accuracy.
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    K = cfg.n_codebooks
    B, Sx = batch.x.shape
    Sy = batch.y_tokens.shape[-1]
    pe = jnp.asarray(sine_table(MAX_POS, cfg.d_model))

    rngs = jax.random.split(rng, 4) if rng is not None else (None,) * 4

    # --- embed text (reference voicecraft.py:497-500) ---
    x_emb = jnp.take(params["text_emb"]["weight"], batch.x, axis=0).astype(dtype)
    x_emb = _dropout(x_emb, cfg.text_embedding_dropout, rngs[0])
    x_in = x_emb + params["alpha_text"].astype(dtype) * pe[:Sx].astype(dtype)
    x_in = _dropout(x_in, cfg.text_positional_embedding_dropout, rngs[1])

    # --- embed audio + mask embeddings (reference voicecraft.py:311-320) ---
    y_emb = embed_audio_tokens(params["audio_emb"], batch.y_tokens).astype(dtype)
    is_mask = batch.mask_emb_idx >= 0                              # [B, Sy]
    mask_vecs = jnp.take(params["mask_emb"],
                         jnp.maximum(batch.mask_emb_idx, 0), axis=0).astype(dtype)
    y_emb = jnp.where(is_mask[..., None], mask_vecs, y_emb)
    y_in = y_emb + params["alpha_audio"].astype(dtype) * pe[:Sy].astype(dtype)
    y_in = _dropout(y_in, cfg.audio_positional_embedding_dropout, rngs[2])

    # --- joint forward (reference voicecraft.py:406-470 dec_forward) ---
    xy = jnp.concatenate([x_in, y_in], axis=1)
    if cfg.train_attn == "chunked":
        from ..ops.flash_attention import chunked_attention
        bias = lambda q, k, v, r: chunked_attention(
            q, k, v, batch.x_lens, batch.y_lens, Sx, cfg.nhead)
    else:
        bias = segment_padding_bias(Sx + Sy, Sx, batch.x_lens, batch.y_lens)
    h = trm.apply_stack(params["decoder"], xy, bias, cfg.nhead,
                        dropout=cfg.trm_dropout, rng=rngs[3],
                        remat=remat and cfg.train_remat != "none",
                        remat_policy=cfg.train_remat)
    h_y = h[:, Sx:]                                                 # [B, Sy, D]

    logits = apply_heads(params["heads"], h_y)                      # [B,Sy,K,card] f32
    logits = logits.transpose(0, 2, 1, 3)                           # [B,K,Sy,card]

    # --- shifted masked CE over the delayed space ---
    # target[q, p] = y_tokens[q, p+1]; validity precomputed on host
    targets = jnp.concatenate(
        [batch.y_tokens[..., 1:], jnp.zeros_like(batch.y_tokens[..., :1])],
        axis=-1)                                                    # [B,K,Sy]
    valid = batch.target_valid                                      # [B,K,Sy]

    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    ce = -tgt_logp * valid                                          # [B,K,Sy]

    ntok_k = valid.sum(axis=(0, 2))                                 # [K]
    loss_k = ce.sum(axis=(0, 2)) / jnp.maximum(ntok_k, 1)           # mean CE per k

    if cfg.codebook_weight is not None:
        w = jnp.asarray(cfg.codebook_weight, dtype=jnp.float32)
    else:
        w = jnp.ones((K,), jnp.float32)
    # reference voicecraft.py:549: sum(mean_ce_k * ntokens_k * weight_k)
    loss = jnp.sum(loss_k * ntok_k.astype(jnp.float32) * w)

    # top-10 accuracy, micro (reference voicecraft.py:187-195,541)
    tgt_logit = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    rank = jnp.sum((logits > tgt_logit[..., None]), axis=-1)
    top10 = (rank < 10) & valid
    acc_k = top10.sum(axis=(0, 2)) / jnp.maximum(ntok_k, 1)

    out = {
        "loss": loss,
        "top10acc_by_codebook": acc_k * ntok_k,
        "top10acc": jnp.sum(acc_k * ntok_k),
        "effective_ntoken": ntok_k.sum(),
    }

    # --- auxiliary multi-token-prediction loss (speculative decoding) ---
    # head group j (0-based) predicts the token at offset j+2 from position
    # p.  A cell (k, p) trains iff (a) the ENDPOINT slot p+2+j holds a real
    # same-span token (target_valid at p+1+j) and (b) no intermediate slot
    # p+1 .. p+1+j is a mask placeholder (span joints always carry one, so
    # this is exactly span contiguity).  Intermediate forced-empty slots do
    # NOT invalidate: the decode loop forces those rows deterministically
    # (the spec drafter mirrors the same rule), so the head trains on every
    # cell the verifier will actually compare.
    if "mtp_heads" in params:
        h_mtp = jax.lax.stop_gradient(h_y) if cfg.mtp_detach else h_y
        n_mtp = jax.tree.leaves(params["mtp_heads"])[0].shape[0]

        # One head group at a time, CE fused under jax.checkpoint: the
        # stacked-vmap alternative materialises [n_mtp, B, Sy, K, card]
        # logits PLUS their log_softmax in f32 — multiple GB per microbatch
        # at 830M with 20k-token buckets (recipes/e830M_mtp.sh).  Remat
        # keeps one group's logits live at a time and recomputes them in
        # the backward from h_mtp (which is stored anyway); values are
        # identical, only scheduling changes.
        def group_stats(hd_j, hh, tgt_j, valid_j):
            logits_j = apply_heads(hd_j, hh).transpose(0, 2, 1, 3)
            logp_j = jax.nn.log_softmax(logits_j, axis=-1)   # [B,K,Sy,card]
            tl = jnp.take_along_axis(logp_j, tgt_j[..., None],
                                     axis=-1)[..., 0]
            ce_j = -tl * valid_j
            ntok_j = valid_j.sum(axis=(0, 2))
            loss_jk = ce_j.sum(axis=(0, 2)) / jnp.maximum(ntok_j, 1)
            top1 = (jnp.argmax(logits_j, axis=-1) == tgt_j) & valid_j
            acc = top1.sum() / jnp.maximum(valid_j.sum(), 1)
            return loss_jk, ntok_j, acc

        group_stats = jax.checkpoint(group_stats)
        mtp_loss = jnp.zeros((), jnp.float32)
        mtp_acc = []
        not_mask = (batch.mask_emb_idx < 0)[:, None, :]     # [B, 1, Sy]
        win = jnp.ones_like(valid)
        zcol = jnp.zeros_like(batch.y_tokens[..., :1])
        for j in range(n_mtp):
            # window gains slot p+1+j; endpoint realness shifts by 1+j
            win = win & jnp.concatenate(
                [jnp.broadcast_to(not_mask[..., 1 + j:],
                                  valid[..., 1 + j:].shape),
                 jnp.zeros_like(valid[..., :1 + j])], axis=-1)
            endpoint = jnp.concatenate(
                [valid[..., 1 + j:], jnp.zeros_like(valid[..., :1 + j])],
                axis=-1)
            valid_j = endpoint & win
            tgt_j = jnp.concatenate(
                [batch.y_tokens[..., 2 + j:]] + [zcol] * (2 + j), axis=-1)
            hd_j = jax.tree.map(lambda x: x[j], params["mtp_heads"])
            loss_jk, ntok_j, acc_j = group_stats(hd_j, h_mtp, tgt_j, valid_j)
            mtp_loss = mtp_loss + jnp.sum(
                loss_jk * ntok_j.astype(jnp.float32) * w)
            mtp_acc.append(acc_j)
        mtp_loss = cfg.mtp_weight * mtp_loss
        out["mtp_loss"] = mtp_loss
        out["mtp_top1acc"] = jnp.stack(mtp_acc)
        out["loss"] = out["loss"] + mtp_loss

    return out


# ==============================================================================
# inference — unified TTS / multi-span editing decode loop
# ==============================================================================

@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Static sampling knobs (recompile on change — these are set per run)."""
    top_k: int = 0                  # <=0 disables (reference default -100)
    top_p: float = 1.0
    temperature: float = 1.0        # <=0 -> greedy (parity/test extension)
    stop_repetition: int = 3
    silence_tokens: Tuple[int, ...] = (1388, 1898, 131)
    # speculative-decoding verification mode (plain loops ignore this):
    #   "exact"      — accept a draft only if it equals the freshly sampled
    #                  token bit-exactly.  Greedy output identical to the
    #                  plain loop; sampled output draw-identical under the
    #                  per-token-index key schedule (invariant to tau), but
    #                  acceptance collapses to ~prod_k p_k(draft) under
    #                  temperature sampling.
    #   "stochastic" — Leviathan-style speculative SAMPLING: drafts are
    #                  sampled from the MTP distributions and verified by
    #                  per-codebook-row rejection sampling (accept w.p.
    #                  min(1, p/q); resample the residual otherwise).  The
    #                  emitted tokens are distributed EXACTLY as the plain
    #                  loop's (per-row law preserved), but the draw
    #                  schedule differs and depends on acceptance.  This is
    #                  the mode that makes --spec pay off at temperature>0.
    spec_sampling: str = "exact"
    # Draft proposal temperature for stochastic verification (< 0 -> use
    # ``temperature``).  The proposal q is arbitrary, so sharpening it is
    # still distribution-exact; it trades acceptance profiles: q ~ p wins
    # when p is flat (acceptance = 1 - TV(p, q)), a near-greedy q (small
    # values, e.g. 0.1) wins when p is peaked but the MTP distributions
    # are miscalibrated (acceptance -> p(argmax q), the exact-match rate,
    # while keeping exact sampled output).  Measured on the procedural
    # corpus: see PERF.md "Measured speculative acceptance".
    spec_draft_temperature: float = -1.0


class DecodeState(NamedTuple):
    cache: jnp.ndarray          # [L, 2, B, S_max, H, Dh]
    logits: jnp.ndarray         # [B, K, card] f32 — prediction for next slot
    rng: jnp.ndarray
    pos: jnp.ndarray            # scalar: slab index where next feed is written
    y_pos: jnp.ndarray          # scalar: position of next feed within y
    gen_buf: jnp.ndarray        # [gen_max, K] int32 sampled tokens (delayed space)
    span_buf: jnp.ndarray       # [gen_max] int32 span index per sample
    gen_cnt: jnp.ndarray        # scalar
    codebook_eog: jnp.ndarray   # [K] bool
    cur_num_gen: jnp.ndarray    # scalar — samples in current span
    consec_silence: jnp.ndarray # scalar
    prev_token: jnp.ndarray     # scalar (-1 = none)
    span_idx: jnp.ndarray       # scalar — current span being generated
    queue: jnp.ndarray          # [2, D] pending feed embeddings
    queue_len: jnp.ndarray      # scalar 0..2
    done: jnp.ndarray           # scalar bool


def _adjust_logits(cfg: ModelConfig, scfg: SamplingConfig, is_tts: bool,
                   logits_k, codebook_eog, cur_num_gen, consec_silence,
                   prev_token):
    """The pre-sampling logit adjustments of the reference sample_helper
    twins (bans, min-length guard, silence-repetition penalty) — split out
    so speculative verification can reach the sampling DISTRIBUTION, not
    just a draw (stochastic verify needs p(token))."""
    K, card = logits_k.shape
    eog_stop = cfg.eog_inference if is_tts else cfg.eog
    rows = jnp.arange(K)[:, None]
    cols = jnp.arange(card)[None, :]
    n_eog = codebook_eog.sum()

    la = logits_k
    if cfg.eos > 0:
        # TTS: ban eog everywhere (voicecraft.py:1091-1093);
        # editing: ban eos everywhere (voicecraft.py:816-818)
        ban_col = cfg.eog if is_tts else cfg.eos
        la = jnp.where(cols == ban_col, BAN, la)

    # rows beyond the next-to-finish codebook may not emit eog/empty
    # (voicecraft.py:1021-1023, 1057-1059; unified: rows > n_eog)
    ban = (rows > n_eog) & ((cols == eog_stop) | (cols == cfg.empty_token))
    la = jnp.where(ban, BAN, la)

    if is_tts:
        # min-length guard (voicecraft.py:1024-1025)
        min_guard = cur_num_gen <= cfg.encodec_sr // 5
        la = jnp.where(min_guard & (rows == 0) & (cols == eog_stop), BAN, la)

    # silence-repetition penalty on row 0 (voicecraft.py:1027-1031)
    if scfg.stop_repetition > 0 and len(scfg.silence_tokens) > 0:
        sil = jnp.asarray(scfg.silence_tokens)
        hit = (jnp.any(sil == prev_token)
               & (consec_silence > scfg.stop_repetition)
               & (n_eog == 0))
        denom = (consec_silence - (scfg.stop_repetition - 1)).astype(jnp.float32)
        cell = (rows == 0) & (cols == prev_token)
        v = la
        penalised = jnp.where(v < 0, v * denom, v / jnp.maximum(denom, 1.0))
        la = jnp.where(hit & cell, penalised, la)
    return la


def _finalize_sample(cfg: ModelConfig, scfg: SamplingConfig, is_tts: bool,
                     cap_mult: int, la, samples, codebook_eog, cur_num_gen,
                     consec_silence, prev_token, y_pos, x_len):
    """Deterministic post-sampling machinery of the reference sample_helper
    twins: forced empties for the span's first K-1 steps, the eog stop
    check (which sees the ADJUSTED row 0, the reference's in-place-alias
    behaviour), silence counters, and the eog cascade."""
    K, card = la.shape
    eog_stop = cfg.eog_inference if is_tts else cfg.eog
    n_eog = codebook_eog.sum()

    # ---- n_eog == 0 branch ----
    # force trailing codebooks to empty for the first K-1 steps of a span
    # (voicecraft.py:1037-1039)
    s0 = jnp.where(jnp.arange(K) > cur_num_gen, cfg.empty_token, samples)
    stop_hit = ((s0[0] == eog_stop)
                | (jnp.argmax(la[0]) == eog_stop)
                | (y_pos > x_len * cap_mult))
    s0 = s0.at[0].set(jnp.where(stop_hit, eog_stop, s0[0]))
    eog0 = codebook_eog.at[0].set(stop_hit)
    # silence counters (voicecraft.py:1047-1051)
    if len(scfg.silence_tokens) > 0:
        sil = jnp.asarray(scfg.silence_tokens)
        is_sil = jnp.any(sil == s0[0]) & (s0[0] == prev_token)
    else:
        is_sil = jnp.asarray(False)
    consec0 = jnp.where(is_sil, consec_silence + 1, 0)
    prev0 = s0[0]

    # ---- n_eog > 0 branch: continue the eog cascade ----
    # (voicecraft.py:1063-1066)
    r = jnp.arange(K)
    s1 = jnp.where(r < n_eog, cfg.empty_token, samples)
    s1 = jnp.where(r == n_eog, eog_stop, s1)
    eog1 = codebook_eog | (r == n_eog)

    first = n_eog == 0
    new_samples = jnp.where(first, s0, s1)
    new_eog = jnp.where(first, eog0, eog1)
    new_consec = jnp.where(first, consec0, consec_silence)
    new_prev = jnp.where(first, prev0, prev_token)
    return new_samples, new_eog, new_consec, new_prev


def _adjust_and_sample(cfg: ModelConfig, scfg: SamplingConfig, is_tts: bool,
                       cap_mult: int, rng, logits_k, codebook_eog,
                       cur_num_gen, consec_silence, prev_token, y_pos, x_len,
                       raw_override=None):
    """One sampling decision for a single sample.  logits_k: [K, card] f32.

    Faithful port of the reference sample_helper twins
    (voicecraft.py:718-787 editing, voicecraft.py:1018-1067 TTS) — logit
    adjustments (_adjust_logits), a categorical draw, then the
    deterministic finalisation machinery (_finalize_sample).

    ``raw_override=(use [bool], tokens [K])``: substitute a pre-determined
    raw sample for the draw (the stochastic speculative verifier's pending
    corrected token) — the finalisation path is identical either way.
    """
    la = _adjust_logits(cfg, scfg, is_tts, logits_k, codebook_eog,
                        cur_num_gen, consec_silence, prev_token)
    samples = sample_tokens(rng, la, scfg.top_k, scfg.top_p,
                            scfg.temperature)
    if raw_override is not None:
        use, toks = raw_override
        samples = jnp.where(use, toks, samples)
    return _finalize_sample(cfg, scfg, is_tts, cap_mult, la, samples,
                            codebook_eog, cur_num_gen, consec_silence,
                            prev_token, y_pos, x_len)


def make_decode_loop(cfg: ModelConfig, *, is_tts: bool, x_pad: int,
                     y_pad: int, gen_max: int, scfg: SamplingConfig,
                     max_spans: Optional[int] = None,
                     bench_mode: bool = False, fused_ffn: bool = False,
                     kv_dtype: Optional[str] = None, unroll: int = 1,
                     steps_per_iter: int = 1):
    """Build the jitted single-sample decode function.

    Static geometry: x padded to ``x_pad``, composed y prefix padded to
    ``y_pad``, at most ``gen_max`` *recorded* decode steps.  The loop bound
    is gen_cnt, which queued mask/empty feed steps do NOT increment while
    still writing KV at pos — so the slab carries 2*(max_spans-1) extra
    slots (2 feed steps per span transition) to make pos <= s_max invariant
    even when every span runs to the budget.

    ``steps_per_iter`` runs that many decode steps inside ONE while-loop
    iteration.  Every loop iteration costs a fixed ~0.5 ms on this backend
    (PERF.md rooflines) regardless of content, which is ~26% of a batch-1
    830M step — grouping k steps per iteration amortises it.  Sub-steps
    after ``done`` still run the forward (their state updates are gated
    off), but they write only to the frozen next-free slab slot, which key
    validity (j < pos) never reads; output is token-identical to the
    k=1 loop, at the cost of at most k-1 wasted trailing forwards.

    Returns fn(params, x_tokens [1,x_pad], x_len, y_prefix [1,K,y_pad],
               prefix_len, mask_emb_idx [1,y_pad], queue_mask_ids [max_spans],
               n_spans, rng)
      -> (gen_buf [gen_max,K], span_buf [gen_max], gen_cnt, n_spans_done)
    """
    K, D = cfg.n_codebooks, cfg.d_model
    H, Dh, L = cfg.nhead, cfg.head_dim, cfg.num_decoder_layers
    dtype = jnp.dtype(cfg.compute_dtype)
    cache_dtype = jnp.dtype(kv_dtype) if kv_dtype else dtype
    cap_mult = (cfg.encodec_sr // 5) if is_tts else 10  # voicecraft.py:1042,751
    if max_spans is None:
        max_spans = cfg.max_n_spans
    # + steps_per_iter-1: in the final group, pos may advance past the
    # gen_cnt budget before the group-boundary cond check stops the loop
    s_max = (x_pad + y_pad + gen_max + 2 * (max_spans - 1)
             + (steps_per_iter - 1))
    pe_np = sine_table(MAX_POS, D)

    def decode(params, x_tokens, x_len, y_prefix, prefix_len, mask_emb_idx,
               queue_mask_ids, n_spans, rng):
        pe = jnp.asarray(pe_np).astype(dtype)
        alpha_a = params["alpha_audio"].astype(dtype)

        # ---- prefill ----
        x_emb = jnp.take(params["text_emb"]["weight"], x_tokens, axis=0).astype(dtype)
        x_in = x_emb + params["alpha_text"].astype(dtype) * pe[:x_pad]
        y_emb = embed_audio_tokens(params["audio_emb"], y_prefix).astype(dtype)
        is_mask = mask_emb_idx >= 0
        mask_vecs = jnp.take(params["mask_emb"],
                             jnp.maximum(mask_emb_idx, 0), axis=0).astype(dtype)
        y_emb = jnp.where(is_mask[..., None], mask_vecs, y_emb)
        y_in = y_emb + alpha_a * pe[:y_pad]
        xy = jnp.concatenate([x_in, y_in], axis=1)          # [1, x_pad+y_pad, D]

        Sp = x_pad + y_pad
        from ..ops.flash_attention import (flash_prefix_attention,
                                           use_flash_prefill)
        if use_flash_prefill(Sp):
            bias = lambda q, k, v: flash_prefix_attention(
                q, k, v, jnp.atleast_1d(x_len), jnp.atleast_1d(prefix_len),
                x_pad, cfg.nhead)
        else:
            jj = jnp.arange(Sp)
            key_valid = jnp.where(jj < x_pad, jj < x_len,
                                  jj < x_pad + prefix_len)
            qi = jnp.arange(Sp)[:, None]
            allowed = (jnp.arange(Sp)[None, :] <= qi) & key_valid[None, :]
            bias = jnp.where(allowed, 0.0,
                             NEG_INF).astype(jnp.float32)[None, None]

        cache = trm.init_kv_cache(L, 1, s_max, H, Dh, cache_dtype)
        h, cache = trm.prefill(params["decoder"], xy, bias, cache, cfg.nhead)
        h_last = jax.lax.dynamic_slice_in_dim(h, x_pad + prefix_len - 1, 1, axis=1)
        logits0 = apply_heads(params["heads"], h_last)[:, 0]  # [1, K, card]

        empty_emb = embed_audio_tokens(
            params["audio_emb"],
            jnp.full((1, K, 1), cfg.empty_token, jnp.int32))[0, 0].astype(dtype)

        state = DecodeState(
            cache=cache,
            logits=logits0,
            rng=rng,
            pos=jnp.asarray(x_pad) + prefix_len,
            y_pos=prefix_len.astype(jnp.int32),
            gen_buf=jnp.zeros((gen_max, K), jnp.int32),
            span_buf=jnp.zeros((gen_max,), jnp.int32),
            gen_cnt=jnp.asarray(0, jnp.int32),
            codebook_eog=jnp.zeros((K,), bool),
            cur_num_gen=jnp.asarray(0, jnp.int32),
            consec_silence=jnp.asarray(0, jnp.int32),
            prev_token=jnp.asarray(-1, jnp.int32),
            span_idx=jnp.asarray(0, jnp.int32),
            queue=jnp.zeros((2, D), dtype),
            queue_len=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False),
        )

        def cond(s: DecodeState):
            return jnp.logical_not(s.done) & (s.gen_cnt < gen_max)

        def substep(s: DecodeState) -> DecodeState:
            # `active` gates every state update: with steps_per_iter > 1 the
            # cond() guard only holds at group boundaries, so sub-steps after
            # done OR past the gen_max budget must be no-ops on the
            # bookkeeping state (including span_idx/queue/done — a
            # budget-capped editing run must report the same n_spans_done as
            # the k=1 loop, which stops dead at the budget).  With
            # steps_per_iter == 1 active is always True here and the gates
            # reduce to the plain loop.
            active = jnp.logical_not(s.done) & (s.gen_cnt < gen_max)
            rng, step_rng = jax.random.split(s.rng)
            feeding = s.queue_len > 0

            # --- sample (only when not feeding queued mask/empty embeds) ---
            samples, new_eog, new_consec, new_prev = _adjust_and_sample(
                cfg, scfg, is_tts, cap_mult, step_rng, s.logits[0],
                s.codebook_eog, s.cur_num_gen, s.consec_silence,
                s.prev_token, s.y_pos, x_len)
            if bench_mode:
                # benchmarking: never terminate early, run to gen_max
                new_eog = jnp.zeros_like(new_eog)
                samples = jnp.where(samples >= cfg.audio_vocab_size,
                                    0, samples)

            span_complete = jnp.all(new_eog) & jnp.logical_not(feeding) & active
            record = jnp.logical_not(feeding) & active

            gen_buf = jax.lax.cond(
                record,
                lambda: jax.lax.dynamic_update_slice(
                    s.gen_buf, samples[None, :], (s.gen_cnt, 0)),
                lambda: s.gen_buf)
            span_buf = jax.lax.cond(
                record,
                lambda: jax.lax.dynamic_update_slice(
                    s.span_buf, s.span_idx[None], (s.gen_cnt,)),
                lambda: s.span_buf)
            gen_cnt = s.gen_cnt + record.astype(jnp.int32)

            sample_emb = embed_audio_tokens(
                params["audio_emb"], samples[None, :, None])[0, 0].astype(dtype)
            feed_emb = jnp.where(feeding, s.queue[0], sample_emb)

            # queue management: on span completion with spans remaining,
            # enqueue [mask_emb(next), empty_emb] (voicecraft.py:838-858)
            more_spans = (s.span_idx + 1) < n_spans
            start_next = span_complete & more_spans
            next_mask_id = queue_mask_ids[jnp.minimum(s.span_idx + 1,
                                                      max_spans - 1)]
            new_queue = jnp.stack(
                [jnp.take(params["mask_emb"], next_mask_id, axis=0).astype(dtype),
                 empty_emb], axis=0)
            consume = feeding & active
            queue = jnp.where(start_next, new_queue,
                              jnp.where(consume,
                                        jnp.stack([s.queue[1], s.queue[1]], 0),
                                        s.queue))
            queue_len = jnp.where(start_next, 2,
                                  jnp.where(consume, s.queue_len - 1,
                                            s.queue_len))

            done = s.done | (span_complete & jnp.logical_not(more_spans))
            span_idx = s.span_idx + start_next.astype(jnp.int32)

            # per-span resets (voicecraft.py:827-858); inactive sub-steps
            # keep their state frozen (their samples are garbage)
            keep = feeding | jnp.logical_not(active)
            codebook_eog = jnp.where(span_complete,
                                     jnp.zeros_like(new_eog),
                                     jnp.where(keep, s.codebook_eog, new_eog))
            cur_num_gen = jnp.where(span_complete, 0,
                                    jnp.where(keep, s.cur_num_gen,
                                              s.cur_num_gen + 1))
            consec = jnp.where(span_complete, 0,
                               jnp.where(keep, s.consec_silence, new_consec))
            prev = jnp.where(span_complete, -1,
                             jnp.where(keep, s.prev_token, new_prev))

            # --- feed one embedding through the decoder ---
            # Runs even when inactive: the write lands at the frozen `pos`
            # (the next free slot), which j < pos key validity never reads.
            feed = (feed_emb + alpha_a * jax.lax.dynamic_slice_in_dim(
                pe, s.y_pos, 1, axis=0)[0])[None, None, :]
            h, cache = trm.decode_step_fast(params["decoder"], feed, s.cache,
                                       s.pos, cfg.nhead,
                                       x_len=x_len, x_pad=x_pad,
                                       fused_ffn=fused_ffn, unroll=unroll)
            logits = apply_heads(params["heads"], h)[:, 0]

            adv = active.astype(jnp.int32)
            return DecodeState(cache, logits, rng, s.pos + adv, s.y_pos + adv,
                               gen_buf, span_buf, gen_cnt, codebook_eog,
                               cur_num_gen, consec, prev, span_idx,
                               queue, queue_len, done)

        def body(s: DecodeState) -> DecodeState:
            for _ in range(steps_per_iter):
                s = substep(s)
            return s

        final = jax.lax.while_loop(cond, body, state)
        return final.gen_buf, final.span_buf, final.gen_cnt, final.span_idx + 1

    return jax.jit(decode)


# ==============================================================================
# speculative decoding with multi-token-prediction drafts
# ==============================================================================

class SpecDecodeState(NamedTuple):
    cache: jnp.ndarray
    logits: jnp.ndarray         # [1, K, card] main-head logits for next slot
    h: jnp.ndarray              # [1, D] f32 hidden at last accepted position
    rng: jnp.ndarray            # base key; per-token keys via fold_in(index)
    pos: jnp.ndarray
    y_pos: jnp.ndarray
    gen_buf: jnp.ndarray        # [gen_max + tau, K]
    gen_cnt: jnp.ndarray
    codebook_eog: jnp.ndarray   # [K]
    cur_num_gen: jnp.ndarray
    consec_silence: jnp.ndarray
    prev_token: jnp.ndarray
    n_passes: jnp.ndarray       # forward passes taken (for acceptance stats)
    pending: jnp.ndarray        # [1, K] stochastic-verify corrected token
    has_pending: jnp.ndarray    # [1] bool
    done: jnp.ndarray


def make_spec_decode_loop(cfg: ModelConfig, *, x_pad: int, y_pad: int,
                          gen_max: int, scfg: SamplingConfig, n_draft: int,
                          bench_mode: bool = False,
                          force_accept: bool = False,
                          kv_dtype: Optional[str] = None):
    """Verified speculative TTS decode (PAPERS.md arXiv 2410.13839).

    Each pass feeds ``n_draft`` tokens through ONE forward: the true next
    token (sampled from the main heads exactly as the plain loop would) plus
    ``n_draft - 1`` guesses from the MTP heads.  The pass's own logits then
    re-derive what the plain loop would have emitted at each guessed slot —
    a guess is accepted only if it matches bit-exactly, so the OUTPUT IS
    IDENTICAL to non-speculative decoding; drafts only change wall-clock.
    (Exactly identical in f32 compute; under bf16 the block forward's
    different accumulation order can flip greedy argmaxes at near-ties,
    the same tie physics documented for the engine in CLAUDE.md.)
    Batch-1 decode is weight-bandwidth-bound, so a pass costs ~the same HBM
    time as a single step; accepted guesses are nearly free tokens.

    Parity detail: per-token RNG is ``fold_in(rng, token_index)`` rather than
    the plain loop's sequential split, so for temperature>0 the sampled
    sequence differs from the plain loop by (exactly) a re-seeding — but is
    itself fully deterministic and INDEPENDENT of draft quality or n_draft
    (accept/reject never consumes randomness).  Greedy (temperature<=0)
    output is bit-identical to the plain loop.

    ``force_accept`` (bench only): skip the equality check so every pass
    retires n_draft tokens — measures the 100%%-acceptance throughput
    ceiling of the machinery; the emitted tokens are the drafts.

    Requires ``params["mtp_heads"]`` with >= n_draft-1 head groups when
    n_draft > 1.  Single span / TTS only (editing keeps the plain loop).

    Returns fn(params, x_tokens [1,x_pad], x_len, y_prefix [1,K,y_pad],
               prefix_len, rng) -> (gen_buf [gen_max+n_draft, K], gen_cnt,
                                    n_passes)
    """
    from ..inference.spec_common import make_lane_sampler, spec_verify_pass
    assert n_draft >= 1
    K, D = cfg.n_codebooks, cfg.d_model
    H, Dh, L = cfg.nhead, cfg.head_dim, cfg.num_decoder_layers
    dtype = jnp.dtype(cfg.compute_dtype)
    cache_dtype = jnp.dtype(kv_dtype) if kv_dtype else dtype
    cap_mult = cfg.encodec_sr // 5
    tau = n_draft
    s_max = x_pad + y_pad + gen_max + tau
    pe_np = sine_table(MAX_POS, D)
    sample_lanes = make_lane_sampler(cfg, scfg, cap_mult)

    def decode(params, x_tokens, x_len, y_prefix, prefix_len, rng):
        pe = jnp.asarray(pe_np).astype(dtype)
        alpha_a = params["alpha_audio"].astype(dtype)

        # ---- prefill (same as make_decode_loop's TTS path) ----
        x_emb = jnp.take(params["text_emb"]["weight"], x_tokens, axis=0).astype(dtype)
        x_in = x_emb + params["alpha_text"].astype(dtype) * pe[:x_pad]
        y_emb = embed_audio_tokens(params["audio_emb"], y_prefix).astype(dtype)
        y_in = y_emb + alpha_a * pe[:y_pad]
        xy = jnp.concatenate([x_in, y_in], axis=1)

        Sp = x_pad + y_pad
        from ..ops.flash_attention import (flash_prefix_attention,
                                           use_flash_prefill)
        if use_flash_prefill(Sp):
            bias = lambda q, k, v: flash_prefix_attention(
                q, k, v, jnp.atleast_1d(x_len), jnp.atleast_1d(prefix_len),
                x_pad, cfg.nhead)
        else:
            jj = jnp.arange(Sp)
            key_valid = jnp.where(jj < x_pad, jj < x_len,
                                  jj < x_pad + prefix_len)
            qi = jnp.arange(Sp)[:, None]
            allowed = (jnp.arange(Sp)[None, :] <= qi) & key_valid[None, :]
            bias = jnp.where(allowed, 0.0,
                             NEG_INF).astype(jnp.float32)[None, None]

        cache = trm.init_kv_cache(L, 1, s_max, H, Dh, cache_dtype)
        h_all, cache = trm.prefill(params["decoder"], xy, bias, cache, cfg.nhead)
        h_last = jax.lax.dynamic_slice_in_dim(h_all, x_pad + prefix_len - 1, 1,
                                              axis=1)
        logits0 = apply_heads(params["heads"], h_last)[:, 0]   # [1, K, card]

        state = SpecDecodeState(
            cache=cache,
            logits=logits0,
            h=h_last[:, 0].astype(jnp.float32),
            rng=rng,
            pos=jnp.asarray(x_pad) + prefix_len,
            y_pos=prefix_len.astype(jnp.int32),
            gen_buf=jnp.zeros((gen_max + tau, K), jnp.int32),
            gen_cnt=jnp.asarray(0, jnp.int32),
            codebook_eog=jnp.zeros((K,), bool),
            cur_num_gen=jnp.asarray(0, jnp.int32),
            consec_silence=jnp.asarray(0, jnp.int32),
            prev_token=jnp.asarray(-1, jnp.int32),
            n_passes=jnp.asarray(0, jnp.int32),
            pending=jnp.zeros((1, K), jnp.int32),
            has_pending=jnp.zeros((1,), bool),
            done=jnp.asarray(False))

        def cond(s: SpecDecodeState):
            return jnp.logical_not(s.done) & (s.gen_cnt < gen_max)

        def body(s: SpecDecodeState) -> SpecDecodeState:
            # B=1 call into the shared verify core (inference/spec_common.py
            # owns the draft/accept/forced-empty/carry semantics for all
            # four speculative modes)
            tok_key = lambda i: jax.random.fold_in(s.rng, s.gen_cnt + i)[None]
            cell = {}

            def forward(feed):
                h_blk, cell["cache"] = trm.decode_step_block(
                    params["decoder"], feed, s.cache, s.pos, cfg.nhead,
                    x_len=x_len, x_pad=x_pad)
                return h_blk

            out = spec_verify_pass(
                params, cfg, sample_lanes, tau=tau,
                gate=jnp.ones((1,), bool), tok_key=tok_key,
                y_pos0=jnp.atleast_1d(s.y_pos),
                x_lens=jnp.atleast_1d(x_len), logits=s.logits, h=s.h,
                eog=s.codebook_eog[None],
                cng=jnp.atleast_1d(s.cur_num_gen),
                consec=jnp.atleast_1d(s.consec_silence),
                prev=jnp.atleast_1d(s.prev_token), t=s.gen_cnt,
                accept_cap=gen_max, pe=pe, alpha_a=alpha_a, dtype=dtype,
                forward=forward, bench_mode=bench_mode,
                force_accept=force_accept, scfg=scfg, is_tts=True,
                cap_mult=cap_mult, pending=s.pending,
                has_pending=s.has_pending)

            n_acc = out["n_acc"][0]
            # record the block; rows beyond n_acc are overwritten later
            gen_buf = jax.lax.dynamic_update_slice(
                s.gen_buf, out["blk"][0], (s.gen_cnt, 0))

            return SpecDecodeState(
                cache=cell["cache"],
                logits=out["logits_next"],
                h=out["h_next"],
                rng=s.rng,
                pos=s.pos + n_acc,
                y_pos=s.y_pos + n_acc,
                gen_buf=gen_buf,
                gen_cnt=s.gen_cnt + n_acc,
                codebook_eog=out["eog"][0],
                cur_num_gen=out["cng"][0],
                consec_silence=out["consec"][0],
                prev_token=out["prev"][0],
                n_passes=s.n_passes + 1,
                pending=out["pending"],
                has_pending=out["has_pending"],
                done=jnp.all(out["eog"][0]))

        final = jax.lax.while_loop(cond, body, state)
        return final.gen_buf, final.gen_cnt, final.n_passes

    return jax.jit(decode)


class SpecEditState(NamedTuple):
    cache: jnp.ndarray
    logits: jnp.ndarray         # [1, K, card]
    h: jnp.ndarray              # [1, D]
    rng: jnp.ndarray
    pos: jnp.ndarray
    y_pos: jnp.ndarray
    gen_buf: jnp.ndarray        # [gen_max + tau, K]
    span_buf: jnp.ndarray       # [gen_max + tau]
    gen_cnt: jnp.ndarray
    codebook_eog: jnp.ndarray   # [K]
    cur_num_gen: jnp.ndarray
    consec_silence: jnp.ndarray
    prev_token: jnp.ndarray
    span_idx: jnp.ndarray
    queue: jnp.ndarray          # [2, D]
    queue_len: jnp.ndarray
    n_passes: jnp.ndarray
    pending: jnp.ndarray        # [1, K] stochastic-verify corrected token
    has_pending: jnp.ndarray    # [1]
    done: jnp.ndarray


def make_spec_edit_loop(cfg: ModelConfig, *, x_pad: int, y_pad: int,
                        gen_max: int, scfg: SamplingConfig, n_draft: int,
                        max_spans: Optional[int] = None):
    """Verified speculative MULTI-SPAN EDITING decode.

    Same verification contract as make_spec_decode_loop (greedy output
    token-identical to make_decode_loop's editing path in f32; sampled
    output keyed per token index, invariant to n_draft), extended with the
    span machinery: when the eog cascade completes mid-block, remaining
    drafts are rejected (alive already gates them), and the NEXT pass is a
    FEED pass — the two queued embeddings (next span's mask embedding +
    the empty embedding, reference voicecraft.py:838-858) ride the same
    tau-wide block forward with the write-pointer advancing only 2; the
    tau-2 tail slots are rewind-trick garbage that key validity never
    reads.  ``n_draft`` must be >= 2 so a feed pass fits in one block.

    The draft/verify chain is inference/spec_common.spec_verify_pass with
    is_tts=False: feed passes gate the verify core off (gate=~feeding),
    substitute the queued embeddings via the ``mix_emb`` hook, and seed the
    next pass from the raw block outputs (slot 1 = the empty embedding's
    logits, matching the plain loop) instead of the gate-frozen ``*_next``
    fields.  Cross-loop parity tests (tests/test_spec_edit.py) pin the
    behaviour against the plain editing loop.

    Returns fn with make_decode_loop's editing signature:
      fn(params, x_tokens [1,x_pad], x_len, y_prefix [1,K,y_pad],
         prefix_len, mask_emb_idx [1,y_pad], queue_mask_ids [max_spans],
         n_spans, rng)
        -> (gen_buf [gen_max+tau, K], span_buf [gen_max+tau], gen_cnt,
            n_spans_done)
    """
    from ..inference.spec_common import make_lane_sampler, spec_verify_pass
    assert n_draft >= 2, "spec editing needs n_draft >= 2 (feed pass)"
    # stochastic verification composes with the span machinery because a
    # pending capture and a span completion are mutually exclusive: capture
    # requires the slot REJECTED (alive & ~match) while span_complete
    # requires an ACCEPTED all-eog slot, after which `alive` kills every
    # later slot's capture; and feed passes gate the verifier off entirely
    # (pending is preserved untouched through them, though in practice it
    # cannot be set when a feed pass starts)
    K, D = cfg.n_codebooks, cfg.d_model
    H, Dh, L = cfg.nhead, cfg.head_dim, cfg.num_decoder_layers
    dtype = jnp.dtype(cfg.compute_dtype)
    cap_mult = 10                                  # voicecraft.py:751
    tau = n_draft
    if max_spans is None:
        max_spans = cfg.max_n_spans
    s_max = x_pad + y_pad + gen_max + tau + 2 * (max_spans - 1)
    pe_np = sine_table(MAX_POS, D)
    sample_lanes = make_lane_sampler(cfg, scfg, cap_mult, is_tts=False)

    def decode(params, x_tokens, x_len, y_prefix, prefix_len, mask_emb_idx,
               queue_mask_ids, n_spans, rng):
        pe = jnp.asarray(pe_np).astype(dtype)
        alpha_a = params["alpha_audio"].astype(dtype)

        # ---- prefill (same as make_decode_loop's editing path) ----
        x_emb = jnp.take(params["text_emb"]["weight"], x_tokens, axis=0).astype(dtype)
        x_in = x_emb + params["alpha_text"].astype(dtype) * pe[:x_pad]
        y_emb = embed_audio_tokens(params["audio_emb"], y_prefix).astype(dtype)
        is_mask = mask_emb_idx >= 0
        mask_vecs = jnp.take(params["mask_emb"],
                             jnp.maximum(mask_emb_idx, 0), axis=0).astype(dtype)
        y_emb = jnp.where(is_mask[..., None], mask_vecs, y_emb)
        y_in = y_emb + alpha_a * pe[:y_pad]
        xy = jnp.concatenate([x_in, y_in], axis=1)

        Sp = x_pad + y_pad
        from ..ops.flash_attention import (flash_prefix_attention,
                                           use_flash_prefill)
        if use_flash_prefill(Sp):
            bias = lambda q, k, v: flash_prefix_attention(
                q, k, v, jnp.atleast_1d(x_len), jnp.atleast_1d(prefix_len),
                x_pad, cfg.nhead)
        else:
            jj = jnp.arange(Sp)
            key_valid = jnp.where(jj < x_pad, jj < x_len,
                                  jj < x_pad + prefix_len)
            qi = jnp.arange(Sp)[:, None]
            allowed = (jnp.arange(Sp)[None, :] <= qi) & key_valid[None, :]
            bias = jnp.where(allowed, 0.0,
                             NEG_INF).astype(jnp.float32)[None, None]

        cache = trm.init_kv_cache(L, 1, s_max, H, Dh, dtype)
        h_all, cache = trm.prefill(params["decoder"], xy, bias, cache,
                                   cfg.nhead)
        h_last = jax.lax.dynamic_slice_in_dim(h_all, x_pad + prefix_len - 1,
                                              1, axis=1)
        logits0 = apply_heads(params["heads"], h_last)[:, 0]

        empty_emb = embed_audio_tokens(
            params["audio_emb"],
            jnp.full((1, K, 1), cfg.empty_token, jnp.int32))[0, 0].astype(dtype)

        state = SpecEditState(
            cache=cache, logits=logits0, h=h_last[:, 0], rng=rng,
            pos=jnp.asarray(x_pad) + prefix_len,
            y_pos=prefix_len.astype(jnp.int32),
            gen_buf=jnp.zeros((gen_max + tau, K), jnp.int32),
            span_buf=jnp.zeros((gen_max + tau,), jnp.int32),
            gen_cnt=jnp.asarray(0, jnp.int32),
            codebook_eog=jnp.zeros((K,), bool),
            cur_num_gen=jnp.asarray(0, jnp.int32),
            consec_silence=jnp.asarray(0, jnp.int32),
            prev_token=jnp.asarray(-1, jnp.int32),
            span_idx=jnp.asarray(0, jnp.int32),
            queue=jnp.zeros((2, D), dtype),
            queue_len=jnp.asarray(0, jnp.int32),
            n_passes=jnp.asarray(0, jnp.int32),
            pending=jnp.zeros((1, K), jnp.int32),
            has_pending=jnp.zeros((1,), bool),
            done=jnp.asarray(False))

        def cond(s: SpecEditState):
            return jnp.logical_not(s.done) & (s.gen_cnt < gen_max)

        def body(s: SpecEditState) -> SpecEditState:
            feeding = s.queue_len > 0
            tok_key = lambda i: jax.random.fold_in(s.rng, s.gen_cnt + i)[None]

            # -- feed block: [mask_emb(next), empty_emb, garbage...] --
            # substituted for the token embeddings while feeding; the verify
            # core is gated off then (gate=~feeding) so its sampling/carry
            # state is frozen and only the raw block outputs matter
            feed_emb = jnp.concatenate(
                [s.queue, jnp.zeros((tau - 2, D), dtype)], axis=0)
            mix = lambda e: jnp.where(feeding, feed_emb[None], e)

            cell = {}

            def forward(feed):
                h_blk, cell["cache"] = trm.decode_step_block(
                    params["decoder"], feed, s.cache, s.pos, cfg.nhead,
                    x_len=x_len, x_pad=x_pad)
                return h_blk

            out = spec_verify_pass(
                params, cfg, sample_lanes, tau=tau,
                gate=jnp.logical_not(feeding)[None], tok_key=tok_key,
                y_pos0=jnp.atleast_1d(s.y_pos),
                x_lens=jnp.atleast_1d(x_len), logits=s.logits, h=s.h,
                eog=s.codebook_eog[None],
                cng=jnp.atleast_1d(s.cur_num_gen),
                consec=jnp.atleast_1d(s.consec_silence),
                prev=jnp.atleast_1d(s.prev_token), t=s.gen_cnt,
                accept_cap=gen_max, pe=pe, alpha_a=alpha_a, dtype=dtype,
                forward=forward, mix_emb=mix, scfg=scfg, is_tts=False,
                cap_mult=cap_mult, pending=s.pending,
                has_pending=s.has_pending)

            n_acc = out["n_acc"][0]        # 0 on feed passes (gate off)
            eog_f, cng_f = out["eog"][0], out["cng"][0]
            consec_f, prev_f = out["consec"][0], out["prev"][0]

            # -- record the block (sampling passes only) --
            gen_buf = jax.lax.cond(
                feeding, lambda: s.gen_buf,
                lambda: jax.lax.dynamic_update_slice(
                    s.gen_buf, out["blk"][0], (s.gen_cnt, 0)))
            span_buf = jax.lax.cond(
                feeding, lambda: s.span_buf,
                lambda: jax.lax.dynamic_update_slice(
                    s.span_buf, jnp.full((tau,), s.span_idx, jnp.int32),
                    (s.gen_cnt,)))
            gen_cnt = s.gen_cnt + n_acc

            # -- span transition bookkeeping (voicecraft.py:827-858) --
            span_complete = jnp.logical_not(feeding) & jnp.all(eog_f)
            more_spans = (s.span_idx + 1) < n_spans
            start_next = span_complete & more_spans
            next_mask_id = queue_mask_ids[jnp.minimum(s.span_idx + 1,
                                                      max_spans - 1)]
            new_queue = jnp.stack(
                [jnp.take(params["mask_emb"], next_mask_id,
                          axis=0).astype(dtype), empty_emb], axis=0)
            queue = jnp.where(start_next, new_queue, s.queue)
            queue_len = jnp.where(start_next, 2,
                                  jnp.where(feeding, 0, s.queue_len))
            done = s.done | (span_complete & jnp.logical_not(more_spans))
            span_idx = s.span_idx + start_next.astype(jnp.int32)

            # per-span resets; on feed passes the verify core already froze
            # eog_f/cng_f/consec_f/prev_f to the carried state (gate off)
            codebook_eog = jnp.where(span_complete, jnp.zeros_like(eog_f),
                                     eog_f)
            cur_num_gen = jnp.where(span_complete, 0, cng_f)
            consec = jnp.where(span_complete, 0, consec_f)
            prev = jnp.where(span_complete, -1, prev_f)

            # -- seed the next pass from the RAW block outputs: feed passes
            #    hand over the SECOND feed's outputs (the empty embedding's
            #    logits start the next span, matching the plain loop) --
            n_adv = jnp.where(feeding, 2, n_acc)
            last = n_adv - 1
            logits_next = jnp.squeeze(
                jax.lax.dynamic_slice_in_dim(out["logits_blk"], last, 1,
                                             axis=1), axis=1)
            h_next = jax.lax.dynamic_slice_in_dim(out["h_blk"][0], last, 1,
                                                  axis=0)

            return SpecEditState(
                cache=cell["cache"], logits=logits_next, h=h_next,
                rng=s.rng,
                pos=s.pos + n_adv, y_pos=s.y_pos + n_adv,
                gen_buf=gen_buf, span_buf=span_buf, gen_cnt=gen_cnt,
                codebook_eog=codebook_eog, cur_num_gen=cur_num_gen,
                consec_silence=consec, prev_token=prev, span_idx=span_idx,
                queue=queue, queue_len=queue_len,
                n_passes=s.n_passes + 1, pending=out["pending"],
                has_pending=out["has_pending"], done=done)

        final = jax.lax.while_loop(cond, body, state)
        return (final.gen_buf, final.span_buf, final.gen_cnt,
                final.span_idx + 1)

    return jax.jit(decode)


# ==============================================================================
# batched best-of-N TTS (reference voicecraft.py:1156-1439)
# ==============================================================================

class BatchDecodeState(NamedTuple):
    cache: jnp.ndarray
    logits: jnp.ndarray          # [B, K, card]
    rng: jnp.ndarray
    pos: jnp.ndarray
    y_pos: jnp.ndarray
    gen_buf: jnp.ndarray         # [gen_max, B, K]
    gen_cnt: jnp.ndarray
    codebook_eog: jnp.ndarray    # [K] (global, reference semantics)
    cur_num_gen: jnp.ndarray
    consec_silence: jnp.ndarray  # [B]
    prev_token: jnp.ndarray      # [B]
    keep: jnp.ndarray            # scalar, -1 until the first sample hits eog
    done: jnp.ndarray


def _batch_adjust_and_sample(cfg: ModelConfig, scfg: SamplingConfig,
                             cap_mult: int, rng, logits, codebook_eog,
                             cur_num_gen, consec, prev, y_pos, x_len, keep):
    """Batched sample_helper (reference voicecraft.py:1269-1325): identical
    prompts, independent sampling paths; the first row to emit eog becomes
    ``keep`` and drives the eog cascade."""
    B, K, card = logits.shape
    eog_stop = cfg.eog_inference
    rows = jnp.arange(K)[None, :, None]
    cols = jnp.arange(card)[None, None, :]
    n_eog = codebook_eog.sum()
    first = n_eog == 0

    la = logits
    if cfg.eos > 0:
        la = jnp.where(cols == cfg.eog, BAN, la)   # voicecraft.py:1369-1371
    la = jnp.where((rows > n_eog) & ((cols == eog_stop)
                                     | (cols == cfg.empty_token)), BAN, la)
    # batch min-length guard bans eog on ALL codebooks (voicecraft.py:1275-1276)
    min_guard = first & (cur_num_gen <= cfg.encodec_sr // 5)
    la = jnp.where(min_guard & (cols == eog_stop), BAN, la)
    if scfg.stop_repetition > 0 and len(scfg.silence_tokens) > 0:
        sil = jnp.asarray(scfg.silence_tokens)
        hit = (jnp.any(sil[None, :] == prev[:, None], axis=1)
               & (consec > scfg.stop_repetition) & first)    # [B]
        denom = (consec - (scfg.stop_repetition - 1)).astype(jnp.float32)
        cell = (rows == 0) & (cols == prev[:, None, None])
        pen = jnp.where(la < 0, la * denom[:, None, None],
                        la / jnp.maximum(denom, 1.0)[:, None, None])
        la = jnp.where(hit[:, None, None] & cell, pen, la)

    samples = sample_tokens(rng, la, scfg.top_k, scfg.top_p,
                            scfg.temperature)               # [B, K]

    # ---- n_eog == 0 ----
    s0 = jnp.where(jnp.arange(K)[None, :] > cur_num_gen,
                   cfg.empty_token, samples)
    stop_b = ((s0[:, 0] == eog_stop)
              | (jnp.argmax(la[:, 0], axis=-1) == eog_stop)
              | (y_pos > x_len * cap_mult))                 # [B]
    s0 = s0.at[:, 0].set(jnp.where(stop_b, eog_stop, s0[:, 0]))
    any_stop = jnp.any(stop_b)
    # reference iterates b ascending and overwrites keep -> last hit wins
    keep0 = jnp.where(any_stop,
                      jnp.max(jnp.where(stop_b, jnp.arange(B), -1)), keep)
    eog0 = codebook_eog.at[0].set(any_stop)
    if len(scfg.silence_tokens) > 0:
        sil = jnp.asarray(scfg.silence_tokens)
        is_sil = (jnp.any(sil[None, :] == s0[:, 0:1], axis=1)
                  & (s0[:, 0] == prev))
    else:
        is_sil = jnp.zeros((B,), bool)
    consec0 = jnp.where(is_sil, consec + 1, 0)
    prev0 = s0[:, 0]

    # ---- n_eog > 0: cascade on the keep row only (voicecraft.py:1321-1324) ----
    kk = jnp.maximum(keep, 0)
    r = jnp.arange(K)
    keep_row = jnp.where(r < n_eog, cfg.empty_token, samples[kk])
    keep_row = jnp.where(r == n_eog, eog_stop, keep_row)
    s1 = samples.at[kk].set(keep_row)
    eog1 = codebook_eog | (r == n_eog)

    new_samples = jnp.where(first, s0, s1)
    new_eog = jnp.where(first, eog0, eog1)
    new_consec = jnp.where(first, consec0, consec)
    new_prev = jnp.where(first, prev0, prev)
    new_keep = jnp.where(first, keep0, keep)
    return new_samples, new_eog, new_consec, new_prev, new_keep


def make_batch_tts_loop(cfg: ModelConfig, *, batch_size: int, x_pad: int,
                        y_pad: int, gen_max: int, scfg: SamplingConfig):
    """Best-of-N TTS: N sampling paths over one prompt; the first to finish
    is returned (used by the gradio "speech rate" control,
    gradio_app.py:506-509)."""
    K, D = cfg.n_codebooks, cfg.d_model
    H, Dh, L = cfg.nhead, cfg.head_dim, cfg.num_decoder_layers
    B = batch_size
    dtype = jnp.dtype(cfg.compute_dtype)
    cap_mult = cfg.encodec_sr // 5
    s_max = x_pad + y_pad + gen_max
    pe_np = sine_table(MAX_POS, D)

    def decode(params, x_tokens, x_len, y_prefix, prefix_len, rng):
        pe = jnp.asarray(pe_np).astype(dtype)
        alpha_a = params["alpha_audio"].astype(dtype)

        x_emb = jnp.take(params["text_emb"]["weight"], x_tokens, axis=0).astype(dtype)
        x_in = x_emb + params["alpha_text"].astype(dtype) * pe[:x_pad]
        y_emb = embed_audio_tokens(params["audio_emb"], y_prefix).astype(dtype)
        y_in = y_emb + alpha_a * pe[:y_pad]
        xy = jnp.concatenate([x_in, y_in], axis=1)
        xy = jnp.broadcast_to(xy, (B,) + xy.shape[1:])

        Sp = x_pad + y_pad
        from ..ops.flash_attention import (flash_prefix_attention,
                                           use_flash_prefill)
        if use_flash_prefill(Sp):
            bias = lambda q, k, v: flash_prefix_attention(
                q, k, v,
                jnp.broadcast_to(jnp.atleast_1d(x_len), (B,)),
                jnp.broadcast_to(jnp.atleast_1d(prefix_len), (B,)),
                x_pad, cfg.nhead)
        else:
            jj = jnp.arange(Sp)
            key_valid = jnp.where(jj < x_pad, jj < x_len,
                                  jj < x_pad + prefix_len)
            allowed = (jj[None, :] <= jj[:, None]) & key_valid[None, :]
            bias = jnp.where(allowed, 0.0,
                             NEG_INF).astype(jnp.float32)[None, None]

        cache = trm.init_kv_cache(L, B, s_max, H, Dh, dtype)
        h, cache = trm.prefill(params["decoder"], xy, bias, cache, cfg.nhead)
        h_last = jax.lax.dynamic_slice_in_dim(h, x_pad + prefix_len - 1, 1, axis=1)
        logits0 = apply_heads(params["heads"], h_last)[:, 0]   # [B, K, card]

        state = BatchDecodeState(
            cache=cache, logits=logits0, rng=rng,
            pos=jnp.asarray(x_pad) + prefix_len,
            y_pos=prefix_len.astype(jnp.int32),
            gen_buf=jnp.zeros((gen_max, B, K), jnp.int32),
            gen_cnt=jnp.asarray(0, jnp.int32),
            codebook_eog=jnp.zeros((K,), bool),
            cur_num_gen=jnp.asarray(0, jnp.int32),
            consec_silence=jnp.zeros((B,), jnp.int32),
            prev_token=jnp.full((B,), -1, jnp.int32),
            keep=jnp.asarray(-1, jnp.int32),
            done=jnp.asarray(False))

        def cond(s):
            return jnp.logical_not(s.done) & (s.gen_cnt < gen_max)

        def body(s):
            rng, step_rng = jax.random.split(s.rng)
            samples, new_eog, consec, prev, keep = _batch_adjust_and_sample(
                cfg, scfg, cap_mult, step_rng, s.logits, s.codebook_eog,
                s.cur_num_gen, s.consec_silence, s.prev_token,
                s.y_pos, x_len, s.keep)
            gen_buf = jax.lax.dynamic_update_slice(
                s.gen_buf, samples[None], (s.gen_cnt, 0, 0))
            done = jnp.all(new_eog)
            feed_emb = embed_audio_tokens(
                params["audio_emb"], samples[:, :, None])[:, 0].astype(dtype)
            feed = feed_emb + alpha_a * jax.lax.dynamic_slice_in_dim(
                pe, s.y_pos, 1, axis=0)                     # [B, D]
            h, cache = trm.decode_step_fast(params["decoder"], feed[:, None, :],
                                       s.cache, s.pos, cfg.nhead,
                                       x_len=x_len, x_pad=x_pad)
            logits = apply_heads(params["heads"], h)[:, 0]
            return BatchDecodeState(cache, logits, rng, s.pos + 1, s.y_pos + 1,
                                    gen_buf, s.gen_cnt + 1, new_eog,
                                    s.cur_num_gen + 1, consec, prev, keep,
                                    done)

        final = jax.lax.while_loop(cond, body, state)
        return final.gen_buf, final.gen_cnt, jnp.maximum(final.keep, 0)

    return jax.jit(decode)
