"""Attention ops for the VoiceCraft decoder, TPU-first.

The reference materialises a (B*H, S, S) additive float mask and calls
``F.scaled_dot_product_attention`` (models/modules/activation.py:634,
models/voicecraft.py:419-447).  Here the [x ; y] joint mask reduces to a plain
causal mask + key-padding (see models/voicecraft.py:419-428: x rows attend
causally within x and never to y — but causality already forbids x->y since
all y positions come after x; y rows attend all x and causally within y).
So we never materialise per-head masks: biases are computed from lengths.

Two paths:
  - ``full_attention``: training / prefill, [B, S, D] x [B, S, D].
  - ``decode_attention``: single-query KV-slab read for autoregressive decode.
Both accumulate in f32 on the MXU regardless of the bf16 activations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative instead of -inf: keeps softmax NaN-free for
                # fully-masked (padding) query rows, which the loss masks out.


def causal_padding_bias(s_q: int, s_kv: int, kv_lens: jnp.ndarray | None,
                        q_offset: int = 0, dtype=jnp.float32) -> jnp.ndarray:
    """Additive bias [B or 1, 1, s_q, s_kv]: causal + key-padding.

    Query global position = q_offset + row.  Key j is visible iff
    j <= q_pos and (kv_lens is None or j < kv_len_b).
    """
    q_pos = q_offset + jnp.arange(s_q)[:, None]
    k_pos = jnp.arange(s_kv)[None, :]
    allowed = k_pos <= q_pos                              # [s_q, s_kv]
    if kv_lens is None:
        return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[None, None]
    allowed = allowed[None] & (k_pos[None] < kv_lens[:, None, None])  # [B,s_q,s_kv]
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[:, None]


def segment_padding_bias(s_total: int, x_max: int, x_lens: jnp.ndarray,
                         y_lens: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Joint [x ; y] bias for training: causal + per-segment key padding.

    Keys are valid when (j < x_len) or (x_max <= j < x_max + y_len); this is
    the reference's xy_padding_mask (models/voicecraft.py:432-443) fused with
    the causal structure.
    Returns [B, 1, s_total, s_total].
    """
    j = jnp.arange(s_total)
    key_valid = jnp.where(
        j[None, :] < x_max,
        j[None, :] < x_lens[:, None],
        j[None, :] < x_max + y_lens[:, None],
    )                                                     # [B, S]
    causal = j[None, :] <= j[:, None]                     # [S, S]
    allowed = causal[None] & key_valid[:, None, :]        # [B, S, S]
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[:, None]


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, bias: jnp.ndarray,
        nhead: int, dropout_rate: float = 0.0, rng=None) -> jnp.ndarray:
    """Multi-head attention core.

    q/k/v: [B, S, D] already projected.  bias: [B or 1, 1, S_q, S_kv].
    Returns [B, S_q, D].  Softmax in f32 (TPU numerics), matmuls on MXU with
    f32 accumulation.
    """
    B, Sq, D = q.shape
    Skv = k.shape[1]
    Dh = D // nhead
    q = q.reshape(B, Sq, nhead, Dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, Skv, nhead, Dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, Skv, nhead, Dh).transpose(0, 2, 1, 3)

    scale = 1.0 / jnp.sqrt(Dh).astype(jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, Sq, D)


def decode_attention_self(q: jnp.ndarray, k_cache: jnp.ndarray,
                          v_cache: jnp.ndarray, kv_len: jnp.ndarray,
                          k_new: jnp.ndarray, v_new: jnp.ndarray,
                          nhead: int,
                          x_len: jnp.ndarray | None = None,
                          x_pad: int | None = None) -> jnp.ndarray:
    """Single-step attention over a READ-ONLY slab plus the current token.

    The hot-loop variant: the slab holds positions [0, kv_len) and is never
    rewritten inside the layer scan; the current token's k/v enter the softmax
    as an explicit extra term.  This avoids the per-layer full-slab
    dynamic_update_slice copies (hundreds of MB/step at 830M scale).

    q: [B, 1, D]; k_cache/v_cache: [B, S_max, H, Dh]; k_new/v_new: [B, 1, H, Dh].
    """
    B, S_max, H, Dh = k_cache.shape
    # keep the cache's native [B, S, H, Dh] layout — no transposes, the
    # einsums contract directly (a materialised transpose would copy the
    # whole slab every step)
    qh = q.reshape(B, 1, H, Dh)
    scale = 1.0 / jnp.sqrt(Dh).astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, k_cache,
                        preferred_element_type=jnp.float32) * scale
    j = jnp.arange(S_max)[None, None, None, :]
    mask = j < kv_len
    if x_pad is not None:
        mask = mask & ((j < x_len) | (j >= x_pad))
    logits = jnp.where(mask, logits, NEG_INF)
    # self term: q attends its own k (always allowed)
    logit_self = jnp.einsum("bqhd,bkhd->bhqk", qh, k_new,
                            preferred_element_type=jnp.float32) * scale
    all_logits = jnp.concatenate([logits, logit_self], axis=-1)
    probs = jax.nn.softmax(all_logits, axis=-1).astype(v_cache.dtype)
    out = (jnp.einsum("bhqk,bkhd->bqhd", probs[..., :-1], v_cache,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bhqk,bkhd->bqhd", probs[..., -1:], v_new,
                        preferred_element_type=jnp.float32)
           ).astype(v_cache.dtype)
    return out.reshape(B, 1, H * Dh)


def decode_attention_self_block(q: jnp.ndarray, k_cache: jnp.ndarray,
                                v_cache: jnp.ndarray, kv_len: jnp.ndarray,
                                k_new: jnp.ndarray, v_new: jnp.ndarray,
                                nhead: int,
                                x_len: jnp.ndarray | None = None,
                                x_pad: int | None = None) -> jnp.ndarray:
    """Block variant of :func:`decode_attention_self` for speculative decode.

    T draft tokens attend the read-only slab [0, kv_len) (minus text padding
    [x_len, x_pad)) plus causally within the new block.  Stale slab entries
    at positions >= kv_len — left over from rejected drafts of a previous
    pass — are masked out, which is what makes "rewind = move the write
    pointer back" sound.

    q: [B, T, D]; k_cache/v_cache: [B, S_max, H, Dh]; k_new/v_new: [B, T, H, Dh].
    """
    B, S_max, H, Dh = k_cache.shape
    T = k_new.shape[1]
    qh = q.reshape(B, T, H, Dh)
    scale = 1.0 / jnp.sqrt(Dh).astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, k_cache,
                        preferred_element_type=jnp.float32) * scale
    j = jnp.arange(S_max)[None, None, None, :]
    mask = j < kv_len
    if x_pad is not None:
        mask = mask & ((j < x_len) | (j >= x_pad))
    logits = jnp.where(mask, logits, NEG_INF)
    logit_blk = jnp.einsum("bqhd,bkhd->bhqk", qh, k_new,
                           preferred_element_type=jnp.float32) * scale
    blk_causal = (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])
    logit_blk = jnp.where(blk_causal[None, None], logit_blk, NEG_INF)
    all_logits = jnp.concatenate([logits, logit_blk], axis=-1)
    probs = jax.nn.softmax(all_logits, axis=-1).astype(v_cache.dtype)
    out = (jnp.einsum("bhqk,bkhd->bqhd", probs[..., :S_max], v_cache,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bhqk,bkhd->bqhd", probs[..., S_max:], v_new,
                        preferred_element_type=jnp.float32)
           ).astype(v_cache.dtype)
    return out.reshape(B, T, H * Dh)


def decode_attention_multi(q: jnp.ndarray, k_cache: jnp.ndarray,
                           v_cache: jnp.ndarray, kv_len: jnp.ndarray,
                           k_new: jnp.ndarray, v_new: jnp.ndarray,
                           nhead: int, x_lens: jnp.ndarray, x_pad: int,
                           prefix_lens: jnp.ndarray, y_start: int
                           ) -> jnp.ndarray:
    """Multi-stream decode attention: per-lane segment validity.

    Slab layout per lane b: text [0, x_len_b) valid within [0, x_pad);
    prompt prefix [x_pad, x_pad + prefix_len_b) within [x_pad, y_start);
    generated tokens [y_start, kv_len) (uniform write pointer).
    """
    B, S_max, H, Dh = k_cache.shape
    qh = q.reshape(B, 1, H, Dh)
    scale = 1.0 / jnp.sqrt(Dh).astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, k_cache,
                        preferred_element_type=jnp.float32) * scale
    j = jnp.arange(S_max)[None, :]
    valid = ((j < x_lens[:, None])
             | ((j >= x_pad) & (j < x_pad + prefix_lens[:, None]))
             | ((j >= y_start) & (j < kv_len)))
    logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    logit_self = jnp.einsum("bqhd,bkhd->bhqk", qh, k_new,
                            preferred_element_type=jnp.float32) * scale
    all_logits = jnp.concatenate([logits, logit_self], axis=-1)
    probs = jax.nn.softmax(all_logits, axis=-1).astype(v_cache.dtype)
    out = (jnp.einsum("bhqk,bkhd->bqhd", probs[..., :-1], v_cache,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bhqk,bkhd->bqhd", probs[..., -1:], v_new,
                        preferred_element_type=jnp.float32)).astype(v_cache.dtype)
    return out.reshape(B, 1, H * Dh)


def decode_attention_multi_block(q: jnp.ndarray, k_cache: jnp.ndarray,
                                 v_cache: jnp.ndarray, gen_lens: jnp.ndarray,
                                 k_new: jnp.ndarray, v_new: jnp.ndarray,
                                 nhead: int, x_lens: jnp.ndarray, x_pad: int,
                                 prefix_lens: jnp.ndarray, y_start: int
                                 ) -> jnp.ndarray:
    """Multi-stream BLOCK attention for speculative serving.

    Combines :func:`decode_attention_multi`'s per-lane segment validity with
    :func:`decode_attention_self_block`'s intra-block causal term.  Lane b's
    valid slab keys: text [0, x_len_b), prompt [x_pad, x_pad+prefix_len_b),
    and a COMPACT per-lane generated region [y_start, y_start + gen_len_b) —
    each lane writes its accepted tokens contiguously at its own offset, so
    stale entries from rejected drafts sit at j >= y_start + gen_len_b and
    are never read (the rewind trick, per lane).

    q: [B, T, D]; k_cache/v_cache: [B, S_max, H, Dh]; k_new/v_new: [B, T, H, Dh].
    """
    B, S_max, H, Dh = k_cache.shape
    T = k_new.shape[1]
    qh = q.reshape(B, T, H, Dh)
    scale = 1.0 / jnp.sqrt(Dh).astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, k_cache,
                        preferred_element_type=jnp.float32) * scale
    j = jnp.arange(S_max)[None, :]
    valid = ((j < x_lens[:, None])
             | ((j >= x_pad) & (j < x_pad + prefix_lens[:, None]))
             | ((j >= y_start) & (j < y_start + gen_lens[:, None])))
    logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    logit_blk = jnp.einsum("bqhd,bkhd->bhqk", qh, k_new,
                           preferred_element_type=jnp.float32) * scale
    blk_causal = (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])
    logit_blk = jnp.where(blk_causal[None, None], logit_blk, NEG_INF)
    all_logits = jnp.concatenate([logits, logit_blk], axis=-1)
    probs = jax.nn.softmax(all_logits, axis=-1).astype(v_cache.dtype)
    out = (jnp.einsum("bhqk,bkhd->bqhd", probs[..., :S_max], v_cache,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bhqk,bkhd->bqhd", probs[..., S_max:], v_new,
                        preferred_element_type=jnp.float32)
           ).astype(v_cache.dtype)
    return out.reshape(B, T, H * Dh)


def decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                     kv_len: jnp.ndarray, nhead: int,
                     x_len: jnp.ndarray | None = None,
                     x_pad: int | None = None) -> jnp.ndarray:
    """Single-step attention against a static KV slab.

    q: [B, 1, D]; k_cache/v_cache: [B, S_max, H, Dh]; kv_len: scalar int —
    number of filled slab slots (uniform across batch; per-sample lengths
    come with continuous batching).

    When the text segment is padded to a static ``x_pad``, slots
    [x_len, x_pad) hold pad-position k/v and are masked out; the audio
    segment starts at x_pad and is contiguous.
    """
    B, S_max, H, Dh = k_cache.shape
    qh = q.reshape(B, 1, H, Dh).transpose(0, 2, 1, 3)       # [B,H,1,Dh]
    kh = k_cache.transpose(0, 2, 1, 3)                       # [B,H,S,Dh]
    vh = v_cache.transpose(0, 2, 1, 3)
    scale = 1.0 / jnp.sqrt(Dh).astype(jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    j = jnp.arange(S_max)[None, None, None, :]
    mask = j < kv_len
    if x_pad is not None:
        mask = mask & ((j < x_len) | (j >= x_pad))
    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                     preferred_element_type=jnp.float32).astype(vh.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, 1, H * Dh)
