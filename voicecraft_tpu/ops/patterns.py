"""Delayed codebook-pattern engine, TPU-first.

The reference (models/codebooks_patterns.py:151-266,302-352) builds per-length
``Pattern`` objects holding python lists of (t, q) coordinates and derives
scatter indexes from them with an lru_cache.  On TPU we want the same maths as
pure index arithmetic: for the delayed pattern with delays (0, 1, .., K-1) the
layout is closed-form, so build/revert are single ``take`` ops over precomputed
index matrices — no python-object layouts, no per-length caches on the hot
path, and everything is jittable with static shapes.

Layout recap (reference codebooks_patterns.py:302-352):
  For T timesteps and K codebooks the interleaved sequence has
  S = T + K columns.  Column 0 is an all-special column (the layout's empty
  initial step); codebook row q holds token t at column 1 + t + q; every other
  slot is the special token.

  Example (T=4, K=3, S marks the special token):
      [[S, 1, 2, 3, 4, S, S],
       [S, S, 1, 2, 3, 4, S],
       [S, S, S, 1, 2, 3, 4]]

Model-output alignment (reference codebooks_patterns.py:247-266,
``revert_pattern_logits`` with is_model_output=True): the logits produced at
column p predict, for codebook q, the token at timestep t = p - q (valid when
0 <= t < T).  Equivalently: next-token prediction in the delayed space,
restricted to slots that hold real tokens.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pattern_len(t: int, n_q: int) -> int:
    """Interleaved sequence length for a span of t timesteps."""
    return t + n_q


def build_delayed(z: jnp.ndarray, special_token: int) -> jnp.ndarray:
    """Interleave a [..., K, T] token array into the delayed pattern.

    Returns [..., K, T + K].  Equivalent to the reference's
    ``Pattern.build_pattern_sequence`` (codebooks_patterns.py:151-176) with
    ``keep_only_valid_steps=False`` for the DelayedPatternProvider.
    """
    K, T = z.shape[-2], z.shape[-1]
    S = T + K
    idx, valid = build_indexes(T, K)
    flat = jnp.concatenate(
        [z.reshape(*z.shape[:-2], K * T),
         jnp.full((*z.shape[:-2], 1), special_token, dtype=z.dtype)],
        axis=-1,
    )
    out = jnp.take(flat, jnp.asarray(idx.reshape(-1)), axis=-1)
    return out.reshape(*z.shape[:-2], K, S)


def revert_delayed(s: jnp.ndarray, special_token: int) -> jnp.ndarray:
    """Invert :func:`build_delayed`: [..., K, T + K] -> [..., K, T].

    Equivalent to reference ``Pattern.revert_pattern_sequence``
    (codebooks_patterns.py:222-245).
    """
    K, S = s.shape[-2], s.shape[-1]
    T = S - K
    idx, valid = revert_indexes(T, K)
    flat = jnp.concatenate(
        [s.reshape(*s.shape[:-2], K * S),
         jnp.full((*s.shape[:-2], 1), special_token, dtype=s.dtype)],
        axis=-1,
    )
    out = jnp.take(flat, jnp.asarray(idx.reshape(-1)), axis=-1)
    return out.reshape(*s.shape[:-2], K, T)


def build_indexes(t: int, n_q: int) -> tuple[np.ndarray, np.ndarray]:
    """Gather indexes for building the delayed sequence.

    Returns (indexes [K, S] into flattened-[K*T]-plus-special, valid [K, S]).
    Mirrors reference ``_build_pattern_sequence_scatter_indexes``
    (codebooks_patterns.py:117-149) specialised to the delayed pattern.
    """
    S = t + n_q
    q = np.arange(n_q)[:, None]                       # [K, 1]
    col = np.arange(S)[None, :]                       # [1, S]
    tt = col - 1 - q                                  # timestep at each slot
    valid = (tt >= 0) & (tt < t)
    idx = np.where(valid, tt + q * t, n_q * t)        # special sentinel last
    return idx.astype(np.int32), valid


def revert_indexes(t: int, n_q: int) -> tuple[np.ndarray, np.ndarray]:
    """Gather indexes for reverting the delayed sequence.

    Returns (indexes [K, T] into flattened-[K*S]-plus-special, valid [K, T]).
    Mirrors reference ``_build_reverted_sequence_scatter_indexes``
    (codebooks_patterns.py:178-220) with is_model_output=False.
    """
    S = t + n_q
    q = np.arange(n_q)[:, None]                       # [K, 1]
    tt = np.arange(t)[None, :]                        # [1, T]
    col = 1 + tt + q                                  # column holding (q, t)
    valid = col < S                                   # always true here
    idx = np.where(valid, col + q * S, n_q * S)
    return idx.astype(np.int32), valid


def slot_timestep(n_q: int, s_max: int) -> np.ndarray:
    """[K, S] map column -> original timestep (or -1 for special slots up
    front; trailing slots are clamped by callers using their own T)."""
    q = np.arange(n_q)[:, None]
    col = np.arange(s_max)[None, :]
    return (col - 1 - q).astype(np.int32)


def real_token_mask(t: int, n_q: int, s_max: int) -> np.ndarray:
    """[K, s_max] bool: True where the delayed layout of a span with t
    timesteps holds a real token (column 1+t'+q, 0 <= t' < t)."""
    tt = slot_timestep(n_q, s_max)
    return (tt >= 0) & (tt < t)


def unshift_span(span_kt: np.ndarray) -> np.ndarray:
    """Undo the delay on a generated span laid out as [K, S_gen].

    Row q keeps columns [q : S_gen - (K - q)], i.e. drops its leading delay
    and the trailing eog cascade (reference voicecraft.py:1130-1135).
    Output is [K, S_gen - K].
    """
    K, S = span_kt.shape
    out = np.stack([span_kt[q, q:S - (K - q)] for q in range(K)], axis=0)
    return out
