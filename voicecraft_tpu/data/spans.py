"""Host-side mask-span sampling and delayed-sequence composition.

This module replaces the reference's in-model, per-sample python machinery
(models/voicecraft.py:198-320: prepare_mask_intervals / rearrange / shift /
insert_mask / cat_y) with numpy composition that runs on the host inside the
input pipeline.  The device receives static-shape arrays only (see
models/voicecraft.py:TrainBatch in this repo).

Composition layout per sample (K codebooks, m masked spans):

    [ D(N_0) M_0 D(N_1) M_1 ... D(N_m) M_m D(G_0) M_{m+1} D(G_1) ... D(G_{m-1}) ]

where N_i are the m+1 non-masked spans, G_j the m masked spans (moved to the
end), D(.) the delayed-pattern interleave of a span *with eog/eos appended
per the reduced_eog rules* (reference voicecraft.py:239-252), and M_j the
single mask-placeholder columns (embedding overwritten by mask_embedding,
reference voicecraft.py:264-288,311-320).

Target validity: position p's CE target (for codebook q) is the token at
column p+1, valid iff that slot holds a real token of the same span — this is
exactly the reference's remove_mask + revert_pattern_logits alignment
(voicecraft.py:376-404); see ops/patterns.py for the proof sketch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from ..config import ModelConfig
from ..ops import patterns


# ==============================================================================
# span sampling (training) — reference voicecraft.py:198-237
# ==============================================================================

def sample_mask_intervals(rng: np.random.Generator, y_len: int,
                          cfg: ModelConfig
                          ) -> Tuple[List[Tuple[int, int]], List[Tuple[int, int]]]:
    """Sample (mask_intervals, non_mask_intervals) for one utterance.

    Reproduces the reference's distribution: n_spans ~ clamp(Poisson(lam),1,max)
    or uniform; starts sampled without replacement from [1, y_len-1-min_len);
    later starts closer than min_gap to the previous are dropped; span length
    uniform in [min,max], re-drawn from [1, gap-1] when it would overlap.
    """
    if cfg.mask_sample_dist == "uniform":
        n_spans = int(rng.integers(1, cfg.max_n_spans + 1))
    elif cfg.mask_sample_dist.lower().startswith("poisson"):
        lam = float(cfg.mask_sample_dist[len("poisson"):])
        n_spans = int(np.clip(rng.poisson(lam), 1, cfg.max_n_spans))
    else:
        raise ValueError(cfg.mask_sample_dist)

    hi = y_len - 1 - cfg.mask_len_min
    assert hi > 1, f"utterance too short to mask: y_len={y_len}"
    n_spans = min(n_spans, hi - 1)
    starts = sorted(rng.choice(np.arange(1, hi), size=n_spans,
                               replace=False).tolist())
    # drop later starts that are too close to the previous one
    # (reference voicecraft.py:213-215)
    for j in range(len(starts) - 1, 0, -1):
        if starts[j] - starts[j - 1] < cfg.min_gap:
            del starts[j]
    assert len(starts) > 0

    # a start whose gap to the next start (or y_len) is < 2 cannot host even
    # a length-1 mask — the reference's random.randint(1, gap-1) raises there
    # (voicecraft.py:223; only reachable with min_gap <= 1 configs).  Drop
    # such starts instead of emitting a degenerate zero-length span.
    for j in range(len(starts) - 1, -1, -1):
        nxt = starts[j + 1] if j + 1 < len(starts) else y_len
        if nxt - starts[j] < 2 and len(starts) > 1:
            del starts[j]

    temp_starts = starts + [y_len]
    gaps = [temp_starts[j + 1] - temp_starts[j] for j in range(len(starts))]
    ends = []
    for start, gap in zip(starts, gaps):
        assert gap >= 2, (start, gap, y_len)
        mask_len = int(rng.integers(cfg.mask_len_min, cfg.mask_len_max + 1))
        if mask_len > gap - 1:
            mask_len = int(rng.integers(1, gap))  # uniform on [1, gap-1]
        ends.append(start + mask_len)

    mask_intervals = list(zip(starts, ends))
    non_mask_intervals = list(zip([0] + ends, starts + [y_len]))
    return mask_intervals, non_mask_intervals


# ==============================================================================
# composition
# ==============================================================================

@dataclass
class ComposedSequence:
    tokens: np.ndarray        # [K, S] int32 (delayed space, incl. placeholders)
    mask_emb_idx: np.ndarray  # [S] int32, -1 where not a mask column
    real: np.ndarray          # [K, S] bool — slot holds a real span token
    length: int


def _span_tokens(y: np.ndarray, lo: int, hi: int, tail: int | None) -> np.ndarray:
    """Slice y[:, lo:hi] and optionally append a tail token column (eog/eos)."""
    seg = y[:, lo:hi]
    if tail is not None:
        seg = np.concatenate(
            [seg, np.full((y.shape[0], 1), tail, dtype=y.dtype)], axis=1)
    return seg


def _delayed_np(seg: np.ndarray, empty_token: int) -> np.ndarray:
    """Numpy delayed interleave of [K, t] -> [K, t + K] (leading empty column,
    row q shifted right by q)."""
    K, t = seg.shape
    S = t + K
    out = np.full((K, S), empty_token, dtype=np.int32)
    for q in range(K):
        out[q, 1 + q:1 + q + t] = seg[q]
    return out


def segment_tails(n_non_mask: int, n_mask: int, cfg: ModelConfig) -> List[int | None]:
    """eog/eos appended to each span, in composition order
    (reference voicecraft.py:243-250)."""
    tails: List[int | None] = []
    for i in range(n_non_mask):
        last = i == n_non_mask - 1
        if cfg.eos > 0:
            assert cfg.reduced_eog
            tails.append(cfg.eos if last else None)
        elif cfg.reduced_eog:
            tails.append(cfg.eog if last else None)
        else:
            tails.append(cfg.eog)
    tails.extend([cfg.eog] * n_mask)
    return tails


def mask_value_ids(n_mask: int, cfg: ModelConfig,
                   rng: np.random.Generator | None = None) -> List[int]:
    """Embedding ids for the 2*n_mask placeholder columns
    (reference voicecraft.py:271-276)."""
    ids = list(range(cfg.max_n_spans))
    if cfg.shuffle_mask_embedding and rng is not None:
        rng.shuffle(ids)
    use = ids[:n_mask]
    return use + use


def compose_sequence(y: np.ndarray,
                     mask_intervals: Sequence[Tuple[int, int]],
                     non_mask_intervals: Sequence[Tuple[int, int]],
                     cfg: ModelConfig,
                     rng: np.random.Generator | None = None,
                     ) -> ComposedSequence:
    """Full training composition: all spans, all mask placeholders.

    y: [K, T] original codes.  Equivalent to reference
    rearrange+shift+insert_mask+cat_y (voicecraft.py:239-309).
    """
    K = y.shape[0]
    m = len(mask_intervals)
    tails = segment_tails(len(non_mask_intervals), m, cfg)
    segs = ([_span_tokens(y, lo, hi, t)
             for (lo, hi), t in zip(non_mask_intervals, tails[:m + 1])]
            + [_span_tokens(y, lo, hi, t)
               for (lo, hi), t in zip(mask_intervals, tails[m + 1:])])

    mv = mask_value_ids(m, cfg, rng)
    cols_tokens, cols_mask, cols_real = [], [], []
    for i, seg in enumerate(segs):
        d = _delayed_np(seg, cfg.empty_token)
        r = patterns.real_token_mask(seg.shape[1], K, d.shape[1])
        cols_tokens.append(d)
        cols_mask.append(np.full(d.shape[1], -1, np.int32))
        cols_real.append(r)
        if i < len(segs) - 1:  # 2m placeholders between 2m+1 segments
            cols_tokens.append(np.full((K, 1), cfg.eog, np.int32))
            cols_mask.append(np.asarray([mv[i]], np.int32))
            cols_real.append(np.zeros((K, 1), bool))

    tokens = np.concatenate(cols_tokens, axis=1).astype(np.int32)
    mask_idx = np.concatenate(cols_mask)
    real = np.concatenate(cols_real, axis=1)
    S = tokens.shape[1]

    # closed-form length check (reference voicecraft.py:299-301)
    y_len = int(sum(hi - lo for lo, hi in mask_intervals)
                + sum(hi - lo for lo, hi in non_mask_intervals))
    n_tails = sum(1 for t in tails if t is not None)
    assert S == y_len + n_tails + (2 * m + 1) * K + 2 * m, (S, y_len, m)
    return ComposedSequence(tokens, mask_idx, real, S)


def target_valid_from_real(real: np.ndarray) -> np.ndarray:
    """valid[q, p] = real[q, p+1] — next-slot-holds-real-token mask."""
    v = np.zeros_like(real)
    v[:, :-1] = real[:, 1:]
    return v


def compose_edit_prefix(y: np.ndarray,
                        mask_intervals: Sequence[Tuple[int, int]],
                        cfg: ModelConfig) -> Tuple[ComposedSequence, List[int]]:
    """Inference prefix for multi-span editing (reference voicecraft.py:621-686).

    Keeps the m+1 non-masked spans (delayed, tails per rules), the m+1 leading
    mask placeholders, and the first (empty) column of the first generated
    span; the masked spans themselves are discarded — they get generated.

    Returns (prefix, queue_mask_ids) where queue_mask_ids[j] is the
    mask-embedding id fed before generated span j (j >= 1), matching the
    reference's more_mask_value (voicecraft.py:676).
    """
    K = y.shape[0]
    y_len = y.shape[1]
    m = len(mask_intervals)
    starts = [s for s, _ in mask_intervals]
    ends = [e for _, e in mask_intervals]
    non_mask_intervals = list(zip([0] + ends, starts + [y_len]))

    tails = segment_tails(len(non_mask_intervals), m, cfg)
    mv = mask_value_ids(m, cfg)

    cols_tokens, cols_mask, cols_real = [], [], []
    for i, (lo, hi) in enumerate(non_mask_intervals):
        seg = _span_tokens(y, lo, hi, tails[i])
        d = _delayed_np(seg, cfg.empty_token)
        r = patterns.real_token_mask(seg.shape[1], K, d.shape[1])
        cols_tokens.append(d)
        cols_mask.append(np.full(d.shape[1], -1, np.int32))
        cols_real.append(r)
        # placeholder after every non-masked span (ids mv[0..m])
        cols_tokens.append(np.full((K, 1), cfg.eog, np.int32))
        cols_mask.append(np.asarray([mv[i] if i < len(mv) else 0], np.int32))
        cols_real.append(np.zeros((K, 1), bool))
    # first (all-empty) column of the first generated span
    # (reference truncation at mask_position[num_mask]+2, voicecraft.py:674)
    cols_tokens.append(np.full((K, 1), cfg.empty_token, np.int32))
    cols_mask.append(np.asarray([-1], np.int32))
    cols_real.append(np.zeros((K, 1), bool))

    prefix = ComposedSequence(
        np.concatenate(cols_tokens, axis=1).astype(np.int32),
        np.concatenate(cols_mask),
        np.concatenate(cols_real, axis=1),
        sum(c.shape[1] for c in cols_tokens),
    )
    # mask fed before generated span j (j>=1): second copy of emb ids -> j
    queue_mask_ids = [mv[m + j] if m + j < len(mv) else 0 for j in range(m)]
    return prefix, queue_mask_ids


def compose_tts_prefix(y: np.ndarray, cfg: ModelConfig) -> ComposedSequence:
    """TTS prefix: delayed prompt with the trailing K-1 columns cut
    (reference voicecraft.py:957-974)."""
    K, T = y.shape
    d = _delayed_np(y, cfg.empty_token)[:, :T + 1]
    real = patterns.real_token_mask(T, K, T + K)[:, :T + 1]
    return ComposedSequence(d.astype(np.int32),
                            np.full(T + 1, -1, np.int32), real, T + 1)
