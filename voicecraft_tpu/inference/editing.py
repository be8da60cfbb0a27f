"""Multi-span speech-editing inference (reference models/voicecraft.py:561-906
+ inference_speech_editing_scale.py:40-127 + edit_utils.py).

Also contains the word-diff span computation (``get_span``) and the
MFA-alignment-to-codec-frames conversion used by the editing CLI.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..config import ModelConfig
from ..data import spans
from ..models.voicecraft import SamplingConfig
from .tts import run_decode


def inference_edit(params, cfg: ModelConfig, x_tokens: np.ndarray,
                   y_codes: np.ndarray,
                   mask_intervals: Sequence[Tuple[int, int]],
                   scfg: SamplingConfig = SamplingConfig(),
                   seed: int = 1, gen_max=None, spec: int = 0) -> np.ndarray:
    """Regenerate the masked codec-frame intervals of ``y_codes`` [K, T].

    ``spec=TAU`` (>=2) uses verified speculative decoding
    (make_spec_edit_loop): requires params['mtp_heads']; greedy output
    token-identical to the plain loop (f32), sampled output keyed per
    token index (invariant to TAU).

    Returns the spliced codes [K, T'] (reference voicecraft.py:893-906).
    """
    if cfg.special_first:
        y_codes = y_codes + cfg.n_special
    mask_intervals = sorted((int(s), int(e)) for s, e in mask_intervals)
    prefix, queue_ids = spans.compose_edit_prefix(y_codes, mask_intervals, cfg)
    m = len(mask_intervals)
    gen = run_decode(params, cfg, is_tts=False, x_tokens=x_tokens,
                     prefix=prefix, queue_mask_ids=queue_ids, n_spans=m,
                     scfg=scfg, seed=seed, gen_max=gen_max, spec=spec)

    y_len = y_codes.shape[1]
    starts = [s for s, _ in mask_intervals]
    ends = [e for _, e in mask_intervals]
    non_mask = list(zip([0] + ends, starts + [y_len]))
    parts = []
    for j, (lo, hi) in enumerate(non_mask[:-1]):
        parts.append(y_codes[:, lo:hi])
        parts.append(gen[j])
    lo, hi = non_mask[-1]
    parts.append(y_codes[:, lo:hi])
    res = np.concatenate(parts, axis=1)
    if cfg.special_first:
        res = res - cfg.n_special
    return res


# ---- edit span computation (reference edit_utils.py:1-49) ---------------------

def fractional_edit_span(n_frames: int, f0: float, f1: float,
                         min_len: int = 4) -> Optional[Tuple[int, int]]:
    """Frame interval covering the (f0, f1) fraction of an utterance, for
    benchmark/quality harnesses that mask a middle span and regenerate it
    (spec_acceptance_cli --edit, quality_cli edit modes share this policy).

    Clamped to [1, n_frames-1]; returns None when the clamped span is
    shorter than ``min_len`` frames (too short to measure anything).
    """
    s = max(1, int(n_frames * f0))
    e = min(n_frames - 1, int(n_frames * f1))
    return (s, e) if e - s >= min_len else None


def get_span(orig: str, new: str, editType: str) -> Tuple[List[int], List[int]]:
    """Word-level diff between transcripts -> (orig_span, new_span) word-index
    intervals.  Behavioural port of reference edit_utils.get_span
    (edit_utils.py:1-49): the edited block is assumed contiguous; deletion /
    insertion spans start at the first diverging word (the changed block must
    not reach the end of the shorter transcript — the reference raises there
    too); substitution spans run from the first to the last diverging word.
    """
    orig_list = orig.split(" ")
    new_list = new.split(" ")

    if editType == "deletion":
        assert len(orig_list) > len(new_list), (orig, new)
        diff = len(orig_list) - len(new_list)
        for i, (o, n) in enumerate(zip(orig_list, new_list)):
            if o != n:
                return [i, i + diff - 1], [i - 1, i]
    elif editType == "insertion":
        assert len(new_list) > len(orig_list), (orig, new)
        diff = len(new_list) - len(orig_list)
        for i, (o, n) in enumerate(zip(orig_list, new_list)):
            if o != n:
                return [i - 1, i], [i, i + diff - 1]
    elif editType == "substitution":
        start = next((i for i, (o, n) in enumerate(zip(orig_list, new_list))
                      if o != n), None)
        assert start is not None, (orig, new)
        for j, (o, n) in enumerate(zip(orig_list[::-1], new_list[::-1])):
            if o != n:
                return ([start, len(orig_list) - j - 1],
                        [start, len(new_list) - j - 1])
    else:
        raise RuntimeError(f"editType unknown: {editType}")
    raise RuntimeError(
        f"wrong editing with the specified edit type:\n original: {orig}\n "
        f"new: {new}\n, editType: {editType}")


def get_mask_interval(alignment_rows: List[dict], word_span_ind: Tuple[int, int],
                      editType: str) -> Tuple[float, float]:
    """MFA alignment rows -> (start_sec, end_sec) for the edit.

    Faithful port of reference get_mask_interval
    (inference_speech_editing_scale.py:107-127): ``word_span_ind`` (s, e)
    indexes the alignment ROWS directly (get_span's insertion spans are
    already the neighbouring-word pair [i-1, i]); substitution/deletion use
    [Begin(s), End(e)], insertion uses the gap [End(s), Begin(e)].  Rows
    whose Type is not 'words' are skipped at the matching index, like the
    reference.
    """
    s, e = word_span_ind
    start = None
    end = None
    for j, r in enumerate(alignment_rows):
        is_word = r.get("Type", "words") == "words"
        if j == s and is_word:
            start = float(r["End" if editType == "insertion" else "Begin"])
        if j == e and is_word:
            end = float(r["Begin" if editType == "insertion" else "End"])
            assert start is not None, (s, e, editType)
            break
    assert start is not None and end is not None, (s, e, editType)
    return start, end
