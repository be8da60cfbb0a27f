"""Word-level forced alignment for editing from a raw wav.

The reference's apps derive edit word timestamps from external aligners:
whisperx in predict.py:209-215/372-389 and MFA CSVs or aeneas in
gradio_app.py:41-79,156-175.  Neither tool (nor their model weights) is a
dependency here; instead this module provides, in order of quality:

  1. ``WhisperWordAligner`` — word timestamps from a *local* transformers
     Whisper snapshot via cross-attention DTW (``return_token_timestamps``),
     the same mechanism whisperx wraps.  Used when the user passes an ASR
     model directory; zero-install environments skip it.
  2. ``energy_align`` — a dependency-free energy/VAD aligner: voiced
     segments from adaptive log-energy thresholding, words distributed over
     voiced time proportionally to their phone counts (the classic
     proportional-duration aligner; aeneas-like in mechanism).  Measured
     on clean procedural speech with exact ground-truth boundaries
     (tests/test_align_characterization.py): word-boundary error median
     35 ms / p90 97 ms / p99 139 ms — inside edit_cli's default 80 ms
     span margins at the median.

Both return MFA-shaped rows [{"Label", "Begin", "End", "Type": "words"}],
the schema ``inference/editing.py:get_mask_interval`` consumes, so every
editing path (edit_cli, serve /edit) works from a raw wav + transcripts
alone — matching the reference's predict.py behaviour.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


# ==============================================================================
# energy VAD
# ==============================================================================

def frame_energy_db(wav: np.ndarray, sr: int, win_s: float = 0.025,
                    hop_s: float = 0.010) -> np.ndarray:
    """Log frame energy (dB) over [T] samples; 25 ms windows, 10 ms hop."""
    wav = np.asarray(wav, np.float32).reshape(-1)
    win = max(int(win_s * sr), 1)
    hop = max(int(hop_s * sr), 1)
    n = max(1 + (len(wav) - win) // hop, 1)
    idx = np.arange(win)[None, :] + hop * np.arange(n)[:, None]
    idx = np.minimum(idx, len(wav) - 1)
    frames = wav[idx]
    e = np.mean(frames ** 2, axis=1)
    return 10.0 * np.log10(np.maximum(e, 1e-12))


def voiced_segments(wav: np.ndarray, sr: int, hop_s: float = 0.010,
                    min_gap_s: float = 0.12, min_seg_s: float = 0.06
                    ) -> List[tuple]:
    """Adaptive-threshold VAD -> [(start_sec, end_sec)] voiced spans.

    Threshold sits between the noise floor (5th pct) and speech level
    (95th pct); short gaps are bridged, short blips dropped.
    """
    e = frame_energy_db(wav, sr, hop_s=hop_s)
    lo, hi = np.percentile(e, 5.0), np.percentile(e, 95.0)
    thr = max(lo + 0.25 * (hi - lo), hi - 35.0)
    voiced = e > thr

    # bridge short unvoiced gaps
    max_gap = int(round(min_gap_s / hop_s))
    segs = []
    start = None
    gap = 0
    for i, v in enumerate(voiced):
        if v:
            if start is None:
                start = i
            gap = 0
        elif start is not None:
            gap += 1
            if gap > max_gap:
                segs.append((start, i - gap + 1))
                start, gap = None, 0
    if start is not None:
        segs.append((start, len(voiced) - gap))

    out = []
    for s, t in segs:
        if (t - s) * hop_s >= min_seg_s:
            out.append((s * hop_s, t * hop_s))
    return out


# ==============================================================================
# proportional word alignment over voiced time
# ==============================================================================

def _voiced_time_to_abs(segs: Sequence[tuple], vt: float) -> float:
    """Map an offset into concatenated voiced time to absolute seconds."""
    for s, t in segs:
        d = t - s
        if vt <= d or (s, t) == segs[-1]:
            return s + min(vt, d)
        vt -= d
    return segs[-1][1]


def energy_align(wav: np.ndarray, sr: int, words: Sequence[str],
                 weights: Optional[Sequence[float]] = None
                 ) -> List[Dict]:
    """Align ``words`` to ``wav`` by proportional allocation over voiced time.

    ``weights`` defaults to per-word character counts (a phone-count proxy;
    pass phone counts for better boundaries).  Returns MFA-shaped rows.
    """
    words = [w for w in words if w]
    assert words, "no words to align"
    dur = len(np.asarray(wav).reshape(-1)) / sr
    segs = voiced_segments(wav, sr) or [(0.0, dur)]
    if weights is None:
        weights = [max(len(w), 1) for w in words]
    weights = np.asarray(weights, np.float64)
    assert len(weights) == len(words) and (weights > 0).all()

    total_voiced = sum(t - s for s, t in segs)
    cum = np.concatenate([[0.0], np.cumsum(weights)]) / weights.sum()
    rows = []
    for i, w in enumerate(words):
        t0 = _voiced_time_to_abs(segs, cum[i] * total_voiced)
        t1 = _voiced_time_to_abs(segs, cum[i + 1] * total_voiced)
        rows.append({"Label": w, "Begin": round(float(t0), 4),
                     "End": round(float(t1), 4), "Type": "words",
                     "Source": "energy"})
    return rows


# characterized word-boundary error of energy_align on clean speech with
# exact ground truth (tests/test_align_characterization.py): median 35 ms,
# p90 97 ms.  Editing margins below the p90 risk clipping word edges when
# the energy aligner is the timestamp source.
ENERGY_P90_SEC = 0.097


def widen_margins_for_aligner(rows: Sequence[Dict], left: float,
                              right: float) -> tuple:
    """Auto-widen edit margins to the aligner's characterized p90 error.

    The reference's 0.08 s default margins
    (inference_speech_editing_scale.py:24-37) assume MFA-quality
    timestamps.  When ``rows`` came from the energy aligner (tagged
    ``Source == "energy"``), a boundary can be off by up to ~97 ms (p90),
    so margins below that would clip word edges roughly one edit in ten.
    Returns (left, right, widened) with both margins floored at
    ``ENERGY_P90_SEC``; logs a warning when widening fires.  Whisper/MFA
    rows are returned unchanged.
    """
    if not any(r.get("Source") == "energy" for r in rows):
        return left, right, False
    wl, wr = max(left, ENERGY_P90_SEC), max(right, ENERGY_P90_SEC)
    if (wl, wr) != (left, right):
        import logging
        logging.getLogger("voicecraft_tpu.align").warning(
            "energy-aligner timestamps: widening edit margins %.3f/%.3f -> "
            "%.3f/%.3f s (characterized p90 boundary error %.0f ms; pass "
            "an ASR model or MFA CSV for tighter spans)",
            left, right, wl, wr, ENERGY_P90_SEC * 1000)
        return wl, wr, True
    return left, right, False


# ==============================================================================
# Whisper cross-attention word timestamps (local snapshot only)
# ==============================================================================

class WhisperWordAligner:
    """Word timestamps via transformers Whisper ``return_token_timestamps``
    (cross-attention DTW over the model's alignment heads — what whisperx
    builds on).  Needs a local snapshot dir (e.g. openai/whisper-base)."""

    def __init__(self, model_path: str):
        from transformers import (WhisperForConditionalGeneration,
                                  WhisperProcessor)
        self.processor = WhisperProcessor.from_pretrained(model_path)
        self.model = WhisperForConditionalGeneration.from_pretrained(model_path)
        self.model.eval()

    def align(self, wav: np.ndarray, sr: int = 16000) -> List[Dict]:
        import torch
        wav = np.asarray(wav, np.float32).reshape(-1)
        inputs = self.processor(wav, sampling_rate=sr, return_tensors="pt")
        with torch.no_grad():
            out = self.model.generate(
                inputs.input_features, return_token_timestamps=True,
                return_dict_in_generate=True)
        ids = out.sequences[0]
        ts = out.token_timestamps[0]
        # merge sub-word tokens into words on leading-space boundaries
        rows: List[Dict] = []
        cur, t0, t1 = "", 0.0, 0.0
        for tok_id, t in zip(ids.tolist(), ts.tolist()):
            piece = self.processor.tokenizer.decode([tok_id])
            if not piece or piece.startswith("<|"):
                continue
            if piece.startswith(" ") and cur:
                rows.append({"Label": cur.strip(), "Begin": t0, "End": t1,
                             "Type": "words"})
                cur, t0 = "", t
            if not cur:
                t0 = t
            cur += piece
            t1 = t
        if cur.strip():
            rows.append({"Label": cur.strip(), "Begin": t0, "End": t1,
                         "Type": "words"})
        return rows


# ==============================================================================
# dispatcher
# ==============================================================================

def align_words(wav: np.ndarray, sr: int, transcript: str,
                asr_model_path: Optional[str] = None,
                weights: Optional[Sequence[float]] = None) -> List[Dict]:
    """Word alignment rows for ``transcript`` against ``wav``.

    Uses the Whisper aligner when a local snapshot is given (and falls back
    cleanly if it fails to load), else the dependency-free energy aligner —
    so editing never requires an external MFA CSV (reference
    predict.py:209-215 parity).
    """
    if asr_model_path:
        try:
            rows = WhisperWordAligner(asr_model_path).align(wav, sr)
            if rows:
                return rows
        except Exception:  # missing snapshot pieces -> energy fallback
            pass
    return energy_align(wav, sr, transcript.split(), weights=weights)
