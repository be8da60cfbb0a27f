"""Energy/VAD forced aligner: synthetic speech-shaped signals with known
word boundaries, plus integration with the editing span machinery."""

import numpy as np
import pytest

from voicecraft_tpu.align import (align_words, energy_align, voiced_segments)
from voicecraft_tpu.inference.editing import get_mask_interval, get_span

SR = 16000


def _burst(dur_s, freq, sr=SR, amp=0.3, seed=0):
    t = np.arange(int(dur_s * sr)) / sr
    rng = np.random.default_rng(seed)
    sig = amp * np.sin(2 * np.pi * freq * t)
    sig += 0.02 * rng.standard_normal(len(t))  # voiced-band noise
    # fade edges so the VAD sees smooth onsets
    ramp = min(int(0.01 * sr), len(t) // 4)
    env = np.ones(len(t))
    env[:ramp] = np.linspace(0, 1, ramp)
    env[-ramp:] = np.linspace(1, 0, ramp)
    return (sig * env).astype(np.float32)


def _silence(dur_s, sr=SR, seed=1):
    rng = np.random.default_rng(seed)
    return (0.0005 * rng.standard_normal(int(dur_s * sr))).astype(np.float32)


def _three_burst_wav():
    """[0.2 sil][0.5 burst][0.3 sil][0.7 burst][0.25 sil][0.4 burst][0.2 sil]"""
    parts = [_silence(0.2), _burst(0.5, 220, seed=2), _silence(0.3, seed=3),
             _burst(0.7, 330, seed=4), _silence(0.25, seed=5),
             _burst(0.4, 440, seed=6), _silence(0.2, seed=7)]
    bounds = []
    t = 0.0
    for i, p in enumerate(parts):
        d = len(p) / SR
        if i % 2 == 1:
            bounds.append((t, t + d))
        t += d
    return np.concatenate(parts), bounds


def test_vad_finds_bursts():
    wav, bounds = _three_burst_wav()
    segs = voiced_segments(wav, SR)
    assert len(segs) == 3, segs
    for (s, e), (ws, we) in zip(segs, bounds):
        assert abs(s - ws) < 0.06, (s, ws)
        assert abs(e - we) < 0.06, (e, we)


def test_energy_align_one_word_per_burst():
    wav, bounds = _three_burst_wav()
    rows = energy_align(wav, SR, ["alpha", "bravo", "charl"])
    assert [r["Label"] for r in rows] == ["alpha", "bravo", "charl"]
    # equal weights over 0.5/0.7/0.4s voiced time: words don't line up with
    # bursts 1:1, but the full span must cover the voiced region and be
    # monotone with positive durations
    assert rows[0]["Begin"] >= bounds[0][0] - 0.06
    assert rows[-1]["End"] <= bounds[-1][1] + 0.06
    for a, b in zip(rows, rows[1:]):
        assert a["End"] <= b["Begin"] + 1e-6
    for r in rows:
        assert r["End"] > r["Begin"]


def test_energy_align_weights_split_burst():
    """Two words in one burst: the boundary lands proportionally."""
    wav = np.concatenate([_silence(0.2), _burst(1.0, 250, seed=8),
                          _silence(0.2, seed=9)])
    rows = energy_align(wav, SR, ["looooooong", "sh"],
                        weights=[3.0, 1.0])
    b = rows[0]["End"]
    # 3:1 split of ~1.0 s of voiced time starting ~0.2s -> boundary ~0.95s
    assert 0.85 < b < 1.05, rows
    assert rows[1]["End"] > rows[1]["Begin"]


def test_alignment_rows_feed_get_mask_interval():
    """Rows from the aligner must slot straight into the editing span
    machinery (substitution of the middle word)."""
    wav, bounds = _three_burst_wav()
    rows = align_words(wav, SR, "alpha bravo charl")
    span, _ = get_span("alpha bravo charl", "alpha delta charl",
                       "substitution")
    s, e = get_mask_interval(rows, tuple(span), "substitution")
    assert rows[1]["Begin"] == s and rows[1]["End"] == e
    assert 0.0 < s < e < len(wav) / SR


@pytest.mark.slow
def test_align_words_fallback_without_asr():
    wav, _ = _three_burst_wav()
    rows = align_words(wav, SR, "a b c", asr_model_path="/nonexistent/path")
    assert len(rows) == 3 and all(r["Type"] == "words" for r in rows)


def test_widen_margins_for_energy_rows():
    """Energy-sourced rows floor the edit margins at the characterized p90
    boundary error; MFA/whisper rows pass margins through untouched."""
    from voicecraft_tpu.align import (ENERGY_P90_SEC,
                                      widen_margins_for_aligner)
    energy_rows = [{"Label": "a", "Begin": 0.1, "End": 0.3,
                    "Type": "words", "Source": "energy"}]
    mfa_rows = [{"Label": "a", "Begin": 0.1, "End": 0.3, "Type": "words"}]
    l, r, w = widen_margins_for_aligner(energy_rows, 0.08, 0.08)
    assert w and l == r == ENERGY_P90_SEC
    l, r, w = widen_margins_for_aligner(energy_rows, 0.15, 0.05)
    assert w and (l, r) == (0.15, ENERGY_P90_SEC)
    l, r, w = widen_margins_for_aligner(energy_rows, 0.2, 0.2)
    assert not w and (l, r) == (0.2, 0.2)          # already wide enough
    l, r, w = widen_margins_for_aligner(mfa_rows, 0.08, 0.08)
    assert not w and (l, r) == (0.08, 0.08)


def test_energy_margin_survives_p90_boundary_error():
    """Regression for the guard's purpose: with every boundary perturbed by
    the full characterized p90 error (in the worst direction), the widened
    edit interval must still contain the true word span — the default
    0.08 s margins alone would clip it."""
    from voicecraft_tpu.align import ENERGY_P90_SEC
    from voicecraft_tpu.align import widen_margins_for_aligner
    true_begin, true_end = 1.000, 1.400
    p90 = ENERGY_P90_SEC
    # worst case: the aligner places the word shifted INWARD by p90 on
    # both edges (late begin, early end)
    rows = [
        {"Label": "alpha", "Begin": 0.1, "End": 0.9, "Type": "words",
         "Source": "energy"},
        {"Label": "bravo", "Begin": true_begin + p90,
         "End": true_end - p90, "Type": "words", "Source": "energy"},
        {"Label": "charl", "Begin": 1.5, "End": 2.0, "Type": "words",
         "Source": "energy"},
    ]
    span, _ = get_span("alpha bravo charl", "alpha delta charl",
                       "substitution")
    s, e = get_mask_interval(rows, tuple(span), "substitution")
    # default reference margins would clip: 0.08 < p90
    assert s - 0.08 > true_begin and e + 0.08 < true_end
    left, right, widened = widen_margins_for_aligner(rows, 0.08, 0.08)
    assert widened
    assert s - left <= true_begin and e + right >= true_end
