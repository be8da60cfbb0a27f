"""Measured characterization of the energy aligner (VERDICT r02 #9).

The procedural corpus generator (recipes/make_spec_corpus.py) synthesizes
utterances whose word boundaries are known BY CONSTRUCTION, so the energy
aligner's word-boundary error can be measured against exact ground truth
(no Whisper snapshot exists in this environment; exact truth is stronger
anyway).  The assertions pin the measured distribution on clean
procedural speech: median |boundary error| < 60 ms, p90 < 160 ms —
the margin edit_cli pads spans with is 80 ms per side, so median-quality
boundaries keep edits inside the padded span.
"""

import importlib.util
import os

import numpy as np

from voicecraft_tpu.align import energy_align

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "make_spec_corpus", os.path.join(REPO, "recipes", "make_spec_corpus.py"))
msc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(msc)


def _utterance_with_truth(words, speaker, rng):
    """Synthesize like make_spec_corpus.synth_utterance but also return the
    per-word (begin, end) seconds."""
    sp = msc._speaker_params(speaker)
    sr = msc.SR
    parts = [np.zeros(int(0.05 * sr), np.float32)]
    t = 0.05
    truth = []
    for w in words:
        f0, dur, am = msc._word_params(w)
        f0 *= sp["pitch"]
        dur *= sp["tempo"] * rng.uniform(0.97, 1.03)
        n = int(dur * sr)
        tt = np.arange(n) / sr
        env = np.sin(np.pi * np.clip(tt / dur, 0, 1)) ** 0.8
        ph = rng.uniform(0, 2 * np.pi)
        sig = 0.30 * np.sin(2 * np.pi * f0 * tt + ph)
        for k, a in enumerate(sp["harm"], start=2):
            sig = sig + 0.30 * a * np.sin(2 * np.pi * k * f0 * tt + ph * k)
        sig = sig * (0.75 + 0.25 * np.sin(2 * np.pi * am * tt))
        parts.append((sig * env).astype(np.float32))
        truth.append((t, t + n / sr))
        t += n / sr
        gap = int(0.07 * sp["tempo"] * sr)
        parts.append(np.zeros(gap, np.float32))
        t += gap / sr
    wav = np.concatenate(parts)
    wav = wav + 0.01 * rng.standard_normal(wav.shape).astype(np.float32)
    return np.clip(wav, -1, 1), truth


def test_energy_aligner_boundary_error_distribution():
    rng = np.random.default_rng(123)
    errors = []
    for i in range(20):
        n = int(rng.integers(5, 11))
        words = list(rng.choice(msc.VOCAB, size=n))
        speaker = int(rng.integers(0, msc.N_SPEAKERS))
        wav, truth = _utterance_with_truth(words, speaker, rng)
        rows = energy_align(wav, msc.SR, words)
        assert len(rows) == len(truth)
        for r, (b, e) in zip(rows, truth):
            errors.append(abs(r["Begin"] - b))
            errors.append(abs(r["End"] - e))
    errors = np.asarray(errors)
    med = float(np.median(errors))
    p90 = float(np.percentile(errors, 90))
    p99 = float(np.percentile(errors, 99))
    print(f"energy aligner boundary error: median {med*1e3:.0f} ms, "
          f"p90 {p90*1e3:.0f} ms, p99 {p99*1e3:.0f} ms over {errors.size} "
          f"boundaries")
    assert med < 0.060, f"median boundary error {med:.3f}s"
    assert p90 < 0.160, f"p90 boundary error {p90:.3f}s"
