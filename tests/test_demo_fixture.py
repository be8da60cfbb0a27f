"""The committed editing golden-path fixture (demo/) stays valid: the wav
is readable, the alignment rows match it, and the editing span machinery
accepts the demo transcripts (recipes/edit_demo.sh runs the full path)."""

import csv
import os
import wave

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORIG = "the sound of birds over the river at dawn"


def _rows():
    with open(os.path.join(REPO, "demo", "demo_alignment.csv")) as f:
        return [r for r in csv.DictReader(f) if r["Type"] == "words"]


def test_demo_wav_and_alignment_consistent():
    with wave.open(os.path.join(REPO, "demo", "demo.wav")) as wf:
        assert wf.getframerate() == 16000 and wf.getnchannels() == 1
        dur = wf.getnframes() / wf.getframerate()
    rows = _rows()
    assert [r["Label"] for r in rows] == ORIG.split()
    ends = [float(r["End"]) for r in rows]
    begins = [float(r["Begin"]) for r in rows]
    assert all(b < e for b, e in zip(begins, ends))
    assert all(e1 <= b2 for e1, b2 in zip(ends, begins[1:]))
    assert ends[-1] < dur


def test_demo_edit_spans_resolve():
    from voicecraft_tpu.inference.editing import get_span, get_mask_interval
    rows = _rows()
    cases = [("the sound of waves over the river at dawn", "substitution"),
             ("the sound of birds flying over the river at dawn",
              "insertion"),
             ("the sound of birds over the river dawn", "deletion")]
    for target, etype in cases:
        orig_span, _ = get_span(ORIG, target, etype)
        start, end = get_mask_interval(rows, orig_span, etype)
        assert 0 <= start <= end, (etype, start, end)
