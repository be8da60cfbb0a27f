"""ASR-free quality metrics (utils/quality.py): the DTW must match a
brute-force DP reference exactly, and the metrics must behave (zero for
identical audio, monotone under corruption, robust to small time shifts)."""

import numpy as np
import pytest

from voicecraft_tpu.utils.quality import (dtw_path_cost, duration_ratio,
                                          log_mel, log_mel_distance, mcd,
                                          mel_filterbank)


def _dtw_bruteforce(dist):
    t1, t2 = dist.shape
    INF = float("inf")
    acc = np.full((t1 + 1, t2 + 1), INF)
    stp = np.zeros((t1 + 1, t2 + 1), np.int64)
    acc[0, 0] = 0.0
    for i in range(1, t1 + 1):
        for j in range(1, t2 + 1):
            # same tie-break preference as the wavefront (diag, up, left)
            cands = [(acc[i - 1, j - 1], stp[i - 1, j - 1]),
                     (acc[i - 1, j], stp[i - 1, j]),
                     (acc[i, j - 1], stp[i, j - 1])]
            a, s = min(cands, key=lambda t: t[0])
            acc[i, j] = a + dist[i - 1, j - 1]
            stp[i, j] = s + 1
    n = int(stp[t1, t2])
    return acc[t1, t2] / max(n, 1), n


@pytest.mark.parametrize("shape", [(1, 1), (1, 7), (6, 1), (5, 5),
                                   (9, 4), (13, 17)])
def test_dtw_matches_bruteforce(shape):
    rng = np.random.default_rng(sum(shape))
    dist = rng.random(shape)
    got_c, got_n = dtw_path_cost(dist)
    exp_c, exp_n = _dtw_bruteforce(dist)
    # path-length ties can differ between equal-cost paths; the total
    # cost (mean*len) is the invariant
    np.testing.assert_allclose(got_c * got_n, exp_c * exp_n, rtol=1e-12)


def test_dtw_identity_is_diagonal():
    d = 1.0 - np.eye(8)
    cost, n = dtw_path_cost(d)
    assert cost == 0.0 and n == 8


def test_metrics_zero_for_identical_audio():
    sr = 16000
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(sr).astype(np.float32) * 0.1
    # float32 rounding in the ||a-b||^2 expansion leaves ~1e-3 residue
    assert log_mel_distance(wav, wav, sr) < 0.01
    assert mcd(wav, wav, sr) < 0.05
    assert duration_ratio(wav, wav) == 1.0


def test_metrics_monotone_under_noise():
    sr = 16000
    rng = np.random.default_rng(1)
    t = np.arange(sr, dtype=np.float32) / sr
    wav = np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * t))
    small = wav + 0.01 * rng.standard_normal(sr).astype(np.float32)
    big = wav + 0.3 * rng.standard_normal(sr).astype(np.float32)
    assert (log_mel_distance(wav, small, sr)
            < log_mel_distance(wav, big, sr))
    assert mcd(wav, small, sr) < mcd(wav, big, sr)


def test_dtw_absorbs_small_time_shift():
    """A 50 ms circular shift of the same audio must score far better than
    different audio — the point of DTW alignment."""
    sr = 16000
    t = np.arange(2 * sr, dtype=np.float32) / sr
    wav = (np.sin(2 * np.pi * 330 * t)
           * (0.5 + 0.5 * np.sin(2 * np.pi * 1.5 * t))).astype(np.float32)
    shifted = np.roll(wav, int(0.05 * sr))
    other = np.sin(2 * np.pi * 97 * t).astype(np.float32)
    assert mcd(wav, shifted, sr) < 0.3 * mcd(wav, other, sr)


def test_mel_filterbank_covers_spectrum():
    fb = mel_filterbank(16000, 1024, n_mels=80)
    assert fb.shape == (80, 513)
    # every filter has mass, and mid-spectrum bins are covered
    assert (fb.sum(axis=1) > 0).all()
    assert (fb.sum(axis=0)[5:-5] > 0).all()


def test_log_mel_shape():
    sr = 16000
    lm = log_mel(np.zeros(sr, np.float32), sr)
    assert lm.shape[1] == 80 and lm.shape[0] > 50
