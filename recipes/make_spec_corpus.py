"""Procedural speech-like corpus for the in-env speculative-acceptance
measurement (VERDICT r02 #1).

Real speech checkpoints/data are unobtainable in this environment, but
acceptance on NON-memorised data only needs (a) a learnable text->audio
mapping with (b) held-out utterances.  Each word in a fixed vocabulary
deterministically maps to a tone pattern (fundamental + harmonics + AM
envelope from the word identity); each "speaker" applies a timbre/pitch/
tempo transform the model must infer from the prompt (the zero-shot-TTS
analogue); small per-utterance jitter and noise keep the mapping from
being bit-deterministic.  Train on random word sequences, hold out unseen
sequences for eval.

Usage:
  python recipes/make_spec_corpus.py OUT_DIR [--train N] [--eval N]
Writes OUT_DIR/train/*.{wav,txt} and OUT_DIR/eval/*.{wav,txt}.
"""

import argparse
import os
import wave

import numpy as np

SR = 16000

VOCAB = [
    "ash", "bird", "cloud", "dawn", "ember", "fern", "glade", "hill",
    "iris", "juniper", "kelp", "lake", "moss", "north", "ocean", "pine",
    "quartz", "river", "stone", "thorn", "umber", "vale", "willow", "wren",
    "aspen", "brook", "cedar", "drift", "echo", "frost", "grove", "heather",
    "inlet", "jade", "knoll", "larch", "meadow", "nettle", "orchid", "peak",
]

N_SPEAKERS = 8


def _stable_hash(word: str) -> int:
    # NOT python hash(): that is salted per process (PYTHONHASHSEED), and
    # the word->audio mapping must be reproducible across runs
    h = 2166136261
    for ch in word.encode():
        h = ((h ^ ch) * 16777619) % (2 ** 32)
    return h


def _word_params(word: str):
    h = _stable_hash(word) % (2 ** 31)
    f0 = 130.0 + 14.0 * (h % 23)
    dur = 0.16 + 0.035 * min(len(word), 8)
    am = 2.0 + (h // 23) % 5
    return f0, dur, am


def _speaker_params(s: int):
    rng = np.random.default_rng(1000 + s)
    return {
        "pitch": 0.8 + 0.07 * s,
        "tempo": 0.85 + 0.045 * s,
        "harm": rng.uniform(0.05, 0.5, size=3),
    }


def synth_utterance(words, speaker: int, rng: np.random.Generator):
    sp = _speaker_params(speaker)
    parts = [np.zeros(int(0.05 * SR), np.float32)]
    for w in words:
        f0, dur, am = _word_params(w)
        f0 *= sp["pitch"]
        dur *= sp["tempo"] * rng.uniform(0.97, 1.03)
        n = int(dur * SR)
        t = np.arange(n) / SR
        env = np.sin(np.pi * np.clip(t / dur, 0, 1)) ** 0.8
        ph = rng.uniform(0, 2 * np.pi)
        sig = 0.30 * np.sin(2 * np.pi * f0 * t + ph)
        for k, a in enumerate(sp["harm"], start=2):
            sig = sig + 0.30 * a * np.sin(2 * np.pi * k * f0 * t + ph * k)
        sig = sig * (0.75 + 0.25 * np.sin(2 * np.pi * am * t))
        parts.append((sig * env).astype(np.float32))
        parts.append(np.zeros(int(0.07 * sp["tempo"] * SR), np.float32))
    wavd = np.concatenate(parts)
    wavd = wavd + 0.01 * rng.standard_normal(wavd.shape).astype(np.float32)
    return np.clip(wavd, -1, 1)


def write_wav(path: str, wavd: np.ndarray):
    with wave.open(path, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(SR)
        wf.writeframes(np.round(wavd * 32767).astype("<i2").tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--train", type=int, default=1800)
    ap.add_argument("--eval", type=int, default=64)
    ap.add_argument("--min-words", type=int, default=6)
    ap.add_argument("--max-words", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    seen = set()

    def sample_sentence():
        while True:
            n = int(rng.integers(args.min_words, args.max_words + 1))
            words = tuple(rng.choice(VOCAB, size=n))
            if words not in seen:
                seen.add(words)
                return list(words)

    total = 0.0
    for split, count in (("train", args.train), ("eval", args.eval)):
        d = os.path.join(args.out_dir, split)
        os.makedirs(d, exist_ok=True)
        for i in range(count):
            words = sample_sentence()
            speaker = int(rng.integers(0, N_SPEAKERS))
            wavd = synth_utterance(words, speaker, rng)
            write_wav(os.path.join(d, f"{split}{i:05d}.wav"), wavd)
            with open(os.path.join(d, f"{split}{i:05d}.txt"), "w") as f:
                f.write(" ".join(words))
            total += wavd.shape[0] / SR
        print(f"{split}: {count} utterances")
    print(f"total audio: {total / 3600:.2f} h -> ~{total * 50 / 1e3:.0f}k "
          f"codec frames")


if __name__ == "__main__":
    main()
