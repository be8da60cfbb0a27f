"""Manifest batch TTS driver (tts_batch_cli.py — reference
inference_tts_scale.py:127-192): end-to-end subprocess run on a synthetic
manifest + WER utility unit tests."""

import os
import subprocess
import sys
import wave as wave_mod

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_word_error_rate():
    sys.path.insert(0, REPO)
    from tts_batch_cli import word_error_rate
    assert word_error_rate("a b c", "a b c") == 0.0
    assert word_error_rate("a b c", "a x c") == 1 / 3
    assert word_error_rate("a b c", "a c") == 1 / 3          # deletion
    assert word_error_rate("a b", "a b c") == 0.5            # insertion
    assert word_error_rate("", "x") >= 1.0


def test_manifest_parse():
    sys.path.insert(0, REPO)
    from tts_batch_cli import parse_manifest
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".tsv", delete=False) as f:
        f.write("path\tname\ttext\tend\tx\tstart\n")
        f.write("a.wav\tout.wav\thello there world\t1.5\t-\t1,foo\n")
        path = f.name
    rows = parse_manifest(path)
    os.unlink(path)
    assert rows == [{"audio": "a.wav", "out_name": "out.wav",
                     "text": "hello there world", "prompt_end": 1.5,
                     "start_ind": 1}]


def test_cli_end_to_end(tmp_path):
    # synthetic prompt wavs (2 s of tone), manifest with 3 rows -> one
    # multi-stream wave of 2 + a single-sample tail
    sr = 16000
    for i in range(3):
        t = np.arange(2 * sr) / sr
        w = (0.2 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        pcm = np.round(w * 32767).astype("<i2")
        with wave_mod.open(str(tmp_path / f"p{i}.wav"), "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            wf.writeframes(pcm.tobytes())
    man = tmp_path / "m.tsv"
    lines = ["path\tname\ttext\tend\tx\tstart"]
    for i in range(3):
        lines.append(f"p{i}.wav\tout{i}.wav\tone two three four five\t"
                     f"1.0\t-\t2,")
    man.write_text("\n".join(lines) + "\n")

    out_dir = tmp_path / "out"
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tts_batch_cli.py"),
         "--model", "tiny_test", "--random-init", "--platform", "cpu",
         "--text-backend", "grapheme", "--manifest", str(man),
         "--audio-root", str(tmp_path), "--output-dir", str(out_dir),
         "--lanes", "2", "--top-k", "15",
         "--silence-tokens", "5", "7"],
        capture_output=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr.decode()[-3000:]
    for i in range(3):
        gen = out_dir / f"gen_out{i}_{i}_seed1.wav"
        cat = out_dir / f"concat_out{i}_{i}_seed1.wav"
        assert gen.exists() and cat.exists(), sorted(os.listdir(out_dir))
        with wave_mod.open(str(cat)) as wf:
            assert wf.getnframes() >= sr  # prompt second + generation
