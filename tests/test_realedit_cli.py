"""RealEdit batch-editing driver end-to-end on synthetic rows (reference
inference_speech_editing_scale.py:127-226 over RealEdit.txt)."""

import os
import subprocess
import sys
import wave as wave_mod

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("lanes,spec", [(1, 0), (2, 0), (2, 2)],
                         ids=["single", "lanes", "lanes-spec"])
def test_realedit_cli_end_to_end(tmp_path, lanes, spec):
    sr = 16000
    wav_dir = tmp_path / "wavs"
    align_dir = tmp_path / "align"
    out_dir = tmp_path / "out"
    wav_dir.mkdir(), align_dir.mkdir()

    rows = []
    for i in range(2):
        t = np.arange(2 * sr) / sr
        w = (0.2 * np.sin(2 * np.pi * (220 + 40 * i) * t)).astype(np.float32)
        with wave_mod.open(str(wav_dir / f"utt{i}.wav"), "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            wf.writeframes(np.round(w * 32767).astype("<i2").tobytes())
        (align_dir / f"utt{i}.csv").write_text(
            "Begin,End,Label,Type\n"
            "0.10,0.55,alpha,words\n0.60,1.10,bravo,words\n"
            "1.15,1.80,charlie,words\n")
        # substitute the middle word; second row also does an insertion span
        if i == 0:
            rows.append("utt0.wav\talpha bravo charlie\talpha delta charlie"
                        "\t1,1\t1,1\tsubstitution")
        else:
            rows.append("utt1.wav\talpha bravo charlie"
                        "\talpha bravo extra charlie\t1,2\t2,2\tinsertion")
    man = tmp_path / "manifest.tsv"
    man.write_text("wav_fn\torig_transcript\tnew_transcript\t"
                   "orig_masked_span\tnew_masked_span\ttype\n"
                   + "\n".join(rows) + "\n")

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "realedit_cli.py"),
         "--manifest", str(man), "--audio-dir", str(wav_dir),
         "--align-dir", str(align_dir),
         "--model", "tiny_test_mtp" if spec else "tiny_test",
         "--random-init", "--platform", "cpu", "--text-backend", "grapheme",
         "--out-dir", str(out_dir), "--top-k", "15",
         "--silence-tokens", "5", "7", "--num-seeds", "2",
         "--lanes", str(lanes), "--spec", str(spec)],
        capture_output=True, timeout=600, cwd=REPO)
    assert r.returncode == 0, r.stderr.decode()[-3000:]
    assert b"done: 2/2 edited" in r.stderr or b"done: 2/2 edited" in r.stdout, \
        r.stderr.decode()[-1500:]
    for i in range(2):
        for s in (1, 2):
            f = out_dir / f"utt{i}_new_seed{s}.wav"
            assert f.exists(), sorted(os.listdir(out_dir))
            with wave_mod.open(str(f)) as wf:
                assert wf.getnframes() > sr  # edited 2s utterance
