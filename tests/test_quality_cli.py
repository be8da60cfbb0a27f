"""quality_cli end-to-end on a self-built tiny corpus + checkpoint:
every mode runs, spec/stream report bit-exactness, and the resynth
reference ('auto' -> resynth with a random-init codec) yields near-zero
spectral distance for a memorised model."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_quality_cli_end_to_end(tmp_path):
    # strip the conftest's 8-virtual-device flag: the CLIs would build an
    # 8-way data mesh for a tiny corpus whose batches aren't divisible
    env = {**os.environ, "PYTHONPATH": REPO, "XLA_FLAGS": ""}

    def run(cmd, **kw):
        r = subprocess.run([sys.executable] + cmd, capture_output=True,
                           timeout=900, cwd=REPO, env=env, **kw)
        assert r.returncode == 0, r.stderr.decode()[-3000:]
        return r

    run([os.path.join(REPO, "recipes/make_spec_corpus.py"),
         str(tmp_path / "corpus"), "--train", "6", "--eval", "2"])
    run([os.path.join(REPO, "preprocess_cli.py"),
         "--audio-dir", str(tmp_path / "corpus/train"),
         "--out-dir", str(tmp_path / "data"), "--random-init",
         "--codec-bins", "128", "--text-backend", "grapheme",
         "--platform", "cpu"])
    run([os.path.join(REPO, "train_cli.py"), "--preset", "tiny_test",
         "--exp-dir", str(tmp_path / "exp"),
         "--dataset-dir", str(tmp_path / "data"), "--num-steps", "25",
         "--max-num-tokens", "2000", "--num-buckets", "2", "--n-mtp", "3",
         "--val-every-n-steps", "1000", "--platform", "cpu"])
    r = run([os.path.join(REPO, "quality_cli.py"),
             "--model", str(tmp_path / "exp/ckpt_latest"),
             "--eval-dir", str(tmp_path / "corpus/eval"),
             "--codec-bins", "128", "--n", "1", "--platform", "cpu",
             "--modes", "resynth", "plain", "spec", "stream",
             "stochastic", "edit", "edit_spec"])
    out = json.loads(r.stdout.decode())
    assert out["ref"] == "resynth" and out["n"] == 1
    modes = out["modes"]
    assert set(modes) == {"resynth", "plain", "spec", "stream",
                          "stochastic", "edit", "edit_spec"}
    assert modes["spec"]["bit_exact_vs_plain"] is True
    assert modes["stream"]["bit_exact_vs_plain"] is True
    assert modes["edit_spec"]["bit_exact_vs_edit"] is True
    assert modes["edit"]["span_duration_ratio_mean"] > 0
    # resynth scores vs RAW ground truth through a random codec: large;
    # generated-vs-resynth for a (near-)memorised model: small
    assert modes["resynth"]["mcd_mean"] > modes["plain"]["mcd_mean"]
    for m in ("plain", "spec", "stream", "stochastic"):
        assert modes[m]["duration_ratio_mean"] > 0
