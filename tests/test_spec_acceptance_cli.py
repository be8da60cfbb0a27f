"""spec_acceptance_cli end-to-end on a self-built tiny corpus + checkpoint:
the TTS mode reports single/serving/engine acceptance with plain baselines
(including the plain continuous-batching engine anchor), and the --edit mode
reports editing acceptance.  This is the CLI the measured-acceptance PERF
tables come from, so its plumbing gets an in-suite smoke."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("specacc")
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
    return tmp_path, run


@pytest.mark.slow
def test_spec_acceptance_cli_tts(tiny_ckpt):
    tmp_path, run = tiny_ckpt
    r = run([os.path.join(REPO, "spec_acceptance_cli.py"),
             "--model", str(tmp_path / "exp/ckpt_latest"),
             "--eval-dir", str(tmp_path / "corpus/eval"),
             "--codec-bins", "128", "--taus", "2", "4", "--n", "2",
             "--lanes", "2", "--engine-requests", "2",
             "--platform", "cpu"])
    out = json.loads(r.stdout.decode())
    assert out["n_mtp"] == 3
    # single-stream rows: plain baseline + per-tau tok/pass within [1, tau]
    assert out["single"]["plain_tokens_per_sec"] > 0
    for tau in ("2", "4"):
        row = out["single"][tau]
        assert 1.0 <= row["tokens_per_pass"] <= float(tau) + 1e-6
        assert row["tokens_per_sec"] > 0 and row["speedup_vs_plain"] > 0
    # serving rows carry the shared plain-lockstep baseline
    assert out["serving"]["plain_frames_per_sec"] > 0
    assert out["serving"]["4"]["tokens_per_pass_per_lane"] > 0
    # engine rows carry a like-for-like (same-burst) plain anchor
    for tau in ("2", "4"):
        row = out["engine"][tau]
        burst = row["burst"]
        assert burst == 4 * int(tau)
        assert out["engine"][f"plain_frames_per_sec_burst{burst}"] > 0
        assert row["frames_per_pass"] > 0 and row["frames_per_sec"] > 0
        assert row["speedup_vs_plain"] > 0


@pytest.mark.slow
def test_spec_acceptance_cli_edit(tiny_ckpt):
    tmp_path, run = tiny_ckpt
    r = run([os.path.join(REPO, "spec_acceptance_cli.py"),
             "--model", str(tmp_path / "exp/ckpt_latest"),
             "--eval-dir", str(tmp_path / "corpus/eval"),
             "--codec-bins", "128", "--taus", "4", "--n", "2",
             "--lanes", "2", "--edit", "--platform", "cpu"])
    out = json.loads(r.stdout.decode())
    edit = out["edit"]
    assert edit["n_items"] >= 2
    for name, lanes in (("edit_single", 1), ("edit_serving", 2)):
        tier = edit[name]
        assert tier["lanes"] == lanes
        assert tier["plain_frames_per_sec"] > 0
        row = tier["4"]
        assert 0.0 < row["tokens_per_pass_per_lane"] <= 4.0 + 1e-6
        assert row["frames_per_sec"] > 0 and row["speedup_vs_plain"] > 0
