"""Checkpoint interop: export to reference .pth / HF snapshot and reload —
params must round-trip exactly through both formats."""

import subprocess
import sys
import os

import numpy as np
import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_export(out, fmt):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "export_cli.py"),
         "--ckpt", "tiny_test", "--random-init", "--out", out,
         "--format", fmt, "--platform", "cpu"],
        check=True, capture_output=True, cwd=REPO)


@pytest.mark.parametrize("fmt", ["pth", "hf"])
def test_export_reload_exact(tmp_path, fmt):
    from voicecraft_tpu.inference.loader import load_model
    out = str(tmp_path / ("m.pth" if fmt == "pth" else "hf_snap"))
    _run_export(out, fmt)
    cfg1, p1, _ = load_model("tiny_test", random_init=True, seed=0)
    cfg2, p2, _ = load_model(out)
    assert cfg1.d_model == cfg2.d_model
    assert cfg1.card == cfg2.card
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_typod_local_paths_never_hit_the_hub():
    """Nonexistent paths that are not org/name shaped must raise
    FileNotFoundError (or the orbax-meta equivalent), not be treated as
    HF-hub repo ids — a typo'd --model must not trigger network retries
    in a zero-egress env (inference/loader.py repo_id_shaped guard)."""
    from voicecraft_tpu.inference.loader import load_model
    for bad in ["/tmp/definitely/not/a/ckpt_late", "./missing/ckpt",
                "exp/sub/ckpt_latest", "noslashname_missing"]:
        with pytest.raises((FileNotFoundError, AssertionError, KeyError)):
            load_model(bad)


def test_relative_ckpt_path_with_existing_dir_is_local(tmp_path,
                                                       monkeypatch):
    """A missing relative path with exactly ONE slash whose first segment
    exists as a directory (e.g. a typo'd 'exp/ckpt_latest' — the exact
    layout train_cli produces) is a LOCAL path: it must raise
    FileNotFoundError, not be classified as an org/name hub id."""
    from voicecraft_tpu.inference.loader import load_model
    (tmp_path / "exp").mkdir()
    monkeypatch.chdir(tmp_path)
    with pytest.raises((FileNotFoundError, AssertionError, KeyError)):
        load_model("exp/ckpt_latest")
