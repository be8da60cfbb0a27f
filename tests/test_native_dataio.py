"""Native C++ data loader: parity with python parsing + batch API."""

import numpy as np
import pytest

from voicecraft_tpu import native


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(" ".join(str(v) for v in r) + "\n")


def test_native_builds():
    lib = native.get_lib()
    # g++ is in the image; native must actually build here (the python
    # fallback is for exotic environments only)
    assert lib is not None


def test_load_codes_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 2048, (4, 137)).tolist()
    p = str(tmp_path / "c.txt")
    _write(p, rows)
    out = native.load_codes(p, 4)
    np.testing.assert_array_equal(out, np.asarray(rows, np.int32))
    # python fallback agrees
    np.testing.assert_array_equal(native._py_load_codes(p, 4), out)


def test_load_codes_batch(tmp_path):
    rng = np.random.default_rng(1)
    paths, refs = [], []
    for i in range(20):
        rows = rng.integers(0, 2048, (4, int(rng.integers(10, 400)))).tolist()
        p = str(tmp_path / f"b{i}.txt")
        _write(p, rows)
        paths.append(p)
        refs.append(np.asarray(rows, np.int32))
    paths.append(str(tmp_path / "missing.txt"))
    out = native.load_codes_batch(paths, 4, n_threads=4)
    for o, r in zip(out[:-1], refs):
        np.testing.assert_array_equal(o, r)
    assert out[-1] is None


def test_malformed_files(tmp_path):
    p1 = str(tmp_path / "short.txt")
    _write(p1, [[1, 2, 3]] * 2)            # only 2 rows, K=4
    assert native.load_codes(p1, 4) is None
    p2 = str(tmp_path / "garbage.txt")
    with open(p2, "w") as f:
        f.write("1 2 x 4\n" * 4)
    assert native.load_codes(p2, 4) is None
    p3 = str(tmp_path / "empty.txt")
    open(p3, "w").close()
    assert native.load_codes(p3, 4) is None
