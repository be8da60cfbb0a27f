"""Pattern-engine invariants.

The reference has no test suite; these encode its runtime asserts and the
documented delayed-pattern example (reference models/codebooks_patterns.py:
302-316 docstring, voicecraft.py:343-366)."""

import numpy as np
import jax.numpy as jnp

from voicecraft_tpu.ops import patterns


def test_delayed_matches_docstring_example():
    # codebooks_patterns.py:307-316: T=4, K=3
    z = jnp.asarray([[1, 2, 3, 4]] * 3)[None]  # [1, 3, 4]
    out = patterns.build_delayed(z, special_token=0)[0]
    expect = np.array([
        [0, 1, 2, 3, 4, 0, 0],
        [0, 0, 1, 2, 3, 4, 0],
        [0, 0, 0, 1, 2, 3, 4],
    ])
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_build_revert_roundtrip():
    rng = np.random.default_rng(0)
    for K in (2, 4, 8):
        for T in (1, 5, 37):
            z = jnp.asarray(rng.integers(0, 100, size=(2, K, T)))
            s = patterns.build_delayed(z, special_token=999)
            assert s.shape == (2, K, T + K)
            z2 = patterns.revert_delayed(s, special_token=999)
            np.testing.assert_array_equal(np.asarray(z2), np.asarray(z))


def test_real_token_mask():
    K, T = 4, 6
    m = patterns.real_token_mask(T, K, T + K)
    # column 0 all special; row q holds tokens at columns 1+q .. q+T
    assert not m[:, 0].any()
    for q in range(K):
        assert m[q, 1 + q:1 + q + T].all()
        assert not m[q, :1 + q].any()
        assert not m[q, 1 + q + T:].any()


def test_unshift_span():
    K, T = 4, 10
    rng = np.random.default_rng(1)
    orig = rng.integers(0, 50, size=(K, T))
    # simulate a generated span: delayed layout without the leading special
    # column, plus the trailing eog cascade — exactly num_gen = T + K entries
    d = np.full((K, T + K), 128, dtype=np.int64)
    for q in range(K):
        d[q, q:q + T] = orig[q]
    out = patterns.unshift_span(d)
    np.testing.assert_array_equal(out, orig)


def test_index_helpers_match_jnp_path():
    K, T = 4, 9
    idx, valid = patterns.build_indexes(T, K)
    assert idx.shape == (K, T + K)
    z = np.arange(K * T).reshape(1, K, T)
    s = np.asarray(patterns.build_delayed(jnp.asarray(z), special_token=-1))[0]
    flat = np.concatenate([z.reshape(-1), [-1]])
    np.testing.assert_array_equal(s, flat[idx])
    assert (s[valid] >= 0).all() and (s[~valid] == -1).all()
