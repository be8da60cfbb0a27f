"""Streaming TTS (inference/streaming.py).

The contract is exactness, not approximation: streamed frames concatenate
to precisely the final ``gen`` (unshift_span is positional, so the prefix
never changes), and streamed audio is bit-identical to decoding the
finished utterance in one shot (the EnCodec stack is causal, so prefix
decode == full decode on the emitted samples).
"""

import dataclasses

import numpy as np
import jax
import pytest

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models import encodec as ec
from voicecraft_tpu.models.voicecraft import SamplingConfig, init_params
from voicecraft_tpu.inference.engine import ContinuousBatcher
from voicecraft_tpu.inference.streaming import stream_tts


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(42))
    ccfg = ec.EncodecConfig(n_filters=8, dimension=16, n_q=cfg.n_codebooks,
                            codebook_size=cfg.audio_vocab_size)
    cparams = ec.init_encodec(ccfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = rng.integers(0, cfg.text_vocab_size, 12).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size,
                     (cfg.n_codebooks, 30)).astype(np.int32)
    return cfg, params, ccfg, cparams, x, y


def test_streamed_frames_and_audio_are_exact(setup):
    cfg, params, ccfg, cparams, x, y = setup
    scfg = SamplingConfig(top_k=10, top_p=0.9, silence_tokens=(5, 7))
    chunks = list(stream_tts(params, cfg, x, y, scfg, seed=3, burst=16,
                             cparams=cparams, ccfg=ccfg))
    assert len(chunks) >= 3, "expected multiple chunks, got one blob"
    gen = chunks[-1]["gen"]
    streamed = np.concatenate([c["frames"] for c in chunks], axis=1)
    np.testing.assert_array_equal(streamed, gen)
    # producer-side decode seconds ride the final chunk (autospec's input)
    assert chunks[-1]["t_decode"] > 0

    audio = np.concatenate([c["audio"] for c in chunks])
    full = ec.decode_bucketed(cparams, gen[None].astype(np.int32), ccfg)[0]
    assert audio.shape == full.shape
    np.testing.assert_array_equal(audio, full)


def test_streaming_pipeline_ab_identical(setup):
    """pipeline=False (synchronous per-burst readbacks, the pre-r04 loop)
    must produce the identical chunk stream as the pipelined default —
    the A/B toggle bench.py --stream-no-pipeline measures is
    output-invisible."""
    cfg, params, ccfg, cparams, x, y = setup
    scfg = SamplingConfig(top_k=10, top_p=0.9, silence_tokens=(5, 7))
    piped = list(stream_tts(params, cfg, x, y, scfg, seed=3, burst=16))
    sync = list(stream_tts(params, cfg, x, y, scfg, seed=3, burst=16,
                           pipeline=False))
    np.testing.assert_array_equal(piped[-1]["gen"], sync[-1]["gen"])
    s1 = np.concatenate([c["frames"] for c in piped], axis=1)
    s2 = np.concatenate([c["frames"] for c in sync], axis=1)
    np.testing.assert_array_equal(s1, s2)


def test_streaming_matches_non_streamed_engine(setup):
    """Same seed, same geometry: the streamed request must produce the
    identical tokens as a plain engine run (per-burst syncing cannot
    perturb the decode)."""
    cfg, params, ccfg, cparams, x, y = setup
    scfg = SamplingConfig(top_k=10, top_p=0.9, silence_tokens=(5, 7))
    chunks = list(stream_tts(params, cfg, x, y, scfg, seed=3, burst=16))
    gen_s = chunks[-1]["gen"]

    eng = ContinuousBatcher(params, cfg, lanes=1, x_pad=32, y_pad=64,
                            gen_max=128, burst=16, scfg=scfg, seed=3)
    rid = eng.submit(x, y)
    full, gen_p = eng.run()[rid]
    np.testing.assert_array_equal(gen_s, gen_p)
    np.testing.assert_array_equal(chunks[-1]["full"], full)


def test_streaming_alongside_batch_lanes(setup):
    """A streaming request sharing the engine with plain requests: both
    finish, streamed frames stay a prefix of the streamer's own result."""
    cfg, params, ccfg, cparams, x, y = setup
    scfg = SamplingConfig(top_k=10, top_p=0.9, silence_tokens=(5, 7))
    eng = ContinuousBatcher(params, cfg, lanes=2, x_pad=32, y_pad=64,
                            gen_max=128, burst=16, scfg=scfg, seed=3)
    got = []
    rid_s = eng.submit(x, y, on_rows=got.append)
    rid_p = eng.submit(x[::-1].copy(), y[:, ::-1].copy())
    res = eng.run()
    assert rid_s in res and rid_p in res
    assert got, "no streaming callbacks fired"
    from voicecraft_tpu.inference.streaming import frames_from_rows
    last = frames_from_rows(got[-1], cfg)
    gen_s = res[rid_s][1]
    np.testing.assert_array_equal(last, gen_s[:, :last.shape[1]])


def test_streaming_with_speculative_engine(setup):
    """Streaming over the spec engine: greedy chunks must concatenate to
    the same tokens as plain streaming (verification is invisible)."""
    cfg0, params0, ccfg, cparams, x, y = setup
    cfg = dataclasses.replace(cfg0, n_mtp=2)
    params = init_params(cfg, jax.random.PRNGKey(42))
    g = SamplingConfig(temperature=0.0, silence_tokens=())
    plain = list(stream_tts(params, cfg, x, y, g, seed=3, burst=16))
    spec = list(stream_tts(params, cfg, x, y, g, seed=3, burst=16, spec=3))
    np.testing.assert_array_equal(spec[-1]["gen"], plain[-1]["gen"])
    streamed = np.concatenate([c["frames"] for c in spec], axis=1)
    np.testing.assert_array_equal(streamed, spec[-1]["gen"])


def test_streaming_decoder_exact_random_feeds(setup):
    """StreamingDecoder: arbitrary feed sizes (incl. sub-chunk dribbles and
    a tiny first feed) must reproduce the one-shot decode bit-exactly."""
    _, _, ccfg, cparams, _, _ = setup
    rng = np.random.default_rng(7)
    T = 137
    codes = rng.integers(0, ccfg.codebook_size,
                         (ccfg.n_q, T)).astype(np.int32)
    full = ec.decode_bucketed(cparams, codes[None], ccfg)[0]

    for sizes in ([3, 2, 4, 30, 1, 17, 16, 64],   # tiny first feeds
                  [16] * 8,                        # exact chunk multiples
                  [137],                           # one shot through feed
                  [5, 132]):
        dec = ec.StreamingDecoder(cparams, ccfg, chunk_frames=16)
        out, pos = [], 0
        for m in sizes + [T]:          # trailing T: feed any remainder
            m = min(m, T - pos)
            if m <= 0:
                break
            out.append(dec.feed(codes[:, pos:pos + m]))
            pos += m
        out.append(dec.flush())
        audio = np.concatenate(out)
        assert audio.shape == full.shape, sizes
        np.testing.assert_array_equal(audio, full, err_msg=str(sizes))


def test_streaming_decoder_flush_short_utterance(setup):
    """Utterances shorter than STREAM_MIN_FIRST frames only emit on flush."""
    _, _, ccfg, cparams, _, _ = setup
    rng = np.random.default_rng(8)
    codes = rng.integers(0, ccfg.codebook_size,
                         (ccfg.n_q, 4)).astype(np.int32)
    # NOTE ground truth is the exact-length decode(): decode_bucketed's
    # zero-pad leaks into the sequence-start reflect window below
    # STREAM_MIN_FIRST frames, so it is itself inexact there
    import jax.numpy as jnp
    full = np.asarray(ec.decode(cparams, jnp.asarray(codes[None]), ccfg))[0]
    dec = ec.StreamingDecoder(cparams, ccfg)
    assert dec.feed(codes).shape == (0,)
    audio = dec.flush()
    np.testing.assert_array_equal(audio, full)


def test_streaming_decoder_flush_is_terminal(setup):
    """flush() is idempotent and makes the stream terminal: a second
    flush() emits nothing (no re-emission of the held-back prefix) and a
    later feed() raises instead of silently producing samples inconsistent
    with the already-flushed ones (the degenerate flush decodes with a
    sequence-start reflect window that later frames would change)."""
    import pytest as _pytest
    _, _, ccfg, cparams, _, _ = setup
    rng = np.random.default_rng(9)
    codes = rng.integers(0, ccfg.codebook_size,
                         (ccfg.n_q, 4)).astype(np.int32)
    dec = ec.StreamingDecoder(cparams, ccfg)
    dec.feed(codes)
    first = dec.flush()
    assert first.shape[0] == 4 * ccfg.hop_length
    assert dec.flush().shape == (0,)          # idempotent
    with _pytest.raises(RuntimeError):
        dec.feed(codes)
    # the normal (nothing held back) path is terminal too
    dec2 = ec.StreamingDecoder(cparams, ccfg, chunk_frames=16)
    dec2.feed(rng.integers(0, ccfg.codebook_size,
                           (ccfg.n_q, 32)).astype(np.int32))
    dec2.flush()
    with _pytest.raises(RuntimeError):
        dec2.feed(codes)
