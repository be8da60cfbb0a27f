"""Streaming TTS: audio chunks while the decode loop is still running.

The reference synthesises a whole utterance before any audio exists
(inference_tts_scale.py:95-100 decodes once, at the end).  Here the
continuous-batching engine already pauses at burst boundaries, so a
streaming request simply rides a lane with per-burst callbacks
(engine.ContinuousBatcher.submit(on_rows=...)) and the host turns the
growing delayed-row prefix into settled audio:

  rows [t, K] (delayed space, prefix-stable)
    -> generated frames via ops.patterns.unshift_span (purely positional,
       so earlier frames never change as t grows)
    -> audio via the codec.  The EnCodec stack here is CAUSAL
       (models/encodec.py), so decoding a PREFIX of the frames yields
       bit-identical leading samples to decoding the finished utterance —
       streamed audio is exact, not an approximation
       (tests/test_streaming.py).

First-audio latency is one burst (~burst/steps_per_sec; 48 steps ~ 1 s of
audio at 830M single-lane speed) instead of the whole utterance.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Iterator, Optional

import numpy as np

from ..config import ModelConfig
from ..models import encodec as ec
from ..models.voicecraft import SamplingConfig
from ..ops import patterns
from .engine import ContinuousBatcher


class _StreamCancelled(Exception):
    """Raised inside the engine's row callback to abort an abandoned run."""


def _ceil(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def frames_from_rows(rows: np.ndarray, cfg: ModelConfig) -> np.ndarray:
    """Delayed-space rows [t, K] -> generated frames [K, max(t - K, 0)].

    Matches ContinuousBatcher._retire's conversion (unshift + special_first
    un-shift), so the streamed frames are a strict prefix of the final
    ``gen`` result.
    """
    K = cfg.n_codebooks
    if rows.shape[0] <= K:
        return np.zeros((K, 0), np.int32)
    frames = patterns.unshift_span(rows.T).astype(np.int32)
    if cfg.special_first:
        frames = frames - cfg.n_special
    return frames


class AudioStreamer:
    """Turns a growing frame prefix into exact PCM chunks.

    Each feed advances an exact incremental decoder
    (models/encodec.py StreamingDecoder: per-layer conv carries + LSTM
    state + transpose overlap-add), so per-feed cost is O(new frames) —
    the earlier implementation re-decoded the whole prefix every feed,
    O(T^2) codec work per utterance on the same chip the decode loop
    needs (VERDICT r02 #4).  The samples are bit-identical to decoding
    the finished utterance in one shot (tests/test_streaming.py).
    """

    def __init__(self, cparams, ccfg: ec.EncodecConfig,
                 chunk_frames: int = 16):
        self._dec = ec.StreamingDecoder(cparams, ccfg,
                                        chunk_frames=chunk_frames)

    def feed(self, new_frames: np.ndarray) -> np.ndarray:
        return self._dec.feed(new_frames)

    def flush(self) -> np.ndarray:
        return self._dec.flush()


def stream_tts(params, cfg: ModelConfig, x_tokens: np.ndarray,
               y_codes: np.ndarray,
               scfg: SamplingConfig = SamplingConfig(),
               *, seed: int = 1,
               cparams=None, ccfg: Optional[ec.EncodecConfig] = None,
               burst: int = 48, gen_max: Optional[int] = None,
               kv_dtype: Optional[str] = None,
               spec: int = 0, mesh=None,
               lanes: int = 1, pipeline: bool = True) -> Iterator[dict]:
    """Generator of streaming TTS chunks for one request.

    Yields dicts with ``frames`` ([K, m] newly settled generated codec
    frames) and, when a codec is supplied, ``audio`` (np.float32 samples —
    exact prefix of the final waveform).  The last chunk additionally
    carries ``full``/``gen`` with inference_tts output semantics (the
    streamed frames concatenate to exactly ``gen``) and ``t_decode``, the
    producer-side wall seconds of the whole engine run — the right number
    for throughput accounting regardless of how fast the consumer drains.

    ``mesh``: shard the engine's lanes over the mesh's 'data' axis
    (ContinuousBatcher(mesh=...)); ``lanes`` must then be a multiple of the
    data-axis size (a single stream rides lane 0, the sharded geometry is
    for serving tiers that multiplex streams).
    """
    K = cfg.n_codebooks
    x_tokens = np.asarray(x_tokens, np.int32)
    y_codes = np.asarray(y_codes, np.int32)
    cap = cfg.encodec_sr // 5
    prefix_len = y_codes.shape[1] + 1   # compose_tts_prefix: T + 1 columns
    if gen_max is None:
        gen_max = max(len(x_tokens) * cap - prefix_len + K + 8, 2 * K + 8)
    gen_max = _ceil(gen_max, 128)

    eng = ContinuousBatcher(
        params, cfg, lanes=lanes,
        x_pad=_ceil(len(x_tokens), 32),
        y_pad=_ceil(prefix_len, 64),
        gen_max=gen_max, burst=burst, scfg=scfg, seed=seed,
        kv_dtype=kv_dtype, spec=spec, mesh=mesh, pipeline=pipeline)

    q: "queue.Queue" = queue.Queue()
    sent = {"n": 0}
    cancel = threading.Event()

    def on_rows(rows):
        if cancel.is_set():
            # consumer abandoned the generator (e.g. HTTP client
            # disconnect): abort the engine run at the next burst boundary
            # instead of decoding the rest of the utterance into a queue
            # nobody reads
            raise _StreamCancelled()
        frames = frames_from_rows(rows, cfg)
        if frames.shape[1] > sent["n"]:
            new = frames[:, sent["n"]:]
            sent["n"] = frames.shape[1]
            q.put(("frames", new))

    rid = eng.submit(x_tokens, y_codes, on_rows=on_rows)

    def work():
        # decode time is measured HERE, at the producer: the queue is
        # unbounded so eng.run()'s wall time never includes consumer drain
        # pace (a realtime-paced HTTP client pre-fills the queue while the
        # handler yields, collapsing consumer-side next() timings to ~0 —
        # useless for the autospec bandit's frames/s comparison)
        t0 = time.perf_counter()
        try:
            res = eng.run()
            q.put(("done", (res[rid], time.perf_counter() - t0)))
        except _StreamCancelled:
            pass
        except Exception as e:  # surfaced to the consumer
            q.put(("error", e))

    threading.Thread(target=work, daemon=True).start()

    streamer = (AudioStreamer(cparams, ccfg)
                if cparams is not None and ccfg is not None else None)
    try:
        while True:
            kind, payload = q.get()
            if kind == "error":
                raise payload
            if kind == "frames":
                chunk = {"frames": payload}
                if streamer is not None:
                    chunk["audio"] = streamer.feed(payload)
                yield chunk
                continue
            (full, gen), t_run = payload
            rest = gen[:, sent["n"]:]
            chunk = {"frames": rest, "full": full, "gen": gen,
                     "t_decode": t_run}
            if streamer is not None:
                chunk["audio"] = np.concatenate(
                    [streamer.feed(rest), streamer.flush()])
            yield chunk
            return
    finally:
        cancel.set()
