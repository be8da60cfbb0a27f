"""Zero-shot TTS inference driver (reference models/voicecraft.py:908-1153 +
inference_tts_scale.py:42-105).

The decode loop is a single jitted ``lax.while_loop`` program per geometry
bucket; geometries are rounded up (x to 32, y prefix to 64, generation cap to
128) so repeated calls hit the compile cache.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..data import spans
from ..models.voicecraft import SamplingConfig, make_decode_loop
from ..ops import patterns


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def find_closest_word_boundary(rows, cut_off_sec: float, margin: float = 0.04,
                               cutoff_tolerance: float = 1.0):
    """Snap a prompt cutoff time to an alignment boundary.

    Behavioural port of reference tts_demo.py:144-165: rows are (Begin, End)
    tuples from the MFA CSV *in file order* (the reference scans every row,
    words and phones alike).  Prefers a boundary within ``cutoff_tolerance``
    of the requested time that has at least ``margin`` of silence before the
    next row, placing the cut 2/3 of the margin into the gap; otherwise the
    first boundary at/after the requested time.

    Returns (cutoff_sec, row_index) — row_index is None if no boundary found.
    """
    cutoff_time = None
    cutoff_index = None
    for i, (_, end) in enumerate(rows):
        end = float(end)
        if end >= cut_off_sec and cutoff_time is None:
            cutoff_time = end
            cutoff_index = i
        if (end >= cut_off_sec and end < cut_off_sec + cutoff_tolerance
                and i + 1 < len(rows)
                and float(rows[i + 1][0]) - end >= margin):
            return end + margin * 2 / 3, i
    return cutoff_time, cutoff_index


@lru_cache(maxsize=32)
def _get_loop(cfg: ModelConfig, is_tts: bool, x_pad: int, y_pad: int,
              gen_max: int, scfg: SamplingConfig, max_spans: int,
              steps_per_iter: int = 1):
    return make_decode_loop(cfg, is_tts=is_tts, x_pad=x_pad, y_pad=y_pad,
                            gen_max=gen_max, scfg=scfg, max_spans=max_spans,
                            steps_per_iter=steps_per_iter)


@lru_cache(maxsize=16)
def _get_spec_edit_loop(cfg: ModelConfig, x_pad: int, y_pad: int,
                        gen_max: int, scfg: SamplingConfig, max_spans: int,
                        n_draft: int):
    from ..models.voicecraft import make_spec_edit_loop
    return make_spec_edit_loop(cfg, x_pad=x_pad, y_pad=y_pad,
                               gen_max=gen_max, scfg=scfg, n_draft=n_draft,
                               max_spans=max_spans)


def run_decode(params, cfg: ModelConfig, *, is_tts: bool,
               x_tokens: np.ndarray, prefix: spans.ComposedSequence,
               queue_mask_ids, n_spans: int, scfg: SamplingConfig,
               seed: int = 1, gen_max: Optional[int] = None,
               return_raw: bool = False, steps_per_iter: int = 1,
               spec: int = 0):
    """Shared decode entry.  Returns a list of generated spans [K, T_j]
    (unshifted), or with ``return_raw`` the per-step delayed-space samples
    (gen_buf [n, K], span_buf [n])."""
    K = cfg.n_codebooks
    x_len = len(x_tokens)
    cap_mult = (cfg.encodec_sr // 5) if is_tts else 10
    if gen_max is None:
        # enough iterations to reach the forced-eog length cap + cascade +
        # 3 feed steps per span transition
        gen_max = max(x_len * cap_mult - prefix.length + K + 8, 2 * K + 8)
        gen_max += 3 * max(n_spans - 1, 0)
    gen_max = _round_up(gen_max, 128)

    x_pad = _round_up(x_len, 32)
    y_pad = _round_up(prefix.length, 64)

    xt = np.full((1, x_pad), cfg.text_pad_token, np.int32)
    xt[0, :x_len] = x_tokens
    yt = np.full((1, K, y_pad), cfg.empty_token, np.int32)
    yt[0, :, :prefix.length] = prefix.tokens
    mi = np.full((1, y_pad), -1, np.int32)
    mi[0, :prefix.length] = prefix.mask_emb_idx
    qm = np.zeros((cfg.max_n_spans,), np.int32)
    for j, v in enumerate(queue_mask_ids[:cfg.max_n_spans]):
        qm[j] = v

    if spec > 1:
        from ..models.voicecraft import check_mtp_heads
        assert not is_tts, "TTS speculative decode goes via inference_tts_spec"
        check_mtp_heads(params, spec, scfg)
        loop = _get_spec_edit_loop(cfg, x_pad, y_pad, gen_max, scfg,
                                   cfg.max_n_spans, spec)
    else:
        loop = _get_loop(cfg, is_tts, x_pad, y_pad, gen_max, scfg,
                         cfg.max_n_spans, steps_per_iter)
    gen_buf, span_buf, gen_cnt, n_done = loop(
        params, jnp.asarray(xt), jnp.asarray(x_len, jnp.int32),
        jnp.asarray(yt), jnp.asarray(prefix.length, jnp.int32),
        jnp.asarray(mi), jnp.asarray(qm), jnp.asarray(n_spans, jnp.int32),
        jax.random.PRNGKey(seed))

    gen_buf = np.asarray(gen_buf)[:int(gen_cnt)]          # [n, K]
    span_buf = np.asarray(span_buf)[:int(gen_cnt)]
    if return_raw:
        return gen_buf, span_buf
    out_spans = []
    for j in range(n_spans):
        rows = gen_buf[span_buf == j]                      # [n_j, K]
        if rows.shape[0] <= K:
            out_spans.append(np.zeros((K, 0), np.int32))
            continue
        out_spans.append(patterns.unshift_span(rows.T).astype(np.int32))
    return out_spans


@lru_cache(maxsize=16)
def _get_batch_loop(cfg: ModelConfig, batch_size: int, x_pad: int, y_pad: int,
                    gen_max: int, scfg: SamplingConfig):
    from ..models.voicecraft import make_batch_tts_loop
    return make_batch_tts_loop(cfg, batch_size=batch_size, x_pad=x_pad,
                               y_pad=y_pad, gen_max=gen_max, scfg=scfg)


def inference_tts_batch(params, cfg: ModelConfig, x_tokens: np.ndarray,
                        y_codes: np.ndarray,
                        scfg: SamplingConfig = SamplingConfig(),
                        batch_size: int = 4, seed: int = 1,
                        gen_max: Optional[int] = None
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Best-of-N TTS: N independent sampling paths over one prompt, return
    the first to finish (reference inference_tts_batch,
    voicecraft.py:1156-1439)."""
    import jax
    import jax.numpy as jnp
    K = cfg.n_codebooks
    if cfg.special_first:
        y_codes = y_codes + cfg.n_special
    prefix = spans.compose_tts_prefix(y_codes, cfg)
    x_len = len(x_tokens)
    cap_mult = cfg.encodec_sr // 5
    if gen_max is None:
        gen_max = max(x_len * cap_mult - prefix.length + K + 8, 2 * K + 8)
    gen_max = _round_up(gen_max, 128)
    x_pad = _round_up(x_len, 32)
    y_pad = _round_up(prefix.length, 64)

    xt = np.full((1, x_pad), cfg.text_pad_token, np.int32)
    xt[0, :x_len] = x_tokens
    yt = np.full((1, K, y_pad), cfg.empty_token, np.int32)
    yt[0, :, :prefix.length] = prefix.tokens

    loop = _get_batch_loop(cfg, batch_size, x_pad, y_pad, gen_max, scfg)
    gen_buf, gen_cnt, keep = loop(
        params, jnp.asarray(xt), jnp.asarray(x_len, jnp.int32),
        jnp.asarray(yt), jnp.asarray(prefix.length, jnp.int32),
        jax.random.PRNGKey(seed))
    rows = np.asarray(gen_buf)[:int(gen_cnt), int(keep)]   # [n, K]
    if rows.shape[0] <= K:
        gen = np.zeros((K, 0), np.int32)
    else:
        gen = patterns.unshift_span(rows.T).astype(np.int32)
    full = np.concatenate([y_codes, gen], axis=1)
    if cfg.special_first:
        full = full - cfg.n_special
        gen = gen - cfg.n_special
    return full, gen


@lru_cache(maxsize=16)
def _get_spec_loop(cfg: ModelConfig, x_pad: int, y_pad: int, gen_max: int,
                   scfg: SamplingConfig, n_draft: int):
    from ..models.voicecraft import make_spec_decode_loop
    return make_spec_decode_loop(cfg, x_pad=x_pad, y_pad=y_pad,
                                 gen_max=gen_max, scfg=scfg, n_draft=n_draft)


def inference_tts_spec(params, cfg: ModelConfig, x_tokens: np.ndarray,
                       y_codes: np.ndarray,
                       scfg: SamplingConfig = SamplingConfig(),
                       n_draft: int = 4, seed: int = 1,
                       gen_max: Optional[int] = None,
                       return_stats: bool = False):
    """Speculative zero-shot TTS via the model's MTP heads.

    Greedy (temperature<=0) output is bit-identical to :func:`inference_tts`;
    sampled output is an equally-valid draw under a per-token-index key
    schedule (see make_spec_decode_loop).  ``n_draft-1`` must not exceed the
    checkpoint's ``n_mtp``.  Returns (full, gen) like inference_tts, plus a
    stats dict (passes, tokens/pass) when ``return_stats``.
    """
    from ..models.voicecraft import check_mtp_heads
    K = cfg.n_codebooks
    check_mtp_heads(params, n_draft, scfg)
    if cfg.special_first:
        y_codes = y_codes + cfg.n_special
    prefix = spans.compose_tts_prefix(y_codes, cfg)
    x_len = len(x_tokens)
    cap_mult = cfg.encodec_sr // 5
    if gen_max is None:
        gen_max = max(x_len * cap_mult - prefix.length + K + 8, 2 * K + 8)
    gen_max = _round_up(gen_max, 128)
    x_pad = _round_up(x_len, 32)
    y_pad = _round_up(prefix.length, 64)

    xt = np.full((1, x_pad), cfg.text_pad_token, np.int32)
    xt[0, :x_len] = x_tokens
    yt = np.full((1, K, y_pad), cfg.empty_token, np.int32)
    yt[0, :, :prefix.length] = prefix.tokens

    loop = _get_spec_loop(cfg, x_pad, y_pad, gen_max, scfg, n_draft)
    gen_buf, gen_cnt, n_passes = loop(
        params, jnp.asarray(xt), jnp.asarray(x_len, jnp.int32),
        jnp.asarray(yt), jnp.asarray(prefix.length, jnp.int32),
        jax.random.PRNGKey(seed))
    rows = np.asarray(gen_buf)[:int(gen_cnt)]                # [n, K]
    if rows.shape[0] <= K:
        gen = np.zeros((K, 0), np.int32)
    else:
        gen = patterns.unshift_span(rows.T).astype(np.int32)
    full = np.concatenate([y_codes, gen], axis=1)
    if cfg.special_first:
        full = full - cfg.n_special
        gen = gen - cfg.n_special
    if return_stats:
        stats = {"passes": int(n_passes), "tokens": int(gen_cnt),
                 "tokens_per_pass": float(int(gen_cnt) / max(int(n_passes), 1))}
        return full, gen, stats
    return full, gen


def inference_tts(params, cfg: ModelConfig, x_tokens: np.ndarray,
                  y_codes: np.ndarray, scfg: SamplingConfig = SamplingConfig(),
                  seed: int = 1, gen_max: Optional[int] = None,
                  steps_per_iter: int = 1
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-shot TTS: continue the voice prompt ``y_codes`` [K, T] for the
    phoneme sequence ``x_tokens`` [Lx].

    ``steps_per_iter`` > 1 amortises the per-iteration loop overhead of the
    backend (~0.5 ms) by running that many decode steps per while-loop
    iteration; output is token-identical (see make_decode_loop).

    Returns (full_codes [K, T+Tg], generated [K, Tg]) — matching the
    reference's (res, flatten_gen) (voicecraft.py:1143-1153).
    """
    if cfg.special_first:
        y_codes = y_codes + cfg.n_special
    prefix = spans.compose_tts_prefix(y_codes, cfg)
    gen = run_decode(params, cfg, is_tts=True, x_tokens=x_tokens,
                     prefix=prefix, queue_mask_ids=[], n_spans=1,
                     scfg=scfg, seed=seed, gen_max=gen_max,
                     steps_per_iter=steps_per_iter)[0]
    full = np.concatenate([y_codes, gen], axis=1)
    if cfg.special_first:
        full = full - cfg.n_special
        gen = gen - cfg.n_special
    return full, gen
