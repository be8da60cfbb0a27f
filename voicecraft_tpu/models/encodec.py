"""EnCodec neural audio codec in JAX (SEANet conv encoder/decoder + 2-layer
LSTM + residual vector quantization).

The reference treats the codec as a black box loaded from audiocraft
(data/tokenizer.py:101-133, ``CompressionSolver.model_from_checkpoint``;
README.md:198: 56M params, 4 codebooks x 2048 codes, 16 kHz, 320x downsample
-> 50 Hz).  This is a from-scratch JAX implementation of that architecture —
the audiocraft SEANet/EnCodec structure (conv kernel 7, ratios 8/5/4/2,
n_filters 64, one residual unit per stage, 2-layer LSTM with skip, weight-norm
convs folded at load) — with a weight converter from audiocraft checkpoints
(utils/convert_encodec.py).  End-to-end parity is proven in
tests/test_encodec_e2e.py: on real audio, codes are bit-identical and decoded
waveforms match (>70 dB SNR) vs a torch oracle reproducing audiocraft's
forward semantics and state-dict layout (tests/oracle_encodec.py), for both
the giga architecture and non-causal/shortcut variants.

Layout convention: activations are [B, T, C] (NWC — the TPU-friendly layout;
XLA maps channel-last convs onto the MXU as matmuls over C).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class EncodecConfig:
    channels: int = 1
    dimension: int = 128
    n_filters: int = 64
    ratios: Tuple[int, ...] = (8, 5, 4, 2)   # decoder order; encoder reverses
    n_residual_layers: int = 1
    lstm: int = 2
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    compress: int = 2
    causal: bool = True
    pad_mode: str = "reflect"     # non-causal symmetric padding mode
    true_skip: bool = True
    n_q: int = 4
    codebook_size: int = 2048
    sample_rate: int = 16000

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @property
    def frame_rate(self) -> float:
        return self.sample_rate / self.hop_length


# ==============================================================================
# conv primitives (streamable padding semantics, matching audiocraft)
# ==============================================================================

def _extra_padding(length: int, kernel_eff: int, stride: int,
                   padding_total: int) -> int:
    """Right padding so the last window is full (audiocraft
    modules/conv.py:get_extra_padding_for_conv1d)."""
    n_frames = (length - kernel_eff + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (kernel_eff - padding_total)
    return max(ideal - length, 0)


def _pad1d(x: jnp.ndarray, left: int, right: int, mode: str) -> jnp.ndarray:
    """Pad the time axis of [B, T, C].  Reflect-pads are length-guarded the
    way audiocraft's pad1d is (zero-extend first if T <= max_pad)."""
    if mode == "reflect":
        T = x.shape[1]
        max_pad = max(left, right)
        if T <= max_pad:
            x = jnp.pad(x, ((0, 0), (0, max_pad - T + 1), (0, 0)))
        out = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
        if T <= max_pad:
            # audiocraft trims the zero extension after reflecting
            end = left + T + right
            out = out[:, :end]
        return out
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)))


def conv1d(params, x: jnp.ndarray, stride: int = 1, dilation: int = 1,
           causal: bool = True, pad_mode: str = "reflect") -> jnp.ndarray:
    """Streamable Conv1d.  params: {'w': [K, Cin, Cout], 'b': [Cout]}.
    x: [B, T, Cin] -> [B, T', Cout]."""
    K = params["w"].shape[0]
    kernel_eff = (K - 1) * dilation + 1
    padding_total = kernel_eff - stride
    extra = _extra_padding(x.shape[1], kernel_eff, stride, padding_total)
    if causal:
        x = _pad1d(x, padding_total, extra, pad_mode)
    else:
        right = padding_total // 2
        left = padding_total - right
        x = _pad1d(x, left, right + extra, pad_mode)
    y = jax.lax.conv_general_dilated(
        x, params["w"].astype(x.dtype),
        window_strides=(stride,), padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return y + params["b"].astype(x.dtype)


def conv_transpose1d(params, x: jnp.ndarray, stride: int,
                     causal: bool = True,
                     trim_right_ratio: float = 1.0) -> jnp.ndarray:
    """Streamable ConvTranspose1d.  params: {'w': [K, Cout, Cin], 'b'}.
    x: [B, T, Cin] -> [B, T*stride, Cout]."""
    K = params["w"].shape[0]
    # kernel [K, Cout, Cin] with spec WIO + transpose_kernel=True reproduces
    # torch.nn.ConvTranspose1d semantics exactly (verified in tests)
    y = jax.lax.conv_transpose(
        x, params["w"].astype(x.dtype),
        strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        transpose_kernel=True,
        preferred_element_type=jnp.float32).astype(x.dtype)
    y = y + params["b"].astype(x.dtype)
    padding_total = K - stride
    if causal:
        right = math.ceil(padding_total * trim_right_ratio)
        left = padding_total - right
    else:
        right = padding_total // 2
        left = padding_total - right
    end = y.shape[1] - right
    return y[:, left:end]


def lstm_stack(params, x: jnp.ndarray, skip: bool = True) -> jnp.ndarray:
    """Multi-layer unidirectional LSTM over [B, T, C] with torch gate order
    (i, f, g, o), plus the SEANet skip connection (audiocraft SLSTM)."""
    y = x
    for layer in params["layers"]:
        w_ih = layer["w_ih"].astype(jnp.float32)   # [4H, Cin]
        w_hh = layer["w_hh"].astype(jnp.float32)   # [4H, H]
        b = (layer["b_ih"] + layer["b_hh"]).astype(jnp.float32)
        H = w_hh.shape[1]
        B = y.shape[0]
        # hoist the input projection out of the scan — one big MXU matmul
        xin = jnp.einsum("btc,gc->btg", y.astype(jnp.float32), w_ih) + b

        def step(carry, xt):
            h, c = carry
            gates = xt + h @ w_hh.T
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32))
        _, hs = jax.lax.scan(step, init, xin.transpose(1, 0, 2))
        y = hs.transpose(1, 0, 2).astype(x.dtype)
    return y + x if skip else y


# ==============================================================================
# SEANet encoder / decoder
# ==============================================================================

def _elu(x):
    return jax.nn.elu(x)


def resnet_block(params, x, cfg: EncodecConfig, dilation: int):
    """[ELU, conv k3 dil d (C -> C/compress), ELU, conv k1 (-> C)] + skip
    (audiocraft SEANetResnetBlock, true_skip identity)."""
    h = _elu(x)
    h = conv1d(params["conv1"], h, dilation=dilation, causal=cfg.causal,
               pad_mode=cfg.pad_mode)
    h = _elu(h)
    h = conv1d(params["conv2"], h, causal=cfg.causal, pad_mode=cfg.pad_mode)
    if cfg.true_skip:
        return x + h
    return conv1d(params["shortcut"], x, causal=cfg.causal,
                  pad_mode=cfg.pad_mode) + h


def encode_frames(params, wav: jnp.ndarray, cfg: EncodecConfig) -> jnp.ndarray:
    """wav [B, T, channels] -> latent frames [B, T', dimension]."""
    x = conv1d(params["init"], wav, causal=cfg.causal, pad_mode=cfg.pad_mode)
    for s, stage in enumerate(params["stages"]):
        ratio = list(reversed(cfg.ratios))[s]
        for j, blk in enumerate(stage["blocks"]):
            x = resnet_block(blk, x, cfg, dilation=cfg.dilation_base ** j)
        x = _elu(x)
        x = conv1d(stage["down"], x, stride=ratio, causal=cfg.causal,
                   pad_mode=cfg.pad_mode)
    if cfg.lstm:
        x = lstm_stack(params["lstm"], x)
    x = _elu(x)
    return conv1d(params["final"], x, causal=cfg.causal, pad_mode=cfg.pad_mode)


def decode_frames(params, z: jnp.ndarray, cfg: EncodecConfig) -> jnp.ndarray:
    """latent frames [B, T', dimension] -> wav [B, T'*hop, channels]."""
    x = conv1d(params["init"], z, causal=cfg.causal, pad_mode=cfg.pad_mode)
    if cfg.lstm:
        x = lstm_stack(params["lstm"], x)
    for s, stage in enumerate(params["stages"]):
        ratio = cfg.ratios[s]
        x = _elu(x)
        x = conv_transpose1d(stage["up"], x, stride=ratio, causal=cfg.causal)
        for j, blk in enumerate(stage["blocks"]):
            x = resnet_block(blk, x, cfg, dilation=cfg.dilation_base ** j)
    x = _elu(x)
    return conv1d(params["final"], x, causal=cfg.causal, pad_mode=cfg.pad_mode)


# ==============================================================================
# residual vector quantization
# ==============================================================================

def rvq_encode(codebooks: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """codebooks [n_q, N, D], z [B, T, D] -> codes [B, n_q, T].

    Residual quantization: each stage takes the nearest codebook entry of the
    remaining residual (audiocraft ResidualVectorQuantization.encode)."""
    def stage(residual, cb):
        d2 = (jnp.sum(residual ** 2, -1, keepdims=True)
              - 2.0 * jnp.einsum("btd,nd->btn", residual, cb)
              + jnp.sum(cb ** 2, -1)[None, None, :])
        idx = jnp.argmin(d2, axis=-1)                     # [B, T]
        quantized = jnp.take(cb, idx, axis=0)             # [B, T, D]
        return residual - quantized, idx

    residual = z.astype(jnp.float32)
    _, codes = jax.lax.scan(stage, residual,
                            codebooks.astype(jnp.float32))
    return codes.transpose(1, 0, 2).astype(jnp.int32)     # [B, n_q, T]


def rvq_decode(codebooks: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, n_q, T] -> z [B, T, D] (sum of codebook vectors)."""
    def per_q(cb, idx):
        return jnp.take(cb, idx, axis=0)                  # [B, T, D]
    vecs = jax.vmap(per_q)(codebooks.astype(jnp.float32),
                           codes.transpose(1, 0, 2))      # [n_q, B, T, D]
    return vecs.sum(axis=0)


# ==============================================================================
# full codec
# ==============================================================================

def encode(params, wav: jnp.ndarray, cfg: EncodecConfig) -> jnp.ndarray:
    """wav [B, T] or [B, T, C] -> codes [B, n_q, T//hop]
    (reference AudioTokenizer.encode, data/tokenizer.py:127-129)."""
    if wav.ndim == 2:
        wav = wav[..., None]
    z = encode_frames(params["encoder"], wav, cfg)
    return rvq_encode(params["codebooks"], z)


def decode(params, codes: jnp.ndarray, cfg: EncodecConfig) -> jnp.ndarray:
    """codes [B, n_q, T] -> wav [B, T*hop]
    (reference AudioTokenizer.decode, data/tokenizer.py:131-133)."""
    z = rvq_decode(params["codebooks"], codes)
    wav = decode_frames(params["decoder"], z, cfg)
    return wav[..., 0]


# ==============================================================================
# jitted, shape-bucketed entry points (host convenience)
# ==============================================================================
#
# Eager per-op dispatch is catastrophically slow over a remote TPU tunnel, and
# naive jit recompiles per audio length.  For a causal codec, right-padding
# the input cannot change earlier output frames, so we pad to a bucket,
# encode/decode once per bucket shape, and trim.

from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=64)
def _encode_fn(cfg: EncodecConfig):
    return jax.jit(lambda p, w: encode(p, w, cfg))


@_lru_cache(maxsize=64)
def _decode_fn(cfg: EncodecConfig):
    return jax.jit(lambda p, c: decode(p, c, cfg))


def encode_bucketed(params, wav: np.ndarray, cfg: EncodecConfig,
                    bucket_samples: int = 4 * 16000) -> np.ndarray:
    """wav [B, T] numpy -> codes [B, n_q, ceil(T/hop)] numpy."""
    assert cfg.causal, "bucketed encode requires a causal codec"
    T = wav.shape[-1]
    pad_T = max(((T + bucket_samples - 1) // bucket_samples) * bucket_samples,
                bucket_samples)
    padded = np.zeros(wav.shape[:-1] + (pad_T,), np.float32)
    padded[..., :T] = wav
    codes = np.asarray(_encode_fn(cfg)(params, jnp.asarray(padded)))
    n_frames = -(-T // cfg.hop_length)
    return codes[..., :n_frames]


def decode_bucketed(params, codes: np.ndarray, cfg: EncodecConfig,
                    bucket_frames: int = 200) -> np.ndarray:
    """codes [B, n_q, T] numpy -> wav [B, T*hop] numpy."""
    assert cfg.causal, "bucketed decode requires a causal codec"
    T = codes.shape[-1]
    pad_T = max(((T + bucket_frames - 1) // bucket_frames) * bucket_frames,
                bucket_frames)
    padded = np.zeros(codes.shape[:-1] + (pad_T,), np.int32)
    padded[..., :T] = codes
    wav = np.asarray(_decode_fn(cfg)(params, jnp.asarray(padded)))
    return wav[..., :T * cfg.hop_length]


# ==============================================================================
# exact incremental (streaming) decode
# ==============================================================================
#
# The decoder stack is causal end-to-end, so a chunk of frames can be decoded
# EXACTLY with O(chunk) work by carrying per-layer state instead of
# re-decoding the whole prefix (which is O(T^2) over an utterance —
# VERDICT r02 #4):
#   * stride-1 causal convs carry their last (kernel_eff - 1) input samples;
#   * the LSTM carries (h, c) per layer;
#   * transposed convs carry the (K - stride)-sample output tail
#     (overlap-add; bias applied once, on emission).
# The only non-causal wrinkle is the reflect LEFT pad at the sequence start
# (audiocraft pad1d semantics): the first output samples depend on inputs
# 1..pad, so the FIRST chunk must carry at least kernel_size frames
# (STREAM_MIN_FIRST) — the first call runs the normal causal-padded conv and
# captures carries; later calls run VALID convs over [carry ; chunk].
# Bit-exactness vs decode() is proven in tests/test_streaming.py.

STREAM_MIN_FIRST = 7     # kernel_size of the decoder's init conv


def _conv_valid(params, x, dilation: int = 1):
    y = jax.lax.conv_general_dilated(
        x, params["w"].astype(x.dtype), window_strides=(1,), padding="VALID",
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return y + params["b"].astype(x.dtype)


def _sconv(params, x, carry, dilation, first, cfg):
    """Streaming stride-1 causal conv: emits exactly len(x) outputs."""
    K = params["w"].shape[0]
    ke = (K - 1) * dilation + 1
    if first:
        y = conv1d(params, x, dilation=dilation, causal=True,
                   pad_mode=cfg.pad_mode)
        xc = x
    else:
        xc = jnp.concatenate([carry, x], axis=1)
        y = _conv_valid(params, xc, dilation)
    new_carry = xc[:, xc.shape[1] - (ke - 1):] if ke > 1 else carry
    return y, new_carry


def _sconvtr(params, x, tail, stride):
    """Streaming causal ConvTranspose1d (trim_right_ratio=1): overlap-add.

    Emits len(x)*stride samples; carries the (K - stride)-sample tail
    WITHOUT bias (bias is added once per emitted sample)."""
    K = params["w"].shape[0]
    y = jax.lax.conv_transpose(
        x, params["w"].astype(x.dtype),
        strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        transpose_kernel=True,
        preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.at[:, :K - stride].add(tail)
    m = x.shape[1]
    emit = y[:, :m * stride] + params["b"].astype(x.dtype)
    return emit, y[:, m * stride:]


def _slstm(params, x, carry, first, skip: bool = True):
    """Streaming lstm_stack: carries (h, c) per layer."""
    y = x
    new_carry = []
    for li, layer in enumerate(params["layers"]):
        w_ih = layer["w_ih"].astype(jnp.float32)
        w_hh = layer["w_hh"].astype(jnp.float32)
        b = (layer["b_ih"] + layer["b_hh"]).astype(jnp.float32)
        H = w_hh.shape[1]
        B = y.shape[0]
        xin = jnp.einsum("btc,gc->btg", y.astype(jnp.float32), w_ih) + b

        def step(hc, xt):
            h, c = hc
            gates = xt + h @ w_hh.T
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        init = ((jnp.zeros((B, H), jnp.float32),
                 jnp.zeros((B, H), jnp.float32)) if first else carry[li])
        hc, hs = jax.lax.scan(step, init, xin.transpose(1, 0, 2))
        new_carry.append(hc)
        y = hs.transpose(1, 0, 2).astype(x.dtype)
    return (y + x if skip else y), new_carry


def _sresnet(blk, x, st, cfg: EncodecConfig, dilation, first):
    h = _elu(x)
    h, c1 = _sconv(blk["conv1"], h, st["conv1"], dilation, first, cfg)
    h = _elu(h)
    h, c2 = _sconv(blk["conv2"], h, st["conv2"], 1, first, cfg)
    new_st = {"conv1": c1, "conv2": c2}
    if cfg.true_skip:
        return x + h, new_st
    s, cs = _sconv(blk["shortcut"], x, st["shortcut"], 1, first, cfg)
    new_st["shortcut"] = cs
    return s + h, new_st


def stream_decode_init(params, cfg: EncodecConfig, B: int = 1,
                       dtype=jnp.float32) -> dict:
    """Zero-initialised per-layer streaming state for the decoder."""
    dec = params["decoder"]

    def conv_carry(p, dilation=1):
        K, cin = p["w"].shape[0], p["w"].shape[1]
        ke = (K - 1) * dilation + 1
        return jnp.zeros((B, ke - 1, cin), dtype)

    def res_st(blk, dilation):
        st = {"conv1": conv_carry(blk["conv1"], dilation),
              "conv2": conv_carry(blk["conv2"], 1)}
        if not cfg.true_skip:
            st["shortcut"] = conv_carry(blk["shortcut"], 1)
        return st

    stages = []
    for s, stage in enumerate(dec["stages"]):
        K, cout = stage["up"]["w"].shape[0], stage["up"]["w"].shape[1]
        stages.append({
            "up": jnp.zeros((B, K - cfg.ratios[s], cout), dtype),
            "blocks": [res_st(blk, cfg.dilation_base ** j)
                       for j, blk in enumerate(stage["blocks"])]})
    lstm = [(jnp.zeros((B, l["w_hh"].shape[1]), jnp.float32),
             jnp.zeros((B, l["w_hh"].shape[1]), jnp.float32))
            for l in dec["lstm"]["layers"]] if cfg.lstm else []
    return {"init": conv_carry(dec["init"]), "lstm": lstm,
            "stages": stages, "final": conv_carry(dec["final"])}


def decode_frames_stream(params, z: jnp.ndarray, st: dict,
                         cfg: EncodecConfig, first: bool):
    """Streaming decode_frames: z [B, m, dimension] -> (wav [B, m*hop, ch],
    new state).  With ``first`` the carries in ``st`` are ignored (the
    sequence-start reflect padding is used instead) and fresh carries are
    captured; m must be >= STREAM_MIN_FIRST then."""
    assert cfg.causal, "streaming decode requires a causal codec"
    x, c_init = _sconv(params["init"], z, st["init"], 1, first, cfg)
    if cfg.lstm:
        x, c_lstm = _slstm(params["lstm"], x, st["lstm"], first)
    else:
        c_lstm = []
    stages = []
    for s, stage in enumerate(params["stages"]):
        x = _elu(x)
        x, tail = _sconvtr(stage["up"], x, st["stages"][s]["up"],
                           cfg.ratios[s])
        blocks = []
        for j, blk in enumerate(stage["blocks"]):
            x, cb = _sresnet(blk, x, st["stages"][s]["blocks"][j], cfg,
                             cfg.dilation_base ** j, first)
            blocks.append(cb)
        stages.append({"up": tail, "blocks": blocks})
    x = _elu(x)
    x, c_fin = _sconv(params["final"], x, st["final"], 1, first, cfg)
    return x, {"init": c_init, "lstm": c_lstm, "stages": stages,
               "final": c_fin}


@_lru_cache(maxsize=32)
def _stream_step_fn(cfg: EncodecConfig, chunk: int, first: bool):
    def step(params, codes, st):
        z = rvq_decode(params["codebooks"], codes)
        wav, st = decode_frames_stream(params["decoder"], z, st, cfg, first)
        return wav[..., 0], st
    return jax.jit(step)


class StreamingDecoder:
    """Exact incremental codes->wav decoder (host driver).

    ``feed(frames [n_q, m])`` returns the newly settled samples: all samples
    of the stream so far beyond what earlier feeds returned, bit-identical
    to the same positions of ``decode()`` on the full code sequence.  Work
    per feed is O(m + chunk): full ``chunk_frames`` blocks advance the
    carried state; a trailing partial block is decoded off a CLONED state
    (zero-padded to the chunk shape — strict causality keeps the emitted
    prefix exact) and re-processed when enough frames arrive.  Before
    STREAM_MIN_FIRST frames exist nothing is emitted (the sequence-start
    reflect pad needs them).
    """

    def __init__(self, params, cfg: EncodecConfig, chunk_frames: int = 16):
        assert cfg.causal, "streaming decode requires a causal codec"
        assert chunk_frames >= STREAM_MIN_FIRST
        self.params = params
        self.cfg = cfg
        self.chunk = chunk_frames
        self.pending = np.zeros((cfg.n_q, 0), np.int32)
        self.state = None              # carries for frames consumed so far
        self.state_frames = 0          # frames consumed into self.state
        self.emitted = 0               # samples returned so far (global)
        self.flushed = False           # flush() makes the stream terminal

    def _run(self, frames: np.ndarray, persist: bool):
        """Decode ``frames`` (shape [n_q, chunk]) on top of self.state."""
        first = self.state is None
        step = _stream_step_fn(self.cfg, self.chunk, first)
        if first:
            st_in = stream_decode_init(self.params, self.cfg)
        else:
            st_in = self.state
        wav, st = step(self.params, jnp.asarray(frames[None]), st_in)
        if persist:
            self.state = st
            self.state_frames += frames.shape[1]
        return np.asarray(wav[0])

    def feed(self, new_frames: np.ndarray) -> np.ndarray:
        if self.flushed:
            # the degenerate flush() branch decodes the sub-minimum prefix
            # with the sequence-START reflect pad; frames arriving after it
            # would re-decode that window differently, so the already-
            # emitted samples could never be made consistent again
            raise RuntimeError("StreamingDecoder.feed() after flush(): "
                               "the stream is terminal")
        hop = self.cfg.hop_length
        if new_frames.shape[1]:
            self.pending = np.concatenate(
                [self.pending, np.asarray(new_frames, np.int32)], axis=1)
        out = []

        def emit(wav, start_frame):
            # slice off samples an earlier partial-block run already returned
            lo = self.emitted - start_frame * hop
            if lo < wav.shape[0]:
                out.append(wav[max(lo, 0):])
                self.emitted = start_frame * hop + wav.shape[0]

        while self.pending.shape[1] >= self.chunk:
            start = self.state_frames
            wav = self._run(self.pending[:, :self.chunk], persist=True)
            self.pending = self.pending[:, self.chunk:]
            emit(wav, start)
        r = self.pending.shape[1]
        total = self.state_frames + r
        if r and (self.state is not None or total >= STREAM_MIN_FIRST):
            padded = np.zeros((self.cfg.n_q, self.chunk), np.int32)
            padded[:, :r] = self.pending
            wav = self._run(padded, persist=False)[:r * hop]
            emit(wav, self.state_frames)
        if not out:
            return np.zeros((0,), np.float32)
        return np.concatenate(out).astype(np.float32)

    def flush(self) -> np.ndarray:
        """Emit anything still held back and make the stream terminal
        (idempotent; a later feed() raises).  Only the degenerate
        sub-STREAM_MIN_FIRST whole-utterance case holds samples (feed
        emits everything else eagerly); decode it in one shot."""
        r = self.pending.shape[1]
        hold = (not self.flushed and self.state is None
                and 0 < r < STREAM_MIN_FIRST)
        self.flushed = True
        if hold:
            held, self.pending = self.pending, self.pending[:, :0]
            wav = np.asarray(decode(
                self.params, jnp.asarray(held[None]), self.cfg))[0]
            self.emitted = r * self.cfg.hop_length
            return wav.astype(np.float32)
        return np.zeros((0,), np.float32)


# ==============================================================================
# init (random weights; real weights come from utils/convert_encodec.py)
# ==============================================================================

def _conv_init(key, k, cin, cout, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(cin * k)
    return {"w": jax.random.uniform(k1, (k, cin, cout), dtype, -bound, bound),
            "b": jax.random.uniform(k2, (cout,), dtype, -bound, bound)}


def _convtr_init(key, k, cin, cout, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(cin * k)
    return {"w": jax.random.uniform(k1, (k, cout, cin), dtype, -bound, bound),
            "b": jax.random.uniform(k2, (cout,), dtype, -bound, bound)}


def _lstm_init(key, dim, n_layers, dtype=jnp.float32):
    layers = []
    for i in range(n_layers):
        ks = jax.random.split(jax.random.fold_in(key, i), 4)
        bound = 1.0 / np.sqrt(dim)
        layers.append({
            "w_ih": jax.random.uniform(ks[0], (4 * dim, dim), dtype, -bound, bound),
            "w_hh": jax.random.uniform(ks[1], (4 * dim, dim), dtype, -bound, bound),
            "b_ih": jax.random.uniform(ks[2], (4 * dim,), dtype, -bound, bound),
            "b_hh": jax.random.uniform(ks[3], (4 * dim,), dtype, -bound, bound),
        })
    return {"layers": layers}


def _resnet_init(key, dim, cfg: EncodecConfig, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = dim // cfg.compress
    p = {"conv1": _conv_init(k1, cfg.residual_kernel_size, dim, hidden, dtype),
         "conv2": _conv_init(k2, 1, hidden, dim, dtype)}
    if not cfg.true_skip:
        p["shortcut"] = _conv_init(k3, 1, dim, dim, dtype)
    return p


def init_encodec(cfg: EncodecConfig, key, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 16)
    nf = cfg.n_filters
    n_stages = len(cfg.ratios)

    # encoder
    mult = 1
    enc_stages = []
    k_i = 2
    for s, ratio in enumerate(reversed(cfg.ratios)):
        dim = mult * nf
        blocks = [_resnet_init(jax.random.fold_in(keys[k_i], j), dim, cfg, dtype)
                  for j in range(cfg.n_residual_layers)]
        down = _conv_init(jax.random.fold_in(keys[k_i], 99),
                          ratio * 2, dim, dim * 2, dtype)
        enc_stages.append({"blocks": blocks, "down": down})
        mult *= 2
        k_i += 1
    enc_dim = mult * nf
    encoder = {
        "init": _conv_init(keys[0], cfg.kernel_size, cfg.channels, nf, dtype),
        "stages": enc_stages,
        "lstm": _lstm_init(keys[1], enc_dim, cfg.lstm, dtype),
        "final": _conv_init(keys[6], cfg.last_kernel_size, enc_dim,
                            cfg.dimension, dtype),
    }

    # decoder (mirror)
    dec_stages = []
    mult = 2 ** n_stages
    for s, ratio in enumerate(cfg.ratios):
        dim = mult * nf
        up = _convtr_init(jax.random.fold_in(keys[7], s), ratio * 2,
                          dim, dim // 2, dtype)
        blocks = [_resnet_init(jax.random.fold_in(keys[8], s * 10 + j),
                               dim // 2, cfg, dtype)
                  for j in range(cfg.n_residual_layers)]
        dec_stages.append({"up": up, "blocks": blocks})
        mult //= 2
    decoder = {
        "init": _conv_init(keys[9], cfg.kernel_size, cfg.dimension,
                           (2 ** n_stages) * nf, dtype),
        "lstm": _lstm_init(keys[10], (2 ** n_stages) * nf, cfg.lstm, dtype),
        "stages": dec_stages,
        "final": _conv_init(keys[11], cfg.last_kernel_size, nf,
                            cfg.channels, dtype),
    }

    codebooks = jax.random.normal(
        keys[12], (cfg.n_q, cfg.codebook_size, cfg.dimension), dtype)
    return {"encoder": encoder, "decoder": decoder, "codebooks": codebooks}
