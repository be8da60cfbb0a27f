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
