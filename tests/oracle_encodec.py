"""Test-only torch oracle for the audiocraft EnCodec forward path.

The reference loads its codec through audiocraft
(``/root/reference/data/tokenizer.py:101-133``,
``CompressionSolver.model_from_checkpoint``); audiocraft itself is not
installed here, so this module re-implements the *forward semantics* of
audiocraft's EncodecModel (SEANetEncoder/SEANetDecoder + SLSTM + residual
vector quantization, streamable weight-norm convs) in plain torch, with
module names chosen so ``state_dict()`` keys are identical to an audiocraft
checkpoint (``encoder.model.N.conv.conv.weight_g`` etc.).

That gives the test suite a full-stack correctness oracle: build this model
with random weights, feed its state_dict through
``voicecraft_tpu.utils.convert_encodec.from_audiocraft_state_dict``, and
assert the JAX codec produces bit-identical codes and matching waveforms on
real audio.  Any divergence in SEANet padding, activation ordering, LSTM
gate math, weight-norm folding, or RVQ distance computation fails the test.

Semantics covered (audiocraft modules/conv.py, modules/seanet.py,
modules/lstm.py, quantization/core_vq.py):
  * streamable conv padding: padding_total = (K-1)*d - (s-1); extra right
    padding so the final window is full; causal -> all pad left (+extra
    right), non-causal -> split, with the reflect-pad small-input guard
  * streamable conv-transpose trimming: padding_total = K - s, causal trims
    ceil(pt * trim_right_ratio) from the right
  * SEANet stage structure and ELU placement, residual blocks
    [ELU, conv k=res_k dil=base^j, ELU, conv k=1] with identity (true_skip)
    or 1x1-conv shortcut
  * SLSTM: 2-layer LSTM over [T, B, C] plus skip connection
  * RVQ: per-stage nearest-neighbour on the residual, codebook lookup via
    the EuclideanCodebook ``embed`` buffer (no projections when
    codebook dim == latent dim, the EnCodec configuration)
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F


@dataclass
class OracleConfig:
    channels: int = 1
    dimension: int = 128
    n_filters: int = 64
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    n_residual_layers: int = 1
    lstm: int = 2
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    compress: int = 2
    causal: bool = True
    pad_mode: str = "reflect"
    true_skip: bool = True
    n_q: int = 4
    codebook_size: int = 2048
    sample_rate: int = 16000

    @property
    def hop_length(self) -> int:
        h = 1
        for r in self.ratios:
            h *= r
        return h


def _wn(mod: nn.Module) -> nn.Module:
    # old-style weight_norm (weight_g/weight_v keys) — what the reference's
    # pinned torch<=2.0 audiocraft checkpoints contain
    return torch.nn.utils.weight_norm(mod)


def _get_extra_padding(x: torch.Tensor, k_eff: int, stride: int,
                       padding_total: int) -> int:
    length = x.shape[-1]
    n_frames = (length - k_eff + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - padding_total)
    return max(ideal - length, 0)


def _pad1d(x: torch.Tensor, left: int, right: int, mode: str) -> torch.Tensor:
    if mode == "reflect":
        length = x.shape[-1]
        max_pad = max(left, right)
        extra = 0
        if length <= max_pad:
            extra = max_pad - length + 1
            x = F.pad(x, (0, extra))
        out = F.pad(x, (left, right), mode="reflect")
        end = out.shape[-1] - extra
        return out[..., :end]
    return F.pad(x, (left, right))


class StreamableConv1d(nn.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1, causal=True,
                 pad_mode="reflect"):
        super().__init__()
        # audiocraft nests NormConv1d (.conv) holding the weight-normed conv
        # (.conv), hence the .conv.conv key path
        self.conv = nn.Module()
        self.conv.conv = _wn(nn.Conv1d(cin, cout, k, stride=stride,
                                       dilation=dilation))
        self.k, self.stride, self.dilation = k, stride, dilation
        self.causal, self.pad_mode = causal, pad_mode

    def forward(self, x):
        k_eff = (self.k - 1) * self.dilation + 1
        padding_total = k_eff - self.stride
        extra = _get_extra_padding(x, k_eff, self.stride, padding_total)
        if self.causal:
            x = _pad1d(x, padding_total, extra, self.pad_mode)
        else:
            right = padding_total // 2
            left = padding_total - right
            x = _pad1d(x, left, right + extra, self.pad_mode)
        return self.conv.conv(x)


class StreamableConvTranspose1d(nn.Module):
    def __init__(self, cin, cout, k, stride=1, causal=True,
                 trim_right_ratio=1.0):
        super().__init__()
        self.convtr = nn.Module()
        self.convtr.convtr = _wn(nn.ConvTranspose1d(cin, cout, k,
                                                    stride=stride))
        self.k, self.stride = k, stride
        self.causal, self.trim_right_ratio = causal, trim_right_ratio

    def forward(self, x):
        y = self.convtr.convtr(x)
        padding_total = self.k - self.stride
        if self.causal:
            right = math.ceil(padding_total * self.trim_right_ratio)
            left = padding_total - right
        else:
            right = padding_total // 2
            left = padding_total - right
        end = y.shape[-1] - right
        return y[..., left:end]


class SLSTM(nn.Module):
    def __init__(self, dim, num_layers=2, skip=True):
        super().__init__()
        self.skip = skip
        self.lstm = nn.LSTM(dim, dim, num_layers)

    def forward(self, x):          # x: [B, C, T]
        x = x.permute(2, 0, 1)     # [T, B, C]
        y, _ = self.lstm(x)
        if self.skip:
            y = y + x
        return y.permute(1, 2, 0)


class SEANetResnetBlock(nn.Module):
    def __init__(self, dim, cfg: OracleConfig, dilation: int):
        super().__init__()
        hidden = dim // cfg.compress
        self.block = nn.Sequential(
            nn.ELU(),
            StreamableConv1d(dim, hidden, cfg.residual_kernel_size,
                             dilation=dilation, causal=cfg.causal,
                             pad_mode=cfg.pad_mode),
            nn.ELU(),
            StreamableConv1d(hidden, dim, 1, causal=cfg.causal,
                             pad_mode=cfg.pad_mode),
        )
        if cfg.true_skip:
            self.shortcut = nn.Identity()
        else:
            self.shortcut = StreamableConv1d(dim, dim, 1, causal=cfg.causal,
                                             pad_mode=cfg.pad_mode)

    def forward(self, x):
        return self.shortcut(x) + self.block(x)


class SEANetEncoder(nn.Module):
    def __init__(self, cfg: OracleConfig):
        super().__init__()
        nf = cfg.n_filters
        mult = 1
        model = [StreamableConv1d(cfg.channels, mult * nf, cfg.kernel_size,
                                  causal=cfg.causal, pad_mode=cfg.pad_mode)]
        for ratio in reversed(cfg.ratios):
            for j in range(cfg.n_residual_layers):
                model += [SEANetResnetBlock(mult * nf, cfg,
                                            cfg.dilation_base ** j)]
            model += [nn.ELU(),
                      StreamableConv1d(mult * nf, mult * nf * 2, ratio * 2,
                                       stride=ratio, causal=cfg.causal,
                                       pad_mode=cfg.pad_mode)]
            mult *= 2
        if cfg.lstm:
            model += [SLSTM(mult * nf, num_layers=cfg.lstm)]
        model += [nn.ELU(),
                  StreamableConv1d(mult * nf, cfg.dimension,
                                   cfg.last_kernel_size, causal=cfg.causal,
                                   pad_mode=cfg.pad_mode)]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        return self.model(x)


class SEANetDecoder(nn.Module):
    def __init__(self, cfg: OracleConfig):
        super().__init__()
        nf = cfg.n_filters
        mult = 2 ** len(cfg.ratios)
        model = [StreamableConv1d(cfg.dimension, mult * nf, cfg.kernel_size,
                                  causal=cfg.causal, pad_mode=cfg.pad_mode)]
        if cfg.lstm:
            model += [SLSTM(mult * nf, num_layers=cfg.lstm)]
        for ratio in cfg.ratios:
            model += [nn.ELU(),
                      StreamableConvTranspose1d(mult * nf, mult * nf // 2,
                                                ratio * 2, stride=ratio,
                                                causal=cfg.causal)]
            for j in range(cfg.n_residual_layers):
                model += [SEANetResnetBlock(mult * nf // 2, cfg,
                                            cfg.dilation_base ** j)]
            mult //= 2
        model += [nn.ELU(),
                  StreamableConv1d(nf, cfg.channels, cfg.last_kernel_size,
                                   causal=cfg.causal, pad_mode=cfg.pad_mode)]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        return self.model(x)


class EuclideanCodebook(nn.Module):
    def __init__(self, dim, bins):
        super().__init__()
        # audiocraft keeps EMA training buffers alongside embed; only embed
        # matters for the forward path, the rest make the state_dict realistic
        self.register_buffer("inited", torch.ones(1))
        self.register_buffer("cluster_size", torch.zeros(bins))
        self.register_buffer("embed", torch.randn(bins, dim))
        self.register_buffer("embed_avg", torch.zeros(bins, dim))

    def quantize(self, x):         # x: [N, D] -> [N]
        embed = self.embed.t()
        dist = -(x.pow(2).sum(1, keepdim=True)
                 - 2 * x @ embed
                 + embed.pow(2).sum(0, keepdim=True))
        return dist.max(dim=-1).indices

    def decode(self, idx):         # [B, T] -> [B, T, D]
        return F.embedding(idx, self.embed)

    def encode(self, x):           # [B, T, D] -> [B, T]
        shape = x.shape
        flat = x.reshape(-1, shape[-1])
        return self.quantize(flat).view(*shape[:-1])


class VectorQuantization(nn.Module):
    def __init__(self, dim, bins):
        super().__init__()
        self._codebook = EuclideanCodebook(dim, bins)

    def encode(self, x):           # x: [B, D, T] -> [B, T]
        return self._codebook.encode(x.permute(0, 2, 1))

    def decode(self, idx):         # [B, T] -> [B, D, T]
        return self._codebook.decode(idx).permute(0, 2, 1)


class ResidualVectorQuantization(nn.Module):
    def __init__(self, dim, bins, n_q):
        super().__init__()
        self.layers = nn.ModuleList(
            [VectorQuantization(dim, bins) for _ in range(n_q)])

    def encode(self, x):           # [B, D, T] -> [n_q, B, T]
        residual = x
        out = []
        for layer in self.layers:
            idx = layer.encode(residual)
            residual = residual - layer.decode(idx)
            out.append(idx)
        return torch.stack(out)

    def decode(self, codes):       # [n_q, B, T] -> [B, D, T]
        x = 0.0
        for layer, idx in zip(self.layers, codes):
            x = x + layer.decode(idx)
        return x


class ResidualVectorQuantizer(nn.Module):
    def __init__(self, dim, bins, n_q):
        super().__init__()
        self.vq = ResidualVectorQuantization(dim, bins, n_q)

    def encode(self, x):           # [B, D, T] -> [B, n_q, T]
        return self.vq.encode(x).transpose(0, 1)

    def decode(self, codes):       # [B, n_q, T] -> [B, D, T]
        return self.vq.decode(codes.transpose(0, 1))


class EncodecModel(nn.Module):
    """audiocraft models/encodec.py forward semantics, renormalize=False
    (the VoiceCraft giga checkpoints do not renormalize)."""

    def __init__(self, cfg: OracleConfig):
        super().__init__()
        self.cfg = cfg
        self.encoder = SEANetEncoder(cfg)
        self.decoder = SEANetDecoder(cfg)
        self.quantizer = ResidualVectorQuantizer(cfg.dimension,
                                                 cfg.codebook_size, cfg.n_q)

    @torch.no_grad()
    def encode(self, wav):         # [B, C, T] -> codes [B, n_q, T']
        emb = self.encoder(wav)
        return self.quantizer.encode(emb)

    @torch.no_grad()
    def decode(self, codes):       # [B, n_q, T'] -> wav [B, C, T'*hop]
        emb = self.quantizer.decode(codes)
        return self.decoder(emb)
