"""Audio IO roundtrip + audiocraft-checkpoint converter structural tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voicecraft_tpu.utils import audio as au
from voicecraft_tpu.models import encodec as ec

DEMO_WAV = "/root/reference/demo/5895_34622_000026_000002.wav"


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(1, 1600)).astype(np.float32) * 0.1).clip(-1, 1)
    p = str(tmp_path / "x.wav")
    au.write_wav(p, wav, 16000)
    back, sr = au.read_wav(p)
    assert sr == 16000 and back.shape == wav.shape
    np.testing.assert_allclose(back, wav, atol=1.0 / 32000)


@pytest.mark.skipif(not os.path.exists(DEMO_WAV), reason="demo wav missing")
def test_load_reference_demo_wav():
    wav = au.load_audio(DEMO_WAV, 16000)
    assert wav.ndim == 2 and wav.shape[0] == 1
    assert wav.shape[1] > 16000          # demo clip is several seconds
    assert np.abs(wav).max() <= 1.0


def test_resample_preserves_tone():
    t = np.arange(32000) / 32000.0
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None]
    out = au.resample(tone, 32000, 16000)
    assert out.shape == (1, 16000)
    # 440 Hz survives: check dominant FFT bin
    spec = np.abs(np.fft.rfft(out[0]))
    assert abs(np.argmax(spec) - 440) <= 1


def _fake_audiocraft_sd(cfg: ec.EncodecConfig, seed=0):
    """Synthesise an audiocraft-style state dict (weight_g/weight_v names,
    torch layouts) with the right SEANet sequential indices."""
    rng = np.random.default_rng(seed)
    sd = {}

    def add_conv(prefix, cin, cout, k):
        w = rng.normal(size=(cout, cin, k)).astype(np.float32) * 0.1
        norm = np.sqrt((w ** 2).sum(axis=(1, 2), keepdims=True))
        sd[prefix + ".weight_v"] = w
        sd[prefix + ".weight_g"] = norm  # so folded weight == w
        sd[prefix + ".bias"] = rng.normal(size=(cout,)).astype(np.float32) * 0.1

    def add_convtr(prefix, cin, cout, k):
        w = rng.normal(size=(cin, cout, k)).astype(np.float32) * 0.1
        norm = np.sqrt((w ** 2).sum(axis=(1, 2), keepdims=True))
        sd[prefix + ".weight_v"] = w
        sd[prefix + ".weight_g"] = norm
        sd[prefix + ".bias"] = rng.normal(size=(cout,)).astype(np.float32) * 0.1

    def add_lstm(prefix, dim):
        for i in range(cfg.lstm):
            for n, shape in [("weight_ih", (4 * dim, dim)),
                             ("weight_hh", (4 * dim, dim)),
                             ("bias_ih", (4 * dim,)),
                             ("bias_hh", (4 * dim,))]:
                sd[f"{prefix}.{n}_l{i}"] = rng.normal(size=shape).astype(np.float32) * 0.05

    def add_resnet(prefix, dim):
        add_conv(f"{prefix}.block.1.conv.conv", dim, dim // cfg.compress,
                 cfg.residual_kernel_size)
        add_conv(f"{prefix}.block.3.conv.conv", dim // cfg.compress, dim, 1)

    nf = cfg.n_filters
    n_stages = len(cfg.ratios)
    per_stage = cfg.n_residual_layers + 2

    # encoder
    add_conv("encoder.model.0.conv.conv", cfg.channels, nf, cfg.kernel_size)
    mult = 1
    for s, ratio in enumerate(reversed(cfg.ratios)):
        base = 1 + s * per_stage
        for j in range(cfg.n_residual_layers):
            add_resnet(f"encoder.model.{base + j}", mult * nf)
        add_conv(f"encoder.model.{base + cfg.n_residual_layers + 1}.conv.conv",
                 mult * nf, mult * nf * 2, ratio * 2)
        mult *= 2
    lstm_idx = 1 + n_stages * per_stage
    add_lstm(f"encoder.model.{lstm_idx}.lstm", mult * nf)
    add_conv(f"encoder.model.{lstm_idx + 2}.conv.conv", mult * nf,
             cfg.dimension, cfg.last_kernel_size)

    # decoder
    add_conv("decoder.model.0.conv.conv", cfg.dimension, mult * nf,
             cfg.kernel_size)
    add_lstm("decoder.model.1.lstm", mult * nf)
    for s, ratio in enumerate(cfg.ratios):
        base = 2 + s * per_stage
        add_convtr(f"decoder.model.{base + 1}.convtr.convtr",
                   mult * nf, mult * nf // 2, ratio * 2)
        for j in range(cfg.n_residual_layers):
            add_resnet(f"decoder.model.{base + 2 + j}", mult * nf // 2)
        mult //= 2
    final_idx = 2 + n_stages * per_stage + 1
    add_conv(f"decoder.model.{final_idx}.conv.conv", nf, cfg.channels,
             cfg.last_kernel_size)

    for q in range(cfg.n_q):
        sd[f"quantizer.vq.layers.{q}._codebook.embed"] = \
            rng.normal(size=(cfg.codebook_size, cfg.dimension)).astype(np.float32)
    return sd


def test_audiocraft_converter_structural():
    from voicecraft_tpu.utils.convert_encodec import from_audiocraft_state_dict
    cfg = ec.EncodecConfig(n_filters=8, dimension=16, codebook_size=32,
                           lstm=2)
    sd = _fake_audiocraft_sd(cfg)
    params = from_audiocraft_state_dict(sd, cfg)
    wav = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 3200)).astype(np.float32) * 0.1)
    codes = ec.encode(params, wav, cfg)
    assert codes.shape == (1, cfg.n_q, 10)
    out = ec.decode(params, codes, cfg)
    assert out.shape == (1, 3200)
    # weight-norm folding: g == ||v|| by construction -> folded == v
    w = np.asarray(params["encoder"]["init"]["w"])
    np.testing.assert_allclose(
        w, sd["encoder.model.0.conv.conv.weight_v"].transpose(2, 1, 0),
        atol=1e-6)
