"""EnCodec JAX implementation tests: primitive parity vs torch, structural
invariants (320x downsample, causality, RVQ roundtrip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voicecraft_tpu.models import encodec as ec


def test_conv1d_matches_torch():
    import torch
    rng = np.random.default_rng(0)
    B, T, Cin, Cout, K, stride, dil = 2, 50, 3, 5, 7, 1, 2
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)
    w = rng.normal(size=(K, Cin, Cout)).astype(np.float32)
    b = rng.normal(size=(Cout,)).astype(np.float32)

    # causal: left-pad (K-1)*dil with the configured mode (audiocraft default
    # reflect), then torch Conv1d VALID on the padded signal
    pad = (K - 1) * dil
    xp = np.pad(x, ((0, 0), (pad, 0), (0, 0)), mode="reflect")
    tx = torch.from_numpy(xp.transpose(0, 2, 1))
    conv = torch.nn.Conv1d(Cin, Cout, K, stride=stride, dilation=dil)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
        conv.bias.copy_(torch.from_numpy(b))
        want = conv(tx).numpy().transpose(0, 2, 1)

    got = np.asarray(ec.conv1d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                               jnp.asarray(x), stride=stride, dilation=dil,
                               causal=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_conv_transpose_matches_torch():
    import torch
    rng = np.random.default_rng(1)
    B, T, Cin, Cout, ratio = 2, 13, 6, 4, 5
    K, stride = 2 * ratio, ratio
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)
    w = rng.normal(size=(K, Cout, Cin)).astype(np.float32)
    b = rng.normal(size=(Cout,)).astype(np.float32)

    tconv = torch.nn.ConvTranspose1d(Cin, Cout, K, stride=stride)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
        tconv.bias.copy_(torch.from_numpy(b))
        full = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    # audiocraft causal trim: cut padding_total from the right
    padding_total = K - stride
    want = full[:, :full.shape[1] - padding_total]

    got = np.asarray(ec.conv_transpose1d(
        {"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x),
        stride=stride, causal=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_lstm_matches_torch():
    import torch
    rng = np.random.default_rng(2)
    B, T, C = 2, 17, 8
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    tl = torch.nn.LSTM(C, C, num_layers=2)
    layers = []
    for i in range(2):
        layers.append({
            "w_ih": jnp.asarray(getattr(tl, f"weight_ih_l{i}").detach().numpy()),
            "w_hh": jnp.asarray(getattr(tl, f"weight_hh_l{i}").detach().numpy()),
            "b_ih": jnp.asarray(getattr(tl, f"bias_ih_l{i}").detach().numpy()),
            "b_hh": jnp.asarray(getattr(tl, f"bias_hh_l{i}").detach().numpy()),
        })
    with torch.no_grad():
        want, _ = tl(torch.from_numpy(x.transpose(1, 0, 2)))
        want = want.numpy().transpose(1, 0, 2) + x      # skip connection

    got = np.asarray(ec.lstm_stack({"layers": layers}, jnp.asarray(x),
                                   skip=True))
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.fixture(scope="module")
def codec():
    cfg = ec.EncodecConfig()
    params = ec.init_encodec(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_shapes_320x(codec):
    cfg, params = codec
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.normal(size=(1, 16000)).astype(np.float32)) * 0.1
    codes = ec.encode(params, wav, cfg)
    assert codes.shape == (1, 4, 50), codes.shape          # 1 s -> 50 frames
    assert int(codes.max()) < cfg.codebook_size and int(codes.min()) >= 0
    out = ec.decode(params, codes, cfg)
    assert out.shape == (1, 16000), out.shape


def test_encoder_causality(codec):
    """causal=True: frame t must not change when future samples change."""
    cfg, params = codec
    rng = np.random.default_rng(4)
    wav = rng.normal(size=(1, 3200)).astype(np.float32) * 0.1
    wav2 = wav.copy()
    wav2[:, 2240:] += 10.0                                  # frame 7 onward
    z1 = np.asarray(ec.encode_frames(params["encoder"], jnp.asarray(wav)[..., None], cfg))
    z2 = np.asarray(ec.encode_frames(params["encoder"], jnp.asarray(wav2)[..., None], cfg))
    # frames strictly before the perturbation must be identical
    cut = 2240 // cfg.hop_length
    np.testing.assert_allclose(z1[:, :cut], z2[:, :cut], atol=1e-6)
    assert np.abs(z1[:, cut:] - z2[:, cut:]).max() > 1e-3


def test_rvq_roundtrip(codec):
    cfg, params = codec
    rng = np.random.default_rng(5)
    # synthesize z as an exact sum of codebook entries -> codes must recover
    cbs = np.asarray(params["codebooks"], np.float32)
    idx = rng.integers(0, cfg.codebook_size, size=(cfg.n_q, 1, 20))
    z = sum(cbs[q][idx[q]] for q in range(cfg.n_q))        # [1, 20, D]
    codes = np.asarray(ec.rvq_encode(jnp.asarray(cbs), jnp.asarray(z)))
    z_hat = np.asarray(ec.rvq_decode(jnp.asarray(cbs), jnp.asarray(codes)))
    # greedy RVQ need not recover the exact indices, but the reconstruction
    # must be at least as close as the generating combination
    err = np.sum((z - z_hat) ** 2)
    assert err <= 1e-3, err
    # decode(encode(z)) is idempotent on its own reconstruction
    codes2 = np.asarray(ec.rvq_encode(jnp.asarray(cbs), jnp.asarray(z_hat)))
    np.testing.assert_array_equal(codes, codes2)
