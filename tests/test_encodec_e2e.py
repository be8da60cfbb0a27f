"""End-to-end EnCodec parity on REAL audio against a torch oracle that
reproduces audiocraft's forward semantics and state-dict layout
(tests/oracle_encodec.py).

This is the full-stack proof the round-1 review asked for: real waveform ->
torch oracle (weight-norm convs, SEANet padding, SLSTM, RVQ) vs the same
weights fed through utils/convert_encodec.from_audiocraft_state_dict into
the JAX codec (models/encodec.py).  Codes must match bit-exactly; decoded
waveforms must match to float tolerance.  Any divergence in padding,
activation ordering, weight-norm folding, sequential-index mapping, LSTM
gate math, or RVQ distance computation fails here.

Reference black-box usage: /root/reference/data/tokenizer.py:101-133.
"""

import dataclasses

import numpy as np
import pytest
import torch

from voicecraft_tpu.models import encodec as ec
from voicecraft_tpu.utils.audio import read_wav
from voicecraft_tpu.utils.convert_encodec import from_audiocraft_state_dict

from oracle_encodec import EncodecModel, OracleConfig

DEMO_WAV = "/root/reference/demo/5895_34622_000026_000002.wav"


def _jax_cfg(ocfg: OracleConfig) -> ec.EncodecConfig:
    return ec.EncodecConfig(**dataclasses.asdict(ocfg))


def _real_audio(n_samples: int) -> np.ndarray:
    wav, sr = read_wav(DEMO_WAV)
    assert sr == 16000
    return wav[:, 8000:8000 + n_samples].astype(np.float32)  # skip silence


def _snr_db(ref: np.ndarray, x: np.ndarray) -> float:
    err = np.sum((ref - x) ** 2)
    sig = np.sum(ref ** 2)
    return 10.0 * np.log10(sig / max(err, 1e-30))


@pytest.mark.parametrize("name,ocfg,n_samples", [
    # the giga_4cb2048 architecture (README.md:198: 56M params, 4 codebooks
    # x 2048, 16 kHz, 320x downsample); causal + reflect pads + true skips
    ("giga", OracleConfig(), 19200),
    # shortcut-conv + non-causal split padding variant, smaller dims
    ("noncausal_shortcut",
     OracleConfig(dimension=32, n_filters=8, ratios=(4, 2), lstm=1,
                  causal=False, true_skip=False, n_q=2, codebook_size=64),
     4096),
])
def test_encode_codes_bit_exact_on_real_audio(name, ocfg, n_samples):
    torch.manual_seed(0)
    model = EncodecModel(ocfg).eval()
    cfg = _jax_cfg(ocfg)
    params = from_audiocraft_state_dict(model.state_dict(), cfg)

    wav = _real_audio(n_samples)
    want = model.encode(torch.from_numpy(wav)[:, None, :]).numpy()

    import jax.numpy as jnp
    got = np.asarray(ec.encode(params, jnp.asarray(wav), cfg))
    assert got.shape == want.shape, (got.shape, want.shape)
    mismatch = got != want
    assert not mismatch.any(), (
        f"{name}: {mismatch.sum()}/{mismatch.size} code mismatches, "
        f"first at {np.argwhere(mismatch)[:5].tolist()}")


def test_decode_waveform_matches_oracle():
    torch.manual_seed(1)
    ocfg = OracleConfig()
    model = EncodecModel(ocfg).eval()
    cfg = _jax_cfg(ocfg)
    params = from_audiocraft_state_dict(model.state_dict(), cfg)

    wav = _real_audio(19200)
    codes_t = model.encode(torch.from_numpy(wav)[:, None, :])
    want = model.decode(codes_t)[:, 0].numpy()

    import jax.numpy as jnp
    got = np.asarray(ec.decode(params, jnp.asarray(codes_t.numpy()), cfg))
    assert got.shape == want.shape, (got.shape, want.shape)
    snr = _snr_db(want, got)
    assert snr > 70.0, f"decode diverges from oracle: SNR {snr:.1f} dB"


def test_bucketed_roundtrip_matches_unbucketed():
    """The jitted bucketed entry points (the production path) must agree
    with the direct functional path on an odd-length real clip."""
    torch.manual_seed(2)
    ocfg = OracleConfig(dimension=32, n_filters=8, ratios=(4, 2), lstm=1,
                        n_q=2, codebook_size=64)
    model = EncodecModel(ocfg).eval()
    cfg = _jax_cfg(ocfg)
    params = from_audiocraft_state_dict(model.state_dict(), cfg)

    wav = _real_audio(5000)  # not a multiple of the hop (8)
    import jax.numpy as jnp
    codes_direct = np.asarray(ec.encode(params, jnp.asarray(wav), cfg))
    codes_bucket = ec.encode_bucketed(params, wav, cfg, bucket_samples=2048)
    n = codes_bucket.shape[-1]
    np.testing.assert_array_equal(codes_bucket, codes_direct[..., :n])
    assert n == -(-5000 // cfg.hop_length)

    wav_direct = np.asarray(ec.decode(params, jnp.asarray(codes_bucket), cfg))
    wav_bucket = ec.decode_bucketed(params, codes_bucket, cfg,
                                    bucket_frames=128)
    assert wav_bucket.shape[-1] == n * cfg.hop_length
    np.testing.assert_allclose(wav_bucket, wav_direct[..., :wav_bucket.shape[-1]],
                               rtol=1e-4, atol=1e-5)


def test_real_checkpoint_roundtrip_if_present():
    """Opt-in: when the real giga codec checkpoint is available (env
    VOICECRAFT_ENCODEC_CKPT or the reference's pretrained dir), load it
    through the converter and sanity-check codec quality on real audio:
    encode/decode roundtrip of speech should reconstruct with decent SNR and
    codes must cover a wide range of the 2048-entry codebooks."""
    import os
    candidates = [os.environ.get("VOICECRAFT_ENCODEC_CKPT", ""),
                  "/root/reference/pretrained_models/encodec_4cb2048_giga.th"]
    path = next((p for p in candidates if p and os.path.exists(p)), None)
    if path is None:
        pytest.skip("real encodec checkpoint not available")
    from voicecraft_tpu.utils.convert_encodec import load_audiocraft_checkpoint
    cfg, params = load_audiocraft_checkpoint(path)
    wav = _real_audio(32000)
    codes = ec.encode_bucketed(params, wav, cfg)
    assert codes.shape[1] == cfg.n_q
    assert len(np.unique(codes[0, 0])) > 20  # not collapsed
    out = ec.decode_bucketed(params, codes, cfg)
    n = min(out.shape[-1], wav.shape[-1])
    snr = _snr_db(wav[..., :n], out[..., :n])
    assert snr > 3.0, f"real-checkpoint roundtrip SNR too low: {snr:.1f} dB"
