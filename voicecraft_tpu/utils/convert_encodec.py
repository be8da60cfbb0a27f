"""Convert audiocraft EnCodec checkpoints to voicecraft-tpu codec params.

The reference loads its codec via ``CompressionSolver.model_from_checkpoint``
(data/tokenizer.py:109-121, checkpoint ``encodec_4cb2048_giga.th``).  This
converter reads that torch checkpoint directly: folds weight-norm
(g * v / ||v||), maps the SEANet sequential indices onto the functional
pytree in models/encodec.py, and pulls the architecture hyperparameters from
the embedded ``xp.cfg`` when present.

Handles both old-style weight-norm keys (``weight_g``/``weight_v``, torch
<= 2.0 as pinned by the reference) and parametrize-style keys
(``parametrizations.weight.original0/1``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.encodec import EncodecConfig


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def _fold_weight_norm(sd: dict, prefix: str) -> np.ndarray:
    """Materialise the conv weight at ``prefix`` (e.g. 'encoder.model.0.conv.conv')."""
    if prefix + ".weight" in sd:
        return _np(sd[prefix + ".weight"])
    if prefix + ".weight_g" in sd:
        g = _np(sd[prefix + ".weight_g"])
        v = _np(sd[prefix + ".weight_v"])
    elif prefix + ".parametrizations.weight.original0" in sd:
        g = _np(sd[prefix + ".parametrizations.weight.original0"])
        v = _np(sd[prefix + ".parametrizations.weight.original1"])
    else:
        raise KeyError(prefix)
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _conv(sd, prefix):
    """torch Conv1d [Cout, Cin, K] -> {'w': [K, Cin, Cout], 'b': [Cout]}."""
    w = _fold_weight_norm(sd, prefix)
    return {"w": jnp.asarray(w.transpose(2, 1, 0)),
            "b": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _convtr(sd, prefix):
    """torch ConvTranspose1d [Cin, Cout, K] -> {'w': [K, Cout, Cin], 'b'}."""
    w = _fold_weight_norm(sd, prefix)
    return {"w": jnp.asarray(w.transpose(2, 1, 0)),
            "b": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _lstm(sd, prefix, n_layers):
    layers = []
    for i in range(n_layers):
        layers.append({
            "w_ih": jnp.asarray(_np(sd[f"{prefix}.weight_ih_l{i}"])),
            "w_hh": jnp.asarray(_np(sd[f"{prefix}.weight_hh_l{i}"])),
            "b_ih": jnp.asarray(_np(sd[f"{prefix}.bias_ih_l{i}"])),
            "b_hh": jnp.asarray(_np(sd[f"{prefix}.bias_hh_l{i}"])),
        })
    return {"layers": layers}


def _resnet(sd, prefix, cfg: EncodecConfig):
    # SEANetResnetBlock.block = [act, conv, act, conv] -> indices 1, 3
    p = {"conv1": _conv(sd, f"{prefix}.block.1.conv.conv"),
         "conv2": _conv(sd, f"{prefix}.block.3.conv.conv")}
    if not cfg.true_skip:
        p["shortcut"] = _conv(sd, f"{prefix}.shortcut.conv.conv")
    return p


def config_from_xp_cfg(xp_cfg) -> EncodecConfig:
    """Build EncodecConfig from an audiocraft checkpoint's xp.cfg."""
    def get(path, default):
        node = xp_cfg
        for part in path.split("."):
            if node is None:
                return default
            node = node.get(part) if hasattr(node, "get") else getattr(node, part, None)
        return default if node is None else node

    return EncodecConfig(
        channels=int(get("channels", 1)),
        dimension=int(get("seanet.dimension", 128)),
        n_filters=int(get("seanet.n_filters", 64)),
        ratios=tuple(get("seanet.ratios", [8, 5, 4, 2])),
        n_residual_layers=int(get("seanet.n_residual_layers", 1)),
        lstm=int(get("seanet.lstm", 2)),
        kernel_size=int(get("seanet.kernel_size", 7)),
        last_kernel_size=int(get("seanet.last_kernel_size", 7)),
        residual_kernel_size=int(get("seanet.residual_kernel_size", 3)),
        dilation_base=int(get("seanet.dilation_base", 2)),
        compress=int(get("seanet.compress", 2)),
        causal=bool(get("seanet.causal", True)),
        pad_mode=str(get("seanet.pad_mode", "reflect")),
        true_skip=bool(get("seanet.true_skip", True)),
        n_q=int(get("rvq.n_q", 4)),
        codebook_size=int(get("rvq.bins", 2048)),
        sample_rate=int(get("sample_rate", 16000)),
    )


def from_audiocraft_state_dict(sd: dict, cfg: EncodecConfig) -> dict:
    """Map an audiocraft EncodecModel state_dict onto the functional pytree."""
    n_stages = len(cfg.ratios)
    R = cfg.n_residual_layers
    per_stage = R + 2  # blocks + ELU + conv

    # ---- encoder (audiocraft SEANetEncoder sequential indices) ----
    enc_stages = []
    for s in range(n_stages):
        base = 1 + s * per_stage
        blocks = [_resnet(sd, f"encoder.model.{base + j}", cfg)
                  for j in range(R)]
        down = _conv(sd, f"encoder.model.{base + R + 1}.conv.conv")
        enc_stages.append({"blocks": blocks, "down": down})
    lstm_idx = 1 + n_stages * per_stage
    encoder = {
        "init": _conv(sd, "encoder.model.0.conv.conv"),
        "stages": enc_stages,
        "lstm": _lstm(sd, f"encoder.model.{lstm_idx}.lstm", cfg.lstm),
        "final": _conv(sd, f"encoder.model.{lstm_idx + 2}.conv.conv"),
    }

    # ---- decoder ----
    dec_stages = []
    for s in range(n_stages):
        base = 2 + s * per_stage  # after init conv (0) and lstm (1)
        up = _convtr(sd, f"decoder.model.{base + 1}.convtr.convtr")
        blocks = [_resnet(sd, f"decoder.model.{base + 2 + j}", cfg)
                  for j in range(R)]
        dec_stages.append({"up": up, "blocks": blocks})
    final_idx = 2 + n_stages * per_stage + 1
    decoder = {
        "init": _conv(sd, "decoder.model.0.conv.conv"),
        "lstm": _lstm(sd, "decoder.model.1.lstm", cfg.lstm),
        "stages": dec_stages,
        "final": _conv(sd, f"decoder.model.{final_idx}.conv.conv"),
    }

    codebooks = np.stack(
        [_np(sd[f"quantizer.vq.layers.{q}._codebook.embed"])
         for q in range(cfg.n_q)], axis=0)

    return {"encoder": encoder, "decoder": decoder,
            "codebooks": jnp.asarray(codebooks)}


def load_audiocraft_checkpoint(path: str):
    """Load an audiocraft compression checkpoint (.th) -> (cfg, params)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    xp_cfg = ckpt.get("xp.cfg")
    sd = ckpt.get("best_state", ckpt)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    cfg = config_from_xp_cfg(xp_cfg) if xp_cfg is not None else EncodecConfig()
    return cfg, from_audiocraft_state_dict(sd, cfg)
