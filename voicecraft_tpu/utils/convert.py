"""Checkpoint conversion: reference PyTorch VoiceCraft <-> voicecraft-tpu params.

Maps the reference ``state_dict`` layout (models/voicecraft.py:137-185,
models/modules/activation.py:233-246, models/modules/transformer.py:179-260)
onto this repo's functional parameter pytree.  Handles:

  * packed attention in-proj [3D, D] -> separate wq/wk/wv [D, D] (transposed
    to x@W layout),
  * per-layer params stacked along a leading L axis for lax.scan,
  * per-codebook embeddings / heads stacked along a leading K axis.

Also provides the reverse mapping (for round-trip tests) and a loader for the
reference's ``best_bundle.pth`` checkpoint format (steps/trainer.py:219-239).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig


def _np(t):
    """torch tensor / array-like -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def from_reference_state_dict(sd: dict, cfg: ModelConfig) -> dict:
    """Convert a reference VoiceCraft state_dict to a params pytree."""
    K, D, L = cfg.n_codebooks, cfg.d_model, cfg.num_decoder_layers
    g = lambda k: _np(sd[k])

    layers = {"ln1": {"g": [], "b": []},
              "attn": {"wq": [], "wk": [], "wv": [],
                       "bq": [], "bk": [], "bv": [],
                       "out": {"w": [], "b": []}},
              "ln2": {"g": [], "b": []},
              "ffn": {"lin1": {"w": [], "b": []}, "lin2": {"w": [], "b": []}}}
    for i in range(L):
        p = f"decoder.layers.{i}."
        inw = g(p + "self_attn.in_proj_weight")           # [3D, D]
        inb = g(p + "self_attn.in_proj_bias")             # [3D]
        layers["attn"]["wq"].append(inw[:D].T)
        layers["attn"]["wk"].append(inw[D:2 * D].T)
        layers["attn"]["wv"].append(inw[2 * D:].T)
        layers["attn"]["bq"].append(inb[:D])
        layers["attn"]["bk"].append(inb[D:2 * D])
        layers["attn"]["bv"].append(inb[2 * D:])
        layers["attn"]["out"]["w"].append(g(p + "self_attn.out_proj.weight").T)
        layers["attn"]["out"]["b"].append(g(p + "self_attn.out_proj.bias"))
        layers["ln1"]["g"].append(g(p + "norm1.weight"))
        layers["ln1"]["b"].append(g(p + "norm1.bias"))
        layers["ln2"]["g"].append(g(p + "norm2.weight"))
        layers["ln2"]["b"].append(g(p + "norm2.bias"))
        layers["ffn"]["lin1"]["w"].append(g(p + "linear1.weight").T)
        layers["ffn"]["lin1"]["b"].append(g(p + "linear1.bias"))
        layers["ffn"]["lin2"]["w"].append(g(p + "linear2.weight").T)
        layers["ffn"]["lin2"]["b"].append(g(p + "linear2.bias"))

    import jax
    stack = jax.tree.map(lambda xs: jnp.asarray(np.stack(xs, 0)), layers,
                         is_leaf=lambda x: isinstance(x, list))

    heads = {
        "w1": jnp.asarray(np.stack(
            [g(f"predict_layer.{k}.0.weight").T for k in range(K)], 0)),
        "b1": jnp.asarray(np.stack(
            [g(f"predict_layer.{k}.0.bias") for k in range(K)], 0)),
        "w2": jnp.asarray(np.stack(
            [g(f"predict_layer.{k}.2.weight").T for k in range(K)], 0)),
        "b2": jnp.asarray(np.stack(
            [g(f"predict_layer.{k}.2.bias") for k in range(K)], 0)),
    }

    return {
        "text_emb": {"weight": jnp.asarray(g("text_embedding.word_embeddings.weight"))},
        "audio_emb": jnp.asarray(np.stack(
            [g(f"audio_embedding.{k}.word_embeddings.weight")
             for k in range(K)], 0)),
        "mask_emb": jnp.asarray(g("mask_embedding")),
        "alpha_text": jnp.asarray(g("text_positional_embedding.alpha").reshape(())),
        "alpha_audio": jnp.asarray(g("audio_positional_embedding.alpha").reshape(())),
        "decoder": {
            "layers": stack,
            "final_ln": {"g": jnp.asarray(g("decoder.norm.weight")),
                         "b": jnp.asarray(g("decoder.norm.bias"))},
        },
        "heads": heads,
    }


def to_reference_state_dict(params: dict, cfg: ModelConfig) -> dict:
    """Inverse of :func:`from_reference_state_dict` (numpy values)."""
    K, D, L = cfg.n_codebooks, cfg.d_model, cfg.num_decoder_layers
    if "mtp_heads" in params:
        import logging
        logging.getLogger(__name__).warning(
            "exporting to the reference format drops the MTP heads "
            "(speculative decoding); keep the orbax checkpoint if you "
            "need them")
    out = {}
    out["text_embedding.word_embeddings.weight"] = _np(params["text_emb"]["weight"])
    for k in range(K):
        out[f"audio_embedding.{k}.word_embeddings.weight"] = _np(params["audio_emb"][k])
    out["mask_embedding"] = _np(params["mask_emb"])
    out["text_positional_embedding.alpha"] = _np(params["alpha_text"]).reshape(1)
    out["audio_positional_embedding.alpha"] = _np(params["alpha_audio"]).reshape(1)
    lay = params["decoder"]["layers"]
    for i in range(L):
        p = f"decoder.layers.{i}."
        inw = np.concatenate([_np(lay["attn"]["wq"][i]).T,
                              _np(lay["attn"]["wk"][i]).T,
                              _np(lay["attn"]["wv"][i]).T], axis=0)
        inb = np.concatenate([_np(lay["attn"]["bq"][i]),
                              _np(lay["attn"]["bk"][i]),
                              _np(lay["attn"]["bv"][i])], axis=0)
        out[p + "self_attn.in_proj_weight"] = inw
        out[p + "self_attn.in_proj_bias"] = inb
        out[p + "self_attn.out_proj.weight"] = _np(lay["attn"]["out"]["w"][i]).T
        out[p + "self_attn.out_proj.bias"] = _np(lay["attn"]["out"]["b"][i])
        out[p + "norm1.weight"] = _np(lay["ln1"]["g"][i])
        out[p + "norm1.bias"] = _np(lay["ln1"]["b"][i])
        out[p + "norm2.weight"] = _np(lay["ln2"]["g"][i])
        out[p + "norm2.bias"] = _np(lay["ln2"]["b"][i])
        out[p + "linear1.weight"] = _np(lay["ffn"]["lin1"]["w"][i]).T
        out[p + "linear1.bias"] = _np(lay["ffn"]["lin1"]["b"][i])
        out[p + "linear2.weight"] = _np(lay["ffn"]["lin2"]["w"][i]).T
        out[p + "linear2.bias"] = _np(lay["ffn"]["lin2"]["b"][i])
    out["decoder.norm.weight"] = _np(params["decoder"]["final_ln"]["g"])
    out["decoder.norm.bias"] = _np(params["decoder"]["final_ln"]["b"])
    for k in range(K):
        out[f"predict_layer.{k}.0.weight"] = _np(params["heads"]["w1"][k]).T
        out[f"predict_layer.{k}.0.bias"] = _np(params["heads"]["b1"][k])
        out[f"predict_layer.{k}.2.weight"] = _np(params["heads"]["w2"][k]).T
        out[f"predict_layer.{k}.2.bias"] = _np(params["heads"]["b2"][k])
    return out


def load_reference_bundle(path: str):
    """Load a reference ``best_bundle.pth`` (steps/trainer.py:219-239).

    Returns (ModelConfig, params, phn2num).  Requires torch (CPU) for
    unpickling.
    """
    import torch
    bundle = torch.load(path, map_location="cpu", weights_only=False)
    args = bundle["config"]
    cfg = ModelConfig.from_dict(vars(args) if not isinstance(args, dict) else args)
    params = from_reference_state_dict(bundle["model"], cfg)
    return cfg, params, bundle.get("phn2num")
