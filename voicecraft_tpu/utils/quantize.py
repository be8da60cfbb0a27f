"""Weight-only fp8 quantization for serving.

Batch-1 autoregressive decode is HBM-bandwidth-bound: every generated token
reads every decoder weight.  Storing matmul weights as float8_e4m3 with
per-output-channel bf16 scales halves the bytes per step; the dequant
(convert + column scale) fuses into the dot's producer on TPU.  Embeddings,
layernorms, and biases stay bf16 (gathers/vectors — negligible traffic).

Exactness: per-output-column scaling commutes with the contraction, so
  dot(x, w) == dot(x, w/s) * s
up to fp8 rounding of w.  Default inference stays bf16; fp8 is opt-in
(--fp8 in bench.py / tts_cli.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FP8_MAX = 448.0  # float8_e4m3fn max normal


def _quantize_matrix(w: jnp.ndarray) -> dict:
    """w [..., in, out] -> {'q': fp8, 'scale': [..., 1, out] bf16}."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax / FP8_MAX, 1e-12)
    q = (wf / scale).astype(jnp.float8_e4m3fn)
    return {"q": q, "scale": scale.astype(jnp.bfloat16)}


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and "scale" in w


def dequant_dot(x: jnp.ndarray, w, preferred=jnp.float32) -> jnp.ndarray:
    """x @ w for plain or quantized w; fp8 path scales after the dot."""
    if not is_quantized(w):
        return jnp.dot(x, w.astype(x.dtype), preferred_element_type=preferred)
    y = jnp.dot(x, w["q"].astype(x.dtype), preferred_element_type=preferred)
    return y * w["scale"].reshape(w["scale"].shape[-1]).astype(y.dtype)


def quantize_decoder_fp8(params: dict, pack_qkv: bool = False) -> dict:
    """Quantize the decoder matmul weights + prediction heads of a voicecraft
    params pytree.  Returns a new pytree (embeddings/norms untouched).

    ``pack_qkv`` fuses wq|wk|wv into one [L, D, 3D] matrix (and the biases
    into bqkv) so decode does one dot instead of three — fewer op boundaries
    for the latency-bound batch-1 step.  Column-wise fp8 scales commute with
    the concat, so packing before quantizing is exact."""
    out = dict(params)
    dec = dict(params["decoder"])
    layers = dict(dec["layers"])
    attn = dict(layers["attn"])
    if pack_qkv:
        import jax.numpy as jnp
        wqkv = jnp.concatenate([layers["attn"][k]
                                for k in ("wq", "wk", "wv")], axis=-1)
        attn = {"wqkv": _quantize_matrix(wqkv),
                "bqkv": jnp.concatenate(
                    [layers["attn"][b] for b in ("bq", "bk", "bv")], axis=-1),
                "out": dict(layers["attn"]["out"])}
    else:
        for k in ("wq", "wk", "wv"):
            attn[k] = _quantize_matrix(layers["attn"][k])
        attn["out"] = dict(layers["attn"]["out"])
    attn["out"] = {"w": _quantize_matrix(attn["out"]["w"]),
                   "b": attn["out"]["b"]}
    layers["attn"] = attn
    # the first projection's key name encodes the activation (see
    # models/transformer.py _FFN_KEY); quantize whichever variant is present
    ffn = {k: {"w": _quantize_matrix(v["w"]), "b": v["b"]}
           for k, v in layers["ffn"].items()}
    layers["ffn"] = ffn
    dec["layers"] = layers
    out["decoder"] = dec
    out["heads"] = {
        "w1": _quantize_matrix(params["heads"]["w1"]),
        "b1": params["heads"]["b1"],
        "w2": _quantize_matrix(params["heads"]["w2"]),
        "b2": params["heads"]["b2"],
    }
    if "mtp_heads" in params:
        out["mtp_heads"] = {
            "w1": _quantize_matrix(params["mtp_heads"]["w1"]),
            "b1": params["mtp_heads"]["b1"],
            "w2": _quantize_matrix(params["mtp_heads"]["w2"]),
            "b2": params["mtp_heads"]["b2"],
        }
    return out
