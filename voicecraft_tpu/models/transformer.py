"""Pre-norm transformer decoder stack (functional JAX, stacked-layer scan).

Mirrors the reference's TransformerEncoderLayer/TransformerEncoder used with
causal masks (reference models/modules/transformer.py:179-488, instantiated at
models/voicecraft.py:166-179): pre-norm, plain LayerNorm (eps 1e-5), MHA with
packed-equivalent q/k/v projections, ReLU FFN of width 4*d_model, final
LayerNorm.

TPU-first design choices:
  - Per-layer params are STACKED along a leading L axis and the stack is
    applied with ``lax.scan`` — one compiled layer body regardless of depth.
  - KV cache is a preallocated slab [L, 2, B, S_max, H, Dh] written with
    ``dynamic_update_slice`` — replaces the reference's unbounded
    ``past = cat(past, present)`` realloc every decode step
    (models/voicecraft.py:1081).
  - Activations run in the config compute dtype (bf16); layernorm + softmax
    accumulate in f32.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..ops.attention import (mha, decode_attention, decode_attention_self,
                             decode_attention_self_block,
                             decode_attention_multi,
                             decode_attention_multi_block)
from . import scaling


# ---- init --------------------------------------------------------------------

def _linear_init(key, fan_in, fan_out, dtype):
    """Kaiming-uniform as in torch.nn.Linear defaults (matches the reference's
    untouched Linear inits)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _norm_init(norm: str, d_model: int, dtype):
    """Parameter pytree per norm family; the STRUCTURE encodes the choice
    (static under jit), so every forward variant dispatches through
    :func:`layer_norm` with no signature changes.  Mirrors the reference's
    ``layer_norm_cls`` argument (reference transformer.py:179-265; norm
    classes :18-176)."""
    if norm == "layernorm":
        return {"g": jnp.ones((d_model,), dtype),
                "b": jnp.zeros((d_model,), dtype)}
    # the reference family wrappers construct their inner _BasicNorm with
    # eps=layer_norm_eps=1e-5 (reference transformer.py:112-121, 134-159,
    # 245-252) — NOT the icefall library default 0.25 (which stays the
    # default of scaling.basic_norm_init itself)
    if norm == "basicnorm":
        return scaling.basic_norm_init(eps=1e-5, dtype=dtype)
    if norm == "balancedbasicnorm":
        return {"log_eps_bal":
                scaling.basic_norm_init(eps=1e-5, dtype=dtype)["log_eps"]}
    if norm == "identity":
        return {}
    raise ValueError(f"unknown norm {norm!r}; expected layernorm | basicnorm "
                     "| balancedbasicnorm | identity")


# FFN first-projection key name encodes the activation (static pytree
# structure, same trick as _norm_init; reference transformer.py:691-697
# _get_activation_fn plus the icefall activations in scaling.py)
_FFN_ACTS = {
    "lin1": jax.nn.relu,                      # reference transformer.py:188
    "lin1_gelu": lambda h: jax.nn.gelu(h, approximate=False),
    "lin1_dsw": scaling.double_swish,
    "lin1_bdsw": scaling.balanced_double_swish,
}
_FFN_KEY = {"relu": "lin1", "gelu": "lin1_gelu", "doubleswish": "lin1_dsw",
            "balanceddoubleswish": "lin1_bdsw"}


def init_layer(key, d_model: int, ffn_dim: int, dtype=jnp.float32,
               norm: str = "layernorm", activation: str = "relu"):
    ks = jax.random.split(key, 6)
    # attention in-proj uses torch MultiheadAttention's xavier_uniform_ on the
    # packed [3D, D] matrix (reference activation.py uses _in_proj_packed);
    # we keep separate q/k/v with the same distribution.
    limit = jnp.sqrt(6.0 / (d_model + 3 * d_model))
    qkv = jax.random.uniform(ks[0], (d_model, 3 * d_model), dtype, -limit, limit)
    if activation not in _FFN_KEY:
        raise ValueError(f"unknown activation {activation!r}; expected one of "
                         f"{sorted(_FFN_KEY)}")
    # the reference family forces the pre-FFN norm to BalancedBasicNorm when
    # layer_norm_cls is IdentityNorm (reference transformer.py:245-252) —
    # only the pre-attention norm is actually the identity
    norm2 = "balancedbasicnorm" if norm == "identity" else norm
    return {
        "ln1": _norm_init(norm, d_model, dtype),
        "attn": {
            "wq": qkv[:, :d_model],
            "wk": qkv[:, d_model:2 * d_model],
            "wv": qkv[:, 2 * d_model:],
            "bq": jnp.zeros((d_model,), dtype),
            "bk": jnp.zeros((d_model,), dtype),
            "bv": jnp.zeros((d_model,), dtype),
            "out": _linear_init(ks[1], d_model, d_model, dtype),
        },
        "ln2": _norm_init(norm2, d_model, dtype),
        "ffn": {
            _FFN_KEY[activation]: _linear_init(ks[2], d_model, ffn_dim, dtype),
            "lin2": _linear_init(ks[3], ffn_dim, d_model, dtype),
        },
    }


def init_stack(key, num_layers: int, d_model: int, ffn_dim: int,
               dtype=jnp.float32, norm: str = "layernorm",
               activation: str = "relu"):
    keys = jax.random.split(key, num_layers + 1)
    layers = [init_layer(k, d_model, ffn_dim, dtype, norm, activation)
              for k in keys[:-1]]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)
    # the stack-final norm follows the layer norm choice (the reference
    # hard-codes LayerNorm there, models/voicecraft.py:175 — but a mixed
    # BasicNorm/LayerNorm stack is an untrained configuration either way)
    # EXCEPT for "identity": the reference encoder's final norm is supplied
    # by the caller independently of layer_norm_cls and VoiceCraft always
    # passes LayerNorm (voicecraft.py:175) — identity here would delete the
    # final norm outright, a configuration the reference cannot express
    final = "layernorm" if norm == "identity" else norm
    return {"layers": stacked, "final_ln": _norm_init(final, d_model, dtype)}


# ---- primitives ---------------------------------------------------------------

def layer_norm(p, x, eps: float = 1e-5, train: bool = False):
    """Norm dispatch on param STRUCTURE (static under jit; see _norm_init):
    {"g","b"} -> LayerNorm, {"log_eps"} -> BasicNorm, {"log_eps_bal"} ->
    BalancedBasicNorm, {} -> IdentityNorm.  ``train`` enables BasicNorm's
    expected-ballast eps repair (scaling.basic_norm); the training stack
    passes it, decode/prefill paths stay in eval form."""
    if "log_eps" in p:
        return scaling.basic_norm(x, p["log_eps"], train=train)
    if "log_eps_bal" in p:
        return scaling.balanced_basic_norm(x, p["log_eps_bal"], train=train)
    if not p:
        return x  # IdentityNorm (reference transformer.py:156-176)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def adaptive_layer_norm_init(key, d_model: int, dtype=jnp.float32,
                             norm: str = "layernorm"):
    """AdaptiveLayerNorm params (reference transformer.py:84-115): a
    d_model -> 2*d_model projection of a conditioning embedding producing
    per-position scale/shift around an inner norm.  Unused by the VoiceCraft
    configs (no conditioning embedding exists in the model) — provided for
    family completeness; see :func:`adaptive_layer_norm`."""
    return {"project": _linear_init(key, d_model, 2 * d_model, dtype),
            "norm": _norm_init(norm, d_model, dtype)}


def adaptive_layer_norm(p, x, embedding):
    """weight * norm(x) + bias with (weight, bias) = split(proj(embedding))
    (reference transformer.py:96-115)."""
    wb = _proj(embedding, p["project"]["w"], p["project"]["b"])
    d = wb.shape[-1] // 2
    weight, bias = wb[..., :d], wb[..., d:]
    return weight * layer_norm(p["norm"], x) + bias


def ffn_block(ffn_p, h, dropout: float = 0.0, rng=None, remat_name=None):
    """lin1 -> activation -> lin2, with the activation chosen by the first
    projection's key name (static pytree structure; see _FFN_KEY)."""
    key = next(k for k in _FFN_ACTS if k in ffn_p)
    h = _proj(h, ffn_p[key]["w"], ffn_p[key]["b"])
    h = _FFN_ACTS[key](h)
    if remat_name is not None:
        from jax.ad_checkpoint import checkpoint_name
        h = checkpoint_name(h, remat_name)
    h = _dropout(h, dropout, rng)
    return _proj(h, ffn_p["lin2"]["w"], ffn_p["lin2"]["b"])


def _proj(x, w, b):
    if isinstance(w, dict):  # weight-only fp8 (utils/quantize.py)
        y = jnp.dot(x, w["q"].astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
        y = y * w["scale"].reshape(1, -1).astype(x.dtype)
        return y + b.astype(x.dtype)
    return jnp.dot(x, w.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype) + b.astype(x.dtype)


def qkv_proj(attn_p, h):
    """q/k/v projections; supports the packed single-dot layout produced by
    utils/quantize.py(pack_qkv=True) — one [D, 3D] matmul instead of three,
    fewer op boundaries on the latency-bound batch-1 decode step."""
    if "wqkv" in attn_p:
        qkv = _proj(h, attn_p["wqkv"], attn_p["bqkv"])
        return jnp.split(qkv, 3, axis=-1)
    return (_proj(h, attn_p["wq"], attn_p["bq"]),
            _proj(h, attn_p["wk"], attn_p["bk"]),
            _proj(h, attn_p["wv"], attn_p["bv"]))


def _dropout(x, rate, rng):
    if rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


# ---- full-sequence forward (training / prefill) --------------------------------

def apply_layer(p, x, bias, nhead: int, dropout: float = 0.0, rng=None):
    """One pre-norm layer: x + SA(LN(x)) then + FFN(LN(x)).
    (reference transformer.py:266-388, norm_first path).

    ``bias`` is either an additive-bias array for the dense path or a
    callable attn_fn(q, k, v, dropout_rng) (e.g. chunked/flash attention)."""
    from jax.ad_checkpoint import checkpoint_name
    train = rng is not None
    rngs = jax.random.split(rng, 4) if rng is not None else (None,) * 4
    h = layer_norm(p["ln1"], x, train=train)
    q, k, v = qkv_proj(p["attn"], h)
    if callable(bias):
        a = bias(q, k, v, rngs[0])
    else:
        a = mha(q, k, v, bias, nhead, dropout_rate=dropout, rng=rngs[0])
    # remat-policy anchors (see apply_stack): naming is free unless a
    # save_only_these_names policy elects the tensor
    a = checkpoint_name(a, "attn_out")
    a = _proj(a, p["attn"]["out"]["w"], p["attn"]["out"]["b"])
    x = x + _dropout(a, dropout, rngs[1])

    h = layer_norm(p["ln2"], x, train=train)
    h = ffn_block(p["ffn"], h, dropout, rngs[2], remat_name="ffn1")
    x = x + _dropout(h, dropout, rngs[3])
    return x


def apply_stack(params, x, bias, nhead: int, dropout: float = 0.0, rng=None,
                remat: bool = False, remat_policy: str = "full"):
    """Run the full stack over [B, S, D] with additive bias [*, 1, S, S].

    ``remat_policy`` (only read when ``remat``): "full" saves nothing per
    layer (whole body recomputed in the backward — +1 forward of recompute);
    "dots" saves every matmul output (qkv/out/ffn projections; for chunked
    attention also the per-chunk outputs, whose inner checkpoint still
    rematerialises the softmax internals) so the backward recomputes only
    elementwise ops.  See config.ModelConfig.train_remat.
    """
    n_layers = jax.tree.leaves(params["layers"])[0].shape[0]
    if rng is not None:
        layer_rngs = jax.random.split(rng, n_layers)
    else:
        layer_rngs = jnp.zeros((n_layers, 2), dtype=jnp.uint32)

    def body(carry, scanned):
        layer_p, lrng = scanned
        r = lrng if rng is not None else None
        return apply_layer(layer_p, carry, bias, nhead, dropout, r), None

    if remat:
        pols = jax.checkpoint_policies
        policies = {
            "full": None,       # jax.checkpoint default: save nothing
            "dots": pols.dots_with_no_batch_dims_saveable,
            # save the pre-out-proj attention result: with chunked train
            # attention (itself inner-checkpointed) this cuts the outer
            # remat's second attention forward — B*S*D bf16 per layer
            "attn": pols.save_only_these_names("attn_out"),
            # + the 4*D ffn hidden: kills most remaining recompute FLOPs
            "attn_ffn1": pols.save_only_these_names("attn_out", "ffn1"),
        }
        if remat_policy not in policies:
            raise ValueError(
                f"unknown remat_policy {remat_policy!r}; expected one of "
                f"{sorted(policies)} (or 'none' gated off by the caller, "
                "see config.ModelConfig.train_remat)")
        body_fn = jax.checkpoint(body, policy=policies[remat_policy])
    else:
        body_fn = body
    x, _ = jax.lax.scan(body_fn, x, (params["layers"], layer_rngs))
    return layer_norm(params["final_ln"], x, train=rng is not None)


# ---- prefill / decode with KV slab ---------------------------------------------

def init_kv_cache(num_layers: int, batch: int, s_max: int, nhead: int,
                  head_dim: int, dtype=jnp.bfloat16):
    """Slab cache [L, 2, B, S_max, H, Dh] (k at index 0, v at index 1)."""
    return jnp.zeros((num_layers, 2, batch, s_max, nhead, head_dim), dtype)


def prefill(params, x, bias, cache, nhead: int):
    """Full-sequence forward that also fills cache[:, :, :, :S].

    x: [B, S, D]; returns (hidden [B, S, D], cache).  ``bias`` is an
    additive-bias array for the dense path or a callable attn_fn(q, k, v)
    (e.g. ops.flash_attention.flash_prefix_attention for long prompts)."""
    B, S, D = x.shape
    H = nhead
    Dh = D // H

    def body(carry, layer_p):
        h_in = carry
        h = layer_norm(layer_p["ln1"], h_in)
        q, k, v = qkv_proj(layer_p["attn"], h)
        a = bias(q, k, v) if callable(bias) else mha(q, k, v, bias, nhead)
        a = _proj(a, layer_p["attn"]["out"]["w"], layer_p["attn"]["out"]["b"])
        x1 = h_in + a
        h2 = layer_norm(layer_p["ln2"], x1)
        h2 = ffn_block(layer_p["ffn"], h2)
        out = x1 + h2
        kv = jnp.stack([k.reshape(B, S, H, Dh), v.reshape(B, S, H, Dh)], axis=0)
        return out, kv

    x, kvs = jax.lax.scan(body, x, params["layers"])
    # kvs: [L, 2, B, S, H, Dh] -> write into slab at [.., :S, ..]
    cache = jax.lax.dynamic_update_slice(
        cache, kvs.astype(cache.dtype), (0, 0, 0, 0, 0, 0))
    return layer_norm(params["final_ln"], x), cache


def decode_step(params, x_t, cache, pos, nhead: int,
                x_len=None, x_pad: int | None = None):
    """One autoregressive step.

    x_t: [B, 1, D] new-token embedding (token+positional already applied).
    pos: scalar int32 — index where this token's k/v are written; attention
    sees cache[0 .. pos] inclusive, minus text pad slots [x_len, x_pad).
    Returns (hidden [B, 1, D], new cache).
    """
    L, _, B, S_max, H, Dh = cache.shape

    def body(carry, scanned):
        h_in = carry
        layer_p, layer_cache = scanned
        h = layer_norm(layer_p["ln1"], h_in)
        q, k, v = qkv_proj(layer_p["attn"], h)
        k_slab = jax.lax.dynamic_update_slice(
            layer_cache[0], k.reshape(B, 1, H, Dh).astype(layer_cache.dtype),
            (0, pos, 0, 0))
        v_slab = jax.lax.dynamic_update_slice(
            layer_cache[1], v.reshape(B, 1, H, Dh).astype(layer_cache.dtype),
            (0, pos, 0, 0))
        a = decode_attention(q, k_slab.astype(q.dtype), v_slab.astype(q.dtype),
                             pos + 1, nhead, x_len=x_len, x_pad=x_pad)
        a = _proj(a, layer_p["attn"]["out"]["w"], layer_p["attn"]["out"]["b"])
        x1 = h_in + a
        h2 = layer_norm(layer_p["ln2"], x1)
        h2 = ffn_block(layer_p["ffn"], h2)
        out = x1 + h2
        return out, jnp.stack([k_slab, v_slab], axis=0)

    x, new_cache = jax.lax.scan(body, x_t, (params["layers"], cache))
    return layer_norm(params["final_ln"], x), new_cache


def decode_step_fast(params, x_t, cache, pos, nhead: int,
                     x_len=None, x_pad: int | None = None,
                     fused_ffn: bool = False, unroll: int = 1):
    """One autoregressive step with a WRITE-ONCE cache update.

    Unlike :func:`decode_step`, the layer scan reads the slab read-only and
    threads only the current token's per-layer k/v out; a single
    dynamic_update_slice then writes all L layers' new k/v at ``pos``.  This
    avoids rebuilding the (large) slab once per layer per step, which costs
    hundreds of MB of HBM traffic at 830M scale.

    ``fused_ffn`` routes the feed-forward through the Pallas fused kernel
    (ops/fused_decode.py) — one kernel streaming w1/w2 tiles through VMEM.
    """
    L, _, B, S_max, H, Dh = cache.shape
    if fused_ffn and "lin1" not in params["layers"]["ffn"]:
        raise ValueError(
            "fused_ffn supports the relu FFN only (the Pallas kernel "
            "hard-codes relu); this model was built with "
            f"ffn_activation != 'relu' (ffn keys: "
            f"{sorted(params['layers']['ffn'])})")

    def body(carry, scanned):
        h_in = carry
        layer_p, layer_cache = scanned
        h = layer_norm(layer_p["ln1"], h_in)
        q, k, v = qkv_proj(layer_p["attn"], h)
        k_new = k.reshape(B, 1, H, Dh)
        v_new = v.reshape(B, 1, H, Dh)
        a = decode_attention_self(
            q, layer_cache[0].astype(q.dtype), layer_cache[1].astype(q.dtype),
            pos, k_new, v_new, nhead, x_len=x_len, x_pad=x_pad)
        a = _proj(a, layer_p["attn"]["out"]["w"], layer_p["attn"]["out"]["b"])
        x1 = h_in + a
        h2 = layer_norm(layer_p["ln2"], x1)
        if fused_ffn:
            from ..ops.fused_decode import fused_ffn as _fused
            h2 = _fused(h2[:, 0], layer_p["ffn"]["lin1"]["w"],
                        layer_p["ffn"]["lin1"]["b"],
                        layer_p["ffn"]["lin2"]["w"],
                        layer_p["ffn"]["lin2"]["b"])[:, None]
        else:
            h2 = ffn_block(layer_p["ffn"], h2)
        out = x1 + h2
        kv = jnp.stack([k_new, v_new], axis=0).astype(cache.dtype)  # [2,B,1,H,Dh]
        return out, kv

    # unroll > 1 lets XLA software-pipeline the next layer's weight fetch
    # behind the current layer's compute — a rolled scan serializes the HBM
    # stream at every layer boundary (batch-1 decode is bandwidth-bound)
    x, kv_new = jax.lax.scan(body, x_t, (params["layers"], cache),
                             unroll=unroll)
    # kv_new: [L, 2, B, 1, H, Dh] — one small write for the whole step
    cache = jax.lax.dynamic_update_slice(cache, kv_new, (0, 0, 0, pos, 0, 0))
    return layer_norm(params["final_ln"], x), cache


def decode_step_block(params, x_t, cache, pos, nhead: int,
                      x_len=None, x_pad: int | None = None):
    """Feed T tokens in ONE forward against the KV slab (speculative decode).

    Same write-once structure as :func:`decode_step_fast`, but the new block
    attends causally within itself (ops.attention.decode_attention_self_block)
    and all T tokens' k/v are written at [pos, pos+T).  The caller rewinds by
    simply moving ``pos`` back — entries beyond the accepted prefix are never
    read because attention masks keys at j >= kv_len.

    x_t: [B, T, D]; returns (hidden [B, T, D], new cache).

    One pass costs the same weight reads as a single decode step (the
    batch-1 bottleneck) and T× the FLOPs — the economics behind multi-token
    speculative decoding (PAPERS.md: arXiv 2410.13839).
    """
    L, _, B, S_max, H, Dh = cache.shape
    T = x_t.shape[1]

    def body(carry, scanned):
        h_in = carry
        layer_p, layer_cache = scanned
        h = layer_norm(layer_p["ln1"], h_in)
        q, k, v = qkv_proj(layer_p["attn"], h)
        k_new = k.reshape(B, T, H, Dh)
        v_new = v.reshape(B, T, H, Dh)
        a = decode_attention_self_block(
            q, layer_cache[0].astype(q.dtype), layer_cache[1].astype(q.dtype),
            pos, k_new, v_new, nhead, x_len=x_len, x_pad=x_pad)
        a = _proj(a, layer_p["attn"]["out"]["w"], layer_p["attn"]["out"]["b"])
        x1 = h_in + a
        h2 = layer_norm(layer_p["ln2"], x1)
        h2 = ffn_block(layer_p["ffn"], h2)
        out = x1 + h2
        kv = jnp.stack([k_new, v_new], axis=0).astype(cache.dtype)  # [2,B,T,H,Dh]
        return out, kv

    x, kv_new = jax.lax.scan(body, x_t, (params["layers"], cache))
    # kv_new: [L, 2, B, T, H, Dh] — one write for the whole block
    cache = jax.lax.dynamic_update_slice(cache, kv_new, (0, 0, 0, pos, 0, 0))
    return layer_norm(params["final_ln"], x), cache


def decode_step_multi_block(params, x_t, cache, offsets, nhead: int,
                            x_lens, x_pad: int, prefix_lens, y_start: int,
                            gen_lens):
    """Speculative-serving forward: T tokens per lane in ONE pass, per-lane
    write offsets.

    Combines :func:`decode_step_block` (tau-token block against the slab)
    with :func:`decode_step_multi` (per-lane segment validity).  Because
    lanes accept different numbers of drafts per pass, their generated
    regions advance at different rates — each lane writes its block at its
    OWN slab offset (``offsets[b] = y_start + accepted_b``, a scatter over
    the S axis) so accepted tokens stay compact per lane and attention
    validity remains plain length arithmetic (``gen_lens``, normally equal
    to ``offsets - y_start``).  Rejected-draft entries are overwritten by
    the next pass or sit beyond the valid length, never read.

    x_t: [B, T, D]; offsets/gen_lens: [B].  Returns (hidden [B,T,D], cache).
    """
    L, _, B, S_max, H, Dh = cache.shape
    T = x_t.shape[1]

    def body(carry, scanned):
        h_in = carry
        layer_p, layer_cache = scanned
        h = layer_norm(layer_p["ln1"], h_in)
        q, k, v = qkv_proj(layer_p["attn"], h)
        k_new = k.reshape(B, T, H, Dh)
        v_new = v.reshape(B, T, H, Dh)
        a = decode_attention_multi_block(
            q, layer_cache[0].astype(q.dtype), layer_cache[1].astype(q.dtype),
            gen_lens, k_new, v_new, nhead, x_lens, x_pad, prefix_lens,
            y_start)
        a = _proj(a, layer_p["attn"]["out"]["w"], layer_p["attn"]["out"]["b"])
        x1 = h_in + a
        h2 = layer_norm(layer_p["ln2"], x1)
        h2 = ffn_block(layer_p["ffn"], h2)
        out = x1 + h2
        kv = jnp.stack([k_new, v_new], axis=0).astype(cache.dtype)
        return out, kv

    x, kv_new = jax.lax.scan(body, x_t, (params["layers"], cache))
    # kv_new: [L, 2, B, T, H, Dh] — ONE scatter for the whole block, with a
    # per-lane offset along S (lanes advance at different rates)
    b_idx = jnp.arange(B)[:, None]                       # [B, 1]
    s_idx = offsets[:, None] + jnp.arange(T)[None, :]    # [B, T]
    cache = cache.at[:, :, b_idx, s_idx].set(kv_new)
    return layer_norm(params["final_ln"], x), cache


def decode_step_multi(params, x_t, cache, pos, nhead: int,
                      x_lens, x_pad: int, prefix_lens, y_start: int):
    """Multi-stream variant of :func:`decode_step_fast`: per-lane text and
    prompt lengths, uniform write pointer at ``pos`` (>= y_start)."""
    L, _, B, S_max, H, Dh = cache.shape

    def body(carry, scanned):
        h_in = carry
        layer_p, layer_cache = scanned
        h = layer_norm(layer_p["ln1"], h_in)
        q, k, v = qkv_proj(layer_p["attn"], h)
        k_new = k.reshape(B, 1, H, Dh)
        v_new = v.reshape(B, 1, H, Dh)
        a = decode_attention_multi(
            q, layer_cache[0].astype(q.dtype), layer_cache[1].astype(q.dtype),
            pos, k_new, v_new, nhead, x_lens, x_pad, prefix_lens, y_start)
        a = _proj(a, layer_p["attn"]["out"]["w"], layer_p["attn"]["out"]["b"])
        x1 = h_in + a
        h2 = layer_norm(layer_p["ln2"], x1)
        h2 = ffn_block(layer_p["ffn"], h2)
        out = x1 + h2
        kv = jnp.stack([k_new, v_new], axis=0).astype(cache.dtype)
        return out, kv

    x, kv_new = jax.lax.scan(body, x_t, (params["layers"], cache))
    cache = jax.lax.dynamic_update_slice(cache, kv_new, (0, 0, 0, pos, 0, 0))
    return layer_norm(params["final_ln"], x), cache
