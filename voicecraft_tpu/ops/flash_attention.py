"""Pallas flash attention for the [text ; audio] prefix-causal layout.

The reference materialises (B*H, S, S) float masks and full attention logits
(models/voicecraft.py:419-447 + F.scaled_dot_product_attention).  This kernel
never materialises logits: online-softmax accumulation over key blocks in
VMEM, with the causal + two-segment key-validity mask computed from scalars
(x_len, y_len per batch row) inside the kernel.

Used for inference prefill (forward-only).  Training uses
``chunked_attention`` below — a lax.scan over key blocks with rematerialised
chunk bodies: same O(S·chunk) live memory, differentiable for free.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# prefill crossover measured on v5e (PERF.md): dense mha wins below ~1k
# (flash's per-call overhead), flash wins above (11% at S=2048) and never
# materialises the [B,H,S,S] logits (128 MB at S=2048 bf16)
FLASH_PREFILL_MIN_LEN = 1024


def use_flash_prefill(seq_len: int) -> bool:
    """Route prefill through the Pallas kernel?  TPU-only (the kernel needs
    Mosaic; CPU tests exercise it via interpret=True separately)."""
    return (seq_len >= FLASH_PREFILL_MIN_LEN
            and jax.default_backend() == "tpu")


def _flash_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, *, bq: int, bk: int,
                  s_kv: int, x_pad: int, scale: float):
    """One (batch, head, q-block) program.

    lens_ref: scalar-prefetch [B, 2] = (x_len, y_len) per batch row.
    q_ref/o_ref: [1, 1, bq, Dh]; k_ref/v_ref: [1, 1, s_kv, Dh].
    """
    b = pl.program_id(0)
    iq = pl.program_id(2)
    x_len = lens_ref[b, 0]
    y_len = lens_ref[b, 1]

    q = q_ref[0, 0, :, :].astype(jnp.float32) * scale       # [bq, Dh]
    q_pos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    n_kb = s_kv // bk

    def body(jb, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, 0, pl.ds(jb * bk, bk), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(jb * bk, bk), :].astype(jnp.float32)
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [bq,bk]
        k_pos = jb * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        valid = ((k_pos < x_len)
                 | ((k_pos >= x_pad) & (k_pos < x_pad + y_len)))
        mask = (k_pos <= q_pos) & valid
        logits = jnp.where(mask, logits, NEG_INF)

        m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(logits - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_cur, l_cur, acc

    # causal: key blocks strictly beyond this q block contribute nothing
    last_kb = jnp.minimum(pl.cdiv((iq + 1) * bq, bk), n_kb)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, q.shape[-1]), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, last_kb, body, (m0, l0, a0))
    o_ref[0, 0, :, :] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


def flash_prefix_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           x_lens: jnp.ndarray, y_lens: jnp.ndarray,
                           x_pad: int, nhead: int,
                           block_q: int = 256, block_k: int = 256,
                           interpret: bool = False) -> jnp.ndarray:
    """q/k/v: [B, S, D]; returns [B, S, D].

    Semantics match ops.attention.mha with segment_padding_bias: causal over
    the joint sequence, keys valid in [0, x_len) u [x_pad, x_pad + y_len).
    """
    B, S, D = q.shape
    H = nhead
    Dh = D // H
    bq = min(block_q, S)
    bk = min(block_k, S)
    while S % bq:
        bq //= 2
    while S % bk:
        bk //= 2

    qh = q.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)  # [B,H,S,Dh]
    kh = k.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
    lens = jnp.stack([x_lens.astype(jnp.int32),
                      y_lens.astype(jnp.int32)], axis=1)  # [B, 2]

    kernel = functools.partial(_flash_kernel, bq=bq, bk=bk, s_kv=S,
                               x_pad=x_pad, scale=1.0 / math.sqrt(Dh))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, S // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, Dh), lambda b, h, i, lens: (b, h, i, 0)),
            pl.BlockSpec((1, 1, S, Dh), lambda b, h, i, lens: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S, Dh), lambda b, h, i, lens: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, Dh),
                               lambda b, h, i, lens: (b, h, i, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, S, Dh), q.dtype),
        interpret=interpret,
    )(lens, qh, kh, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, S, D)


# ------------------------------------------------------------------------------
# differentiable chunked attention (training): no S^2 materialisation
# ------------------------------------------------------------------------------

def chunked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      x_lens: jnp.ndarray, y_lens: jnp.ndarray,
                      x_pad: int, nhead: int,
                      chunk: int = 256) -> jnp.ndarray:
    """Memory-efficient differentiable attention: lax.scan over QUERY
    chunks with a rematerialised body (Rabe & Staats style).  Live memory
    is one [B, chunk, H, S] logits block; scan residuals are only each
    chunk's [B, chunk, H, Dh] inputs/outputs (the logits are recomputed in
    the backward), so total saved state is O(B*S*H*Dh) — vs the dense
    path's per-layer [B, H, S, S] probs.

    NOTE an earlier version scanned over KEY chunks with the online-softmax
    (m, l, acc) as the scan carry; that is fine forward, but scan's
    backward stores the f32 [B,S,H,Dh] carry per step — ~8 GB at 830M
    training shapes, i.e. strictly WORSE than dense.  Query chunking keeps
    the recompute-not-store property under autodiff.

    Same masking semantics as flash_prefix_attention."""
    B, S, D = q.shape
    H = nhead
    Dh = D // H
    c = min(chunk, S)
    while S % c:
        c //= 2
    n_chunks = S // c

    qh = q.reshape(B, S, H, Dh)
    kh = k.reshape(B, S, H, Dh)
    vh = v.reshape(B, S, H, Dh)
    scale = 1.0 / math.sqrt(Dh)
    k_pos = jnp.arange(S)[None, None, None, :]          # [1,1,1,S]
    valid = ((k_pos < x_lens[:, None, None, None])
             | ((k_pos >= x_pad)
                & (k_pos < x_pad + y_lens[:, None, None, None])))  # [B,1,1,S]

    qc = qh.reshape(B, n_chunks, c, H, Dh).transpose(1, 0, 2, 3, 4)

    @jax.checkpoint
    def body(carry, inp):
        iq, q_blk = inp
        logits = jnp.einsum(
            "bqhd,bkhd->bqhk", q_blk.astype(jnp.float32),
            kh.astype(jnp.float32),
            preferred_element_type=jnp.float32) * scale  # [B,c,H,S]
        q_pos = iq * c + jnp.arange(c)[None, :, None, None]
        mask = (k_pos <= q_pos) & valid                  # [B,c,1,S]
        logits = jnp.where(mask, logits, NEG_INF)
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bqhk,bkhd->bqhd", p, vh.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        return carry, out.astype(q.dtype)

    _, outs = jax.lax.scan(body, None, (jnp.arange(n_chunks), qc))
    return outs.transpose(1, 0, 2, 3, 4).reshape(B, S, D)
