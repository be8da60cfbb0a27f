"""Token + sinusoidal positional embeddings (functional JAX).

Mirrors reference models/modules/embedding.py:22-98 (vall-e's TokenEmbedding /
SinePositionalEmbedding): fixed sine/cosine table, *learnable scalar alpha*
scaling the positional term, x_scale == 1.  The reference auto-extends its pe
buffer from 4000 positions (embedding.py:67-75); here the table is built once
for a static max length — TPU/XLA-friendly, no dynamic reallocation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def sine_table(max_len: int, dim: int) -> np.ndarray:
    """[max_len, dim] sine/cosine table (reference embedding.py:76-92)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, dim, 2, dtype=np.float64) * -(np.log(10000.0) / dim)
    )
    pe = np.zeros((max_len, dim), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


def init_token_embedding(key, vocab_size: int, dim: int, dtype=jnp.float32):
    """N(0,1) init, matching torch.nn.Embedding default."""
    return {"weight": jax.random.normal(key, (vocab_size, dim), dtype=dtype)}


def token_embed(params, tokens: jnp.ndarray) -> jnp.ndarray:
    """Lookup: [...,] int -> [..., D]."""
    return jnp.take(params["weight"], tokens, axis=0)


def apply_pos_embedding(x: jnp.ndarray, pe: jnp.ndarray, alpha: jnp.ndarray,
                        start: jnp.ndarray | int = 0) -> jnp.ndarray:
    """x [..., T, D] + alpha * pe[start:start+T]  (reference embedding.py:94-97,
    with x_scale == 1 since scale=False at voicecraft.py:153-164)."""
    T = x.shape[-2]
    table = jax.lax.dynamic_slice_in_dim(pe, start, T, axis=0) if not isinstance(start, int) or start != 0 else pe[:T]
    return x + alpha.astype(x.dtype) * table.astype(x.dtype)
