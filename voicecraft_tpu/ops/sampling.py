"""Top-k / top-p (nucleus) sampling, vectorized and jittable.

Mirrors the reference's ``top_k_top_p_filtering`` + ``topk_sampling``
(models/voicecraft.py:26-87, models/modules/sampling.py:48-63) with JAX
explicit PRNG keys instead of the torch global RNG.  ``temperature <= 0`` is
an extension meaning greedy/argmax — used for deterministic parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FILTER_VALUE = -1e9


def top_k_top_p_filter(logits: jnp.ndarray, top_k: int, top_p: float) -> jnp.ndarray:
    """Filter logits [..., V].  top_k <= 0 disables top-k; top_p >= 1 disables
    nucleus filtering.  Static python conditions keep the jitted graph lean."""
    V = logits.shape[-1]
    if top_k > 0:
        k = min(max(top_k, 1), V)
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, FILTER_VALUE, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # remove tokens with cumulative prob above threshold, shifted right so
        # the first token crossing the boundary is kept (reference
        # voicecraft.py:53-61)
        remove_sorted = cum > top_p
        remove_sorted = jnp.concatenate(
            [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]],
            axis=-1)
        # threshold in logit space: smallest kept sorted logit
        thresh = jnp.min(jnp.where(remove_sorted, jnp.inf, sorted_logits),
                         axis=-1, keepdims=True)
        logits = jnp.where(logits < thresh, FILTER_VALUE, logits)
    return logits


def sample(rng, logits: jnp.ndarray, top_k: int = 0, top_p: float = 1.0,
           temperature: float = 1.0) -> jnp.ndarray:
    """Sample token ids from logits [..., V] -> [...].

    Matches reference ``topk_sampling`` (voicecraft.py:71-86): temperature
    scaling first, then top-k/top-p filtering, then a categorical draw.
    ``temperature <= 0`` -> greedy argmax (deterministic test mode).
    """
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if temperature != 1.0:
        logits = logits / temperature
    logits = top_k_top_p_filter(logits, top_k, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
