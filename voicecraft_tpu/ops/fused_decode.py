"""Pallas fused kernels for the batch-1 decode hot path.

Batch-1 autoregressive decode is HBM-bound: every step streams every decoder
weight.  The FFN is 2/3 of the per-layer weight bytes (w1 [D,4D] + w2 [4D,D]
of 12 D^2 total).  XLA evaluates it as dot -> relu -> dot with the [1,4D]
hidden written back between fusions and no explicit pipelining of the two
weight streams.  ``fused_ffn`` computes

    out = relu(x @ w1 * s1 + b1) @ w2 * s2 + b2

in ONE kernel: the grid walks column-tiles of w1 (= row-tiles of w2), the
hidden tile stays in registers/VMEM, both weight matrices stream through
VMEM exactly once per step (Pallas double-buffers the next tile's DMA while
the MXU works), and the f32 accumulator lives in scratch.  Works for plain
bf16 weights and for the fp8 weight-only quantization of utils/quantize.py
(scales folded in-kernel).

Reference context: this replaces the FFN half of the reference's
decoder-layer forward (models/modules/transformer.py feed-forward block) on
the TPU serving path; numerics are tested against the XLA composition in
tests/test_fused_decode.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ffn_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]                                   # [B, D] compute dtype
    w1 = w1_ref[:].astype(x.dtype)                 # [D, TF]
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h = h * s1_ref[:].astype(jnp.float32) + b1_ref[:].astype(jnp.float32)
    h = jnp.maximum(h, 0.0).astype(x.dtype)        # [B, TF]
    w2 = w2_ref[:].astype(x.dtype)                 # [TF, D]
    acc_ref[:] += jnp.dot(h, w2, preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out = acc_ref[:] * s2_ref[:].astype(jnp.float32) \
            + b2_ref[:].astype(jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_f",))
def fused_ffn(x: jnp.ndarray, w1, b1, w2, b2, tile_f: int = 1024
              ) -> jnp.ndarray:
    """relu(x @ w1 + b1) @ w2 + b2 as one Pallas kernel.

    x: [B, D] (B small — the decode step's token batch).  w1/w2 either plain
    [D, F]/[F, D] arrays or utils/quantize.py dicts {'q': fp8, 'scale'}.
    """
    def split(w, rows_are_contraction):
        if isinstance(w, dict):
            s = w["scale"].reshape(1, -1)
            return w["q"], s
        one = jnp.ones((1, w.shape[-1]), w.dtype)
        return w, one

    w1q, s1 = split(w1, True)
    w2q, s2 = split(w2, False)
    B, D = x.shape
    F = w1q.shape[1]
    assert F % tile_f == 0, (F, tile_f)
    n_tiles = F // tile_f

    in_specs = [
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_f), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_f), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_f), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    return pl.pallas_call(
        _ffn_kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * D * F,
            bytes_accessed=w1q.size * w1q.dtype.itemsize
            + w2q.size * w2q.dtype.itemsize,
            transcendentals=0),
    )(x, w1q, s1, b1.reshape(1, -1), w2q, s2, b2.reshape(1, -1))


def ffn_reference(x, w1, b1, w2, b2):
    """The XLA composition fused_ffn replaces (for tests/benchmarks)."""
    from ..models.transformer import _proj
    h = jax.nn.relu(_proj(x, w1, b1))
    return _proj(h, w2, b2)
