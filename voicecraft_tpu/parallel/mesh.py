"""Device mesh + sharding rules (GSPMD tensor/data parallel).

The reference's only parallelism is NCCL DDP (main.py:40, steps/trainer.py:46).
Here parallelism is declarative: a 2-D ``Mesh(('data', 'model'))``, batch dims
sharded over ``data``, and megatron-style tensor-parallel layouts over
``model`` (attention heads + FFN hidden sharded column-wise, output
projections row-wise — XLA inserts the all-reduces over ICI).  DP gradient
sync is implicit in jit's partitioning of the batch dimension.
"""

from __future__ import annotations


import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model, (len(devices), n_data, n_model)
    arr = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# ---- parameter partition specs -------------------------------------------------

def param_pspecs(params) -> dict:
    """PartitionSpec pytree matching a voicecraft params pytree.

    Layers carry a leading L (scan) axis; per-codebook tensors a leading K.
    """
    def spec(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        ks = "/".join(str(k) for k in keys)
        nd = leaf.ndim
        if "alpha" in ks or "ln" in ks or "final_ln" in ks:
            return P()
        if ks.endswith("text_emb/weight"):
            return P(None, "model")
        if ks == "audio_emb":
            return P(None, None, "model")
        if ks == "mask_emb":
            return P(None, "model")
        if "attn/wq" in ks or "attn/wk" in ks or "attn/wv" in ks:
            return P(None, None, "model")          # [L, D, D] col-parallel
        if "attn/bq" in ks or "attn/bk" in ks or "attn/bv" in ks:
            return P(None, "model")
        if "attn/out/w" in ks:
            return P(None, "model", None)          # row-parallel
        if "attn/out/b" in ks:
            return P()
        if "ffn/lin1" in ks and ks.endswith("/w"):   # lin1 | lin1_gelu | lin1_dsw...
            return P(None, None, "model")
        if "ffn/lin1" in ks and ks.endswith("/b"):
            return P(None, "model")
        if "ffn/lin2/w" in ks:
            return P(None, "model", None)
        if "ffn/lin2/b" in ks:
            return P()
        if ks == "heads/w1":
            return P(None, None, "model")          # [K, D, half]
        if ks == "heads/b1":
            return P(None, "model")
        if ks == "heads/w2":
            return P(None, "model", None)          # [K, half, card]
        if ks == "heads/b2":
            return P()
        return P()  # replicate anything unrecognised

    return jax.tree_util.tree_map_with_path(spec, params)


def param_shardings(params, mesh: Mesh):
    return jax.tree.map(lambda s: NamedSharding(mesh, s), param_pspecs(params),
                        is_leaf=lambda x: isinstance(x, P))


def batch_pspec(leaf_ndim: int) -> P:
    """Shard the leading batch dimension over 'data'."""
    return P(*(("data",) + (None,) * (leaf_ndim - 1)))


def shard_params(params, mesh: Mesh):
    """Place (already materialised) params onto the mesh."""
    return jax.device_put(params, param_shardings(params, mesh))


# ---- ZeRO-1: optimizer state sharded over the data axis ------------------------

def _extend_with_data(spec: P, shape, dp: int) -> P:
    """Shard the first free (None) axis divisible by ``dp`` over 'data'.

    Keeps any existing 'model' placements (so the elementwise optimizer math
    never reshards the TP axis); leaves too small or indivisible stay as-is.
    """
    s = tuple(spec) + (None,) * (len(shape) - len(spec))
    for i, (ax, dim) in enumerate(zip(s, shape)):
        if ax is None and dim % dp == 0 and dim >= dp:
            return P(*(s[:i] + ("data",) + s[i + 1:]))
    return P(*s)


def zero1_opt_shardings(params, opt_state, mesh: Mesh, labels=None):
    """ZeRO-1 sharding pytree for an optimizer state, or None if unsupported.

    The reference replicates optimizer state per DDP rank (steps/trainer.py:46
    — standard torch DDP).  Here the big param-shaped moments (ScaledAdam's
    ``delta``/``exp_avg_sq``, ~8 bytes/param f32) are sharded over the mesh's
    'data' axis — the idiomatic GSPMD form of ZeRO-1/optimizer-state sharding:
    jit sees data-sharded state operands, partitions the elementwise update
    accordingly (grads arrive via reduce-scatter instead of all-reduce), and
    all-gathers only the final param-shaped update.  Same bytes on the wire
    as DDP, 1/dp the optimizer memory per chip.

    Supports ScaledAdamState, optax.adamw's chained state, and — given the
    ``labels`` pytree the trainer built — optax.multi_transform's
    PartitionState wrapper (the --mtp-only graft path: a masked ScaledAdam
    over the trained subset, whose state holds one _LeafState per TRAINED
    leaf in params order).  Anything else returns None (caller keeps the
    replicated layout).
    """
    dp = mesh.shape["data"]
    if dp <= 1:
        return None
    from ..training.optim import ScaledAdamState, _LeafState

    repl = NamedSharding(mesh, P())
    pspecs = jax.tree.leaves(param_pspecs(params),
                             is_leaf=lambda x: isinstance(x, P))
    pflat = jax.tree.leaves(params)

    def moment(spec, p):
        return NamedSharding(mesh, _extend_with_data(spec, p.shape, dp))

    def build(state, specs, ps):
        if isinstance(state, ScaledAdamState):
            assert len(state.leaves) == len(ps), (len(state.leaves), len(ps))
            leaves = tuple(
                _LeafState(delta=moment(spec, p), exp_avg_sq=moment(spec, p),
                           param_rms=repl, scale_exp_avg_sq=repl,
                           scale_grads=repl)
                for spec, p in zip(specs, ps))
            return ScaledAdamState(step=repl, model_norms=repl,
                                   model_norm_threshold=repl, leaves=leaves)
        # optax.adamw: (ScaleByAdamState(count, mu, nu), <wd/lr states>)
        # where mu/nu are param-congruent pytrees (full-params case only —
        # a masked adamw's mu treedef differs from params)
        try:
            import optax
            if (isinstance(state, tuple) and len(state) > 0
                    and isinstance(state[0], optax.ScaleByAdamState)
                    and ps is pflat):
                sh_tree = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(params),
                    [moment(spec, p) for spec, p in zip(specs, ps)])
                adam = optax.ScaleByAdamState(count=repl, mu=sh_tree,
                                              nu=sh_tree)
                rest = tuple(jax.tree.map(lambda _: repl, s)
                             for s in state[1:])
                return (adam,) + rest
        except Exception:
            pass
        return None

    sh = build(opt_state, pspecs, pflat)
    if sh is not None:
        return sh

    # optax.multi_transform: PartitionState(inner_states={label:
    # MaskedState(inner_state=<wrapped state over that label's leaves>)})
    if (labels is not None and hasattr(opt_state, "inner_states")
            and type(opt_state).__name__ == "PartitionState"):
        lab_flat = jax.tree.leaves(labels)
        assert len(lab_flat) == len(pflat)
        inner_sh = {}
        for lab, masked in opt_state.inner_states.items():
            sel = [i for i, l in enumerate(lab_flat) if l == lab]
            sub = build(masked.inner_state,
                        [pspecs[i] for i in sel], [pflat[i] for i in sel])
            if sub is None:
                # e.g. set_to_zero's EmptyState (no leaves) — replicate
                sub = jax.tree.map(lambda _: repl, masked.inner_state)
            inner_sh[lab] = type(masked)(inner_state=sub)
        return type(opt_state)(inner_states=inner_sh)
    return None


def shard_batch(batch, mesh: Mesh):
    """Place a host-local batch on the mesh, sharded over 'data'.

    Multi-process: each host contributes its local batch as its shard of the
    global array (all hosts must present identical local shapes — the
    Trainer pads to fixed dims in distributed mode)."""
    def put(x):
        sharding = NamedSharding(mesh, batch_pspec(x.ndim))
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)
    return jax.tree.map(put, batch)
