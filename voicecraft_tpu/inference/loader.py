"""Model/codec loading for the inference CLIs.

Accepts three model sources (reference get_model, inference_tts_scale.py:107-125
+ HF-hub load, voicecraft.py:90-104):
  * a reference ``*.pth`` bundle (converted on the fly),
  * an orbax checkpoint directory produced by this repo's Trainer,
  * a named preset with random init (smoke tests / development).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax

from ..config import ModelConfig, PRESETS
from ..models.voicecraft import init_params
from ..models.encodec import EncodecConfig, init_encodec


def _cpu_dtype_fix(cfg: ModelConfig) -> ModelConfig:
    if jax.default_backend() == "cpu" and cfg.compute_dtype == "bfloat16":
        import dataclasses
        return dataclasses.replace(cfg, compute_dtype="float32")
    return cfg


def load_model(path_or_preset: str, random_init: bool = False,
               seed: int = 0) -> Tuple[ModelConfig, dict, Optional[Dict[str, int]]]:
    if path_or_preset in PRESETS:
        cfg = _cpu_dtype_fix(PRESETS[path_or_preset]())
        assert random_init, "presets require --random-init (no weights)"
        return cfg, init_params(cfg, jax.random.PRNGKey(seed)), None
    if path_or_preset.endswith(".pth"):
        from ..utils.convert import load_reference_bundle
        cfg, params, phn2num = load_reference_bundle(path_or_preset)
        return _cpu_dtype_fix(cfg), params, phn2num
    repo_id_shaped = (path_or_preset.count("/") == 1
                      and not path_or_preset.startswith(("/", ".", "~"))
                      and all(path_or_preset.split("/"))
                      # a typo'd RELATIVE checkpoint path whose first segment
                      # exists locally (e.g. 'exp/ckpt_latest' — the exact
                      # layout train_cli produces) is a local path, not a hub
                      # id: fail with FileNotFoundError below, never a
                      # network retry loop
                      and not os.path.isdir(path_or_preset.split("/")[0]))
    if repo_id_shaped and not os.path.exists(path_or_preset):
        # HF-hub repo id (reference PyTorchModelHubMixin.from_pretrained,
        # voicecraft.py:90-104): fetch the snapshot when huggingface_hub is
        # installed and the network is reachable, then load it as a local
        # snapshot dir below.  Zero-egress environments get a clear error
        # instead of a silent hang.  Only org/name shapes qualify — a
        # typo'd local path (absolute, dotted, or multi-segment) must fail
        # with FileNotFoundError below, not a network retry loop.
        try:
            from huggingface_hub import snapshot_download
        except ImportError as e:
            raise FileNotFoundError(
                f"{path_or_preset!r} is not a local path; to load it as a "
                "HF-hub repo id, `pip install huggingface_hub` (or download "
                "the snapshot elsewhere and pass its directory)") from e
        path_or_preset = snapshot_download(repo_id=path_or_preset)
    if os.path.isdir(path_or_preset) and os.path.exists(
            os.path.join(path_or_preset, "config.json")):
        # HF-hub snapshot (reference PyTorchModelHubMixin serialisation,
        # voicecraft.py:90-104): config.json + model.safetensors
        from ..utils.convert import from_reference_state_dict
        with open(os.path.join(path_or_preset, "config.json")) as f:
            cfg = _cpu_dtype_fix(ModelConfig.from_dict(json.load(f)))
        st = os.path.join(path_or_preset, "model.safetensors")
        if os.path.exists(st):
            from safetensors.numpy import load_file
            sd = load_file(st)
        else:
            import torch
            sd = torch.load(os.path.join(path_or_preset, "pytorch_model.bin"),
                            map_location="cpu", weights_only=True)
        params = from_reference_state_dict(sd, cfg)
        phn2num = None
        vfn = os.path.join(path_or_preset, "vocab.txt")
        if os.path.exists(vfn):
            from ..data.manifest import load_vocab
            phn2num = load_vocab(vfn)
        return cfg, params, phn2num
    # orbax checkpoint dir from training/trainer.py
    meta_fn = os.path.join(os.path.dirname(path_or_preset.rstrip("/")),
                           "meta_" + os.path.basename(
                               path_or_preset.rstrip("/")).replace("ckpt_", "")
                           + ".json")
    with open(meta_fn) as f:
        meta = json.load(f)
    cfg = _cpu_dtype_fix(ModelConfig.from_dict(meta["model_config"]))
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        # the trainer bundles params+opt_state+rng; restore all, keep params
        path = os.path.abspath(path_or_preset)
        try:
            restored = ckptr.restore(path)
        except ValueError:
            # checkpoint was saved on a different device kind (e.g. TPU,
            # now loading on CPU): restore into local-device placements
            # rebuilt from the checkpoint's own shape/dtype metadata
            from jax.sharding import SingleDeviceSharding
            dev = jax.local_devices()[0]
            md = ckptr.metadata(path).item_metadata
            target = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(
                    m.shape, m.dtype, sharding=SingleDeviceSharding(dev)),
                md)
            restored = ckptr.restore(path, target)
    phn2num = None
    vocab_fn = os.path.join(os.path.dirname(meta_fn), "vocab.txt")
    if os.path.exists(vocab_fn):
        from ..data.manifest import load_vocab
        phn2num = {p: i for p, i in load_vocab(vocab_fn).items()}
    return cfg, restored["params"], phn2num


def load_codec(path: Optional[str], random_init: bool = False,
               seed: int = 0) -> Tuple[EncodecConfig, dict]:
    if path is None:
        assert random_init, "codec path required unless --random-init"
        cfg = EncodecConfig()
        return cfg, init_encodec(cfg, jax.random.PRNGKey(seed))
    from ..utils.convert_encodec import load_audiocraft_checkpoint
    return load_audiocraft_checkpoint(path)
