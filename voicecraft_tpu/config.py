"""Typed configuration for voicecraft-tpu.

Replaces the reference's argparse Namespace that doubles as model config
(reference: config.py:4-86, models/voicecraft.py:97-115).  Field names are kept
identical to the reference flags so that reference checkpoints' pickled args
map 1:1 onto this dataclass, giving config/weights compatibility.

Unlike the reference, stringly-typed fields are real types here:
  - ``audio_vocab_size`` is an int (reference eval()'s a string,
    voicecraft.py:126-127).
  - ``codebook_weight`` is a tuple of floats (reference eval()'s a string,
    voicecraft.py:545-546).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Architecture + token-layout config (reference config.py:54-84)."""

    # token layout (reference config.py:67-73)
    n_codebooks: int = 4
    text_vocab_size: int = 100
    text_pad_token: int = 100
    audio_vocab_size: int = 2048
    empty_token: int = 2048
    eog: int = 2049
    audio_pad_token: int = 2050
    eos: int = -1            # >0 for TTS-enhanced models (=2051), config.py:57
    n_special: int = 3       # empty, eog, pad (+eos -> 4), config.py:60
    special_first: int = 0
    reduced_eog: int = 0

    # mask-span sampling (training), reference config.py:55-66
    max_n_spans: int = 3
    mask_len_min: int = 1
    mask_len_max: int = 600
    min_gap: int = 5
    max_mask_portion: float = 0.7
    mask_sample_dist: str = "poisson1"
    shuffle_mask_embedding: int = 0

    # model dims (reference config.py:76-84)
    d_model: int = 2048
    audio_embedding_dim: int = 2048
    nhead: int = 16
    num_decoder_layers: int = 16
    text_embedding_dropout: float = 0.1
    audio_embedding_dropout: float = 0.0
    text_positional_embedding_dropout: float = 0.1
    audio_positional_embedding_dropout: float = 0.1
    trm_dropout: float = 0.1

    # data / sequence caps (reference config.py:46-52)
    encodec_sr: int = 50
    audio_max_length: float = 20.0
    text_max_length: int = 400

    # loss
    codebook_weight: Optional[Tuple[float, ...]] = None

    # multi-token prediction heads for speculative decoding (no reference
    # equivalent; PAPERS.md arXiv 2410.13839).  n_mtp extra per-codebook
    # head groups predict tokens at offsets +2..+(n_mtp+1) from each hidden
    # state; they are auxiliary-only (base weights and main loss unchanged
    # when mtp_detach=1) so checkpoints stay reference-compatible.
    n_mtp: int = 0
    mtp_weight: float = 0.5
    mtp_detach: int = 1

    # TPU-specific compute policy (no reference equivalent; replaces fp16
    # autocast + GradScaler, reference steps/trainer.py:45,90)
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # training attention: "dense" (materialised bias, supports attention-prob
    # dropout) or "chunked" (online-softmax over key blocks, O(S*chunk)
    # memory, no attention-prob dropout)
    train_attn: str = "dense"
    # transformer norm / FFN-activation family (reference exposes these via
    # TransformerEncoderLayer's layer_norm_cls/activation arguments,
    # transformer.py:179-265, with the icefall variants in scaling.py; the
    # shipped reference configs leave both at the defaults below —
    # voicecraft.py:166-174).  See models/scaling.py for the JAX toolbox.
    norm: str = "layernorm"              # | basicnorm | balancedbasicnorm | identity
    ffn_activation: str = "relu"         # | gelu | doubleswish | balanceddoubleswish
    # layer-stack rematerialisation policy for the training forward:
    # "full" recomputes the whole layer body in the backward (lowest memory,
    # +1 forward of recompute FLOPs); "dots" saves every matmul output and
    # recomputes only elementwise ops (LN/relu/dropout/residual) — trades
    # ~sum-of-dot-outputs bf16 memory for near-zero recompute FLOPs;
    # "none" disables remat (dense-activation training, small models only)
    train_remat: str = "full"

    # ---- derived quantities -------------------------------------------------

    @property
    def n_text_tokens(self) -> int:
        # reference voicecraft.py:129
        return self.text_vocab_size + 1

    @property
    def card(self) -> int:
        """Per-codebook output cardinality (reference voicecraft.py:132)."""
        return self.audio_vocab_size + self.n_special

    @property
    def eog_inference(self) -> int:
        # reference voicecraft.py:938
        return self.eos if self.eos > 0 else self.eog

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.nhead == 0
        return self.d_model // self.nhead

    @property
    def ffn_dim(self) -> int:
        # reference voicecraft.py:169 (dim_feedforward = d_model * 4)
        return self.d_model * 4

    def __post_init__(self):
        # token-id layout invariants (reference voicecraft.py:130-135)
        assert self.text_pad_token == self.text_vocab_size
        assert self.empty_token == self.audio_vocab_size
        assert self.eog == self.audio_vocab_size + 1
        assert self.audio_pad_token == self.audio_vocab_size + 2
        if self.eos > 0:
            assert self.eos not in (self.audio_pad_token, self.empty_token)
            assert self.n_special >= 4
        assert self.norm in ("layernorm", "basicnorm", "balancedbasicnorm",
                             "identity"), self.norm
        assert self.ffn_activation in ("relu", "gelu", "doubleswish",
                                       "balanceddoubleswish"), self.ffn_activation

    # ---- (de)serialization ---------------------------------------------------

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "ModelConfig":
        return cls.from_dict(json.loads(s))

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        """Build from a dict, tolerating extra keys (e.g. a full reference
        args.pkl namespace dict) and the reference's stringly-typed fields."""
        names = {f.name for f in dataclasses.fields(cls)}
        clean = {}
        for k, v in d.items():
            if k not in names:
                continue
            if k == "audio_vocab_size" and isinstance(v, str):
                v = int(eval(v, {}, {}))  # matches reference voicecraft.py:127
            if k == "codebook_weight" and isinstance(v, str):
                v = tuple(float(x) for x in eval(v, {}, {}))
            if k == "codebook_weight" and isinstance(v, list):
                v = tuple(float(x) for x in v)
            clean[k] = v
        return cls(**clean)


@dataclass(frozen=True)
class TrainConfig:
    """Training runtime config (reference config.py:6-35 + z_scripts/e830M.sh)."""

    seed: int = 1
    lr: float = 0.05
    batch_size: int = 100
    max_num_tokens: int = 100000
    val_max_num_tokens: Optional[int] = None
    num_buckets: int = 6
    dynamic_batching: int = 1
    weight_decay: float = 1e-2
    warmup_fraction: float = 0.01
    num_epochs: int = 10
    num_steps: Optional[int] = 50000
    gradient_accumulation_steps: int = 1
    gradient_clip_val: float = 1.0
    early_stop_step: int = 3200
    early_stop_threshold: float = -1.0

    optimizer_name: str = "ScaledAdam"
    reduce_lr_start_step: int = 3000
    pseudo_epoch_size: int = 3000
    reduce_lr_start_epoch: int = 4
    clipping_update_period: int = 600

    # data
    audio_max_length: float = 20.0
    audio_min_length: float = 2.0
    text_max_length: int = 400
    text_min_length: float = 10.0
    pad_x: int = 1
    drop_long: int = 1

    # io
    exp_dir: Optional[str] = None
    dataset_dir: Optional[str] = None
    manifest_name: str = "manifest"
    phn_folder_name: str = "phonemes"
    encodec_folder_name: str = "encodec_16khz_4codebooks"

    tb_write_every_n_steps: int = 100
    print_every_n_steps: int = 400
    val_every_n_steps: int = 800

    # observability (SURVEY.md §5): jax.profiler trace dir, traced step window
    profile_dir: Optional[str] = None
    profile_start_step: int = 10

    # memory: split grads/update into two executables (auto-enabled for
    # >400M-param models on a single chip; see training/step.py)
    two_phase_step: bool = False
    # ZeRO-1: shard the optimizer moments over the mesh's data axis
    # (parallel/mesh.py zero1_opt_shardings); semantics-identical, 1/dp the
    # optimizer memory per chip.  Only takes effect with a mesh and a
    # recognised optimizer state; set False to force DDP-style replication.
    zero1: bool = True

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_dict(cls, d: dict) -> "TrainConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


# ---- presets ----------------------------------------------------------------

def giga330M() -> ModelConfig:
    """Small-model preset (reference README.md:32 'giga330M' family).

    Note: presets matter only for random-init runs — real checkpoints carry
    their exact config (args.pkl / config.json) which the loader uses.  The
    published giga330M's dims aren't in the reference repo; this preset is
    the d_model=1024 reading (~220M transformer params)."""
    return ModelConfig(
        d_model=1024,
        audio_embedding_dim=1024,
        nhead=16,
        num_decoder_layers=16,
        text_vocab_size=120,
        text_pad_token=120,
    )


def giga830M() -> ModelConfig:
    """830M model (reference z_scripts/e830M.sh:34-37,56-60)."""
    return ModelConfig(
        d_model=2048,
        audio_embedding_dim=2048,
        nhead=16,
        num_decoder_layers=16,
        text_vocab_size=120,
        text_pad_token=120,
    )


def giga830M_tts_enhanced() -> ModelConfig:
    """TTS-enhanced 830M (eos=2051, n_special=4, reduced_eog;
    reference z_scripts/e830M.sh:56-60, README.md:30)."""
    return ModelConfig(
        d_model=2048,
        audio_embedding_dim=2048,
        nhead=16,
        num_decoder_layers=16,
        text_vocab_size=120,
        text_pad_token=120,
        eos=2051,
        n_special=4,
        reduced_eog=1,
    )


def tiny_test() -> ModelConfig:
    """Small config for unit tests — same token layout, tiny dims."""
    return ModelConfig(
        d_model=64,
        audio_embedding_dim=64,
        nhead=4,
        num_decoder_layers=2,
        text_vocab_size=40,
        text_pad_token=40,
        audio_vocab_size=128,
        empty_token=128,
        eog=129,
        audio_pad_token=130,
        text_embedding_dropout=0.0,
        audio_embedding_dropout=0.0,
        text_positional_embedding_dropout=0.0,
        audio_positional_embedding_dropout=0.0,
        trm_dropout=0.0,
    )


def tiny_test_mtp() -> ModelConfig:
    """tiny_test + 3 MTP head groups (tau <= 4): lets the CLIs smoke the
    speculative paths (--spec / --spec auto) with --random-init."""
    cfg = tiny_test()
    import dataclasses
    return dataclasses.replace(cfg, n_mtp=3)


def proc50M() -> ModelConfig:
    """~50M-param small-but-real model for the in-env speculative-acceptance
    measurement: pretrained on the procedural corpus
    (recipes/make_spec_corpus.py) with MTP heads, evaluated on held-out
    prompts (spec_acceptance_cli.py).  Same token layout as the giga
    family."""
    return ModelConfig(
        d_model=512,
        audio_embedding_dim=512,
        nhead=8,
        num_decoder_layers=8,
        text_vocab_size=120,
        text_pad_token=120,
    )


PRESETS = {
    "giga330M": giga330M,
    "giga830M": giga830M,
    "giga830M_TTSEnhanced": giga830M_tts_enhanced,
    "tiny_test": tiny_test,
    "tiny_test_mtp": tiny_test_mtp,
    "proc50M": proc50M,
}
