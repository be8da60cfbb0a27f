#!/usr/bin/env python
"""Training entrypoint (reference main.py + z_scripts/e830M.sh).

  python train_cli.py --exp-dir exp/e830M --dataset-dir /data/gigaspeech \\
      --preset giga830M --optimizer ScaledAdam --lr 0.05 --num-steps 50000

Multi-host: run one process per host with jax.distributed auto-init
(JAX coordinates via the TPU runtime; no torchrun/NCCL rendezvous needed).
"""

import argparse
import dataclasses
import logging


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="giga830M")
    ap.add_argument("--exp-dir", required=True)
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--optimizer", default="ScaledAdam")
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--num-steps", type=int, default=50000)
    ap.add_argument("--max-num-tokens", type=int, default=100000)
    ap.add_argument("--num-buckets", type=int, default=6)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--codebook-weight", type=float, nargs="*", default=None,
                    help="e.g. 5 1 0.5 0.1 (z_scripts/e830M.sh:39)")
    ap.add_argument("--drop-long", type=int, default=1)
    ap.add_argument("--val-every-n-steps", type=int, default=800)
    ap.add_argument("--n-model", type=int, default=1,
                    help="tensor-parallel size; data-parallel gets the rest")
    ap.add_argument("--no-zero1", action="store_true",
                    help="replicate optimizer state per data shard (DDP-"
                         "style) instead of the default ZeRO-1 sharding")
    ap.add_argument("--train-attn", default=None,
                    choices=["dense", "chunked"],
                    help="training attention: 'dense' materialises the "
                         "[B,H,S,S] bias (reference-like), 'chunked' uses "
                         "the differentiable chunked attention (no "
                         "materialised probs -> bigger batches; parity incl. "
                         "gradients in tests/test_flash_attention.py)")
    ap.add_argument("--train-remat", default=None,
                    choices=["full", "dots", "attn", "attn_ffn1", "none"],
                    help="layer remat policy: 'full' recomputes the whole "
                         "layer body in the backward, 'dots' saves matmul "
                         "outputs (recompute only elementwise; more memory, "
                         "fewer recompute FLOPs), 'none' disables remat")
    ap.add_argument("--n-mtp", type=int, default=0,
                    help="train N multi-token-prediction head groups "
                         "(speculative decoding drafts; auxiliary loss only)")
    ap.add_argument("--init-from", default=None,
                    help="initialise params from an existing checkpoint "
                         "(.pth / HF snapshot / orbax exp dir); fresh-inits "
                         "anything missing, e.g. the MTP heads")
    ap.add_argument("--mtp-only", action="store_true",
                    help="freeze everything except the MTP heads (graft "
                         "speculative-decoding drafts onto a frozen "
                         "pretrained model)")
    ap.add_argument("--tb", action="store_true", help="write tensorboard")
    ap.add_argument("--distributed", action="store_true",
                    help="call jax.distributed.initialize() (multi-host)")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    args = ap.parse_args()
    from voicecraft_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup(args.platform)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    import jax
    if args.distributed:
        jax.distributed.initialize()

    from voicecraft_tpu.config import PRESETS, TrainConfig
    from voicecraft_tpu.parallel.mesh import make_mesh
    from voicecraft_tpu.training.trainer import Trainer

    mcfg = PRESETS[args.preset]()
    if args.codebook_weight:
        mcfg = dataclasses.replace(mcfg,
                                   codebook_weight=tuple(args.codebook_weight))
    if args.n_mtp:
        mcfg = dataclasses.replace(mcfg, n_mtp=args.n_mtp)
    if args.train_attn:
        mcfg = dataclasses.replace(mcfg, train_attn=args.train_attn)
    if args.train_remat:
        mcfg = dataclasses.replace(mcfg, train_remat=args.train_remat)
    tcfg = TrainConfig(
        exp_dir=args.exp_dir, dataset_dir=args.dataset_dir,
        optimizer_name=args.optimizer, lr=args.lr, num_steps=args.num_steps,
        max_num_tokens=args.max_num_tokens, num_buckets=args.num_buckets,
        seed=args.seed, drop_long=args.drop_long,
        val_every_n_steps=args.val_every_n_steps,
        zero1=not args.no_zero1)

    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        n_model = max(1, args.n_model)
        mesh = make_mesh(n_dev // n_model, n_model)
        logging.info("mesh: data=%d model=%d", n_dev // n_model, n_model)

    tb = None
    if args.tb and jax.process_index() == 0:
        from torch.utils.tensorboard import SummaryWriter
        tb = SummaryWriter(args.exp_dir)

    Trainer(mcfg, tcfg, mesh=mesh, tb_writer=tb, init_from=args.init_from,
            train_mtp_only=args.mtp_only).train()


if __name__ == "__main__":
    main()
