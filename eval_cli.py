#!/usr/bin/env python
"""Teacher-forced evaluation: loss / top-10 accuracy over a manifest split.

The reference only evaluates inside the training loop (steps/trainer.py:
244-293 validate).  This standalone driver scores any checkpoint on any
split — useful for loss-curve comparisons against reference training runs.

  python eval_cli.py --ckpt exp/ckpt_best --dataset-dir data/ --split validation
"""

import argparse
import logging

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--split", default="validation")
    ap.add_argument("--max-num-tokens", type=int, default=20000)
    ap.add_argument("--max-batches", type=int, default=200)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    from voicecraft_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup(args.platform)

    import jax
    from voicecraft_tpu.config import TrainConfig
    from voicecraft_tpu.inference.loader import load_model
    from voicecraft_tpu.data.manifest import (ManifestDataset, DynamicBatcher,
                                              collate_train)
    from voicecraft_tpu.models.voicecraft import forward_train

    cfg, params, _ = load_model(args.ckpt, args.random_init)
    tcfg = TrainConfig(dataset_dir=args.dataset_dir, exp_dir="/tmp",
                       max_num_tokens=args.max_num_tokens, seed=args.seed)
    ds = ManifestDataset(cfg, tcfg, args.split)
    batcher = DynamicBatcher(ds.lengths, args.max_num_tokens, seed=args.seed)
    eval_fn = jax.jit(lambda p, b: forward_train(p, cfg, b, rng=None,
                                                 remat=False))

    tot_loss, tot_acc, tot_ntok, n_utt = 0.0, 0.0, 0.0, 0
    rng = np.random.default_rng(args.seed)
    for bi, idxs in enumerate(batcher.epoch_batches(0)[:args.max_batches]):
        batch = collate_train(ds, idxs, np.random.default_rng((args.seed, bi)))
        if batch is None:
            continue
        out = eval_fn(params, batch)
        tot_loss += float(out["loss"])
        tot_acc += float(out["top10acc"])
        tot_ntok += float(out["effective_ntoken"])
        n_utt += batch.x.shape[0]
    logging.info("%s: %d utts, %.0f tokens | loss/token %.4f | top10acc %.4f",
                 args.split, n_utt, tot_ntok,
                 tot_loss / max(tot_ntok, 1), tot_acc / max(tot_ntok, 1))


if __name__ == "__main__":
    main()
