#!/usr/bin/env python
"""Export a voicecraft-tpu checkpoint to reference-compatible formats.

Two targets:
  * ``--format pth``: a reference ``best_bundle.pth``-style torch bundle
    ({"model": state_dict, "config": Namespace, "phn2num": ...},
    reference steps/trainer.py:219-239) loadable by the PyTorch reference.
  * ``--format hf``: an HF-hub snapshot dir (config.json +
    model.safetensors), the reference's from_pretrained layout
    (voicecraft.py:90-104).

  python export_cli.py --ckpt exp/ckpt_best --out giga_export.pth --format pth
"""

import argparse
import dataclasses
import json
import logging
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help="orbax ckpt dir, .pth bundle, or preset (with "
                         "--random-init, for format testing)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--format", choices=["pth", "hf"], default="pth")
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    from voicecraft_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup(args.platform)

    from voicecraft_tpu.inference.loader import load_model
    from voicecraft_tpu.utils.convert import to_reference_state_dict

    cfg, params, phn2num = load_model(args.ckpt, args.random_init)
    sd = to_reference_state_dict(params, cfg)

    if args.format == "pth":
        import torch
        from argparse import Namespace
        tsd = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
        ns = Namespace(**dataclasses.asdict(cfg))
        torch.save({"model": tsd, "config": ns, "phn2num": phn2num},
                   args.out)
        logging.info("wrote torch bundle %s (%d tensors)", args.out, len(tsd))
    else:
        from safetensors.numpy import save_file
        import numpy as np
        os.makedirs(args.out, exist_ok=True)
        # safetensors mishandles non-contiguous views (transposed exports)
        sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
        save_file(sd, os.path.join(args.out, "model.safetensors"))
        with open(os.path.join(args.out, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2)
        if phn2num:
            with open(os.path.join(args.out, "vocab.txt"), "w") as f:
                for p, i in sorted(phn2num.items(), key=lambda kv: kv[1]):
                    f.write(f"{i} {p}\n")
        logging.info("wrote HF snapshot %s", args.out)


if __name__ == "__main__":
    main()
