#!/usr/bin/env python
"""Offline preprocessing: wav+transcript pairs -> phoneme/code manifest tree.

Equivalent of the reference data/phonemize_encodec_encode_hf.py, generalised
from the HF gigaspeech downloader to any local directory of
``<id>.wav`` + ``<id>.txt`` transcript pairs:

  python preprocess_cli.py --audio-dir wavs/ --out-dir data/mydataset \\
      --codec encodec.th --split train

Writes manifest/{split}.txt, vocab.txt, phonemes/<id>.txt,
encodec_16khz_4codebooks/<id>.txt in the reference's exact on-disk format.
"""

import argparse
import logging
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--audio-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--codec", default=None)
    ap.add_argument("--split", default="train")
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--text-backend", default="auto")
    ap.add_argument("--batch-frames", type=int, default=16000 * 60,
                    help="max audio samples per encode batch")
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--codec-bins", type=int, default=None,
                    help="override codebook size for --random-init codecs "
                         "(match the target model's audio_vocab_size)")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    args = ap.parse_args()
    from voicecraft_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup(args.platform)
    logging.basicConfig(level=logging.INFO)

    import jax.numpy as jnp
    from voicecraft_tpu.inference.loader import load_codec
    from voicecraft_tpu.models import encodec as ec
    from voicecraft_tpu.data.phonemes import make_text_tokenizer
    from voicecraft_tpu.data.manifest import write_manifest_tree
    from voicecraft_tpu.utils import audio as au

    if args.codec is None and args.codec_bins:
        import jax
        from voicecraft_tpu.models.encodec import EncodecConfig, init_encodec
        ccfg = EncodecConfig(codebook_size=args.codec_bins)
        cparams = init_encodec(ccfg, jax.random.PRNGKey(0))
    else:
        ccfg, cparams = load_codec(args.codec, args.random_init)
    tok = make_text_tokenizer(args.language, args.text_backend)

    ids = sorted(os.path.splitext(f)[0] for f in os.listdir(args.audio_dir)
                 if f.endswith(".wav"))
    items = []
    for uid in ids:
        txt_fn = os.path.join(args.audio_dir, uid + ".txt")
        if not os.path.exists(txt_fn):
            logging.warning("no transcript for %s, skipping", uid)
            continue
        with open(txt_fn) as f:
            text = f.read().strip()
        phones = tok.phonemize(text)
        wav = au.load_audio(os.path.join(args.audio_dir, uid + ".wav"),
                            ccfg.sample_rate)
        codes = ec.encode_bucketed(cparams, wav, ccfg)[0]
        items.append({"id": uid, "phones": phones, "codes": codes.tolist()})
        logging.info("%s: %d phones, %d frames", uid, len(phones),
                     codes.shape[1])

    from voicecraft_tpu.config import giga830M
    write_manifest_tree(args.out_dir, items, giga830M(), args.split)
    logging.info("wrote %d items to %s", len(items), args.out_dir)


if __name__ == "__main__":
    main()
