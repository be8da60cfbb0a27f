#!/usr/bin/env python
"""Offline preprocessing: audio + transcripts -> phoneme/code manifest tree.

Equivalent of the reference data/phonemize_encodec_encode_hf.py.  Two
sources:

  # any local directory of <id>.wav + <id>.txt transcript pairs
  python preprocess_cli.py --audio-dir wavs/ --out-dir data/mydataset \\
      --codec encodec.th --split train

  # an HF datasets source (e.g. a local speechcolab/gigaspeech snapshot —
  # the reference's source, phonemize_encodec_encode_hf.py:80)
  python preprocess_cli.py --hf-dataset speechcolab/gigaspeech --hf-subset xs \\
      --out-dir data/gigaspeech --codec encodec.th --split train

Writes manifest/{split}.txt, vocab.txt, phonemes/<id>.txt,
encodec_16khz_4codebooks/<id>.txt in the reference's exact on-disk format.
"""

import argparse
import logging
import os

import numpy as np


def iter_local_dir(audio_dir, sample_rate, load_audio):
    ids = sorted(os.path.splitext(f)[0] for f in os.listdir(audio_dir)
                 if f.endswith(".wav"))
    for uid in ids:
        txt_fn = os.path.join(audio_dir, uid + ".txt")
        if not os.path.exists(txt_fn):
            logging.warning("no transcript for %s, skipping", uid)
            continue
        with open(txt_fn) as f:
            text = f.read().strip()
        wav = load_audio(os.path.join(audio_dir, uid + ".wav"), sample_rate)
        yield uid, text, wav


def iter_hf_dataset(name, subset, split, sample_rate, limit=None):
    """Reference gigaspeech path: HF datasets with audio + text columns
    (works offline against a local datasets cache/snapshot)."""
    import datasets
    from voicecraft_tpu.utils.audio import resample
    ds = datasets.load_dataset(name, subset, split=split,
                               trust_remote_code=True)
    for i, ex in enumerate(ds):
        if limit and i >= limit:
            break
        audio = ex["audio"]
        wav = np.asarray(audio["array"], np.float32)[None]
        if audio["sampling_rate"] != sample_rate:
            wav = resample(wav, audio["sampling_rate"], sample_rate)
        uid = ex.get("segment_id") or ex.get("id") or f"utt{i:08d}"
        text = ex.get("text") or ex.get("transcript") or ""
        yield str(uid), text, wav


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--audio-dir", default=None)
    ap.add_argument("--hf-dataset", default=None,
                    help="HF datasets name (local snapshot; zero-egress "
                         "environments need a pre-populated cache)")
    ap.add_argument("--hf-subset", default=None)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--codec", default=None)
    ap.add_argument("--split", default="train")
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--text-backend", default="auto")
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
    assert (args.audio_dir is None) != (args.hf_dataset is None), \
        "pass exactly one of --audio-dir / --hf-dataset"

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

    if args.audio_dir:
        source = iter_local_dir(args.audio_dir, ccfg.sample_rate,
                                au.load_audio)
    else:
        source = iter_hf_dataset(args.hf_dataset, args.hf_subset, args.split,
                                 ccfg.sample_rate, args.limit)

    items = []
    for uid, text, wav in source:
        phones = tok.phonemize(text)
        codes = ec.encode_bucketed(cparams, wav, ccfg)[0]
        items.append({"id": uid, "phones": phones, "codes": codes.tolist()})
        logging.info("%s: %d phones, %d frames", uid, len(phones),
                     codes.shape[1])

    from voicecraft_tpu.config import giga830M
    write_manifest_tree(args.out_dir, items, giga830M(), args.split)
    logging.info("wrote %d items to %s", len(items), args.out_dir)


if __name__ == "__main__":
    main()
