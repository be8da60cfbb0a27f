#!/usr/bin/env python
"""Speech-editing CLI (reference inference_speech_editing_scale.py).

Regenerate the span of audio corresponding to a transcript edit:

  python edit_cli.py --model ckpt.pth --codec encodec.th --wav orig.wav \\
      --orig-transcript "..." --target-transcript "..." \\
      --edit-type substitution --out edited.wav

Word alignments come from --mfa-csv (Begin,End,Label,Type rows) when given;
otherwise they are derived in-process (voicecraft_tpu/align.py): Whisper
cross-attention timestamps when --asr-model points at a local snapshot, else
the dependency-free energy aligner — matching the reference's
auto-alignment behaviour (predict.py:209-215).  The edited word span is
found by diffing transcripts (edit_utils.get_span), converted to seconds via
the alignment, padded by --left/right-margin, then to codec frames
(reference inference_speech_editing_scale.py:107-127, 193-207).
"""

import argparse
import csv
import logging

import numpy as np


def read_mfa_csv(path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return [r for r in rows if r.get("Type", "words") == "words"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--codec", default=None)
    ap.add_argument("--wav", required=True)
    ap.add_argument("--orig-transcript", required=True)
    ap.add_argument("--target-transcript", required=True)
    ap.add_argument("--edit-type", required=True,
                    choices=["substitution", "insertion", "deletion"])
    ap.add_argument("--mfa-csv", default=None,
                    help="word-alignment CSV; omitted -> align in-process")
    ap.add_argument("--asr-model", default=None,
                    help="local Whisper snapshot dir for alignment/"
                         "transcription when no --mfa-csv is given")
    ap.add_argument("--out", required=True)
    ap.add_argument("--left-margin", type=float, default=0.08)
    ap.add_argument("--right-margin", type=float, default=0.08)
    # editing sampling defaults (reference inference_speech_editing_scale.py:24-37)
    ap.add_argument("--top-k", type=int, default=-1)
    ap.add_argument("--top-p", type=float, default=0.8)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--stop-repetition", type=int, default=-1)
    ap.add_argument("--silence-tokens", type=int, nargs="*",
                    default=[1388, 1898, 131])
    ap.add_argument("--spec", type=int, default=0, metavar="TAU",
                    help="speculative decoding with TAU tokens per verified "
                         "pass (checkpoint must carry MTP heads, "
                         "train_cli --n-mtp); greedy output identical to "
                         "plain decoding")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--spec-sampling", default="exact",
                    choices=["exact", "stochastic"])
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--text-backend", default="auto")
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    args = ap.parse_args()
    from voicecraft_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup(args.platform)
    logging.basicConfig(level=logging.INFO)

    from voicecraft_tpu.inference.loader import load_model, load_codec
    from voicecraft_tpu.inference.editing import (
        inference_edit, get_span, get_mask_interval)
    from voicecraft_tpu.models.voicecraft import SamplingConfig
    from voicecraft_tpu.models import encodec as ec
    from voicecraft_tpu.data.phonemes import make_text_tokenizer, phones_to_ids
    from voicecraft_tpu.utils import audio as au

    cfg, params, phn2num = load_model(args.model, args.random_init, args.seed)
    ccfg, cparams = load_codec(args.codec, args.random_init, args.seed)

    tok = make_text_tokenizer(args.language, args.text_backend)
    phones = tok.phonemize(args.target_transcript.strip())
    if phn2num is None:
        from voicecraft_tpu.data.phonemes import build_vocab
        phn2num = build_vocab([phones])
    x = np.asarray(phones_to_ids(phones, phn2num), np.int32)

    wav = au.load_audio(args.wav, ccfg.sample_rate)
    codes = ec.encode_bucketed(cparams, wav, ccfg)[0]
    audio_dur = wav.shape[1] / ccfg.sample_rate

    if args.mfa_csv:
        words = read_mfa_csv(args.mfa_csv)
    else:
        from voicecraft_tpu.align import align_words
        words = align_words(wav, ccfg.sample_rate,
                            args.orig_transcript.strip().lower(),
                            asr_model_path=args.asr_model)
        logging.info("in-process alignment: %s",
                     [(r["Label"], r["Begin"], r["End"]) for r in words])
    orig_span, _ = get_span(args.orig_transcript.strip().lower(),
                            args.target_transcript.strip().lower(),
                            args.edit_type)
    start_sec, end_sec = get_mask_interval(words, tuple(orig_span),
                                           args.edit_type)
    # margins + clamp (reference inference_speech_editing_scale.py:196-197:
    # floor at one codec frame, ceil at the audio duration, round() to
    # frames); energy-aligner timestamps auto-widen to the characterized
    # p90 boundary error so word edges aren't clipped
    from voicecraft_tpu.align import widen_margins_for_aligner
    left_m, right_m, _ = widen_margins_for_aligner(
        words, args.left_margin, args.right_margin)
    sr = cfg.encodec_sr
    start_sec = max(start_sec - left_m, 1.0 / sr)
    end_sec = min(end_sec + right_m, audio_dur)
    interval = (round(start_sec * sr), round(end_sec * sr))
    logging.info("edit span: words %s -> %.2f..%.2fs -> frames %s",
                 orig_span, start_sec, end_sec, interval)

    scfg = SamplingConfig(top_k=args.top_k if args.top_k > 0 else 0,
                          top_p=args.top_p, temperature=args.temperature,
                          stop_repetition=args.stop_repetition,
                          silence_tokens=tuple(args.silence_tokens),
                          spec_sampling=args.spec_sampling)
    res = inference_edit(params, cfg, x, codes, [interval], scfg,
                         seed=args.seed, spec=args.spec)
    out = ec.decode_bucketed(cparams, res[None], ccfg)[0]
    au.write_wav(args.out, out, ccfg.sample_rate)
    logging.info("wrote %s (%.2fs)", args.out, out.shape[-1] / ccfg.sample_rate)


if __name__ == "__main__":
    main()
