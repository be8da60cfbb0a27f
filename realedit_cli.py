#!/usr/bin/env python
"""RealEdit batch speech-editing driver (reference
inference_speech_editing_scale.py:127-226 main loop over RealEdit.txt).

Manifest TSV columns: wav_fn, orig_transcript, new_transcript,
orig_masked_span, new_masked_span, type.  Word alignments are MFA CSVs named
<wav_fn stem>.csv in --align-dir.

  python realedit_cli.py --manifest RealEdit.txt --audio-dir wavs/ \\
      --align-dir alignments/ --model ckpt.pth --codec encodec.th --out-dir out/
"""

import argparse
import csv
import logging
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--audio-dir", required=True)
    ap.add_argument("--align-dir", required=True)
    ap.add_argument("--model", required=True)
    ap.add_argument("--codec", default=None)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--left-margin", type=float, default=0.08)
    ap.add_argument("--right-margin", type=float, default=0.08)
    ap.add_argument("--top-k", type=int, default=-1)
    ap.add_argument("--top-p", type=float, default=0.8)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--stop-repetition", type=int, default=-1)
    ap.add_argument("--silence-tokens", type=int, nargs="*",
                    default=[1388, 1898, 131])
    ap.add_argument("--spec", type=int, default=0, metavar="TAU",
                    help="speculative decoding (MTP-head checkpoint; "
                         "greedy output identical to plain decoding)")
    ap.add_argument("--lanes", type=int, default=1,
                    help="decode N manifest rows per lockstep wave "
                         "(serve_edit_batch — batch-1 decode streams all "
                         "weights per step, so N lanes cost ~one row); "
                         "composes with --spec (speculative waves)")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--spec-sampling", default="exact",
                    choices=["exact", "stochastic"])
    ap.add_argument("--num-seeds", type=int, default=1,
                    help="write one output per seed (reference _new_seed{n})")
    ap.add_argument("--wer", action="store_true",
                    help="score edited audio against new_transcript with "
                         "ASR WER (needs --asr-model)")
    ap.add_argument("--asr-model", default=None,
                    help="local Whisper snapshot dir for --wer")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--text-backend", default="auto")
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    from voicecraft_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup(args.platform)

    from voicecraft_tpu.inference.loader import load_model, load_codec
    from voicecraft_tpu.inference.editing import inference_edit, get_mask_interval
    from voicecraft_tpu.models.voicecraft import SamplingConfig
    from voicecraft_tpu.models import encodec as ec
    from voicecraft_tpu.data.phonemes import make_text_tokenizer, phones_to_ids
    from voicecraft_tpu.utils import audio as au

    cfg, params, phn2num = load_model(args.model, args.random_init, args.seed)
    ccfg, cparams = load_codec(args.codec, args.random_init, args.seed)
    tok = make_text_tokenizer(args.language, args.text_backend)
    os.makedirs(args.out_dir, exist_ok=True)

    with open(args.manifest) as f:
        rows = list(csv.DictReader(f, delimiter="\t"))
    if args.limit:
        rows = rows[:args.limit]

    scfg = SamplingConfig(top_k=args.top_k if args.top_k > 0 else 0,
                          top_p=args.top_p, temperature=args.temperature,
                          stop_repetition=args.stop_repetition,
                          silence_tokens=tuple(args.silence_tokens),
                          spec_sampling=args.spec_sampling)

    # ---- prepare every row (host: audio load, codec encode, span calc) ----
    prepared = []      # (i, row, stem, x, codes, intervals)
    for i, row in enumerate(rows):
        try:
            wav_fn = row["wav_fn"]
            stem = os.path.splitext(wav_fn)[0]
            wav = au.load_audio(os.path.join(args.audio_dir, wav_fn),
                                ccfg.sample_rate)
            audio_dur = wav.shape[1] / ccfg.sample_rate
            codes = ec.encode_bucketed(cparams, wav, ccfg)[0]

            with open(os.path.join(args.align_dir, stem + ".csv")) as f:
                words = [r for r in csv.DictReader(f)
                         if r.get("Type", "words") == "words"]
            # pipe-separated multi-span rows (reference
            # inference_speech_editing_scale.py:186-201)
            sr = cfg.encodec_sr
            intervals = []
            for ind_inter, edit_type in zip(
                    row["orig_masked_span"].split("|"),
                    row["type"].split("|")):
                span = tuple(int(v) for v in ind_inter.split(","))
                s_sec, e_sec = get_mask_interval(words, span, edit_type)
                s_sec = max(s_sec - args.left_margin, 1.0 / sr)
                e_sec = min(e_sec + args.right_margin, audio_dur)
                intervals.append((round(s_sec * sr), round(e_sec * sr)))
            intervals.sort()

            phones = tok.phonemize(row["new_transcript"].strip())
            if phn2num is None:
                from voicecraft_tpu.data.phonemes import build_vocab
                phn2num = build_vocab([phones])
            x = np.asarray(phones_to_ids(phones, phn2num), np.int32)
            prepared.append((i, row, stem, x, codes, intervals))
        except Exception as e:
            logging.warning("[%d/%d] %s failed to prepare: %s", i + 1,
                            len(rows), row.get("wav_fn"), e)

    n_ok = 0
    wers = []

    def emit(row, stem, res, seed_s):
        out = ec.decode_bucketed(cparams, res[None], ccfg)[0]
        out_fn = os.path.join(args.out_dir, f"{stem}_new_seed{seed_s}.wav")
        au.write_wav(out_fn, out, ccfg.sample_rate)
        if args.wer:
            from voicecraft_tpu.utils.transcribe import make_transcriber
            from tts_batch_cli import word_error_rate
            hyp = make_transcriber(args.asr_model).transcribe(
                out, ccfg.sample_rate)
            w = word_error_rate(row["new_transcript"], hyp)
            wers.append(w)
            logging.info("  seed %d WER %.3f", seed_s, w)

    if args.lanes > 1:
        # lockstep waves over the prepared rows, one pass per seed
        from voicecraft_tpu.inference.serving import serve_edit_batch
        for s in range(args.num_seeds):
            done_rows = set()
            for lo in range(0, len(prepared), args.lanes):
                chunk = prepared[lo:lo + args.lanes]
                try:
                    outs = serve_edit_batch(
                        params, cfg, [(x, c, iv) for _, _, _, x, c, iv
                                      in chunk],
                        scfg, seed=args.seed + s, spec=args.spec)
                    for (i, row, stem, _, _, iv), res in zip(chunk, outs):
                        emit(row, stem, res, args.seed + s)
                        done_rows.add(i)
                        logging.info("[%d/%d] %s: spans -> frames %s, ok "
                                     "(wave of %d)", i + 1, len(rows),
                                     row["wav_fn"], iv, len(chunk))
                except Exception as e:
                    logging.warning("wave %d..%d failed: %s", lo,
                                    lo + len(chunk) - 1, e)
            if s == 0:
                n_ok = len(done_rows)
    else:
        for i, row, stem, x, codes, intervals in prepared:
            try:
                for s in range(args.num_seeds):
                    res = inference_edit(params, cfg, x, codes, intervals,
                                         scfg, seed=args.seed + s,
                                         spec=args.spec)
                    emit(row, stem, res, args.seed + s)
                n_ok += 1
                logging.info("[%d/%d] %s: spans -> frames %s, ok",
                             i + 1, len(rows), row["wav_fn"], intervals)
            except Exception as e:
                logging.warning("[%d/%d] %s failed: %s", i + 1, len(rows),
                                row.get("wav_fn"), e)
    logging.info("done: %d/%d edited", n_ok, len(rows))
    if wers:
        logging.info("mean WER over %d outputs: %.4f", len(wers),
                     float(np.mean(wers)))


if __name__ == "__main__":
    main()
