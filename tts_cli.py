#!/usr/bin/env python
"""Zero-shot TTS CLI (reference tts_demo.py + inference_tts_scale.py).

Continue a voice prompt with new text:

  python tts_cli.py --model ckpt.pth --codec encodec.th \\
      --prompt-wav demo.wav --prompt-transcript "..." \\
      --target-transcript "..." --out out.wav

Smoke mode (no checkpoints): --model giga330M --random-init
"""

import argparse
import logging
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True,
                    help=".pth bundle, orbax ckpt dir, or preset name")
    ap.add_argument("--codec", default=None, help="audiocraft .th checkpoint")
    ap.add_argument("--prompt-wav", required=True)
    ap.add_argument("--prompt-transcript", default=None,
                    help="transcript of the prompt; omit to transcribe with "
                         "--asr-model (reference gradio_app.py whisper path)")
    ap.add_argument("--asr-model", default=None,
                    help="local Whisper snapshot dir for auto-transcription")
    ap.add_argument("--target-transcript", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--prompt-end-sec", type=float, default=-1.0,
                    help="cut the prompt at this time (reference cut_off_sec)")
    ap.add_argument("--mfa-csv", default=None,
                    help="MFA alignment CSV: snap --prompt-end-sec to a word "
                         "boundary and truncate the prompt transcript "
                         "(reference tts_demo.py find_closest_word_boundary)")
    ap.add_argument("--snap-cutoff", action="store_true",
                    help="snap --prompt-end-sec to a word boundary using the "
                         "in-process aligner (no MFA CSV needed)")
    ap.add_argument("--margin", type=float, default=0.04)
    ap.add_argument("--cutoff-tolerance", type=float, default=1.0)
    # sampling defaults per reference README.md:24 (post 03/2025)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--stop-repetition", type=int, default=3)
    ap.add_argument("--sample-batch-size", type=int, default=1)
    ap.add_argument("--spec", type=int, default=0, metavar="TAU",
                    help="speculative decoding with TAU tokens per verified "
                         "pass (checkpoint must carry MTP heads, "
                         "train_cli --n-mtp); greedy output identical to "
                         "plain decoding, sampled output equally valid")
    ap.add_argument("--silence-tokens", type=int, nargs="*",
                    default=[1388, 1898, 131])
    ap.add_argument("--spec-sampling", default="exact",
                    choices=["exact", "stochastic"],
                    help="speculative verification: 'exact' (greedy-only "
                         "speedup, draw-identical output) or 'stochastic' "
                         "(speculative SAMPLING, distribution-exact under "
                         "temperature>0)")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--text-backend", default="auto",
                    choices=["auto", "phonemizer", "espeak", "grapheme"])
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--long", action="store_true",
                    help="long-form mode: split the target transcript into "
                         "sentences and synthesize each against the prompt "
                         "(reference gradio_app.py 'Long TTS' mode)")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    args = ap.parse_args()
    from voicecraft_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup(args.platform)
    logging.basicConfig(level=logging.INFO)

    from voicecraft_tpu.inference.loader import load_model, load_codec
    from voicecraft_tpu.inference.tts import (inference_tts,
                                              inference_tts_batch,
                                              inference_tts_spec)
    from voicecraft_tpu.models.voicecraft import SamplingConfig
    from voicecraft_tpu.models import encodec as ec
    from voicecraft_tpu.data.phonemes import make_text_tokenizer, phones_to_ids
    from voicecraft_tpu.utils import audio as au

    cfg, params, phn2num = load_model(args.model, args.random_init, args.seed)
    if args.spec > 1 and "mtp_heads" not in params:
        if not args.random_init:
            ap.error("--spec needs a checkpoint with MTP heads "
                     "(train_cli --n-mtp)")
        import dataclasses as _dc
        import jax as _jax
        from voicecraft_tpu.models.voicecraft import init_params as _ip
        cfg = _dc.replace(cfg, n_mtp=args.spec - 1)
        params = _ip(cfg, _jax.random.PRNGKey(args.seed))
    ccfg, cparams = load_codec(args.codec, args.random_init, args.seed)

    if args.prompt_transcript is None:
        from voicecraft_tpu.utils.transcribe import make_transcriber
        wav0 = au.load_audio(args.prompt_wav, 16000)
        args.prompt_transcript = make_transcriber(args.asr_model).transcribe(
            wav0, 16000)
        logging.info("transcribed prompt: %s", args.prompt_transcript)

    if args.prompt_end_sec > 0 and (args.mfa_csv or args.snap_cutoff):
        from voicecraft_tpu.inference.tts import find_closest_word_boundary
        if args.mfa_csv:
            import csv as _csv
            with open(args.mfa_csv) as f:
                rdr = _csv.DictReader(f)
                rows = [(r["Begin"], r["End"]) for r in rdr]
        else:
            # no MFA CSV: word boundaries from the in-process aligner
            # (predict.py-style; align.py Whisper timestamps or energy VAD)
            from voicecraft_tpu.align import align_words
            wav0 = au.load_audio(args.prompt_wav, ccfg.sample_rate)
            arows = align_words(wav0, ccfg.sample_rate,
                                args.prompt_transcript.strip().lower(),
                                asr_model_path=args.asr_model)
            rows = [(r["Begin"], r["End"]) for r in arows]
        snapped, idx = find_closest_word_boundary(
            rows, args.prompt_end_sec, args.margin, args.cutoff_tolerance)
        if snapped is not None:
            logging.info("prompt cutoff snapped: %.2fs -> %.3fs",
                         args.prompt_end_sec, snapped)
            args.prompt_end_sec = snapped
            # truncate the prompt transcript to the words before the cutoff
            # (reference tts_demo.py:173)
            words = args.prompt_transcript.split(" ")
            n_words = min(idx + 1, len(words))
            args.prompt_transcript = " ".join(words[:n_words])

    tok = make_text_tokenizer(args.language, args.text_backend)
    # reference inference_tts_scale.py:45-51: phonemize combined transcript
    text = args.prompt_transcript.strip() + " " + args.target_transcript.strip()
    phones = tok.phonemize(text)
    if phn2num is None:
        from voicecraft_tpu.data.phonemes import build_vocab
        phn2num = build_vocab([phones])
    x = np.asarray(phones_to_ids(phones, phn2num), np.int32)
    logging.info("phonemized to %d symbols", len(x))

    wav = au.load_audio(args.prompt_wav, ccfg.sample_rate)
    if args.prompt_end_sec > 0:
        wav = wav[:, :int(args.prompt_end_sec * ccfg.sample_rate)]
    t0 = time.time()
    codes = ec.encode_bucketed(cparams, wav, ccfg)[0]
    logging.info("prompt: %.2fs -> %d frames (%.2fs encode)",
                 wav.shape[1] / ccfg.sample_rate, codes.shape[1],
                 time.time() - t0)

    scfg = SamplingConfig(top_k=args.top_k, top_p=args.top_p,
                          temperature=args.temperature,
                          stop_repetition=args.stop_repetition,
                          silence_tokens=tuple(args.silence_tokens),
                          spec_sampling=args.spec_sampling)

    def synth(target_text, seed):
        phones_i = tok.phonemize(
            args.prompt_transcript.strip() + " " + target_text.strip())
        xi = np.asarray(phones_to_ids(phones_i, phn2num), np.int32)
        if args.sample_batch_size > 1:
            return inference_tts_batch(params, cfg, xi, codes, scfg,
                                       batch_size=args.sample_batch_size,
                                       seed=seed)
        if args.spec > 1:
            return inference_tts_spec(params, cfg, xi, codes, scfg,
                                      n_draft=args.spec, seed=seed)
        return inference_tts(params, cfg, xi, codes, scfg, seed=seed)

    t0 = time.time()
    if args.long:
        from voicecraft_tpu.utils.transcribe import split_sentences
        sentences = split_sentences(args.target_transcript)
        logging.info("long-form mode: %d sentences", len(sentences))
        gens = [synth(s, args.seed + i)[1] for i, s in enumerate(sentences)]
        gen = np.concatenate(gens, axis=1)
        full = np.concatenate([codes, gen], axis=1)
    elif args.sample_batch_size > 1:
        full, gen = inference_tts_batch(params, cfg, x, codes, scfg,
                                        batch_size=args.sample_batch_size,
                                        seed=args.seed)
    elif args.spec > 1:
        full, gen, st = inference_tts_spec(params, cfg, x, codes, scfg,
                                           n_draft=args.spec, seed=args.seed,
                                           return_stats=True)
        logging.info("speculative decode: %d tokens in %d passes "
                     "(%.2f tok/pass)", st["tokens"], st["passes"],
                     st["tokens_per_pass"])
    else:
        full, gen = inference_tts(params, cfg, x, codes, scfg, seed=args.seed)
    gen_sec = gen.shape[1] / cfg.encodec_sr
    dt = time.time() - t0
    logging.info("generated %d frames (%.2fs audio) in %.2fs (%.2fx realtime)",
                 gen.shape[1], gen_sec, dt, gen_sec / max(dt, 1e-9))

    out = ec.decode_bucketed(cparams, full[None], ccfg)[0]
    au.write_wav(args.out, out, ccfg.sample_rate)
    concat_out = args.out.replace(".wav", "_gen_only.wav")
    gen_wav = ec.decode_bucketed(cparams, gen[None], ccfg)[0] if gen.shape[1] else np.zeros(0, np.float32)
    au.write_wav(concat_out, gen_wav, ccfg.sample_rate)
    logging.info("wrote %s and %s", args.out, concat_out)


if __name__ == "__main__":
    main()
