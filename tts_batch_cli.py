#!/usr/bin/env python
"""Batch zero-shot TTS over a manifest (reference
inference_tts_scale.py:127-192 __main__).

Manifest: TSV with a header row; columns follow the reference layout —
  col 0: audio path (relative to --audio-root)
  col 1: output wav name
  col 2: transcript (prompt words + target words)
  col 3: prompt end time (seconds)
  col 5: "start_ind,..." — the word index where synthesis starts

For each row the prompt is the audio up to prompt-end and the words before
start_ind; the words from start_ind on are synthesized.  Outputs
gen_<name>_<i>_seed<seed>.wav and concat_<name>_<i>_seed<seed>.wav like the
reference.

TPU-first difference: rows are decoded in waves of --lanes through the
multi-stream serving loop (inference/serving.py) — distinct prompts share
every weight read — instead of the reference's one-by-one loop.

  python tts_batch_cli.py --model ckpt --codec enc.th --manifest m.tsv \\
      --audio-root /data --output-dir out/ [--lanes 8] [--wer --asr-model D]
"""

import argparse
import logging
import os
import time

import numpy as np

log = logging.getLogger("voicecraft_tpu.tts_batch")


def parse_manifest(path):
    with open(path) as f:
        rows = [l.rstrip("\n").split("\t") for l in f]
    rows = rows[1:]
    out = []
    for r in rows:
        if len(r) < 6 or not r[0]:
            continue
        out.append({"audio": r[0], "out_name": r[1], "text": r[2],
                    "prompt_end": float(r[3]),
                    "start_ind": int(r[5].split(",")[0])})
    return out


def word_error_rate(ref: str, hyp: str) -> float:
    """Levenshtein WER between two transcripts (dependency-free)."""
    r, h = ref.lower().split(), hyp.lower().split()
    d = np.zeros((len(r) + 1, len(h) + 1), np.int32)
    d[:, 0] = np.arange(len(r) + 1)
    d[0, :] = np.arange(len(h) + 1)
    for i in range(1, len(r) + 1):
        for j in range(1, len(h) + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (r[i - 1] != h[j - 1]))
    return float(d[-1, -1]) / max(len(r), 1)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--codec", default=None)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--audio-root", default="")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--lanes", type=int, default=8,
                    help="rows decoded per multi-stream wave")
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=0.8)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--stop-repetition", type=int, default=-1)
    ap.add_argument("--silence-tokens", type=int, nargs="*",
                    default=[1388, 1898, 131])
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--text-backend", default="auto")
    ap.add_argument("--kv-fp8", action="store_true",
                    help="fp8 KV slab for the serving waves")
    ap.add_argument("--spec", default="0", metavar="TAU|auto[:TAU]",
                    help="speculative decoding across lanes (checkpoint "
                         "must carry MTP heads; greedy output identical). "
                         "'auto' measures plain-vs-spec throughput on the "
                         "manifest's own waves and decodes from the faster "
                         "mode (inference/autospec.py)")
    ap.add_argument("--fp8", action="store_true",
                    help="weight-only fp8 serving quantization")
    ap.add_argument("--spec-sampling", default="exact",
                    choices=["exact", "stochastic"])
    ap.add_argument("--wer", action="store_true",
                    help="score generated audio with ASR WER "
                         "(needs --asr-model)")
    ap.add_argument("--asr-model", default=None,
                    help="local Whisper snapshot dir for --wer")
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    from voicecraft_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup(args.platform)
    logging.basicConfig(level=logging.INFO)

    from voicecraft_tpu.inference.loader import load_model, load_codec
    from voicecraft_tpu.inference.serving import serve_tts_batch
    from voicecraft_tpu.models.voicecraft import SamplingConfig
    from voicecraft_tpu.models import encodec as ec
    from voicecraft_tpu.data.phonemes import (make_text_tokenizer,
                                              phones_to_ids, build_vocab)
    from voicecraft_tpu.utils import audio as au

    cfg, params, phn2num = load_model(args.model, args.random_init, args.seed)
    if args.fp8:
        from voicecraft_tpu.utils.quantize import quantize_decoder_fp8
        params = quantize_decoder_fp8(params, pack_qkv=True)
    ccfg, cparams = load_codec(args.codec, args.random_init, args.seed)
    tok = make_text_tokenizer(args.language, args.text_backend)
    rows = parse_manifest(args.manifest)
    os.makedirs(args.output_dir, exist_ok=True)
    log.info("%d manifest rows, %d lanes", len(rows), args.lanes)

    scfg = SamplingConfig(top_k=max(args.top_k, 0), top_p=args.top_p,
                          temperature=args.temperature,
                          stop_repetition=args.stop_repetition,
                          silence_tokens=tuple(args.silence_tokens),
                          spec_sampling=args.spec_sampling)

    # prepare every request up front (host work), then decode in waves
    reqs, metas = [], []
    for i, row in enumerate(rows):
        wav = au.load_audio(os.path.join(args.audio_root, row["audio"]),
                            ccfg.sample_rate)
        end = int(round(row["prompt_end"] * ccfg.sample_rate))
        prompt_wav = wav[:, :end] if end > 0 else wav
        codes = ec.encode_bucketed(cparams, prompt_wav, ccfg)[0]
        phones = tok.phonemize(row["text"].strip())
        if phn2num is None:
            phn2num = build_vocab([phones])
        x = np.asarray(phones_to_ids(phones, phn2num), np.int32)
        to_syn = " ".join(row["text"].split(" ")[row["start_ind"]:])
        reqs.append((x, codes))
        metas.append({"i": i, "row": row, "prompt_wav": prompt_wav,
                      "to_syn": to_syn})

    from voicecraft_tpu.inference.autospec import resolve_spec_arg
    spec_tau, autospec = resolve_spec_arg(args.spec, params)
    if str(args.spec).startswith("auto") and spec_tau == 0:
        log.warning("--spec auto: checkpoint has no MTP heads; plain waves")

    wers = []
    t0 = time.time()
    for lo in range(0, len(reqs), args.lanes):
        wave_reqs = reqs[lo:lo + args.lanes]
        wave_meta = metas[lo:lo + args.lanes]
        if len(wave_reqs) > 1 or spec_tau > 1 or args.kv_fp8:
            # serving path handles B=1 too; a plain-inference fallback for
            # a lone trailing request would silently drop --spec/--kv-fp8
            mode = autospec.next_mode() if autospec is not None else spec_tau
            wave_stats: dict = {}
            outs = serve_tts_batch(
                params, cfg, wave_reqs, scfg, seed=args.seed,
                kv_dtype="float8_e4m3fn" if args.kv_fp8 else None,
                spec=mode, stats=wave_stats)
            if autospec is not None:
                autospec.observe(mode, wave_stats["frames"],
                                 wave_stats["seconds"],
                                 tok_per_pass=wave_stats["tok_per_pass"])
        else:
            from voicecraft_tpu.inference.tts import inference_tts
            x, y = wave_reqs[0]
            outs = [inference_tts(params, cfg, x, y, scfg, seed=args.seed)]
        for (full, gen), m in zip(outs, wave_meta):
            i, row = m["i"], m["row"]
            base = row["out_name"][:-4] if row["out_name"].endswith(".wav") \
                else row["out_name"]
            gen_wav = ec.decode_bucketed(cparams, gen[None], ccfg)[0] \
                if gen.shape[1] else np.zeros((0,), np.float32)
            concat = np.concatenate([m["prompt_wav"][0], gen_wav])
            au.write_wav(os.path.join(
                args.output_dir, f"gen_{base}_{i}_seed{args.seed}.wav"),
                gen_wav, ccfg.sample_rate)
            au.write_wav(os.path.join(
                args.output_dir, f"concat_{base}_{i}_seed{args.seed}.wav"),
                concat, ccfg.sample_rate)
            if args.wer:
                from voicecraft_tpu.utils.transcribe import make_transcriber
                asr = make_transcriber(args.asr_model)
                hyp = asr.transcribe(gen_wav, ccfg.sample_rate)
                w = word_error_rate(m["to_syn"], hyp)
                wers.append(w)
                log.info("row %d WER %.3f (%r vs %r)", i, w,
                         m["to_syn"][:60], hyp[:60])
        log.info("wave %d..%d done (%.1fs elapsed)", lo,
                 lo + len(wave_reqs) - 1, time.time() - t0)
    if autospec is not None:
        log.info("autospec: %s", autospec.snapshot())
    if wers:
        log.info("mean WER over %d rows: %.4f", len(wers),
                 float(np.mean(wers)))


if __name__ == "__main__":
    main()
