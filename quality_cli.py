#!/usr/bin/env python
"""ASR-free output-quality harness (VERDICT r03 #3).

The reference's quality evidence is human listening + WER over published
checkpoints; neither exists in a zero-egress environment.  This CLI scores
generated AUDIO against ground-truth audio directly: synthesize held-out
transcripts (whose exact waveforms the procedural corpus provides), then
report DTW-aligned log-mel distance, MCD, and duration sanity per decode
mode — proving the fast paths (spec, stochastic, fp8, streaming) cost zero
quality relative to the plain decode, with the codec resynthesis floor as
context.  ``--wer`` paths stay in tts_batch_cli/realedit_cli for
weights-available environments.

Modes:
  resynth     codec round-trip of the ground-truth continuation (floor)
  plain       greedy TTS (temperature 0)
  spec        greedy speculative (inference_tts_spec) + bit-exact check
  stream      streaming engine + bit-exact check vs plain
  fp8         weight-only fp8 decoder, greedy
  sampled     plain loop at --temperature (the stochastic baseline)
  stochastic  speculative stochastic sampling at --temperature
  edit        greedy speech editing: mask --edit-span of each utterance,
              regenerate, score the full utterance AND the regenerated
              span against ground truth (reference voicecraft.py:561-906
              — the reference's signature capability, scored numerically)
  edit_spec   greedy speculative editing + bit-exact check vs edit
  edit_stoch  stochastic speculative editing at --temperature

Usage:
  python quality_cli.py --model EXP/ckpt_latest --eval-dir CORPUS/eval \\
      --codec-bins 2048 --n 8 --modes resynth plain spec fp8
"""

import argparse
import glob
import json
import logging
import os
import time

import numpy as np

ALL_MODES = ("resynth", "plain", "spec", "stream", "fp8", "sampled",
             "stochastic", "edit", "edit_spec", "edit_stoch")
EDIT_MODES = ("edit", "edit_spec", "edit_stoch")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--eval-dir", required=True)
    ap.add_argument("--codec", default=None)
    ap.add_argument("--codec-bins", type=int, default=None)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--prompt-sec", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=0.0,
                    help="skip eval utterances shorter than this.  With a "
                         "2 s prompt, a 2.2 s utterance leaves a 0.2 s "
                         "ground-truth continuation — its duration_ratio "
                         "and distances measure nothing; quality tables "
                         "should use utterances comfortably longer than "
                         "the prompt (e.g. --min-sec 4)")
    ap.add_argument("--modes", nargs="*", default=list(ALL_MODES),
                    choices=list(ALL_MODES))
    ap.add_argument("--edit-span", type=float, nargs=2, default=[0.4, 0.7],
                    help="fractional (start, end) of each utterance to "
                         "mask and regenerate for the edit modes")
    ap.add_argument("--tau", type=int, default=None,
                    help="draft count for spec/stochastic (default: the "
                         "checkpoint's full MTP depth)")
    ap.add_argument("--temperature", type=float, default=0.8,
                    help="sampling temperature for sampled/stochastic")
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--ref", default="auto",
                    choices=["auto", "gt", "resynth"],
                    help="scoring reference: 'gt' = the raw ground-truth "
                         "waveform (meaningful with a REAL codec); "
                         "'resynth' = the codec round-trip of the ground-"
                         "truth codes (the right reference for a random-"
                         "init codec, where decode() of ANY tokens is far "
                         "from raw audio and gt-relative numbers only "
                         "measure the codec floor); 'auto' = resynth when "
                         "--codec-bins (random-init) is used, else gt")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    from voicecraft_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup(args.platform)
    logging.basicConfig(level=logging.INFO)

    import jax
    from voicecraft_tpu.inference.loader import load_model, load_codec
    from voicecraft_tpu.inference.tts import inference_tts, inference_tts_spec
    from voicecraft_tpu.data.phonemes import make_text_tokenizer, phones_to_ids
    from voicecraft_tpu.models.voicecraft import SamplingConfig
    from voicecraft_tpu.models import encodec as ec
    from voicecraft_tpu.utils import audio as au
    from voicecraft_tpu.utils.quality import (duration_ratio,
                                              log_mel_distance, mcd)

    cfg, params, phn2num = load_model(args.model)
    assert phn2num is not None, "checkpoint carries no phn2num vocab"
    n_mtp = (jax.tree.leaves(params["mtp_heads"])[0].shape[0]
             if "mtp_heads" in params else 0)
    tau = args.tau or (n_mtp + 1 if n_mtp else 0)
    if n_mtp and tau > n_mtp + 1:
        # a tau deeper than the checkpoint's MTP head count would raise in
        # check_mtp_heads AFTER the earlier (expensive) modes finished
        logging.warning("clamping --tau %d to the checkpoint's MTP depth "
                        "%d", tau, n_mtp + 1)
        tau = n_mtp + 1
    modes = list(args.modes)
    for m in ("spec", "stochastic", "edit_spec", "edit_stoch"):
        if m in modes and (n_mtp == 0 or tau < 2):
            logging.warning("dropping mode %s: checkpoint has no MTP heads",
                            m)
            modes.remove(m)
    tts_modes = [m for m in modes if m not in EDIT_MODES]
    edit_modes = [m for m in modes if m in EDIT_MODES]

    if args.codec is None and args.codec_bins:
        from voicecraft_tpu.models.encodec import EncodecConfig, init_encodec
        ccfg = EncodecConfig(codebook_size=args.codec_bins)
        cparams = init_encodec(ccfg, jax.random.PRNGKey(0))
    else:
        ccfg, cparams = load_codec(args.codec)
    tok = make_text_tokenizer("en-us", "grapheme")

    params_fp8 = None
    if "fp8" in modes:
        from voicecraft_tpu.utils.quantize import quantize_decoder_fp8
        params_fp8 = quantize_decoder_fp8(params)

    greedy = SamplingConfig(top_k=0, top_p=1.0, temperature=0.0,
                            stop_repetition=3)
    sampled = SamplingConfig(top_k=args.top_k, top_p=args.top_p,
                             temperature=args.temperature,
                             stop_repetition=3)
    stoch = SamplingConfig(top_k=args.top_k, top_p=args.top_p,
                           temperature=args.temperature,
                           stop_repetition=3, spec_sampling="stochastic")

    items = []
    for wav_path in sorted(glob.glob(os.path.join(args.eval_dir, "*.wav"))):
        if len(items) >= args.n:
            break
        text = open(wav_path[:-4] + ".txt").read().strip()
        wav = au.load_audio(wav_path, ccfg.sample_rate)
        if wav.shape[-1] < args.min_sec * ccfg.sample_rate:
            continue
        codes = ec.encode_bucketed(cparams, wav, ccfg)[0]
        x = np.asarray(phones_to_ids(tok.phonemize(text), phn2num), np.int32)
        p_frames = int(args.prompt_sec * ccfg.frame_rate)
        items.append({
            "x": x, "prompt": codes[:, :p_frames].astype(np.int32),
            "gt_cont_codes": codes[:, p_frames:].astype(np.int32),
            "gt_cont_wav": np.asarray(wav).reshape(-1)[
                int(args.prompt_sec * ccfg.sample_rate):],
            "codes": codes.astype(np.int32),
            "gt_wav": np.asarray(wav).reshape(-1),
            "id": os.path.basename(wav_path)})
    ref_kind = args.ref
    if ref_kind == "auto":
        ref_kind = "resynth" if (args.codec is None and args.codec_bins) \
            else "gt"
    logging.info("scoring %d held-out utterances, modes=%s, tau=%d, "
                 "ref=%s", len(items), modes, tau, ref_kind)

    def decode_audio(gen_codes):
        return np.asarray(ec.decode_bucketed(
            cparams, np.asarray(gen_codes)[None], ccfg)[0]).reshape(-1)

    def gen_for(mode, it):
        """-> (audio, gen_codes or None)"""
        x, prompt = it["x"], it["prompt"]
        if mode == "resynth":
            return decode_audio(it["gt_cont_codes"]), it["gt_cont_codes"]
        if mode == "plain":
            _, g = inference_tts(params, cfg, x, prompt, greedy,
                                 seed=args.seed)
            return decode_audio(g), g
        if mode == "spec":
            _, g = inference_tts_spec(params, cfg, x, prompt, greedy,
                                      n_draft=tau, seed=args.seed)
            return decode_audio(g), g
        if mode == "stream":
            from voicecraft_tpu.inference.streaming import stream_tts
            chunks = list(stream_tts(params, cfg, x, prompt, greedy,
                                     seed=args.seed, cparams=cparams,
                                     ccfg=ccfg))
            audio = np.concatenate([c["audio"] for c in chunks
                                    if "audio" in c and c["audio"].size]
                                   or [np.zeros(1, np.float32)])
            return audio, chunks[-1]["gen"]
        if mode == "fp8":
            _, g = inference_tts(params_fp8, cfg, x, prompt, greedy,
                                 seed=args.seed)
            return decode_audio(g), g
        if mode == "sampled":
            _, g = inference_tts(params, cfg, x, prompt, sampled,
                                 seed=args.seed)
            return decode_audio(g), g
        if mode == "stochastic":
            _, g = inference_tts_spec(params, cfg, x, prompt, stoch,
                                      n_draft=tau, seed=args.seed)
            return decode_audio(g), g
        raise ValueError(mode)

    if ref_kind == "resynth":
        for it in items:
            it["ref_wav"] = decode_audio(it["gt_cont_codes"])
    else:
        for it in items:
            it["ref_wav"] = it["gt_cont_wav"]

    results = {"n": len(items), "tau": tau, "ref": ref_kind,
               "temperature": args.temperature, "modes": {}}
    plain_codes = {}
    for mode in tts_modes:
        lmds, mcds, durs = [], [], []
        bit_exact = [] if mode in ("spec", "stream") else None
        t0 = time.perf_counter()
        t_baseline = 0.0  # lazy-baseline decodes don't belong to this mode
        for it in items:
            audio, gcodes = gen_for(mode, it)
            # 'resynth' always scores against the RAW ground truth — it is
            # the codec-floor indicator that contextualises the other rows
            ref = (it["gt_cont_wav"] if mode == "resynth"
                   else it["ref_wav"])
            lmds.append(log_mel_distance(ref, audio, ccfg.sample_rate))
            mcds.append(mcd(ref, audio, ccfg.sample_rate))
            durs.append(duration_ratio(ref, audio))
            if mode == "plain":
                plain_codes[it["id"]] = np.asarray(gcodes)
            if bit_exact is not None:
                # lazy baseline: without this, running spec/stream without
                # (or before) 'plain' in --modes would silently skip the
                # advertised bit-exactness check
                if it["id"] not in plain_codes:
                    tb = time.perf_counter()
                    _, pg = inference_tts(params, cfg, it["x"],
                                          it["prompt"], greedy,
                                          seed=args.seed)
                    plain_codes[it["id"]] = np.asarray(pg)
                    t_baseline += time.perf_counter() - tb
                p = plain_codes[it["id"]]
                g = np.asarray(gcodes)
                bit_exact.append(bool(p.shape == g.shape
                                      and (p == g).all()))
        entry = {
            "log_mel_dist_mean": float(np.mean(lmds)),
            "log_mel_dist_max": float(np.max(lmds)),
            "mcd_mean": float(np.mean(mcds)),
            "mcd_max": float(np.max(mcds)),
            "duration_ratio_mean": float(np.mean(durs)),
            "seconds": time.perf_counter() - t0 - t_baseline,
        }
        if bit_exact is not None and bit_exact:
            entry["bit_exact_vs_plain"] = all(bit_exact)
        results["modes"][mode] = entry
        logging.info("%-10s lmd %.3f mcd %.2f dB dur %.2f %s", mode,
                     entry["log_mel_dist_mean"], entry["mcd_mean"],
                     entry["duration_ratio_mean"],
                     f"bit_exact={entry.get('bit_exact_vs_plain')}"
                     if "bit_exact_vs_plain" in entry else "")

    # ---- edit modes: mask --edit-span of each utterance, regenerate, and
    # score BOTH the whole utterance and the regenerated span against the
    # ground truth (transcript unchanged, so the original utterance IS the
    # target).  Unedited frames are preserved verbatim by construction
    # (inference_edit splices them), so the span-restricted score is where
    # the model's editing quality actually lives. ----
    if edit_modes:
        from voicecraft_tpu.inference.editing import (fractional_edit_span,
                                                      inference_edit)
        f0, f1 = args.edit_span
        spf = int(round(ccfg.sample_rate / ccfg.frame_rate))  # samples/frame
        eitems = []
        for it in items:
            span = fractional_edit_span(it["codes"].shape[1], f0, f1)
            if span is None:
                continue
            ref_full = (decode_audio(it["codes"]) if ref_kind == "resynth"
                        else it["gt_wav"])
            eitems.append({**it, "span": span, "ref_full": ref_full})
        results["edit_span"] = list(args.edit_span)
        if not eitems:
            logging.warning("no eval utterance long enough for edit span "
                            "(%s); skipping edit modes", args.edit_span)
            edit_modes = []

        edit_codes = {}
        for mode in edit_modes:
            scfg_m = stoch if mode == "edit_stoch" else greedy
            tau_m = 0 if mode == "edit" else tau
            lmds, mcds, slmds, smcds, sdurs = [], [], [], [], []
            bit_exact = [] if mode == "edit_spec" else None
            t0 = time.perf_counter()
            t_baseline = 0.0
            for it in eitems:
                s, e = it["span"]
                T = it["codes"].shape[1]
                res = inference_edit(params, cfg, it["x"], it["codes"],
                                     [(s, e)], scfg_m, seed=args.seed,
                                     spec=tau_m)
                audio = decode_audio(res)
                ref = it["ref_full"]
                lmds.append(log_mel_distance(ref, audio, ccfg.sample_rate))
                mcds.append(mcd(ref, audio, ccfg.sample_rate))
                # span-restricted: slice both audios at their own span
                # boundaries (frame -> sample); codec context preserved
                gen_len = res.shape[1] - s - (T - e)
                hyp_span = audio[s * spf:(s + gen_len) * spf]
                ref_span = ref[s * spf:e * spf]
                if len(hyp_span) > spf and len(ref_span) > spf:
                    slmds.append(log_mel_distance(ref_span, hyp_span,
                                                  ccfg.sample_rate))
                    smcds.append(mcd(ref_span, hyp_span, ccfg.sample_rate))
                sdurs.append(gen_len / max(e - s, 1))
                if mode == "edit":
                    edit_codes[it["id"]] = np.asarray(res)
                if bit_exact is not None:
                    # lazy baseline: a user may request edit_spec alone
                    if it["id"] not in edit_codes:
                        tb = time.perf_counter()
                        edit_codes[it["id"]] = np.asarray(inference_edit(
                            params, cfg, it["x"], it["codes"], [(s, e)],
                            scfg_m, seed=args.seed, spec=0))
                        t_baseline += time.perf_counter() - tb
                    p = edit_codes[it["id"]]
                    g = np.asarray(res)
                    bit_exact.append(bool(p.shape == g.shape
                                          and (p == g).all()))
            mean = lambda v: float(np.mean(v)) if v else None
            entry = {
                "log_mel_dist_mean": mean(lmds),
                "mcd_mean": mean(mcds),
                "span_log_mel_dist_mean": mean(slmds),
                "span_mcd_mean": mean(smcds),
                "span_duration_ratio_mean": mean(sdurs),
                "seconds": time.perf_counter() - t0 - t_baseline,
            }
            if bit_exact is not None and bit_exact:
                entry["bit_exact_vs_edit"] = all(bit_exact)
            results["modes"][mode] = entry
            nan = float("nan")
            logging.info("%-10s lmd %.3f mcd %.2f dB | span lmd %.3f mcd "
                         "%.2f dB dur %.2f %s", mode,
                         entry["log_mel_dist_mean"] or nan,
                         entry["mcd_mean"] or nan,
                         entry["span_log_mel_dist_mean"] or nan,
                         entry["span_mcd_mean"] or nan,
                         entry["span_duration_ratio_mean"] or nan,
                         f"bit_exact={entry.get('bit_exact_vs_edit')}"
                         if "bit_exact_vs_edit" in entry else "")

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
