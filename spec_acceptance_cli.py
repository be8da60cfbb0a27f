"""Measure REAL speculative-decoding acceptance on held-out data.

Round-2 PERF numbers for speculative decoding were 100%-acceptance
ceilings; the only trained-acceptance evidence was a memorised tiny model.
This CLI closes that gap in-env (VERDICT r02 #1): given a checkpoint
pretrained (with MTP heads) on the procedural corpus
(recipes/make_spec_corpus.py -> preprocess_cli -> train_cli --n-mtp), it
runs HELD-OUT prompts through

  1. single-stream speculative TTS (inference_tts_spec) — exact
     tokens/pass from the loop's pass counter, plus wall-clock speedup vs
     the plain decode loop on the same prompts;
  2. speculative lockstep serving (make_spec_serving_loop) — per-lane
     tok/pass across N distinct held-out prompts;
  3. the speculative continuous-batching engine (ContinuousBatcher
     (spec=TAU)) — aggregate frames per device pass (gstep clock).

Greedy decoding (temperature<=0): speculative output is bit-identical to
the plain loop, so acceptance is purely a property of the trained heads on
unseen prompts.  Run with --platform left unset on the TPU for wall-clock
numbers; tok/pass is hardware-independent.

Usage (see recipes/spec_acceptance.sh for the full pipeline):
  python spec_acceptance_cli.py --model EXP/ckpt_latest \\
      --eval-dir CORPUS/eval --codec-bins 2048 --taus 2 4 8 --n 16
"""

import argparse
import glob
import json
import logging
import os
import time

import numpy as np


def load_eval_items(eval_dir, cparams, ccfg, tok, phn2num, n, prompt_sec):
    from voicecraft_tpu.models import encodec as ec
    from voicecraft_tpu.data.phonemes import phones_to_ids
    from voicecraft_tpu.utils import audio as au

    items = []
    for wav_path in sorted(glob.glob(os.path.join(eval_dir, "*.wav")))[:n]:
        text = open(wav_path[:-4] + ".txt").read().strip()
        wav = au.load_audio(wav_path, ccfg.sample_rate)
        codes = ec.encode_bucketed(cparams, wav, ccfg)[0]
        x = np.asarray(phones_to_ids(tok.phonemize(text), phn2num), np.int32)
        prompt = codes[:, :int(prompt_sec * ccfg.frame_rate)]
        items.append({"x": x, "prompt": prompt.astype(np.int32),
                      "codes": codes, "id": os.path.basename(wav_path)})
    return items


def run_edit_mode(args, cfg, params, items, scfg, results):
    """Editing-mode acceptance: mask a middle span of each held-out
    utterance and regenerate it, plain vs spec, at B=1 (single-stream
    proxy) and B=lanes (serving waves).  Both modes share one
    serve_edit_batch geometry (pads=) so the comparison is compile-fair;
    every config runs twice (warm, then measured).  Matches reference
    editing semantics voicecraft.py:561-906 per lane."""
    import logging
    import time
    from voicecraft_tpu.inference.serving import serve_edit_batch

    from voicecraft_tpu.inference.editing import fractional_edit_span

    f0, f1 = args.edit_span
    kv_dtype = "float8_e4m3fn" if args.kv_fp8 else None
    ereqs = []
    for it in items:
        span = fractional_edit_span(it["codes"].shape[1], f0, f1)
        if span is None:
            continue
        ereqs.append((it["x"], it["codes"], [span]))
    results["edit"] = {"span": [f0, f1], "n_items": len(ereqs)}
    if not ereqs:
        logging.warning("no eval utterance long enough for edit span "
                        "(%s, %s); skipping edit mode", f0, f1)
        results["edit"]["skipped"] = "no utterance long enough"
        return

    # shared geometry across every config in this run
    cap = cfg.encodec_sr // 5
    K = cfg.n_codebooks
    x_max = max(len(x) for x, _, _ in ereqs)
    y_max = max(c.shape[1] + 2 for _, c, _ in ereqs)
    gmax = max(int(np.ceil((e - s) * 1.5)) + 2 * K + 8
               for _, _, [(s, e)] in ereqs)
    pads = (int(np.ceil(x_max / 32) * 32), int(np.ceil(y_max / 64) * 64),
            int(np.ceil(gmax / 128) * 128))

    def measure(B, tau):
        reqs_b = ereqs[:B]
        stats: dict = {}
        serve_edit_batch(params, cfg, reqs_b, scfg, seed=1, pads=pads,
                         spec=tau, kv_dtype=kv_dtype,
                         stats=stats)                     # warm/compile
        stats = {}
        serve_edit_batch(params, cfg, reqs_b, scfg, seed=1, pads=pads,
                         spec=tau, kv_dtype=kv_dtype, stats=stats)
        return stats

    for B, name in ((1, "edit_single"), (args.lanes, "edit_serving")):
        if len(ereqs) < B:
            logging.info("not enough items for B=%d, skipping %s", B, name)
            continue
        plain = measure(B, 0)
        plain_fps = plain["frames"] / plain["seconds"]
        results["edit"][name] = {
            "plain_frames_per_sec": plain_fps, "lanes": B}
        logging.info("%s plain B=%d: %.0f frames/s", name, B, plain_fps)
        for tau in args.taus:
            if tau - 1 > results["n_mtp"]:
                logging.info("skipping tau=%d (> n_mtp+1)", tau)
                continue
            st = measure(B, tau)
            fps = st["frames"] / st["seconds"]
            results["edit"][name][tau] = {
                "tokens_per_pass_per_lane": st["tok_per_pass"],
                "frames_per_sec": fps,
                "speedup_vs_plain": fps / plain_fps,
            }
            logging.info("%s tau=%d B=%d: %.2f tok/pass/lane, %.0f "
                         "frames/s (%.2fx plain)", name, tau, B,
                         st["tok_per_pass"] or -1, fps, fps / plain_fps)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--eval-dir", required=True)
    ap.add_argument("--codec", default=None)
    ap.add_argument("--codec-bins", type=int, default=None,
                    help="random-init codec codebook size (must match the "
                         "preprocessing run)")
    ap.add_argument("--taus", type=int, nargs="*", default=[2, 4, 8])
    ap.add_argument("--n", type=int, default=16,
                    help="held-out utterances for the single-stream pass")
    ap.add_argument("--lanes", type=int, default=8,
                    help="serving/engine lanes")
    ap.add_argument("--prompt-sec", type=float, default=2.0)
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="0 = greedy (spec output bit-identical to plain); "
                         ">0 measures sampled-mode acceptance — combine "
                         "with --spec-sampling stochastic")
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--spec-sampling", default="exact",
                    choices=["exact", "stochastic"])
    ap.add_argument("--spec-draft-temperature", type=float, default=-1.0,
                    help="stochastic-mode draft proposal temperature "
                         "(<0 = sampling temperature; small values, e.g. "
                         "0.1, sharpen q toward the MTP argmax)")
    ap.add_argument("--edit", action="store_true",
                    help="measure SPEECH EDITING spec acceptance instead of "
                         "TTS: each held-out utterance gets a middle span "
                         "masked (--edit-span) and regenerated via "
                         "serve_edit_batch at B=1 (single-stream proxy) and "
                         "B=lanes, plain vs spec")
    ap.add_argument("--edit-span", type=float, nargs=2, default=[0.4, 0.7],
                    metavar=("FRAC_START", "FRAC_END"),
                    help="masked interval as fractions of the utterance")
    ap.add_argument("--skip-engine", action="store_true")
    ap.add_argument("--engine-burst", type=int, default=0,
                    help="engine burst size override (default 4*tau).  The "
                         "pipelined engine loop costs one burst of "
                         "retirement staleness per retire, so long bursts "
                         "(tau=8 -> 32 steps) interact badly with refill "
                         "churn; this flag isolates burst size from tau")
    ap.add_argument("--engine-requests", type=int, default=2,
                    help="engine request multiplier: submit N*lanes "
                         "held-out requests (cycled).  2 = the historical "
                         "short-stream number (ramp-down included); 8+ "
                         "approximates steady state and isolates the "
                         "ramp-down share of the tau=8 engine regression "
                         "(VERDICT r03 #2)")
    ap.add_argument("--skip-serving", action="store_true",
                    help="skip the lockstep-serving rows (useful for "
                         "engine-isolation runs where serving numbers are "
                         "already on record)")
    ap.add_argument("--skip-single", action="store_true",
                    help="measure only serving/engine (skips the "
                         "single-stream loops and their compiles — useful "
                         "for lane sweeps where single-stream numbers are "
                         "already on record)")
    ap.add_argument("--kv-fp8", action="store_true",
                    help="fp8 KV slab for the serving/engine measurements "
                         "(time-neutral, capacity win — PERF.md; needed "
                         "for 32-lane 830M spec slabs on 16 GB)")
    ap.add_argument("--fp8", action="store_true",
                    help="weight-only fp8 decoder matmuls (the serving "
                         "config; utils/quantize.py) — wall-clock numbers "
                         "then match PERF.md's fp8 ceilings; tok/pass is "
                         "unchanged up to fp8 rounding of the logits")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    from voicecraft_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup(args.platform)
    logging.basicConfig(level=logging.INFO)

    import jax
    from voicecraft_tpu.inference.loader import load_model, load_codec
    from voicecraft_tpu.inference.tts import inference_tts, inference_tts_spec
    from voicecraft_tpu.data.phonemes import make_text_tokenizer
    from voicecraft_tpu.models.voicecraft import SamplingConfig

    cfg, params, phn2num = load_model(args.model)
    assert phn2num is not None, "checkpoint carries no phn2num vocab"
    kv_dtype = "float8_e4m3fn" if args.kv_fp8 else None
    n_mtp = (jax.tree.leaves(params["mtp_heads"])[0].shape[0]
             if "mtp_heads" in params else 0)
    assert n_mtp > 0, "checkpoint has no MTP heads (train_cli --n-mtp)"
    if args.fp8:
        from voicecraft_tpu.utils.quantize import quantize_decoder_fp8
        params = quantize_decoder_fp8(params)

    if args.codec is None and args.codec_bins:
        from voicecraft_tpu.models.encodec import EncodecConfig, init_encodec
        ccfg = EncodecConfig(codebook_size=args.codec_bins)
        cparams = init_encodec(ccfg, jax.random.PRNGKey(0))
    else:
        ccfg, cparams = load_codec(args.codec)
    tok = make_text_tokenizer("en-us", "grapheme")

    items = load_eval_items(args.eval_dir, cparams, ccfg, tok, phn2num,
                            max(args.n, args.lanes * 2), args.prompt_sec)
    logging.info("loaded %d held-out items", len(items))
    scfg = SamplingConfig(top_k=args.top_k, top_p=1.0,
                          temperature=args.temperature,
                          stop_repetition=3,
                          spec_sampling=args.spec_sampling,
                          spec_draft_temperature=args.spec_draft_temperature)
    results = {"n_mtp": n_mtp, "temperature": args.temperature,
               "spec_sampling": args.spec_sampling,
               "single": {}, "serving": {}, "engine": {}}

    if args.edit:
        run_edit_mode(args, cfg, params, items, scfg, results)
        print(json.dumps(results, indent=2, default=float))
        return

    # ---- plain single-stream reference (wall-clock + token lengths) ----
    def run_single_plain():
        t0 = time.perf_counter()
        toks = 0
        for it in items[:args.n]:
            _, gen = inference_tts(params, cfg, it["x"], it["prompt"], scfg,
                                   seed=1)
            toks += gen.shape[1] + cfg.n_codebooks  # delayed rows incl. eog
        return toks, time.perf_counter() - t0

    if not args.skip_single:
        run_single_plain()                    # compile
        plain_toks, plain_dt = run_single_plain()
        results["single"]["plain_tokens_per_sec"] = plain_toks / plain_dt
        logging.info("plain single-stream: %d rows in %.2fs", plain_toks,
                     plain_dt)

    # ---- shared serving inputs: composed ONCE, with serve_tts_batch's
    # special_first shift (serving.py:390) so plain and spec decode the
    # same tokens; same pads for both so the comparison is geometry-fair ----
    from voicecraft_tpu.inference.serving import (_get_serving_loop,
                                                  _get_spec_serving_loop)
    from voicecraft_tpu.data import spans as _spans
    import jax.numpy as jnp
    B = args.lanes
    # cycle when the eval dir holds fewer items than lanes: every lane must
    # be populated — x_lens/p_lens/xt/yt all carry B rows into the jitted loop
    reqs = [(items[i % len(items)]["x"], items[i % len(items)]["prompt"])
            for i in range(B)]
    shift = cfg.n_special if cfg.special_first else 0
    prefixes = [_spans.compose_tts_prefix(y + shift, cfg) for _, y in reqs]
    x_lens = np.asarray([len(x) for x, _ in reqs], np.int32)
    p_lens = np.asarray([p.length for p in prefixes], np.int32)
    cap = cfg.encodec_sr // 5
    x_pad = int(np.ceil(x_lens.max() / 32) * 32)
    y_pad = int(np.ceil(p_lens.max() / 64) * 64)
    gen_max = int(np.ceil(((x_lens * cap - p_lens).max() + 12) / 128) * 128)
    xt = np.full((B, x_pad), cfg.text_pad_token, np.int32)
    yt = np.full((B, cfg.n_codebooks, y_pad), cfg.empty_token, np.int32)
    for b, ((x, _), p) in enumerate(zip(reqs, prefixes)):
        xt[b, :len(x)] = x
        yt[b, :, :p.length] = p.tokens
    serve_args = (jnp.asarray(xt), jnp.asarray(x_lens), jnp.asarray(yt),
                  jnp.asarray(p_lens), jnp.ones((B,), jnp.int32))

    def plain_serving_baseline():
        """Lazy plain-lockstep baseline: timed in EXACTLY the spec
        measurement's scope — the pre-built jitted loop plus a [B]-sized
        readback — so speedup_vs_plain compares like with like (no host
        composition, padding, or gen_buf readback on either side)."""
        if "plain_frames_per_sec" not in results["serving"]:
            loop = _get_serving_loop(cfg, B, x_pad, y_pad, gen_max, scfg,
                                     kv_dtype)
            loop(params, *serve_args)             # compile
            t0 = time.perf_counter()
            _, finish_t = loop(params, *serve_args)
            finish_t = np.asarray(finish_t)
            dt = time.perf_counter() - t0
            frames = int(np.where(finish_t >= 0, finish_t + 1,
                                  gen_max).sum())
            results["serving"]["plain_frames_per_sec"] = frames / dt
            logging.info("plain serving B=%d: %.0f frames/s", B,
                         frames / dt)
        return results["serving"]["plain_frames_per_sec"]

    def engine_requests():
        n_req = args.engine_requests * B
        pool = [(it["x"], it["prompt"]) for it in items]
        return [pool[i % len(pool)] for i in range(n_req)]

    def run_engine(make_engine, ereqs):
        """Warm pass (jit fns are lru-cached on geometry, so compile time
        stays out of the wall-clock), then the timed run.  Returns
        (frames, seconds, device_passes)."""
        warm = make_engine()
        for x, y in ereqs[:B]:
            warm.submit(x, y)
        warm.run()
        eng = make_engine()
        for x, y in ereqs:
            eng.submit(x, y)
        g0 = int(np.asarray(eng._lanes.gstep))
        t0 = time.perf_counter()
        res = eng.run()
        dt = time.perf_counter() - t0
        frames = sum(g.shape[1] for _, g in res.values())
        return frames, dt, int(np.asarray(eng._lanes.gstep)) - g0

    def plain_engine_baseline(burst):
        """Lazy plain continuous-batching baseline at the same eval set,
        request count, AND burst size as the spec row it anchors, so
        speedup_vs_plain is like-for-like (the burst size changes the
        pipelined loop's retirement staleness and host-sync cadence, so a
        mismatched anchor would conflate speculation gains with burst
        effects).  Cached per burst — taus that share a burst share the
        anchor."""
        key = f"plain_frames_per_sec_burst{burst}"
        if key not in results["engine"]:
            from voicecraft_tpu.inference.engine import ContinuousBatcher

            def make_engine():
                return ContinuousBatcher(
                    params, cfg, lanes=B, x_pad=x_pad, y_pad=y_pad,
                    gen_max=gen_max, burst=burst, scfg=scfg, seed=1,
                    kv_dtype=kv_dtype)

            frames, dt, _ = run_engine(make_engine, engine_requests())
            results["engine"][key] = frames / dt
            logging.info("plain engine B=%d burst=%d: %.0f frames/s", B,
                         burst, frames / dt)
        return results["engine"][key]

    for tau in args.taus:
        if tau - 1 > n_mtp:
            logging.info("skipping tau=%d (> n_mtp+1)", tau)
            continue

        # ---- single-stream ----
        def run_single_spec():
            t0 = time.perf_counter()
            toks = passes = 0
            for it in items[:args.n]:
                _, _, st = inference_tts_spec(
                    params, cfg, it["x"], it["prompt"], scfg, n_draft=tau,
                    seed=1, return_stats=True)
                toks += st["tokens"]
                passes += st["passes"]
            return toks, passes, time.perf_counter() - t0

        if not args.skip_single:
            run_single_spec()                 # compile
            toks, passes, dt = run_single_spec()
            results["single"][tau] = {
                "tokens_per_pass": toks / max(passes, 1),
                "tokens_per_sec": toks / dt,
                "speedup_vs_plain": (toks / dt) / results["single"][
                    "plain_tokens_per_sec"],
            }
            logging.info(
                "single tau=%d: %.2f tok/pass, %.0f tok/s (%.2fx plain)",
                tau, toks / max(passes, 1), toks / dt,
                results["single"][tau]["speedup_vs_plain"])

        # ---- lockstep spec serving ----
        if not args.skip_serving:
            plain_fps = plain_serving_baseline()
            loop = _get_spec_serving_loop(cfg, B, tau, x_pad, y_pad,
                                          gen_max, scfg, kv_dtype)
            a = (params,) + serve_args
            out = loop(*a)                    # compile
            t0 = time.perf_counter()
            out = loop(*a)
            t_acc = np.asarray(out[1])
            dt = time.perf_counter() - t0
            n_passes = int(out[2])
            results["serving"][tau] = {
                "tokens_per_pass_per_lane": float(t_acc.sum())
                                            / max(n_passes, 1) / B,
                "frames_per_sec": float(t_acc.sum()) / dt,
                "speedup_vs_plain": float(t_acc.sum()) / dt / plain_fps,
            }
            logging.info(
                "serving tau=%d B=%d: %.2f tok/pass/lane, %.0f frames/s",
                tau, B,
                results["serving"][tau]["tokens_per_pass_per_lane"],
                results["serving"][tau]["frames_per_sec"])

        # ---- speculative continuous-batching engine ----
        if not args.skip_engine:
            from voicecraft_tpu.inference.engine import ContinuousBatcher
            eng_burst = args.engine_burst or 4 * tau
            plain_eng_fps = plain_engine_baseline(eng_burst)

            def make_engine():
                return ContinuousBatcher(
                    params, cfg, lanes=B, x_pad=x_pad, y_pad=y_pad,
                    gen_max=gen_max, burst=eng_burst,
                    scfg=scfg, seed=1, spec=tau, kv_dtype=kv_dtype)

            frames, dt, gsteps = run_engine(make_engine, engine_requests())
            results["engine"][tau] = {
                "burst": eng_burst,
                "frames_per_pass": frames / max(gsteps, 1),
                "frames_per_sec": frames / dt,
                "speedup_vs_plain": frames / dt / plain_eng_fps,
            }
            logging.info("engine tau=%d: %.2f frames/device-pass "
                         "(occupancy-inclusive), %.0f frames/s (%.2fx "
                         "plain engine)", tau, frames / max(gsteps, 1),
                         frames / dt, frames / dt / plain_eng_fps)

    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
