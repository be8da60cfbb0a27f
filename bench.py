"""Benchmark: giga830M zero-shot TTS decode throughput on one chip.

Prints ONE JSON line:
  {"metric": "tts_rtf_830m", "value": <x realtime>, "unit": "x_realtime",
   "vs_baseline": <ratio>}

Metric: generated-audio seconds per wall-clock second per chip (RTF) for the
830M decoder with the KV-slab decode loop (timing includes prefill).  Default
is the serving config — weight-only fp8 decoder matmuls (batch-1 decode is
HBM-bound; fp8 halves the bytes/step) — pass --bf16 for the full-precision
parity config.

Baseline: the reference repo publishes no numbers; its Colab notes report
6-15 s per generation on a T4 with ~8 s prompts + ~10 s outputs
(voicecraft-gradio-colab.ipynb cell 6), i.e. roughly ~1x realtime.  We take
1.0x realtime as the reference baseline, so vs_baseline == value.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="force a jax backend (e.g. 'cpu' for smoke runs — "
                         "the axon plugin ignores JAX_PLATFORMS, so this "
                         "sets jax.config before any device query)")
    ap.add_argument("--preset", default="giga830M")
    ap.add_argument("--frames", type=int, default=500,
                    help="codec frames to generate (50 = 1 s of audio)")
    ap.add_argument("--prompt-frames", type=int, default=150)
    ap.add_argument("--phones", type=int, default=120)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--bf16", action="store_true",
                    help="full bf16 weights (parity mode); default is the "
                         "serving config: weight-only fp8 decoder")
    ap.add_argument("--serve", type=int, default=0, metavar="LANES",
                    help="measure aggregate multi-stream serving throughput "
                         "with N distinct-prompt lanes instead of "
                         "single-stream latency")
    ap.add_argument("--train", action="store_true",
                    help="measure training throughput (codec tokens/s/chip, "
                         "forward+backward+ScaledAdam)")
    ap.add_argument("--train-attn", default=None,
                    choices=["dense", "chunked"],
                    help="training attention mode for --train (default: "
                         "the preset's cfg.train_attn)")
    ap.add_argument("--train-fused", action="store_true",
                    help="force the single-phase (fused fwd+bwd+update) "
                         "step even for >400M models (with chunked "
                         "attention the activation footprint may fit)")
    ap.add_argument("--train-remat", default=None,
                    choices=["full", "dots", "attn", "attn_ffn1", "none"],
                    help="layer remat policy for --train (default: the "
                         "preset's cfg.train_remat; 'dots' saves matmul "
                         "outputs, recomputes only elementwise)")
    ap.add_argument("--train-batch", type=int, default=0,
                    help="override the training bench batch size "
                         "(default: 4 for >400M models, else 16)")
    ap.add_argument("--edit-serve", type=int, default=0, metavar="LANES",
                    help="aggregate batched speech-editing throughput with "
                         "N distinct edit requests in lockstep "
                         "(serve_edit_batch machinery, run to budget)")
    ap.add_argument("--engine", type=int, default=0, metavar="LANES",
                    help="measure continuous-batching aggregate throughput: "
                         "2x LANES mixed-length requests, lanes refill "
                         "mid-flight (inference/engine.py)")
    ap.add_argument("--burst", type=int, default=48,
                    help="engine burst size (steps between admission checks)")
    ap.add_argument("--kv-fp8", action="store_true",
                    help="store the KV slab in float8_e4m3 (serving/engine)")
    ap.add_argument("--spec", type=int, default=0, metavar="TAU",
                    help="speculative decode with TAU tokens per pass "
                         "(TAU-1 MTP drafts).  Random-init MTP heads accept "
                         "~nothing, so this measures the verified-pass rate; "
                         "add --spec-accept for the 100%%-acceptance ceiling")
    ap.add_argument("--spec-sampling", default="exact",
                    choices=["exact", "stochastic"],
                    help="speculative verification mode for --spec "
                         "(stochastic = speculative sampling; incompatible "
                         "with --spec-accept ceilings)")
    ap.add_argument("--spec-accept", action="store_true",
                    help="force-accept all drafts (throughput ceiling: real "
                         "per-pass cost, simulated perfect acceptance)")
    ap.add_argument("--fused-ffn", action="store_true",
                    help="route the decode FFN through the Pallas fused "
                         "kernel (single-stream mode only)")
    ap.add_argument("--no-pack-qkv", action="store_true",
                    help="keep separate wq/wk/wv dots (default packs them "
                         "into one [D,3D] matmul in fp8 mode)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="layer-scan unroll factor for the decode step")
    ap.add_argument("--steps-per-iter", type=int, default=1,
                    help="decode steps grouped per while-loop iteration "
                         "(output-identical; measured perf-NEUTRAL on TPU "
                         "at 4 and WORSE at 8 — see PERF.md negative "
                         "results; the while_loop has no per-iteration "
                         "host cost to amortise)")
    ap.add_argument("--train-profile", action="store_true",
                    help="training cost-attribution ladder (VERDICT r03 "
                         "#5): times forward-only, grads (bwd+remat "
                         "recompute), and the ScaledAdam update as "
                         "separate executables at the production geometry, "
                         "plus a standalone GEMM roofline probe at the "
                         "step's dominant shapes; prints per-piece "
                         "attribution of the non-MXU time")
    ap.add_argument("--profile-dir", default=None,
                    help="with --train-profile: also capture a "
                         "jax.profiler trace of a few steps into this dir "
                         "(best-effort; the tunnel backend may not "
                         "support it)")
    ap.add_argument("--steady", action="store_true",
                    help="with --engine: steady-state variant — 8x LANES "
                         "uniform-length requests so ramp-up/down is "
                         "amortised and the queue never starves; isolates "
                         "the occupancy loss from the per-step residual")
    ap.add_argument("--stream", action="store_true",
                    help="measure streaming TTS first-audio latency "
                         "(inference/streaming.py over the engine, burst "
                         "from --burst) and steady-state chunk cadence")
    ap.add_argument("--stream-no-pipeline", action="store_true",
                    help="with --stream: disable the one-burst-ahead "
                         "pipelined engine loop (synchronous per-burst "
                         "readbacks — the pre-r04 behavior) for A/B "
                         "measurement of the pipeline's win")
    ap.add_argument("--stream-no-codec", action="store_true",
                    help="with --stream: skip the codec (frames-only "
                         "chunks) — isolates the engine+callback share of "
                         "the sustained-rate gap from the codec-feed share")
    args = ap.parse_args()
    if args.platform:
        from voicecraft_tpu.utils.jax_setup import setup as _jax_setup
        _jax_setup(args.platform)
    args.fp8 = not args.bf16
    if args.spec_accept:
        args.spec_sampling = "exact"   # ceilings use exact verification

    if args.train_profile:
        _bench_train_profile(args)
        return

    if args.train:
        _bench_train(args)
        return


    import jax
    from voicecraft_tpu.config import PRESETS
    from voicecraft_tpu.data import spans
    from voicecraft_tpu.models.voicecraft import (
        init_params, make_decode_loop, SamplingConfig)

    cfg = PRESETS[args.preset]()
    print(f"devices: {jax.devices()}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    if args.spec:
        cfg = __import__("dataclasses").replace(cfg, n_mtp=args.spec - 1)
    params = init_params(cfg, key)
    params = jax.tree.map(
        lambda x: x.astype("bfloat16") if x.dtype == np.float32 else x, params)
    if args.fp8:
        from voicecraft_tpu.utils.quantize import quantize_decoder_fp8
        params = quantize_decoder_fp8(params, pack_qkv=not args.no_pack_qkv)

    rng = np.random.default_rng(0)
    K = cfg.n_codebooks

    if args.serve:
        _bench_serving(args, cfg, params, rng)
        return
    if args.edit_serve:
        _bench_edit_serving(args, cfg, params, rng)
        return
    if args.engine:
        _bench_engine(args, cfg, params, rng)
        return
    if args.spec:
        _bench_spec(args, cfg, params, rng)
        return
    if args.stream:
        _bench_stream(args, cfg, params, rng)
        return

    x_tokens = rng.integers(0, cfg.text_vocab_size, args.phones).astype(np.int32)
    prompt = rng.integers(0, cfg.audio_vocab_size,
                          (K, args.prompt_frames)).astype(np.int32)
    prefix = spans.compose_tts_prefix(prompt, cfg)

    def ceil(v, m):
        return (v + m - 1) // m * m

    x_pad = ceil(len(x_tokens), 32)
    y_pad = ceil(prefix.length, 64)
    gen_max = args.frames
    scfg = SamplingConfig(top_k=40, top_p=1.0, temperature=1.0,
                          stop_repetition=3,
                          spec_sampling=args.spec_sampling)

    loop = make_decode_loop(cfg, is_tts=True, x_pad=x_pad, y_pad=y_pad,
                            gen_max=gen_max, scfg=scfg, bench_mode=True,
                            fused_ffn=args.fused_ffn, unroll=args.unroll,
                            kv_dtype="float8_e4m3fn" if args.kv_fp8 else None,
                            steps_per_iter=args.steps_per_iter)

    import jax.numpy as jnp
    xt = np.full((1, x_pad), cfg.text_pad_token, np.int32)
    xt[0, :len(x_tokens)] = x_tokens
    yt = np.full((1, K, y_pad), cfg.empty_token, np.int32)
    yt[0, :, :prefix.length] = prefix.tokens
    mi = np.full((1, y_pad), -1, np.int32)
    qm = np.zeros((cfg.max_n_spans,), np.int32)

    def run(seed):
        out = loop(params, jnp.asarray(xt), jnp.asarray(len(x_tokens), jnp.int32),
                   jnp.asarray(yt), jnp.asarray(prefix.length, jnp.int32),
                   jnp.asarray(mi), jnp.asarray(qm),
                   jnp.asarray(1, jnp.int32), jax.random.PRNGKey(seed))
        jax.block_until_ready(out)
        return out

    t0 = time.perf_counter()
    out = run(0)
    compile_time = time.perf_counter() - t0
    n_gen = int(out[2])
    assert n_gen == gen_max, (n_gen, gen_max)
    print(f"compile+first run: {compile_time:.1f}s, generated {n_gen} frames",
          file=sys.stderr)

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    audio_sec = args.frames / cfg.encodec_sr
    rtf = audio_sec / best
    steps_per_sec = args.frames / best
    print(f"decode: {best:.3f}s for {args.frames} frames "
          f"({steps_per_sec:.0f} steps/s incl. prefill)", file=sys.stderr)

    print(json.dumps({
        "metric": "tts_rtf_830m" + ("" if args.fp8 else "_bf16"),
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 1.0, 3),
    }))

    if args.fp8 and not args.bf16:
        # default run: also measure the PRODUCT headline — aggregate
        # per-chip serving throughput at 32 lockstep lanes with the fp8 KV
        # slab (PERF.md "serving" table) — so the driver-recorded artifact
        # tracks the serving tier, not just single-stream latency
        # (VERDICT r02 #6).  Printed LAST: the driver parses the final
        # JSON line.
        args.serve, args.kv_fp8 = 32, True
        _bench_serving(args, cfg, params, rng,
                       extra={"single_stream_rtf": round(rtf, 3)})


def _bench_spec(args, cfg, params, rng):
    """Speculative single-stream decode throughput.

    Every pass feeds TAU tokens through one forward (same weight reads as a
    plain step, TAUx the FLOPs).  Without --spec-accept, random-init MTP
    heads reject essentially every draft, so the number measures the
    verified-pass rate (the per-pass cost of the machinery); with
    --spec-accept each pass retires TAU tokens — the genuine end-to-end
    throughput at 100%% acceptance.  Real acceptance needs trained heads
    (see tests/test_spec_decode.py::test_spec_acceptance_after_memorising)."""
    import jax
    import jax.numpy as jnp
    from voicecraft_tpu.data import spans
    from voicecraft_tpu.models.voicecraft import (SamplingConfig,
                                                  make_spec_decode_loop)

    K = cfg.n_codebooks
    tau = args.spec
    x_tokens = rng.integers(0, cfg.text_vocab_size, args.phones).astype(np.int32)
    prompt = rng.integers(0, cfg.audio_vocab_size,
                          (K, args.prompt_frames)).astype(np.int32)
    prefix = spans.compose_tts_prefix(prompt, cfg)

    def ceil(v, m):
        return (v + m - 1) // m * m

    x_pad = ceil(len(x_tokens), 32)
    y_pad = ceil(prefix.length, 64)
    gen_max = args.frames
    scfg = SamplingConfig(top_k=40, top_p=1.0, temperature=1.0,
                          stop_repetition=3,
                          spec_sampling=args.spec_sampling)
    loop = make_spec_decode_loop(
        cfg, x_pad=x_pad, y_pad=y_pad, gen_max=gen_max, scfg=scfg,
        n_draft=tau, bench_mode=True, force_accept=args.spec_accept,
        kv_dtype="float8_e4m3fn" if args.kv_fp8 else None)

    xt = np.full((1, x_pad), cfg.text_pad_token, np.int32)
    xt[0, :len(x_tokens)] = x_tokens
    yt = np.full((1, K, y_pad), cfg.empty_token, np.int32)
    yt[0, :, :prefix.length] = prefix.tokens

    def run(seed):
        out = loop(params, jnp.asarray(xt),
                   jnp.asarray(len(x_tokens), jnp.int32), jnp.asarray(yt),
                   jnp.asarray(prefix.length, jnp.int32),
                   jax.random.PRNGKey(seed))
        np.asarray(out[1])
        return out

    t0 = time.perf_counter()
    out = run(0)
    n_gen, n_passes = int(out[1]), int(out[2])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"({n_gen} tokens in {n_passes} passes)", file=sys.stderr)

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = run(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    n_gen, n_passes = int(out[1]), int(out[2])
    rtf = n_gen / cfg.encodec_sr / best
    print(f"spec tau={tau} accept={'forced' if args.spec_accept else 'real'}: "
          f"{best:.3f}s for {n_gen} tokens / {n_passes} passes "
          f"({n_passes / best:.0f} passes/s, {n_gen / best:.0f} tokens/s, "
          f"{n_gen / max(n_passes, 1):.2f} tok/pass)", file=sys.stderr)
    suffix = "_ceiling" if args.spec_accept else ""
    print(json.dumps({
        "metric": f"tts_spec_rtf_830m_tau{tau}{suffix}",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf, 3),
    }))


def _bench_stream(args, cfg, params, rng):
    """Streaming TTS: wall-clock to first audible chunk + chunk cadence.

    Runs stream_tts (engine burst syncing + causal codec prefix decode) on
    one request; the headline is first-audio latency — the user hears
    sound this long after submitting, vs the full-utterance latency of
    one-shot decoding."""
    from voicecraft_tpu.models import encodec as ec
    from voicecraft_tpu.models.voicecraft import SamplingConfig
    from voicecraft_tpu.inference.streaming import stream_tts

    K = cfg.n_codebooks
    ccfg = ec.EncodecConfig()            # random weights: timing-equivalent
    import jax
    if args.stream_no_codec:
        cparams = ccfg = None
    else:
        cparams = ec.init_encodec(ccfg, jax.random.PRNGKey(0))
    x_tokens = rng.integers(0, cfg.text_vocab_size,
                            args.phones).astype(np.int32)
    prompt = rng.integers(0, cfg.audio_vocab_size,
                          (K, args.prompt_frames)).astype(np.int32)
    scfg = SamplingConfig(top_k=40, top_p=1.0, temperature=1.0,
                          stop_repetition=3,
                          spec_sampling=args.spec_sampling)

    def run():
        t0 = time.perf_counter()
        first, chunks, frames = None, 0, 0
        for c in stream_tts(params, cfg, x_tokens, prompt, scfg, seed=1,
                            cparams=cparams, ccfg=ccfg, burst=args.burst,
                            kv_dtype="float8_e4m3fn" if args.kv_fp8
                            else None,
                            pipeline=not args.stream_no_pipeline):
            ready = (c["frames"].size if args.stream_no_codec
                     else c.get("audio") is not None and c["audio"].size)
            if ready and first is None:
                first = time.perf_counter() - t0
            chunks += 1
            frames += c["frames"].shape[1]
        return first, time.perf_counter() - t0, chunks, frames

    first, total, chunks, frames = run()      # compile
    print(f"compile+first run: {total:.1f}s", file=sys.stderr)
    results = [run() for _ in range(args.iters)]
    first = min(r[0] for r in results)
    total = min(r[1] for r in results)
    chunks, frames = results[0][2], results[0][3]
    audio_sec = frames / cfg.encodec_sr
    print(f"stream: first audio {first * 1e3:.0f} ms, {chunks} chunks, "
          f"{frames} frames ({audio_sec:.1f}s audio) in {total:.2f}s "
          f"({audio_sec / total:.1f}x realtime)", file=sys.stderr)
    print(json.dumps({
        "metric": f"tts_stream_first_audio_ms_burst{args.burst}"
                  + ("_nocodec" if args.stream_no_codec else "")
                  + ("_nopipe" if args.stream_no_pipeline else ""),
        "value": round(first * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round((audio_sec / total), 2),
    }))


def _bench_train(args):
    """Training step throughput: forward + backward + ScaledAdam update."""
    import jax
    import jax.numpy as jnp
    from voicecraft_tpu.config import PRESETS
    from voicecraft_tpu.models.voicecraft import init_params, param_count
    from voicecraft_tpu.training.optim import scaled_adam, eden_schedule
    from voicecraft_tpu.training.step import (
        make_train_step, make_train_step_two_phase)
    from __graft_entry__ import _synthetic_batch

    import dataclasses
    cfg = PRESETS[args.preset]()
    if args.train_attn:
        cfg = dataclasses.replace(cfg, train_attn=args.train_attn)
    if args.train_remat:
        cfg = dataclasses.replace(cfg, train_remat=args.train_remat)
    if jax.default_backend() == "cpu" and cfg.compute_dtype == "bfloat16":
        # CPU XLA lacks bf16xbf16->f32 dots (smoke runs only)
        cfg = dataclasses.replace(cfg, compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = scaled_adam(lr=eden_schedule(0.05, 3000, 4, 500))
    opt_state = jax.jit(tx.init)(params)
    big = param_count(params) > 4e8 and not args.train_fused
    make = make_train_step_two_phase if big else make_train_step
    step = make(cfg, tx)
    # measured on v5e (PERF.md "Training throughput"): 830M two-phase fits
    # B=10 (30.1k tokens/s) and OOMs at 12; default 8 keeps margin
    B = args.train_batch or (8 if big else 16)
    batch = _synthetic_batch(cfg, B=B, Sx=160, y_len=480, seed=1)
    t0 = time.perf_counter()
    params, opt_state, m = step(params, opt_state, batch, jax.random.PRNGKey(1))
    ntok = float(np.asarray(m["effective_ntoken"]))
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for i in range(args.iters):
        params, opt_state, m = step(params, opt_state, batch,
                                    jax.random.PRNGKey(i))
    _ = float(np.asarray(m["loss"]))
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": f"train_tokens_per_sec_{args.preset}"
                  + (f"_{args.train_attn}" if args.train_attn else "")
                  + (f"_{args.train_remat}" if args.train_remat else "")
                  + ("_fused" if args.train_fused else ""),
        "value": round(ntok / dt, 0),
        "unit": "codec_tokens/s/chip",
        "vs_baseline": 1.0,
    }))


def _bench_train_profile(args):
    """Training cost-attribution ladder (VERDICT r03 #5).

    The 830M two-phase step already runs gradients and the ScaledAdam
    update as separate executables, so their wall times are separable with
    host readbacks (np.asarray — block_until_ready can return early on
    this backend).  The ladder:

      fwd        forward_train WITHOUT remat wrappers, no grad
      grads      value_and_grad with the production remat policy
      update     ScaledAdam + apply_updates (donated, as in training)
      gemm       standalone bf16 GEMMs at the step's dominant shapes

    Attribution printed from these: ideal backward = 2x fwd, so
    ``grads - 3*fwd`` is remat recompute + scheduling; ``update`` is the
    optimizer's state round-trip; the GEMM probe gives the achievable
    matmul rate at these shapes — the difference between the step's MFU
    and the probe's is structural (non-matmul ops, memory stalls), not
    matmul efficiency.
    """
    import dataclasses
    import jax
    import jax.numpy as jnp
    from voicecraft_tpu.config import PRESETS
    from voicecraft_tpu.models.voicecraft import (forward_train, init_params,
                                                  param_count)
    from voicecraft_tpu.training.optim import scaled_adam, eden_schedule
    from __graft_entry__ import _synthetic_batch
    import optax

    cfg = PRESETS[args.preset]()
    if args.train_attn:
        cfg = dataclasses.replace(cfg, train_attn=args.train_attn)
    if args.train_remat:
        cfg = dataclasses.replace(cfg, train_remat=args.train_remat)
    if jax.default_backend() == "cpu" and cfg.compute_dtype == "bfloat16":
        cfg = dataclasses.replace(cfg, compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0))
    n_params = param_count(params)
    big = n_params > 4e8
    B = args.train_batch or (8 if big else 16)
    Sx, Sy = 160, 480
    batch = _synthetic_batch(cfg, B=B, Sx=Sx, y_len=Sy, seed=1)
    tx = scaled_adam(lr=eden_schedule(0.05, 3000, 4, 500))
    opt_state = jax.jit(tx.init)(params)

    def timed(fn, *a, readback=lambda r: r, n=None):
        n = n or args.iters
        out = fn(*a)                      # compile + warm
        _ = np.asarray(readback(out))
        t0 = time.perf_counter()
        for _i in range(n):
            # free the previous output BEFORE recomputing: at the grads
            # rung `out` is a full param-sized pytree (3.3 GB at 830M) and
            # holding two copies OOMs the 16 GB chip (unlike the trainer,
            # which never keeps a stale grads buffer alive)
            out = None
            out = fn(*a)
            _ = np.asarray(readback(out))
        return (time.perf_counter() - t0) / n, out

    # ---- fwd only (no remat wrappers, no grad) ----
    fwd_fn = jax.jit(lambda p, b, r: forward_train(p, cfg, b, rng=r,
                                                   remat=False)["loss"])
    t_fwd, _ = timed(fwd_fn, params, batch, jax.random.PRNGKey(1))

    # ---- grads with the production remat policy ----
    def loss_fn(p, b, r):
        out = forward_train(p, cfg, b, rng=r, remat=True)
        return out["loss"], out

    def grads_fn(p, b, r):
        (_, out), g = jax.value_and_grad(
            lambda q: loss_fn(q, b, r), has_aux=True)(p)
        return g, out["loss"], out["effective_ntoken"]

    grads_jit = jax.jit(grads_fn)
    t_grads, (grads, loss, ntok) = timed(
        grads_jit, params, batch, jax.random.PRNGKey(1),
        readback=lambda o: o[1])
    ntok = float(np.asarray(ntok))

    # ---- optimizer update.  Donated and CHAINED (the new state feeds the
    # next call) — an undonated repeat holds params + opt + grads + new
    # params + new opt at once (~16.6 GB at 830M f32), which OOMs; chaining
    # keeps the same per-call compute with the trainer's real memory
    # profile.  The evolving state changes VALUES, not shapes/compute. ----
    def update_fn(p, o, g):
        updates, new_o = tx.update(g, o, p)
        new_p = optax.apply_updates(p, updates)
        return new_p, new_o

    update_jit = jax.jit(update_fn, donate_argnums=(0, 1))
    state = update_jit(params, opt_state, grads)      # compile + warm
    _ = np.asarray(state[0]["alpha_audio"])
    t0 = time.perf_counter()
    for _i in range(args.iters):
        state = update_jit(state[0], state[1], grads)
        _ = np.asarray(state[0]["alpha_audio"])
    t_upd = (time.perf_counter() - t0) / args.iters
    params, opt_state = state

    # ---- optional jax.profiler trace of real steps ----
    if args.profile_dir:
        try:
            with jax.profiler.trace(args.profile_dir):
                for i in range(3):
                    g, l, _ = grads_jit(params, batch, jax.random.PRNGKey(i))
                    # chain through the donated update, as in training
                    params, opt_state = update_jit(params, opt_state, g)
                _ = np.asarray(params["alpha_audio"])
            print(f"profiler trace written to {args.profile_dir}",
                  file=sys.stderr)
        except Exception as e:  # the tunnel backend may not support it
            print(f"profiler trace failed: {e!r}", file=sys.stderr)

    # ---- standalone GEMM probe at the step's dominant shapes ----
    D, F = cfg.d_model, cfg.d_model * 4
    M = B * (Sx + Sy)                     # tokens in the step
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    key = jax.random.PRNGKey(0)
    a1 = jax.random.normal(key, (M, D), dt)
    w1 = jax.random.normal(key, (D, F), dt)
    w2 = jax.random.normal(key, (F, D), dt)
    wq = jax.random.normal(key, (D, D), dt)

    @jax.jit
    def gemm_probe(a1, w1, w2, wq):
        h = a1 @ w1                       # FFN up
        y = h @ w2                        # FFN down
        q = a1 @ wq                       # attn projection shape
        return (y * q).sum()

    probe_flops = 2 * M * (D * F * 2 + D * D)
    t_gemm, _ = timed(gemm_probe, a1, w1, w2, wq, n=max(args.iters, 10))
    gemm_tflops = probe_flops / t_gemm / 1e12

    # ---- fp8-matmul lever go/no-go (VERDICT r03 #5): same GEMMs with
    # float8_e4m3fn inputs.  v5e's MXU is bf16-native, so if XLA merely
    # upcasts, this measures ~bf16 speed minus convert overhead — a
    # measured NO-GO for fp8 *training* matmuls on this part (fp8 stays a
    # weight-storage win).  Guarded: some backends reject fp8 dots. ----
    gemm_fp8_tflops = None
    try:
        f8 = jnp.float8_e4m3fn

        @jax.jit
        def gemm_probe_fp8(a1, w1, w2, wq):
            h = jax.lax.dot(a1, w1, preferred_element_type=jnp.bfloat16)
            y = jax.lax.dot(h.astype(f8), w2,
                            preferred_element_type=jnp.bfloat16)
            q = jax.lax.dot(a1, wq, preferred_element_type=jnp.bfloat16)
            return (y * q).sum()

        t_gemm8, _ = timed(gemm_probe_fp8, a1.astype(f8), w1.astype(f8),
                           w2.astype(f8), wq.astype(f8),
                           n=max(args.iters, 10))
        gemm_fp8_tflops = round(probe_flops / t_gemm8 / 1e12, 1)
    except Exception as e:
        print(f"fp8 gemm probe failed: {e!r}", file=sys.stderr)

    # ---- attribution ----
    # FLOPs convention stated explicitly: the transformer runs B*(Sx+Sy)
    # SEQUENCE POSITIONS per step (each position embeds all K codebooks),
    # and fwd+bwd costs ~6*N FLOPs per position (2N fwd + 4N bwd,
    # multiply-add = 2).  'ntok' (effective_ntoken) counts K codebook
    # streams and is the tokens/s THROUGHPUT unit, not the FLOPs unit.
    t_step = t_grads + t_upd
    positions = B * (Sx + Sy)
    step_flops = 6.0 * n_params * positions
    toks_per_s = ntok / t_step
    ideal_bwd = 2.0 * t_fwd
    remat_sched = t_grads - 3.0 * t_fwd
    result = {
        "metric": f"train_profile_{args.preset}"
                  + (f"_{args.train_remat}" if args.train_remat else ""),
        "B": B, "tokens_per_step": ntok,
        "tokens_per_sec": round(toks_per_s, 0),
        "t_fwd_s": round(t_fwd, 4),
        "t_grads_s": round(t_grads, 4),
        "t_update_s": round(t_upd, 4),
        "t_step_s": round(t_step, 4),
        "achieved_tflops": round(step_flops / t_step / 1e12, 1),
        "gemm_probe_tflops": round(gemm_tflops, 1),
        "gemm_probe_fp8_tflops": gemm_fp8_tflops,
        "frac_fwd": round(t_fwd / t_step, 3),
        "frac_ideal_bwd": round(ideal_bwd / t_step, 3),
        "frac_remat_sched": round(remat_sched / t_step, 3),
        "frac_update": round(t_upd / t_step, 3),
    }
    print(json.dumps(result))


def _bench_serving(args, cfg, params, rng, extra=None):
    """Aggregate throughput with N distinct-prompt lanes (serving config).

    With ``--spec TAU`` the lanes decode speculatively (MTP drafts + verify,
    make_spec_serving_loop); add ``--spec-accept`` for the 100%-acceptance
    ceiling.  Without --spec-accept, random-init heads reject everything, so
    the number is the verified-pass rate of the machinery."""
    import jax
    import jax.numpy as jnp
    from voicecraft_tpu.data import spans
    from voicecraft_tpu.models.voicecraft import SamplingConfig
    from voicecraft_tpu.inference.serving import (make_serving_tts_loop,
                                                  make_spec_serving_loop)

    B = args.serve
    K = cfg.n_codebooks
    tau = args.spec
    x_pad, y_pad, gen_max = 128, 192, args.frames
    scfg = SamplingConfig(top_k=40, stop_repetition=3,
                          spec_sampling=args.spec_sampling)
    xt = rng.integers(0, cfg.text_vocab_size, (B, x_pad)).astype(np.int32)
    x_lens = np.full((B,), x_pad, np.int32)
    yt = np.full((B, K, y_pad), cfg.empty_token, np.int32)
    p_lens = np.zeros((B,), np.int32)
    for b in range(B):
        prompt = rng.integers(0, cfg.audio_vocab_size,
                              (K, args.prompt_frames)).astype(np.int32)
        pre = spans.compose_tts_prefix(prompt, cfg)
        yt[b, :, :pre.length] = pre.tokens
        p_lens[b] = pre.length
    kv_dtype = "float8_e4m3fn" if args.kv_fp8 else None
    if tau > 1:
        loop = make_spec_serving_loop(
            cfg, batch_size=B, n_draft=tau, x_pad=x_pad, y_pad=y_pad,
            gen_max=gen_max, scfg=scfg, kv_dtype=kv_dtype, bench_mode=True,
            force_accept=args.spec_accept)
    else:
        loop = make_serving_tts_loop(
            cfg, batch_size=B, x_pad=x_pad, y_pad=y_pad, gen_max=gen_max,
            scfg=scfg, kv_dtype=kv_dtype)
    a = (params, jnp.asarray(xt), jnp.asarray(x_lens), jnp.asarray(yt),
         jnp.asarray(p_lens), jnp.zeros((B,), jnp.int32))
    t0 = time.perf_counter()
    out = loop(*a)
    _ = np.asarray(out[1])
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = loop(*a)
        ft = np.asarray(out[1])
        times.append(time.perf_counter() - t0)
    best = min(times)
    if tau > 1:
        frames = int(ft.sum())
        n_passes = int(out[2])
        print(f"spec serving tau={tau} "
              f"accept={'forced' if args.spec_accept else 'real'}: "
              f"{best:.2f}s for {frames} frames across {B} lanes "
              f"({n_passes} passes, {frames / max(n_passes, 1) / B:.2f} "
              f"tok/pass/lane)", file=sys.stderr)
    else:
        frames = int(np.where(ft >= 0, ft + 1, gen_max).sum())
        print(f"serving: {best:.2f}s for {frames} frames across {B} lanes",
              file=sys.stderr)
    rtf = frames / cfg.encodec_sr / best
    suffix = ("" if tau <= 1 else
              f"_spec{tau}" + ("_ceiling" if args.spec_accept else ""))
    print(json.dumps({
        "metric": f"tts_serving_rtf_830m_b{B}{suffix}",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf, 2),
        **(extra or {}),
    }))


def _bench_edit_serving(args, cfg, params, rng):
    """Aggregate batched speech-editing throughput: N distinct edit
    requests in lockstep (make_serving_edit_loop), every lane run to the
    generation budget (bench_mode)."""
    import jax.numpy as jnp
    from voicecraft_tpu.data import spans
    from voicecraft_tpu.models.voicecraft import SamplingConfig
    from voicecraft_tpu.inference.serving import make_serving_edit_loop

    B = args.edit_serve
    K = cfg.n_codebooks
    x_pad, y_pad, gen_max = 128, 192, args.frames
    max_spans = cfg.max_n_spans
    scfg = SamplingConfig(top_k=40, stop_repetition=3)
    xt = rng.integers(0, cfg.text_vocab_size, (B, x_pad)).astype(np.int32)
    x_lens = np.full((B,), x_pad, np.int32)
    yt = np.full((B, K, y_pad), cfg.empty_token, np.int32)
    mi = np.full((B, y_pad), -1, np.int32)
    qm = np.zeros((B, max_spans), np.int32)
    p_lens = np.zeros((B,), np.int32)
    n_spans = np.zeros((B,), np.int32)
    for b in range(B):
        codes = rng.integers(0, cfg.audio_vocab_size,
                             (K, args.prompt_frames)).astype(np.int32)
        iv = [(args.prompt_frames // 4, args.prompt_frames // 2)]
        pre, qids = spans.compose_edit_prefix(codes, iv, cfg)
        yt[b, :, :pre.length] = pre.tokens
        mi[b, :pre.length] = pre.mask_emb_idx
        for j, v in enumerate(qids[:max_spans]):
            qm[b, j] = v
        p_lens[b] = pre.length
        n_spans[b] = len(iv)
    loop = make_serving_edit_loop(
        cfg, batch_size=B, x_pad=x_pad, y_pad=y_pad, gen_max=gen_max,
        scfg=scfg, max_spans=max_spans,
        kv_dtype="float8_e4m3fn" if args.kv_fp8 else None, bench_mode=True)
    a = (params, jnp.asarray(xt), jnp.asarray(x_lens), jnp.asarray(yt),
         jnp.asarray(p_lens), jnp.asarray(mi), jnp.asarray(qm),
         jnp.asarray(n_spans), jnp.zeros((B,), jnp.int32))
    t0 = time.perf_counter()
    out = loop(*a)
    _ = np.asarray(out[2])
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = loop(*a)
        cnt = np.asarray(out[2])
        times.append(time.perf_counter() - t0)
    best = min(times)
    frames = int(cnt.sum())
    print(f"edit serving: {best:.2f}s for {frames} frames across {B} lanes",
          file=sys.stderr)
    rtf = frames / cfg.encodec_sr / best
    print(json.dumps({
        "metric": f"edit_serving_rtf_830m_b{B}",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf, 2),
    }))


def _bench_engine(args, cfg, params, rng):
    """Continuous-batching throughput with mid-flight refill.

    2x LANES requests with mixed target lengths (capped by the x_len*10
    frame budget, so lengths are deterministic under bench sampling) are
    drained through the ContinuousBatcher; wall-clock covers everything the
    server would do: admission prefills, bursts, retirement readbacks."""
    import jax
    from voicecraft_tpu.data import spans
    from voicecraft_tpu.models.voicecraft import SamplingConfig
    from voicecraft_tpu.inference.engine import ContinuousBatcher

    lanes = args.engine
    K = cfg.n_codebooks
    # --steady: a long uniform-length stream (8 waves) so the finite
    # benchmark's ramp-down is amortised and the queue never starves —
    # isolates true steady-state throughput from wave-tail occupancy loss
    # (VERDICT r02 #7)
    n_req = (8 if args.steady else 2) * lanes
    scfg = SamplingConfig(top_k=40, stop_repetition=3,
                          spec_sampling=args.spec_sampling)
    # target generated lengths between 60% and 100% of --frames via the
    # x_len * (encodec_sr//5) cap (sampled eog is rare at random init);
    # uniform at 100% with --steady
    cap_mult = cfg.encodec_sr // 5
    reqs = []
    total_target = 0
    for i in range(n_req):
        frac = 1.0 if args.steady else (
            0.6 + 0.4 * (i % lanes) / max(lanes - 1, 1))
        target = int(args.frames * frac)
        x_len = (target + args.prompt_frames) // cap_mult + 1
        x = rng.integers(0, cfg.text_vocab_size, x_len).astype(np.int32)
        y = rng.integers(0, cfg.audio_vocab_size,
                         (K, args.prompt_frames)).astype(np.int32)
        reqs.append((x, y))
        total_target += target

    def make_engine():
        return ContinuousBatcher(
            params, cfg, lanes=lanes, x_pad=128,
            y_pad=((args.prompt_frames + K + 8 + 63) // 64) * 64,
            gen_max=args.frames + 16, burst=args.burst, scfg=scfg, seed=0,
            kv_dtype="float8_e4m3fn" if args.kv_fp8 else None,
            spec=args.spec, spec_force_accept=args.spec_accept)

    eng = make_engine()
    t0 = time.perf_counter()
    for x, y in reqs[:lanes]:
        eng.submit(x, y)
    warm = eng.run()
    print(f"compile+warmup: {time.perf_counter() - t0:.1f}s "
          f"({len(warm)} requests)", file=sys.stderr)

    times, frames = [], 0
    g0 = int(np.asarray(eng._lanes.gstep))
    for it in range(args.iters):
        for x, y in reqs:
            eng.submit(x, y)
        t0 = time.perf_counter()
        results = eng.run()
        dt = time.perf_counter() - t0
        times.append(dt)
        frames = sum(g.shape[1] for _, g in results.values())
    best = min(times)
    rtf = frames / cfg.encodec_sr / best
    per_iter = (int(np.asarray(eng._lanes.gstep)) - g0) / args.iters
    print(f"engine: {best:.2f}s for {frames} frames, {n_req} requests "
          f"over {lanes} lanes (burst {args.burst}); "
          f"~{per_iter:.0f} device steps/iter -> {best / per_iter * 1e3:.2f} "
          f"ms/step, lane occupancy "
          f"{frames / (per_iter * lanes) * 100:.0f}%", file=sys.stderr)
    suffix = ("" if args.spec <= 1 else
              f"_spec{args.spec}" + ("_ceiling" if args.spec_accept else ""))
    if args.steady:
        suffix += "_steady"
    print(json.dumps({
        "metric": f"tts_engine_rtf_830m_l{lanes}{suffix}",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf, 2),
    }))


if __name__ == "__main__":
    main()
