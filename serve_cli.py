#!/usr/bin/env python
"""HTTP serving app: zero-shot TTS + Long TTS + speech editing with
micro-batching — the TPU-serving equivalent of the reference's app layer
(gradio_app.py + predict.py), on the stdlib only.

  python serve_cli.py --model ckpt.pth --codec encodec.th --port 8080
  # smoke: python serve_cli.py --model tiny_test --random-init --port 8080

Feature parity with gradio_app.py:
  * three modes — TTS, Long TTS (sentence split, decoded as one
    multi-stream batch instead of the reference's sequential loop), Edit
  * smart transcript (gradio_app.py:254-296): the prompt's aligned words are
    stitched ahead of (and, for edits, after) the typed text
  * per-sentence rerun (gradio_app.py:237-240, 316-320) via /rerun
  * num2words normalization (gradio_app.py:207-216)
  * editing works from a raw wav alone — word alignments come from the
    in-process aligner (voicecraft_tpu/align.py) when the request carries
    none (predict.py:209-215 parity)

Endpoints:
  GET  /            web UI (three modes)
  GET  /healthz     liveness + model info
  POST /tts         {"prompt_wav_b64", "prompt_transcript",
                     "target_transcript", "mode": "TTS"|"Long TTS",
                     "smart_transcript": bool, "prompt_end_sec": float,
                     "split_text": "Sentence"|"Newline", "top_k": 40, ...}
                    -> {"wav_b64", "gen_sec", "latency_sec", "session",
                        "sentences": ["0: ...", ...],
                        "inference_transcript"}
  POST /rerun       {"session", "sentence_idx", "sentence_text"?, "seed"?}
                    -> {"wav_b64" (combined), "sentence_wav_b64"}
  POST /edit        {"wav_b64", "target_transcript", ...
                     either ("orig_transcript" + "edit_type"
                             [+ "alignment" rows])
                     or     ("edit_start_sec" + "edit_end_sec"
                             [+ "smart_transcript" + "orig_transcript"])
                     or     ("edit_spans": [[s0,e0],[s1,e1],...] seconds —
                             multi-span editing in one decode)}
                    -> {"wav_b64", "latency_sec"}
"""

import argparse
import base64
import collections
import io
import json
import logging
import queue
import threading
import time
import uuid
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

log = logging.getLogger("voicecraft_tpu.serve")


class Engine:
    """Model + codec + micro-batching TTS scheduler + session store."""

    def __init__(self, args):
        from voicecraft_tpu.inference.loader import load_model, load_codec
        from voicecraft_tpu.data.phonemes import make_text_tokenizer
        self.args = args
        self.cfg, self.params, self.phn2num = load_model(
            args.model, args.random_init, args.seed)
        if getattr(args, "fp8", False):
            from voicecraft_tpu.utils.quantize import quantize_decoder_fp8
            self.params = quantize_decoder_fp8(self.params, pack_qkv=True)
            log.info("serving with weight-only fp8 decoder (packed qkv)")
        self.ccfg, self.cparams = load_codec(args.codec, args.random_init)
        self.tok = make_text_tokenizer(args.language, args.text_backend)
        self.kv_dtype = ("float8_e4m3fn"
                         if getattr(args, "kv_fp8", False) else None)
        self.mesh = None
        mesh_arg = getattr(args, "mesh", None)
        if mesh_arg:
            import jax
            from voicecraft_tpu.parallel.mesh import make_mesh, shard_params
            n_data, n_model = (int(v) for v in mesh_arg.lower().split("x"))
            self.mesh = make_mesh(n_data, n_model)
            self.params = shard_params(self.params, self.mesh)
            jax.set_mesh(self.mesh)        # sticky: the server owns the process
            log.info("serving over a (%d data x %d model) device mesh",
                     n_data, n_model)
        from voicecraft_tpu.inference.autospec import resolve_spec_arg
        spec_arg = getattr(args, "spec", 0) or 0
        self.spec, self.autospec = resolve_spec_arg(spec_arg, self.params)
        if str(spec_arg).startswith("auto") and self.spec == 0:
            log.warning("--spec auto requested but the checkpoint has no "
                        "MTP heads (train_cli --n-mtp); speculative serving "
                        "disabled")
        elif self.spec > 1 and "mtp_heads" not in self.params:
            log.warning("--spec %s requested but the checkpoint has no MTP "
                        "heads (train_cli --n-mtp); speculative serving "
                        "disabled", spec_arg)
            self.spec = 0
        # one policy per tier: TTS waves and edit waves have different
        # economics, so their throughput samples must not be pooled
        self.autospec_edit = None
        self.autospec_stream = None
        if self.autospec is not None:
            from voicecraft_tpu.inference.autospec import AutoSpecPolicy
            self.autospec_edit = AutoSpecPolicy(taus=self.autospec.taus)
            self.autospec_stream = AutoSpecPolicy(taus=self.autospec.taus)
            log.info("adaptive speculation enabled (arms=%s): waves probe "
                     "per-arm throughput online and serve from the "
                     "fastest", self.autospec.arms)
        self.queue: "queue.Queue" = queue.Queue()
        self.lock = threading.Lock()
        # rerun sessions: sid -> {"codes", "prompt_end", "scfg", "seed",
        #                         "sentences", "targets", "gen_wavs"}
        self.sessions = collections.OrderedDict()
        threading.Thread(target=self._batch_worker, daemon=True).start()

    # ---- request plumbing -----------------------------------------------------

    def _phonemize(self, text):
        from voicecraft_tpu.data.phonemes import phones_to_ids, build_vocab
        phones = self.tok.phonemize(text)
        if self.phn2num is None:
            self.phn2num = build_vocab([phones])
        return np.asarray(phones_to_ids(phones, self.phn2num), np.int32)

    def _decode_wav_b64(self, b64):
        from voicecraft_tpu.utils import audio as au
        raw = base64.b64decode(b64)
        import tempfile, os
        with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
            f.write(raw)
            path = f.name
        try:
            return au.load_audio(path, self.ccfg.sample_rate)
        finally:
            os.unlink(path)

    def _wav_to_b64(self, wav):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(self.ccfg.sample_rate)
            pcm = np.round(np.clip(wav, -1, 1) * 32767).astype("<i2")
            wf.writeframes(pcm.tobytes())
        return base64.b64encode(buf.getvalue()).decode()

    def _scfg(self, req):
        from voicecraft_tpu.models.voicecraft import SamplingConfig
        return SamplingConfig(
            top_k=int(req.get("top_k", 40)),
            top_p=float(req.get("top_p", 1.0)),
            temperature=float(req.get("temperature", 1.0)),
            stop_repetition=int(req.get("stop_repetition", 3)),
            silence_tokens=tuple(req.get("silence_tokens",
                                         (1388, 1898, 131))),
            spec_sampling=req.get(
                "spec_sampling",
                getattr(self.args, "spec_sampling", "exact")),
            spec_draft_temperature=float(
                req.get("spec_draft_temperature", -1.0)))

    def _words_info(self, req, wav, transcript):
        """Whisper-style words_info for the prompt: request-supplied
        alignment rows, else the in-process aligner."""
        from voicecraft_tpu.app import words_info_from_rows
        if req.get("alignment"):
            return words_info_from_rows(req["alignment"])
        from voicecraft_tpu.align import align_words
        rows = align_words(wav, self.ccfg.sample_rate, transcript,
                           asr_model_path=self.args.asr_model)
        return words_info_from_rows(rows)

    def _decode_sentences(self, slots):
        """Queue sentence slots through the micro-batcher, wait for all."""
        for s in slots:
            self.queue.put(s)
        for s in slots:
            if not s["done"].wait(timeout=600):
                raise TimeoutError("decode timed out after 600 s")
            if isinstance(s["result"], Exception):
                raise s["result"]

    def _remember(self, sid, state):
        self.sessions[sid] = state
        while len(self.sessions) > 16:
            self.sessions.popitem(last=False)

    # ---- TTS / Long TTS ---------------------------------------------------------

    def tts(self, req: dict) -> dict:
        from voicecraft_tpu.app import (normalize_transcript,
                                        smart_transcript_tts, split_sentences)
        from voicecraft_tpu.models import encodec as ec
        t0 = time.time()
        cfg, ccfg = self.cfg, self.ccfg
        mode = req.get("mode", "TTS")
        target_text = normalize_transcript(req["target_transcript"])
        prompt_transcript = normalize_transcript(
            req.get("prompt_transcript", ""))

        wav = self._decode_wav_b64(req["prompt_wav_b64"])
        audio_dur = wav.shape[1] / ccfg.sample_rate
        prompt_end = float(req.get("prompt_end_sec", -1))
        if prompt_end <= 0:
            prompt_end = audio_dur
        smart = bool(req.get("smart_transcript", False))

        if mode == "Long TTS":
            sentences = split_sentences(target_text,
                                        req.get("split_text", "Sentence"))
        else:
            sentences = [target_text.replace("\n", " ")]

        words_info = None
        if smart:
            if not prompt_transcript:
                raise ValueError("smart_transcript needs prompt_transcript")
            words_info = self._words_info(req, wav, prompt_transcript)

        # per-sentence targets (+ the adjusted prompt cut for smart mode)
        targets, cut = [], min(prompt_end, audio_dur)
        for sentence in sentences:
            if smart:
                tgt, cut = smart_transcript_tts(words_info, cut, sentence)
            else:
                tgt = (prompt_transcript + " " + sentence).strip()
            targets.append(tgt)
        codes = ec.encode_bucketed(
            self.cparams, wav[:, :int(cut * ccfg.sample_rate)], ccfg)[0]

        seed = int(req.get("seed", self.args.seed))
        scfg = self._scfg(req)
        sbs = int(req.get("sample_batch_size", 1))
        # per-sentence seeds: distinct RNG streams regardless of how the
        # micro-batcher slices sentences into waves (lanes carry their own
        # seeds), and consistent with /tts_stream's per-sentence seeding
        slots = [{"x": self._phonemize(t), "codes": codes, "scfg": scfg,
                  "seed": seed + i, "sbs": sbs, "done": threading.Event(),
                  "result": None} for i, t in enumerate(targets)]
        self._decode_sentences(slots)

        gen_wavs = [ec.decode_bucketed(self.cparams, s["result"][1][None],
                                       ccfg)[0] for s in slots]
        combined = np.concatenate(gen_wavs, axis=-1)
        if req.get("include_prompt"):
            combined = np.concatenate(
                [wav[0, :int(cut * ccfg.sample_rate)], combined], axis=-1)

        sid = uuid.uuid4().hex[:12]
        self._remember(sid, {"codes": codes, "scfg": scfg, "seed": seed,
                             "sentences": list(sentences),
                             "targets": targets, "gen_wavs": gen_wavs,
                             "smart": smart, "words_info": words_info,
                             "cut": cut})
        gen_sec = sum(s["result"][1].shape[1] for s in slots) / cfg.encodec_sr
        return {"wav_b64": self._wav_to_b64(combined),
                "gen_sec": gen_sec,
                "latency_sec": time.time() - t0,
                "session": sid,
                "sentences": [f"{i}: {s}" for i, s in enumerate(sentences)],
                "inference_transcript": "\n".join(targets)}

    def tts_stream(self, req: dict):
        """Generator of WAV byte chunks: header first, then PCM16 audio as
        the decode loop settles frames (inference/streaming.py — exact, the
        codec is causal).  ``mode: "Long TTS"`` streams the sentences
        back-to-back (each synthesized from the same prompt, gradio-app
        semantics); no smart-transcript modes.  First-audio latency is one
        engine burst instead of the whole utterance.  Holds the model lock
        for the duration (one streaming request decodes at a time)."""
        from voicecraft_tpu.app import normalize_transcript, split_sentences
        from voicecraft_tpu.inference.streaming import stream_tts
        from voicecraft_tpu.models import encodec as ec
        ccfg = self.ccfg
        target_text = normalize_transcript(req["target_transcript"])
        prompt_transcript = normalize_transcript(
            req.get("prompt_transcript", ""))
        wav = self._decode_wav_b64(req["prompt_wav_b64"])
        prompt_end = float(req.get("prompt_end_sec", -1))
        cut = (wav.shape[1] / ccfg.sample_rate if prompt_end <= 0
               else min(prompt_end, wav.shape[1] / ccfg.sample_rate))
        codes = ec.encode_bucketed(
            self.cparams, wav[:, :int(cut * ccfg.sample_rate)], ccfg)[0]
        if req.get("mode") == "Long TTS":
            sentences = split_sentences(target_text,
                                        req.get("split_text", "Sentence"))
        else:
            sentences = [target_text.replace("\n", " ")]
        targets = [(prompt_transcript + " " + s).strip() for s in sentences]
        scfg = self._scfg(req)
        seed = int(req.get("seed", self.args.seed))

        # WAV header with unknown (streaming) sizes
        import struct
        hdr = (b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt "
               + struct.pack("<IHHIIHH", 16, 1, 1, ccfg.sample_rate,
                             ccfg.sample_rate * 2, 2, 16)
               + b"data" + struct.pack("<I", 0xFFFFFFFF))
        yield hdr
        if req.get("include_prompt"):
            pcm = np.round(np.clip(wav[0, :int(cut * ccfg.sample_rate)],
                                   -1, 1) * 32767).astype("<i2")
            yield pcm.tobytes()
        with self.lock:
            for i, target in enumerate(targets):
                x = self._phonemize(target)
                n_data = self.mesh.shape["data"] if self.mesh else 1
                # engine tier rides its own autospec arm (the engine is
                # constructed per stream, so arm choice is per sentence)
                smode = (self.autospec_stream.next_mode()
                         if self.autospec_stream is not None else self.spec)
                # Decode time comes from the PRODUCER: stream_tts attaches
                # its worker thread's eng.run() wall time to the final
                # chunk (t_decode).  Consumer-side timing (of next() or the
                # for-loop) runs at the CLIENT's drain pace — a realtime
                # player pre-fills the unbounded queue while we yield, so
                # every arm would report ~identical frames/s and reduce
                # the bandit to a coin flip.
                t_decode, n_frames = 0.0, 0
                stream_it = stream_tts(self.params, self.cfg, x, codes,
                                       scfg, seed=seed + i,
                                       cparams=self.cparams,
                                       ccfg=ccfg, kv_dtype=self.kv_dtype,
                                       spec=smode, mesh=self.mesh,
                                       lanes=n_data,
                                       burst=int(req.get("burst", 48)))
                for chunk in stream_it:
                    n_frames += chunk["frames"].shape[1]
                    t_decode = chunk.get("t_decode", t_decode)
                    audio = chunk.get("audio")
                    if audio is not None and audio.size:
                        pcm = np.round(np.clip(audio, -1, 1)
                                       * 32767).astype("<i2")
                        yield pcm.tobytes()
                if self.autospec_stream is not None and t_decode > 0:
                    self.autospec_stream.observe(smode, n_frames, t_decode)

    def rerun(self, req: dict) -> dict:
        """Regenerate one sentence of a previous TTS session
        (gradio_app.py Rerun mode)."""
        from voicecraft_tpu.app import (normalize_transcript,
                                        smart_transcript_tts)
        from voicecraft_tpu.models import encodec as ec
        t0 = time.time()
        st = self.sessions.get(req.get("session", ""))
        if st is None:
            raise ValueError("unknown or expired session")
        idx = int(req["sentence_idx"])
        if not 0 <= idx < len(st["targets"]):
            raise ValueError(f"sentence_idx out of range: {idx}")
        sentence = req.get("sentence_text")
        if sentence is not None:
            sentence = normalize_transcript(sentence)
            if st["smart"]:
                tgt, _ = smart_transcript_tts(st["words_info"], st["cut"],
                                              sentence)
            else:
                tgt = sentence
            st["sentences"][idx] = sentence
            st["targets"][idx] = tgt
        seed = int(req.get("seed", st["seed"] + 1000 + idx))
        slot = {"x": self._phonemize(st["targets"][idx]),
                "codes": st["codes"], "scfg": st["scfg"], "seed": seed,
                "done": threading.Event(), "result": None}
        self._decode_sentences([slot])
        st["gen_wavs"][idx] = ec.decode_bucketed(
            self.cparams, slot["result"][1][None], self.ccfg)[0]
        combined = np.concatenate(st["gen_wavs"], axis=-1)
        return {"wav_b64": self._wav_to_b64(combined),
                "sentence_wav_b64": self._wav_to_b64(st["gen_wavs"][idx]),
                "latency_sec": time.time() - t0}

    def _batch_worker(self):
        from voicecraft_tpu.inference.serving import (serve_tts_batch,
                                                      serve_edit_batch)
        from voicecraft_tpu.inference.editing import inference_edit
        from voicecraft_tpu.inference.tts import (inference_tts,
                                                  inference_tts_batch,
                                                  inference_tts_spec)
        while True:
            slots = [self.queue.get()]
            deadline = time.time() + self.args.batch_window_ms / 1000.0
            while len(slots) < self.args.max_batch:
                try:
                    slots.append(self.queue.get(
                        timeout=max(deadline - time.time(), 0)))
                except queue.Empty:
                    break
            try:
                log.info("micro-batch wave: %d slot(s) [%s]", len(slots),
                         ",".join(s.get("kind", "tts") for s in slots))
                with self.lock:
                    # batch only requests that share a SamplingConfig —
                    # the lockstep loop is specialized on one scfg;
                    # batching mixed params would silently decode every
                    # lane with the first request's settings.  Per-request
                    # SEEDS ride along (serving lanes key their RNG on
                    # their own seed), so mixed-seed waves are fine.
                    groups: dict = {}
                    for s in slots:
                        k = (s.get("kind", "tts"), s["scfg"],
                             s.get("sbs", 1))
                        groups.setdefault(k, []).append(s)
                    for (kind, scfg, sbs), group in groups.items():
                        if kind == "edit":
                            if len(group) > 1:
                                ereqs = [(s["x"], s["codes"],
                                          s["intervals"]) for s in group]
                                seeds = [s["seed"] for s in group]
                                if self.mesh is not None:
                                    nd = self.mesh.shape["data"]
                                    while len(ereqs) % nd:
                                        ereqs.append(ereqs[-1])
                                        seeds.append(0)
                                emode = (self.autospec_edit.next_mode()
                                         if self.autospec_edit is not None
                                         else self.spec)
                                estats: dict = {}
                                outs = serve_edit_batch(
                                    self.params, self.cfg, ereqs, scfg,
                                    seeds=seeds, kv_dtype=self.kv_dtype,
                                    mesh=self.mesh, spec=emode,
                                    stats=estats)
                                if self.autospec_edit is not None:
                                    self.autospec_edit.observe(
                                        emode, estats["frames"],
                                        estats["seconds"],
                                        tok_per_pass=estats["tok_per_pass"])
                                for s, o in zip(group, outs):
                                    s["result"] = o
                            else:
                                for s in group:
                                    s["result"] = inference_edit(
                                        self.params, self.cfg, s["x"],
                                        s["codes"], s["intervals"], scfg,
                                        seed=s["seed"], spec=self.spec)
                            continue
                        if len(group) > 1 and sbs == 1:
                            reqs_b = [(s["x"], s["codes"]) for s in group]
                            # lane-sharded waves need B % n_data == 0; pad
                            # the wave by repeating the last request
                            if self.mesh is not None:
                                nd = self.mesh.shape["data"]
                                while len(reqs_b) % nd:
                                    reqs_b.append(reqs_b[-1])
                            # adaptive speculation: ask the bandit which
                            # mode serves this wave, feed the measured
                            # throughput back (autospec.AutoSpecPolicy)
                            mode = (self.autospec.next_mode()
                                    if self.autospec is not None
                                    else self.spec)
                            wave_stats: dict = {}
                            outs = serve_tts_batch(
                                self.params, self.cfg, reqs_b,
                                scfg, seeds=[s["seed"] for s in group]
                                + [0] * (len(reqs_b) - len(group)),
                                kv_dtype=self.kv_dtype, spec=mode,
                                mesh=self.mesh, stats=wave_stats)
                            if self.autospec is not None:
                                self.autospec.observe(
                                    mode, wave_stats["frames"],
                                    wave_stats["seconds"],
                                    tok_per_pass=wave_stats["tok_per_pass"])
                            for s, o in zip(group, outs):
                                s["result"] = o
                            continue
                        for s in group:
                            # best-of-N (reference sample_batch_size) or a
                            # lone request
                            if sbs > 1:
                                s["result"] = inference_tts_batch(
                                    self.params, self.cfg, s["x"],
                                    s["codes"], scfg, batch_size=sbs,
                                    seed=s["seed"])
                            elif self.spec > 1:
                                s["result"] = inference_tts_spec(
                                    self.params, self.cfg, s["x"],
                                    s["codes"], scfg, n_draft=self.spec,
                                    seed=s["seed"])
                            else:
                                s["result"] = inference_tts(
                                    self.params, self.cfg, s["x"],
                                    s["codes"], scfg, seed=s["seed"])
            except Exception as e:  # surface errors to waiters
                log.exception("batch failed")
                for s in slots:
                    if s["result"] is None:
                        s["result"] = e
            for s in slots:
                s["done"].set()

    # ---- editing (single-stream) -------------------------------------------------

    def edit(self, req: dict) -> dict:
        from voicecraft_tpu.app import (morph_edit_span, normalize_transcript,
                                        smart_transcript_edit)
        from voicecraft_tpu.models import encodec as ec
        from voicecraft_tpu.inference.editing import (
            inference_edit, get_span, get_mask_interval)
        t0 = time.time()
        cfg, ccfg = self.cfg, self.ccfg
        wav = self._decode_wav_b64(req["wav_b64"])
        audio_dur = wav.shape[1] / ccfg.sample_rate
        codes = ec.encode_bucketed(self.cparams, wav, ccfg)[0]
        target_text = normalize_transcript(req["target_transcript"])
        orig_text = normalize_transcript(req.get("orig_transcript", ""))

        if "edit_spans" in req:
            # explicit multi-span editing (serve_edit_batch / inference_edit
            # decode all spans in one pass, reference voicecraft.py:561-906)
            spans_sec = sorted((float(s), float(e))
                               for s, e in req["edit_spans"])
            for s, e in spans_sec:
                if not e > s:
                    raise ValueError(f"edit span [{s}, {e}] has "
                                     "non-positive length")
            for (_, e0), (s1, _) in zip(spans_sec, spans_sec[1:]):
                if s1 < e0:
                    raise ValueError("edit_spans must be disjoint "
                                     f"(span starting at {s1}s overlaps "
                                     f"the previous span ending at {e0}s)")
            left_m = float(req.get("left_margin", req.get("margin", 0.08)))
            right_m = float(req.get("right_margin",
                                    req.get("margin", 0.08)))
            intervals = sorted(morph_edit_span(
                s, e, left_margin=left_m, right_margin=right_m,
                audio_dur=audio_dur, codec_sr=cfg.encodec_sr)
                for s, e in spans_sec)
            # margin widening can make adjacent frame intervals touch or
            # overlap; merge them — the union region is regenerated as one
            # contiguous edit (the splice in serve_edit_batch assumes
            # strictly increasing disjoint intervals)
            merged = [list(intervals[0])]
            for s, e in intervals[1:]:
                if s <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], e)
                else:
                    merged.append([s, e])
            intervals = [tuple(iv) for iv in merged]
            x = self._phonemize(target_text)
            slot = {"kind": "edit", "x": x, "codes": codes,
                    "intervals": intervals, "scfg": self._scfg(req),
                    "seed": int(req.get("seed", self.args.seed)),
                    "result": None, "done": threading.Event()}
            self._decode_sentences([slot])
            out = ec.decode_bucketed(self.cparams, slot["result"][None],
                                     ccfg)[0]
            return {"wav_b64": self._wav_to_b64(out),
                    "edit_interval_frames": [list(iv) for iv in intervals],
                    "latency_sec": time.time() - t0}

        if "edit_start_sec" in req and "edit_end_sec" in req:
            start_sec = float(req["edit_start_sec"])
            end_sec = float(req["edit_end_sec"])
            if req.get("smart_transcript"):
                if not orig_text:
                    raise ValueError("smart_transcript needs orig_transcript")
                wi = self._words_info(req, wav, orig_text.lower())
                target_text = normalize_transcript(smart_transcript_edit(
                    wi, start_sec, end_sec, target_text))
        else:
            # transcript-diff path (predict.py / edit_cli semantics);
            # alignment rows come from the request or the in-process aligner
            if not orig_text:
                raise ValueError("need orig_transcript (or edit_*_sec times)")
            if req.get("alignment"):
                rows = [r for r in req["alignment"]
                        if r.get("Type", "words") == "words"]
            else:
                from voicecraft_tpu.align import align_words
                rows = align_words(wav, ccfg.sample_rate, orig_text.lower(),
                                   asr_model_path=self.args.asr_model)
            orig_span, _ = get_span(orig_text.lower(), target_text.lower(),
                                    req["edit_type"])
            start_sec, end_sec = get_mask_interval(rows, tuple(orig_span),
                                                   req["edit_type"])

        left_m = float(req.get("left_margin", req.get("margin", 0.08)))
        right_m = float(req.get("right_margin", req.get("margin", 0.08)))
        if "edit_start_sec" not in req:
            # energy-aligner timestamps auto-widen to the characterized
            # p90 boundary error so word edges aren't clipped (align.py)
            from voicecraft_tpu.align import widen_margins_for_aligner
            left_m, right_m, _ = widen_margins_for_aligner(
                rows, left_m, right_m)
        interval = morph_edit_span(
            start_sec, end_sec, left_margin=left_m, right_margin=right_m,
            audio_dur=audio_dur, codec_sr=cfg.encodec_sr)
        x = self._phonemize(target_text)
        # ride the micro-batcher: concurrent edit requests sharing a
        # SamplingConfig decode as one serve_edit_batch wave
        slot = {"kind": "edit", "x": x, "codes": codes,
                "intervals": [interval],
                "scfg": self._scfg(req),
                "seed": int(req.get("seed", self.args.seed)),
                "result": None, "done": threading.Event()}
        self._decode_sentences([slot])
        res = slot["result"]
        out = ec.decode_bucketed(self.cparams, res[None], ccfg)[0]
        return {"wav_b64": self._wav_to_b64(out),
                "edit_interval_frames": list(interval),
                "latency_sec": time.time() - t0}


INDEX_HTML = """<!doctype html><html><head><title>voicecraft-tpu</title>
<style>body{font-family:sans-serif;max-width:52rem;margin:2rem auto;padding:0 1rem}
textarea,input,select{width:100%;margin:.25rem 0;box-sizing:border-box}
button{padding:.5rem 1rem;margin:.25rem .25rem .25rem 0}
.row{display:flex;gap:1rem}.row>div{flex:1}
fieldset{margin:.75rem 0;border:1px solid #ccc}</style></head>
<body><h2>voicecraft-tpu</h2>
<div class=row><div>
<label>Mode <select id=mode onchange="modeUi()">
<option>TTS</option><option>Long TTS</option><option>Edit</option>
</select></label></div><div>
<label><input type=checkbox id=smart style="width:auto"> smart transcript</label>
</div></div>
<input type=file id=wav accept=.wav>
<textarea id=pt rows=2 placeholder="prompt / original transcript"></textarea>
<textarea id=tt rows=3 placeholder="target transcript (TTS: text to speak; Edit: replacement text or full target)"></textarea>
<div class=row id=ttsopts><div>
<label>prompt end (s) <input id=pend type=number step=0.01 value=-1></label>
</div><div>
<label>split <select id=split><option>Sentence</option><option>Newline</option></select></label>
</div></div>
<fieldset id=editopts style="display:none"><legend>Edit</legend>
<div class=row><div>
<label>edit type <select id=etype><option>substitution</option>
<option>insertion</option><option>deletion</option></select></label></div><div>
<label>left margin <input id=lm type=number step=0.01 value=0.08></label></div><div>
<label>right margin <input id=rm type=number step=0.01 value=0.08></label>
</div></div></fieldset>
<div class=row><div><label>top_k <input id=topk type=number value=40></label></div>
<div><label>top_p <input id=topp type=number step=0.05 value=1.0></label></div>
<div><label>temperature <input id=temp type=number step=0.05 value=1.0></label></div>
<div><label>seed <input id=seed type=number value=1></label></div></div>
<button onclick=go()>Run</button> <span id=st></span>
<audio id=out controls style="display:block;margin-top:1rem"></audio>
<fieldset id=rerunbox style="display:none"><legend>Rerun a sentence</legend>
<select id=sentsel></select>
<textarea id=sentedit rows=2></textarea>
<button onclick=rerun()>Rerun sentence</button>
<audio id=sentout controls style="display:block"></audio></fieldset>
<pre id=itx></pre>
<script>
let session = null;
function modeUi(){
  const m = document.getElementById('mode').value;
  document.getElementById('editopts').style.display = m==='Edit'?'':'none';
  document.getElementById('ttsopts').style.display = m==='Edit'?'none':'flex';
}
async function b64(){
  const f = document.getElementById('wav').files[0];
  if(!f){alert('pick a wav');throw 'no wav'}
  const bytes = new Uint8Array(await f.arrayBuffer());
  let s=''; for(let i=0;i<bytes.length;i+=0x8000)
    s += String.fromCharCode.apply(null, bytes.subarray(i,i+0x8000));
  return btoa(s);
}
function common(){return {
  top_k:+document.getElementById('topk').value,
  top_p:+document.getElementById('topp').value,
  temperature:+document.getElementById('temp').value,
  seed:+document.getElementById('seed').value,
  smart_transcript:document.getElementById('smart').checked};}
async function go(){
  const m = document.getElementById('mode').value;
  const st = document.getElementById('st');
  st.textContent = 'generating...';
  try{
    let r, j;
    if(m==='Edit'){
      r = await fetch('/edit',{method:'POST',body:JSON.stringify({...common(),
        wav_b64: await b64(),
        orig_transcript: document.getElementById('pt').value,
        target_transcript: document.getElementById('tt').value,
        edit_type: document.getElementById('etype').value,
        left_margin:+document.getElementById('lm').value,
        right_margin:+document.getElementById('rm').value})});
    } else {
      r = await fetch('/tts',{method:'POST',body:JSON.stringify({...common(),
        mode:m, prompt_wav_b64: await b64(),
        prompt_transcript: document.getElementById('pt').value,
        target_transcript: document.getElementById('tt').value,
        prompt_end_sec:+document.getElementById('pend').value,
        split_text: document.getElementById('split').value})});
    }
    j = await r.json();
    if(!r.ok) throw j.error;
    st.textContent = (j.gen_sec!==undefined?j.gen_sec.toFixed(1)+'s audio in ':'done in ')
      + j.latency_sec.toFixed(1)+'s';
    document.getElementById('out').src = 'data:audio/wav;base64,'+j.wav_b64;
    document.getElementById('itx').textContent = j.inference_transcript||'';
    session = j.session||null;
    const box = document.getElementById('rerunbox');
    if(j.sentences && j.sentences.length){
      box.style.display='';
      const sel = document.getElementById('sentsel');
      sel.innerHTML='';
      j.sentences.forEach(s=>{const o=document.createElement('option');
        o.textContent=s; sel.appendChild(o);});
      sel.onchange = ()=>{const v=sel.value;
        document.getElementById('sentedit').value=v.slice(v.indexOf(':')+2);};
      sel.onchange();
    } else box.style.display='none';
  }catch(e){st.textContent = 'error: '+e}
}
async function rerun(){
  const sel = document.getElementById('sentsel');
  const st = document.getElementById('st');
  st.textContent = 'rerunning...';
  try{
    const r = await fetch('/rerun',{method:'POST',body:JSON.stringify({
      session, sentence_idx: sel.selectedIndex,
      sentence_text: document.getElementById('sentedit').value,
      seed: Math.floor(Math.random()*1e6)})});
    const j = await r.json();
    if(!r.ok) throw j.error;
    st.textContent = 'rerun done in '+j.latency_sec.toFixed(1)+'s';
    document.getElementById('out').src = 'data:audio/wav;base64,'+j.wav_b64;
    document.getElementById('sentout').src = 'data:audio/wav;base64,'+j.sentence_wav_b64;
  }catch(e){st.textContent = 'error: '+e}
}
modeUi();
</script></body></html>"""


def make_handler(engine: Engine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            log.info("%s " + fmt, self.client_address[0], *args)

        def _send(self, code, body, ctype="application/json"):
            data = body if isinstance(body, bytes) else body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/":
                self._send(200, INDEX_HTML, "text/html")
            elif self.path == "/healthz":
                info = {
                    "status": "ok",
                    "model_d_model": engine.cfg.d_model,
                    "n_codebooks": engine.cfg.n_codebooks}
                if engine.autospec is not None:
                    info["autospec"] = engine.autospec.snapshot()
                if engine.autospec_edit is not None:
                    info["autospec_edit"] = engine.autospec_edit.snapshot()
                if engine.autospec_stream is not None:
                    info["autospec_stream"] = (
                        engine.autospec_stream.snapshot())
                self._send(200, json.dumps(info))
            else:
                self._send(404, json.dumps({"error": "not found"}))

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n))
                if self.path == "/tts_stream":
                    # stream WAV bytes as frames settle; end = connection
                    # close (no Content-Length)
                    gen = engine.tts_stream(req)
                    first = next(gen)           # raise before headers go out
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.end_headers()
                    try:
                        self.wfile.write(first)
                        self.wfile.flush()
                        for part in gen:
                            self.wfile.write(part)
                            self.wfile.flush()
                    except Exception:
                        # headers already sent: a 500 body here would be
                        # decoded as garbage AUDIO by the client — just log
                        # and close the connection (truncation = error)
                        log.exception("stream aborted")
                    finally:
                        gen.close()
                        self.close_connection = True
                    return
                if self.path == "/tts":
                    out = engine.tts(req)
                elif self.path == "/edit":
                    out = engine.edit(req)
                elif self.path == "/rerun":
                    out = engine.rerun(req)
                else:
                    return self._send(404, json.dumps({"error": "not found"}))
                if isinstance(out, Exception):
                    raise out
                self._send(200, json.dumps(out))
            except Exception as e:
                log.exception("request failed")
                self._send(500, json.dumps({"error": str(e)}))

    return Handler


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--codec", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--batch-window-ms", type=float, default=50.0)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--text-backend", default="auto")
    ap.add_argument("--asr-model", default=None,
                    help="local Whisper snapshot dir for transcription/"
                         "alignment (else the energy aligner is used)")
    ap.add_argument("--fp8", action="store_true",
                    help="weight-only fp8 decoder (serving quantization)")
    ap.add_argument("--kv-fp8", action="store_true",
                    help="fp8 KV slab for multi-lane serving (halves the "
                         "dominant HBM traffic at 16+ lanes)")
    ap.add_argument("--spec", default="0", metavar="TAU|auto[:T1,T2..]",
                    help="speculative decoding with TAU tokens per verified "
                         "pass (checkpoint must carry MTP heads); applies "
                         "to both lone requests and micro-batched lanes. "
                         "'auto' runs a per-tier bandit over arms "
                         "{plain, tau=4, full MTP depth} — TTS waves, edit "
                         "waves, and /tts_stream each measure their own "
                         "arms on live traffic and serve from the fastest "
                         "(lone requests always use spec, the measured "
                         "single-stream win); 'auto:T1,T2' picks the arm "
                         "taus explicitly")
    ap.add_argument("--mesh", default=None, metavar="DATAxMODEL",
                    help="multi-chip serving: shard lanes over a data axis "
                         "and params over a model axis, e.g. 4x2 "
                         "(parallel/mesh.py)")
    ap.add_argument("--spec-sampling", default="exact",
                    choices=["exact", "stochastic"],
                    help="default speculative verification mode (requests "
                         "can override via the spec_sampling field)")
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    from voicecraft_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup(args.platform)

    engine = Engine(args)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(engine))
    log.info("serving on http://%s:%d", args.host, args.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
