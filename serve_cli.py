#!/usr/bin/env python
"""HTTP serving app: zero-shot TTS + speech editing with micro-batching.

The reference's app layer is a gradio UI + a Replicate cog wrapper
(gradio_app.py, predict.py).  This is the TPU-serving equivalent on the
stdlib only: a threaded HTTP front-end, a request queue, and a batcher thread
that coalesces concurrent TTS requests into multi-stream decodes
(voicecraft_tpu/inference/serving.py) so the HBM-bound decoder is shared
across lanes.

  python serve_cli.py --model ckpt.pth --codec encodec.th --port 8080
  # smoke: python serve_cli.py --model tiny_test --random-init --port 8080

Endpoints:
  GET  /            minimal web UI
  GET  /healthz     liveness + model info
  POST /tts         {"prompt_wav_b64": ..., "prompt_transcript": ...,
                     "target_transcript": ..., "top_k": 40, ...}
                    -> {"wav_b64": ..., "gen_sec": ..., "latency_sec": ...}
  POST /edit        {"wav_b64": ..., "orig_transcript": ...,
                     "target_transcript": ..., "edit_type": ...,
                     "alignment": [{"Begin","End","Label"}...]} -> wav
"""

import argparse
import base64
import io
import json
import logging
import queue
import threading
import time
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

log = logging.getLogger("voicecraft_tpu.serve")

INDEX_HTML = """<!doctype html><html><head><title>voicecraft-tpu</title>
<style>body{font-family:sans-serif;max-width:48rem;margin:2rem auto;padding:0 1rem}
textarea,input{width:100%;margin:.25rem 0}button{padding:.5rem 1rem}</style></head>
<body><h2>voicecraft-tpu</h2>
<p>Zero-shot TTS: upload a voice prompt wav, its transcript, and the text to
synthesize in that voice.</p>
<input type=file id=wav accept=.wav>
<textarea id=pt rows=2 placeholder="prompt transcript"></textarea>
<textarea id=tt rows=2 placeholder="target transcript"></textarea>
<button onclick=go()>Synthesize</button> <span id=st></span>
<audio id=out controls style="display:block;margin-top:1rem"></audio>
<script>
async function go(){
  const f = document.getElementById('wav').files[0];
  if(!f){alert('pick a wav');return}
  const b64 = btoa(String.fromCharCode(...new Uint8Array(await f.arrayBuffer())));
  document.getElementById('st').textContent = 'generating...';
  const r = await fetch('/tts', {method:'POST', body: JSON.stringify({
    prompt_wav_b64: b64,
    prompt_transcript: document.getElementById('pt').value,
    target_transcript: document.getElementById('tt').value})});
  const j = await r.json();
  document.getElementById('st').textContent =
    r.ok ? (j.gen_sec.toFixed(1)+'s audio in '+j.latency_sec.toFixed(1)+'s') : j.error;
  if(r.ok) document.getElementById('out').src = 'data:audio/wav;base64,'+j.wav_b64;
}
</script></body></html>"""


class Engine:
    """Model + codec + micro-batching TTS scheduler."""

    def __init__(self, args):
        from voicecraft_tpu.inference.loader import load_model, load_codec
        from voicecraft_tpu.data.phonemes import make_text_tokenizer
        self.args = args
        self.cfg, self.params, self.phn2num = load_model(
            args.model, args.random_init, args.seed)
        self.ccfg, self.cparams = load_codec(args.codec, args.random_init)
        self.tok = make_text_tokenizer(args.language, args.text_backend)
        self.queue: "queue.Queue" = queue.Queue()
        self.lock = threading.Lock()
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
            silence_tokens=tuple(req.get("silence_tokens", (1388, 1898, 131))))

    # ---- TTS with micro-batching ------------------------------------------------

    def tts(self, req: dict) -> dict:
        from voicecraft_tpu.models import encodec as ec
        t0 = time.time()
        x = self._phonemize(req["prompt_transcript"].strip() + " "
                            + req["target_transcript"].strip())
        wav = self._decode_wav_b64(req["prompt_wav_b64"])
        end = float(req.get("prompt_end_sec", -1))
        if end > 0:
            wav = wav[:, :int(end * self.ccfg.sample_rate)]
        codes = ec.encode_bucketed(self.cparams, wav, self.ccfg)[0]

        done = threading.Event()
        slot = {"x": x, "codes": codes, "scfg": self._scfg(req),
                "seed": int(req.get("seed", self.args.seed)),
                "done": done, "result": None}
        self.queue.put(slot)
        done.wait(timeout=600)
        if isinstance(slot["result"], Exception):
            raise slot["result"]
        full, gen = slot["result"]
        out = ec.decode_bucketed(self.cparams, full[None], self.ccfg)[0]
        return {"wav_b64": self._wav_to_b64(out),
                "gen_sec": gen.shape[1] / self.cfg.encodec_sr,
                "latency_sec": time.time() - t0}

    def _batch_worker(self):
        from voicecraft_tpu.inference.serving import serve_tts_batch
        from voicecraft_tpu.inference.tts import inference_tts
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
                with self.lock:
                    if len(slots) == 1:
                        s = slots[0]
                        s["result"] = inference_tts(
                            self.params, self.cfg, s["x"], s["codes"],
                            s["scfg"], seed=s["seed"])
                    else:
                        outs = serve_tts_batch(
                            self.params, self.cfg,
                            [(s["x"], s["codes"]) for s in slots],
                            slots[0]["scfg"], seed=slots[0]["seed"])
                        for s, o in zip(slots, outs):
                            s["result"] = o
            except Exception as e:  # surface errors to waiters
                log.exception("batch failed")
                for s in slots:
                    s["result"] = e
            for s in slots:
                s["done"].set()

    # ---- editing (single-stream) -------------------------------------------------

    def edit(self, req: dict) -> dict:
        from voicecraft_tpu.models import encodec as ec
        from voicecraft_tpu.inference.editing import (
            inference_edit, get_span, get_mask_interval)
        t0 = time.time()
        wav = self._decode_wav_b64(req["wav_b64"])
        audio_dur = wav.shape[1] / self.ccfg.sample_rate
        codes = ec.encode_bucketed(self.cparams, wav, self.ccfg)[0]
        x = self._phonemize(req["target_transcript"].strip())
        orig_span, _ = get_span(req["orig_transcript"].strip().lower(),
                                req["target_transcript"].strip().lower(),
                                req["edit_type"])
        start_sec, end_sec = get_mask_interval(req["alignment"],
                                               tuple(orig_span),
                                               req["edit_type"])
        margin = float(req.get("margin", 0.08))
        start_sec = max(0.0, start_sec - margin)
        end_sec = min(audio_dur, end_sec + margin)
        interval = (int(start_sec * self.cfg.encodec_sr),
                    int(end_sec * self.cfg.encodec_sr))
        with self.lock:
            res = inference_edit(self.params, self.cfg, x, codes, [interval],
                                 self._scfg(req),
                                 seed=int(req.get("seed", self.args.seed)))
        out = ec.decode_bucketed(self.cparams, res[None], self.ccfg)[0]
        return {"wav_b64": self._wav_to_b64(out),
                "latency_sec": time.time() - t0}


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
                self._send(200, json.dumps({
                    "status": "ok",
                    "model_d_model": engine.cfg.d_model,
                    "n_codebooks": engine.cfg.n_codebooks}))
            else:
                self._send(404, json.dumps({"error": "not found"}))

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n))
                if self.path == "/tts":
                    out = engine.tts(req)
                elif self.path == "/edit":
                    out = engine.edit(req)
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
