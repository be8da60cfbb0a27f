"""HTTP serving app regression test: spin the real server, hit /healthz,
/tts (two concurrent requests through the micro-batcher), and /edit."""

import base64
import json
import os
import signal
import socket
import subprocess
import sys
import threading
import time
import urllib.request

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO_WAV = "/root/reference/demo/5895_34622_000026_000002.wav"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server():
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve_cli.py"),
         "--model", "tiny_test", "--random-init",
         "--text-backend", "grapheme", "--platform", "cpu",
         "--port", str(port), "--batch-window-ms", "500"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd=REPO)
    base = f"http://127.0.0.1:{port}"
    try:
        for _ in range(120):
            if proc.poll() is not None:
                raise RuntimeError(proc.stdout.read().decode()[-2000:])
            try:
                urllib.request.urlopen(base + "/healthz", timeout=2)
                break
            except Exception:
                time.sleep(1)
        else:
            raise TimeoutError("server did not come up")
        yield base
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=10)


def _post(base, path, payload, timeout=420):
    req = urllib.request.Request(base + path,
                                 data=json.dumps(payload).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _prompt_b64():
    if os.path.exists(DEMO_WAV):
        # re-encode the float32 demo wav as 16-bit pcm via our own utils
        from voicecraft_tpu.utils import audio as au
        import io, wave
        w = au.load_audio(DEMO_WAV, 16000)[:, :32000]
    else:
        t = np.arange(32000) / 16000.0
        w = (0.1 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    import io, wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(np.round(np.clip(w[0], -1, 1) * 32767)
                       .astype("<i2").tobytes())
    return base64.b64encode(buf.getvalue()).decode()


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=10) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok" and info["n_codebooks"] == 4


def test_concurrent_tts_and_edit(server):
    b64 = _prompt_b64()
    results = [None, None]

    def run(i, text):
        results[i] = _post(server, "/tts", {
            "prompt_wav_b64": b64, "prompt_end_sec": 1.5,
            "prompt_transcript": "a test prompt",
            "target_transcript": text, "top_k": 15,
            "silence_tokens": [5, 7]})

    ths = [threading.Thread(target=run, args=(i, t))
           for i, t in enumerate(["hello world", "another request"])]
    [t.start() for t in ths]
    [t.join(timeout=420) for t in ths]
    for r in results:
        assert r is not None and "wav_b64" in r and r["gen_sec"] > 0

    align = [{"Begin": 0.1, "End": 0.5, "Label": "a", "Type": "words"},
             {"Begin": 0.5, "End": 1.0, "Label": "test", "Type": "words"},
             {"Begin": 1.0, "End": 1.6, "Label": "prompt", "Type": "words"}]
    r = _post(server, "/edit", {
        "wav_b64": b64, "orig_transcript": "a test prompt",
        "target_transcript": "a great prompt", "edit_type": "substitution",
        "alignment": align, "top_k": 15, "silence_tokens": [5, 7]})
    assert "wav_b64" in r and len(r["wav_b64"]) > 1000


def test_long_tts_with_rerun(server):
    b64 = _prompt_b64()
    r = _post(server, "/tts", {
        "prompt_wav_b64": b64, "prompt_end_sec": 1.2,
        "prompt_transcript": "a test prompt",
        "target_transcript": "First thing. Second thing.",
        "mode": "Long TTS", "top_k": 15, "silence_tokens": [5, 7]})
    assert r["sentences"] == ["0: First thing.", "1: Second thing."]
    assert r["session"] and r["gen_sec"] > 0
    assert "First thing." in r["inference_transcript"]

    rr = _post(server, "/rerun", {
        "session": r["session"], "sentence_idx": 1,
        "sentence_text": "A new second thing.", "seed": 7,
        "silence_tokens": [5, 7]})
    assert "wav_b64" in rr and "sentence_wav_b64" in rr
    assert len(rr["wav_b64"]) > len(rr["sentence_wav_b64"]) // 2


def test_edit_without_alignment(server):
    """predict.py parity: editing from a raw wav + transcripts alone — the
    server aligns in-process."""
    b64 = _prompt_b64()
    r = _post(server, "/edit", {
        "wav_b64": b64, "orig_transcript": "a test prompt",
        "target_transcript": "a great prompt", "edit_type": "substitution",
        "top_k": 15, "silence_tokens": [5, 7]})
    assert "wav_b64" in r and len(r["wav_b64"]) > 1000
    s, e = r["edit_interval_frames"]
    assert 0 < s < e <= 101  # inside the 2 s clip, 50 Hz frames


def test_edit_multi_span(server):
    """Explicit multi-span editing over HTTP: both spans decode in one pass
    (edit_spans -> serve_edit_batch/inference_edit multi-span path)."""
    b64 = _prompt_b64()
    r = _post(server, "/edit", {
        "wav_b64": b64, "target_transcript": "a very different test phrase",
        "edit_spans": [[0.3, 0.6], [1.2, 1.5]],
        "top_k": 15, "silence_tokens": [5, 7]})
    assert "wav_b64" in r and len(r["wav_b64"]) > 1000
    ivs = r["edit_interval_frames"]
    assert len(ivs) == 2 and ivs[0][1] <= ivs[1][0]


def test_edit_multi_span_validation(server):
    """Overlapping raw spans are rejected; spans whose margin-widened frame
    intervals overlap merge into one contiguous edit region (the splice in
    serve_edit_batch assumes strictly increasing disjoint intervals)."""
    import urllib.error
    b64 = _prompt_b64()
    with pytest.raises(urllib.error.HTTPError):
        _post(server, "/edit", {
            "wav_b64": b64, "target_transcript": "a b c",
            "edit_spans": [[0.3, 0.6], [0.5, 0.9]],
            "top_k": 15, "silence_tokens": [5, 7]})
    r = _post(server, "/edit", {
        "wav_b64": b64, "target_transcript": "a very different test phrase",
        "edit_spans": [[0.3, 0.6], [0.65, 0.9]],
        "top_k": 15, "silence_tokens": [5, 7]})
    assert "wav_b64" in r and len(r["wav_b64"]) > 1000
    # the 0.05 s gap is inside the default 0.08 s margins -> one interval
    assert len(r["edit_interval_frames"]) == 1


def test_tts_smart_transcript(server):
    b64 = _prompt_b64()
    r = _post(server, "/tts", {
        "prompt_wav_b64": b64, "prompt_end_sec": 1.0,
        "prompt_transcript": "a test prompt",
        "smart_transcript": True,
        "target_transcript": "hello there", "top_k": 15,
        "silence_tokens": [5, 7]})
    assert "wav_b64" in r and r["gen_sec"] > 0
    # the smart transcript stitches aligned prompt words before the text
    assert r["inference_transcript"].endswith("hello there")


def test_tts_sample_batch_size(server):
    """Best-of-N sampling for a lone request (reference sample_batch_size)."""
    b64 = _prompt_b64()
    r = _post(server, "/tts", {
        "prompt_wav_b64": b64, "prompt_end_sec": 1.0,
        "prompt_transcript": "a test prompt",
        "target_transcript": "short line", "top_k": 15,
        "sample_batch_size": 2, "silence_tokens": [5, 7]})
    assert "wav_b64" in r and r["gen_sec"] > 0


def test_tts_stream(server):
    """/tts_stream returns a streaming WAV: header + PCM16 written as the
    decode settles frames (connection close terminates the stream)."""
    b64 = _prompt_b64()
    req = urllib.request.Request(
        server + "/tts_stream",
        data=json.dumps({
            "prompt_wav_b64": b64, "prompt_end_sec": 1.5,
            "prompt_transcript": "a test prompt",
            "target_transcript": "streamed hello", "top_k": 15,
            "burst": 16, "silence_tokens": [5, 7]}).encode(),
        method="POST")
    reads = []
    with urllib.request.urlopen(req, timeout=420) as r:
        assert r.headers.get("Content-Type") == "audio/wav"
        while True:
            blk = r.read(65536)
            if not blk:
                break
            reads.append(blk)
    data = b"".join(reads)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    pcm = np.frombuffer(data[44:], dtype="<i2")
    # at least half a second of real audio came through
    assert pcm.size > 8000 and np.abs(pcm).max() > 0


def test_tts_stream_long(server):
    """Long TTS streaming: sentences stream back-to-back in one WAV."""
    b64 = _prompt_b64()
    req = urllib.request.Request(
        server + "/tts_stream",
        data=json.dumps({
            "prompt_wav_b64": b64, "prompt_end_sec": 1.5,
            "prompt_transcript": "a test prompt", "mode": "Long TTS",
            "target_transcript": "first sentence. second one.",
            "top_k": 15, "burst": 16, "silence_tokens": [5, 7]}).encode(),
        method="POST")
    with urllib.request.urlopen(req, timeout=420) as r:
        data = r.read()
    assert data[:4] == b"RIFF"
    pcm = np.frombuffer(data[44:], dtype="<i2")
    assert pcm.size > 8000 and np.abs(pcm).max() > 0


@pytest.fixture(scope="module")
def mesh_server():
    """serve_cli over a (4 data x 2 model) mesh on the 8-device CPU grid."""
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve_cli.py"),
         "--model", "tiny_test", "--random-init",
         "--text-backend", "grapheme", "--platform", "cpu",
         "--mesh", "4x2",
         "--port", str(port), "--batch-window-ms", "300"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd=REPO)
    base = f"http://127.0.0.1:{port}"
    try:
        for _ in range(120):
            if proc.poll() is not None:
                raise RuntimeError(proc.stdout.read().decode()[-2000:])
            try:
                urllib.request.urlopen(base + "/healthz", timeout=2)
                break
            except Exception:
                time.sleep(1)
        else:
            raise TimeoutError("server did not come up")
        yield base
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=10)


def test_mesh_tts_and_stream(mesh_server):
    """--mesh 4x2: micro-batched /tts (lane-sharded wave, padded to the
    data-axis multiple) and /tts_stream (lane-sharded engine) both work."""
    b64 = _prompt_b64()
    results = [None, None]

    def run(i, text):
        results[i] = _post(mesh_server, "/tts", {
            "prompt_wav_b64": b64, "prompt_end_sec": 1.5,
            "prompt_transcript": "a test prompt",
            "target_transcript": text, "top_k": 15,
            "silence_tokens": [5, 7]})

    ths = [threading.Thread(target=run, args=(i, t))
           for i, t in enumerate(["hello world", "another request"])]
    [t.start() for t in ths]
    [t.join(timeout=420) for t in ths]
    for r in results:
        assert r is not None and "wav_b64" in r and r["gen_sec"] > 0

    req = urllib.request.Request(
        mesh_server + "/tts_stream",
        data=json.dumps({
            "prompt_wav_b64": b64, "prompt_end_sec": 1.5,
            "prompt_transcript": "a test prompt",
            "target_transcript": "streamed hello", "top_k": 15,
            "burst": 16, "silence_tokens": [5, 7]}).encode(),
        method="POST")
    reads = []
    with urllib.request.urlopen(req, timeout=420) as r:
        assert r.headers.get("Content-Type") == "audio/wav"
        while True:
            blk = r.read(65536)
            if not blk:
                break
            reads.append(blk)
    data = b"".join(reads)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    pcm = np.frombuffer(data[44:], dtype="<i2")
    assert pcm.size > 8000 and np.abs(pcm).max() > 0


def test_concurrent_edits_batch_into_one_wave(server):
    """Two concurrent /edit requests sharing a SamplingConfig ride one
    serve_edit_batch wave through the micro-batcher (serve_cli
    _batch_worker kind='edit' group)."""
    b64 = _prompt_b64()
    align = [{"Begin": 0.1, "End": 0.5, "Label": "a", "Type": "words"},
             {"Begin": 0.5, "End": 1.0, "Label": "test", "Type": "words"},
             {"Begin": 1.0, "End": 1.6, "Label": "prompt", "Type": "words"}]
    results = [None, None]

    def run(i, target):
        results[i] = _post(server, "/edit", {
            "wav_b64": b64, "orig_transcript": "a test prompt",
            "target_transcript": target, "edit_type": "substitution",
            "alignment": align, "top_k": 15, "silence_tokens": [5, 7],
            "seed": 3 + i})

    ths = [threading.Thread(target=run, args=(i, t))
           for i, t in enumerate(["a great prompt", "a small prompt"])]
    [t.start() for t in ths]
    [t.join(timeout=420) for t in ths]
    for r in results:
        assert r is not None and "wav_b64" in r and len(r["wav_b64"]) > 1000
        s, e = r["edit_interval_frames"]
        assert 0 < s < e <= 101
