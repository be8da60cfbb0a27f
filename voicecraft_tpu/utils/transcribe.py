"""Transcription glue (reference gradio_app.py:41-79 Whisper/WhisperX).

The reference shells out to whisper/whisperx for transcribing prompts in its
apps.  Here: a transformers Whisper pipeline when local weights are
available (offline), with a clear error otherwise.  Word-level alignment
(the reference's MFA/whisperx alignment for editing) must still come from an
external aligner's CSV — see edit_cli.py --mfa-csv.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class WhisperTranscriber:
    """transformers Whisper ASR from a local snapshot directory."""

    def __init__(self, model_path: str, device: str = "cpu"):
        from transformers import (WhisperForConditionalGeneration,
                                  WhisperProcessor)
        self.processor = WhisperProcessor.from_pretrained(model_path)
        self.model = WhisperForConditionalGeneration.from_pretrained(model_path)
        self.model.eval()

    def transcribe(self, wav: np.ndarray, sample_rate: int = 16000) -> str:
        import torch
        if wav.ndim == 2:
            wav = wav.mean(axis=0)
        inputs = self.processor(wav, sampling_rate=sample_rate,
                                return_tensors="pt")
        with torch.no_grad():
            ids = self.model.generate(inputs.input_features)
        return self.processor.batch_decode(ids, skip_special_tokens=True)[0]


from functools import lru_cache


@lru_cache(maxsize=2)
def make_transcriber(model_path: Optional[str]):
    """Returns a transcriber or raises with guidance when unavailable.

    Memoized on the snapshot path: batch drivers call this per row/seed
    (tts_batch_cli --wer, realedit_cli --wer), and reloading the Whisper
    checkpoint each time would dominate their runtime."""
    if model_path is None:
        raise RuntimeError(
            "no ASR model configured: pass a local Whisper snapshot dir "
            "(e.g. downloaded openai/whisper-base) via --asr-model, or "
            "provide the transcript explicitly")
    return WhisperTranscriber(model_path)


def split_sentences(text: str) -> list[str]:
    """Sentence split for long-form TTS (reference gradio_app.py uses
    nltk.sent_tokenize; this is a dependency-free equivalent)."""
    import re
    parts = re.split(r"(?<=[.!?])\s+", text.strip())
    return [p for p in (s.strip() for s in parts) if p]
