"""voicecraft-tpu: a TPU-native neural codec language model framework for
zero-shot TTS and speech editing (JAX/XLA/Pallas), re-designed from the
capabilities of the VoiceCraft reference (jasonppy/VoiceCraft)."""

__version__ = "0.1.0"

from .config import ModelConfig, TrainConfig, PRESETS  # noqa: F401
