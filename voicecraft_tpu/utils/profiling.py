"""Profiling & metering (SURVEY.md §5 tracing/observability).

The reference only had wall-clock AverageMeters for data/train time
(steps/trainer.py:162-166).  Here: the same meters, plus first-class
``jax.profiler`` trace capture around a window of training steps — the trace
opens in TensorBoard / Perfetto and shows per-op device time on the TPU.
"""

from __future__ import annotations

import contextlib
import logging
import time

log = logging.getLogger("voicecraft_tpu.profiling")


class AverageMeter:
    """Running average (reference trainer_utils.py:142-157 semantics)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace for the enclosed region."""
    import jax
    jax.profiler.start_trace(log_dir)
    t0 = time.time()
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace (%.2fs) written to %s",
                 time.time() - t0, log_dir)


class StepProfiler:
    """Traces steps [start, stop) of a training run into ``log_dir``."""

    def __init__(self, log_dir: str | None, start: int = 10, stop: int = 13):
        self.log_dir = log_dir
        self.start, self.stop = start, stop
        self._active = False

    def step(self, step_idx: int):
        if self.log_dir is None:
            return
        import jax
        if step_idx == self.start and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            log.info("profiler: tracing steps %d..%d", self.start, self.stop)
        elif step_idx >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
            log.info("profiler: trace written to %s", self.log_dir)

    def close(self):
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
