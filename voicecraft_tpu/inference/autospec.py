"""Online plain-vs-speculative mode selection for the serving tier.

Whether speculative decoding (``spec=tau``) beats plain lockstep serving is
NOT knowable offline: it depends on draft acceptance (prompt mix, sampling
temperature, MTP-head quality) and on the wave's lane count.  Measured on
real TPU at 830M (PERF.md "MEASURED end-to-end speculative decoding"):
single-stream tau=8 won 3.61x over the plain loop, serving B=8 tau=8 won
1.51x — but tau=2/4 at the same lane count LOST outright (<1x), and at 32
lanes plain lockstep beats spec entirely.  The reference has no equivalent
concern (it decodes one request at a time, /root/reference/models/
voicecraft.py:1068), so this policy is new surface: a tiny online bandit
that measures both modes on live waves and serves from the faster one.

Design:

- Each mode (0 = plain, tau = speculative) keeps a small window of
  throughput samples (generated frames / wall second, timed through the
  host readback inside ``serve_tts_batch``).  The estimate is the median of
  the window — robust to a one-off jit compile or a straggler wave.
- Until both modes have ``probe_waves`` samples, waves alternate between
  modes (spec first: its compile is the expensive one, get it done early).
- After that the faster mode serves every wave, except one probe of the
  loser every ``reprobe_every`` waves — acceptance drifts with the traffic
  mix, so a mode written off at startup can win later (and vice versa).
- The first sample of each mode is dropped once a second arrives: the
  first wave of a geometry pays jit compilation, which would poison the
  estimate for the rest of the process lifetime.

The policy is pure host-side bookkeeping (no device work) and mode choice
never changes outputs: greedy spec serving is bit-exact vs the plain loop
in f32, and sampled output uses the per-(request, token-index) key
schedule, so it is draw-equivalent across plain/spec and invariant to tau
(tests/test_serving_spec.py).
"""
from __future__ import annotations

import logging
import threading
import time
from collections import deque
from typing import Dict, Optional

log = logging.getLogger("voicecraft_tpu.autospec")


class AutoSpecPolicy:
    """Two-armed throughput bandit over {plain, spec=tau} serving modes.

    Usage (one instance per server; thread-safe)::

        policy = AutoSpecPolicy(tau=8)
        mode = policy.next_mode()              # 0 or tau, for this wave
        stats = {}
        serve_tts_batch(..., spec=mode, stats=stats)
        policy.observe(mode, stats["frames"], stats["seconds"],
                       tok_per_pass=stats["tok_per_pass"])
    """

    def __init__(self, tau: int, *, probe_waves: int = 2,
                 reprobe_every: int = 12, window: int = 4):
        assert tau > 1, tau
        assert probe_waves >= 1 and reprobe_every >= 2 and window >= 2
        self.tau = int(tau)
        self.probe_waves = int(probe_waves)
        self.reprobe_every = int(reprobe_every)
        self._lock = threading.Lock()
        # per-mode sample windows of frames/s; [0] additionally remembers
        # whether the compile-tainted first sample was already shed
        self._samples: Dict[int, deque] = {0: deque(maxlen=window),
                                           tau: deque(maxlen=window)}
        self._n_obs: Dict[int, int] = {0: 0, tau: 0}
        self._tpp: Dict[int, Optional[float]] = {0: None, tau: None}
        self._since_probe = 0
        self._next_probe_mode = tau     # alternation cursor while probing

    # ---- estimates -----------------------------------------------------------

    def _estimate(self, mode: int) -> Optional[float]:
        s = self._samples[mode]
        if not s:
            return None
        vals = sorted(s)
        n = len(vals)
        return (vals[n // 2] if n % 2
                else 0.5 * (vals[n // 2 - 1] + vals[n // 2]))

    def snapshot(self) -> dict:
        """Telemetry: current estimates and sample counts (for /healthz,
        logs, tests)."""
        with self._lock:
            return {
                "tau": self.tau,
                "plain_fps": self._estimate(0),
                "spec_fps": self._estimate(self.tau),
                "n_plain": self._n_obs[0],
                "n_spec": self._n_obs[self.tau],
                "tok_per_pass": self._tpp[self.tau],
                "serving_mode": self._exploit_mode(),
            }

    def _exploit_mode(self) -> int:
        ep, es = self._estimate(0), self._estimate(self.tau)
        if ep is None and es is None:
            return self.tau
        if ep is None:
            return self.tau
        if es is None:
            return 0
        return self.tau if es >= ep else 0

    # ---- the bandit ----------------------------------------------------------

    def next_mode(self) -> int:
        """Mode for the next wave: 0 (plain lockstep) or ``self.tau``."""
        with self._lock:
            # probe phase: alternate until both arms have enough samples
            for _ in range(2):
                m = self._next_probe_mode
                self._next_probe_mode = 0 if m else self.tau
                if self._n_obs[m] < self.probe_waves:
                    return m
            # exploit, with a periodic probe of the loser
            best = self._exploit_mode()
            self._since_probe += 1
            if self._since_probe >= self.reprobe_every:
                self._since_probe = 0
                return self.tau if best == 0 else 0
            return best

    def observe(self, mode: int, frames: int, seconds: float,
                tok_per_pass: Optional[float] = None) -> None:
        """Record one wave's outcome.  ``frames``/``seconds`` as filled into
        ``serve_tts_batch(stats=)``; zero-frame or zero-time waves are
        ignored (nothing to learn from an empty wave)."""
        if mode not in self._samples:
            raise ValueError(f"mode {mode} is neither 0 nor tau={self.tau}")
        if frames <= 0 or seconds <= 0:
            return
        with self._lock:
            s = self._samples[mode]
            self._n_obs[mode] += 1
            # shed the compile-tainted first sample once a clean one exists
            if self._n_obs[mode] == 2 and len(s) == 1:
                s.clear()
            s.append(frames / seconds)
            if tok_per_pass is not None and mode != 0:
                self._tpp[mode] = float(tok_per_pass)
            n = self._n_obs[0] + self._n_obs[self.tau]
        if n in (4, 16, 64):    # occasional telemetry, outside the lock
            log.info("autospec: %s", self.snapshot())


def resolve_spec_arg(value, params) -> "tuple[int, Optional[AutoSpecPolicy]]":
    """Parse a ``--spec`` CLI value into (tau, policy).

    ``0``/``1`` → plain; an int > 1 → fixed spec tau; ``"auto"`` → adaptive
    with tau = the checkpoint's full MTP depth (n_mtp + 1); ``"auto:T"`` →
    adaptive with tau = T.  Auto silently degrades to plain when the
    checkpoint has no MTP heads (matching the fixed-spec warning path in
    serve_cli).
    """
    sval = str(value).strip().lower()
    if sval.startswith("auto"):
        if "mtp_heads" not in params:
            return 0, None
        n_mtp = None
        try:
            import jax
            n_mtp = int(jax.tree.leaves(params["mtp_heads"])[0].shape[0])
        except Exception:
            return 0, None
        tau = (int(sval.split(":", 1)[1]) if ":" in sval else n_mtp + 1)
        tau = max(2, min(tau, n_mtp + 1))
        return tau, AutoSpecPolicy(tau)
    return int(value or 0), None
