"""Adaptive plain-vs-speculative serving mode selection (inference/autospec).

The policy is pure host bookkeeping, so most tests inject synthetic
observations; the integration test drives real waves through
serve_tts_batch and checks that (a) the stats out-param is filled for both
modes and (b) greedy outputs are identical whichever mode the bandit picks
— mode choice must never change what a request hears.
"""

import dataclasses

import numpy as np
import jax
import pytest

from voicecraft_tpu.config import tiny_test
from voicecraft_tpu.models.voicecraft import SamplingConfig, init_params
from voicecraft_tpu.inference.autospec import AutoSpecPolicy, resolve_spec_arg
from voicecraft_tpu.inference.serving import serve_tts_batch


def _feed(policy, mode, fps, n=1):
    for _ in range(n):
        policy.observe(mode, frames=int(fps), seconds=1.0,
                       tok_per_pass=3.0 if mode else None)


def test_probe_phase_alternates_then_exploits():
    p = AutoSpecPolicy(tau=8, probe_waves=2, reprobe_every=100)
    seen = []
    for _ in range(4):
        m = p.next_mode()
        seen.append(m)
        _feed(p, m, 200 if m else 100)
    # spec probes first (its compile is the expensive one), then alternates
    assert seen == [8, 0, 8, 0]
    # spec measured 2x faster -> exploit spec
    assert all(p.next_mode() == 8 for _ in range(10))
    assert p.snapshot()["serving_mode"] == 8


def test_reprobe_can_flip_the_winner():
    p = AutoSpecPolicy(tau=4, probe_waves=1, reprobe_every=3, window=2)
    _feed(p, 4, 300, n=2)
    _feed(p, 0, 100, n=2)
    assert p.next_mode() == 4
    # the world flips: plain gets faster (e.g. traffic mix tanks acceptance)
    flips = 0
    for _ in range(20):
        m = p.next_mode()
        _feed(p, m, 100 if m else 500)
        if p.snapshot()["serving_mode"] == 0:
            flips += 1
    # reprobes sampled plain, its window refilled with fast samples, and
    # the policy switched (and stays switched)
    assert flips >= 5
    assert p.snapshot()["serving_mode"] == 0
    assert p.next_mode() in (0, 4)      # mostly 0, sometimes a spec reprobe


def test_first_sample_is_shed_as_compile_tainted():
    p = AutoSpecPolicy(tau=2, probe_waves=2, window=4)
    _feed(p, 2, 1)        # compile-poisoned wave: 1 frame/s
    _feed(p, 2, 1000, n=2)
    assert p.snapshot()["spec_fps"] == 1000.0   # the 1 fps sample is gone


def test_observe_validation():
    p = AutoSpecPolicy(tau=4)
    with pytest.raises(ValueError):
        p.observe(3, 10, 1.0)
    p.observe(4, 0, 1.0)          # empty wave: ignored, not an error
    p.observe(4, 10, 0.0)
    assert p.snapshot()["n_spec"] == 0


def test_multi_arm_probe_rotates_then_exploits_middle_arm():
    """Three arms {0, 4, 8}: the probe phase visits every arm (deepest
    first), then the bandit exploits the measured winner even when it is
    neither plain nor the deepest tau — tau itself is the decision
    (VERDICT r03 #6: at 830M B=8, tau=8 won while tau=4 lost; at other
    lane counts the ordering flips)."""
    p = AutoSpecPolicy(taus=[4, 8], probe_waves=1, reprobe_every=100)
    seen = []
    for _ in range(3):
        m = p.next_mode()
        seen.append(m)
        _feed(p, m, {0: 100, 4: 300, 8: 200}[m])
    assert seen == [8, 4, 0]
    assert all(p.next_mode() == 4 for _ in range(5))
    snap = p.snapshot()
    assert snap["serving_mode"] == 4
    assert set(snap["arms"]) == {"0", "4", "8"}
    assert snap["arms"]["4"]["fps"] == 300.0


def test_multi_arm_reprobe_drives_arm_switch():
    """The world flips mid-run (acceptance tanks): reprobes must resample
    the other arms and move the serving arm."""
    p = AutoSpecPolicy(taus=[4, 8], probe_waves=1, reprobe_every=3,
                       window=2)
    _feed(p, 8, 400, n=2)
    _feed(p, 4, 200, n=2)
    _feed(p, 0, 100, n=2)
    assert p.next_mode() == 8
    for _ in range(30):
        m = p.next_mode()
        # new regime: plain is now fastest, spec arms collapse
        _feed(p, m, {0: 500, 4: 50, 8: 40}[m])
    assert p.snapshot()["serving_mode"] == 0


def test_multi_arm_back_compat_single_tau():
    p = AutoSpecPolicy(tau=8)
    assert p.taus == [8] and p.arms == [0, 8] and p.tau == 8


def test_resolve_spec_arg_multi():
    heads = {"mtp_heads": {"w": np.zeros((7, 4, 4))}}   # n_mtp = 7
    tau, pol = resolve_spec_arg("auto", heads)
    # default arm set {plain, 4, depth}: deepest arm is the returned tau
    assert tau == 8 and pol.taus == [4, 8]
    tau, pol = resolve_spec_arg("auto:2,4,8", heads)
    assert tau == 8 and pol.taus == [2, 4, 8]
    tau, pol = resolve_spec_arg("auto:4,99", heads)
    assert pol.taus == [4, 8]     # capped at depth


def test_resolve_spec_arg():
    heads = {"mtp_heads": {"w": np.zeros((3, 4, 4))}}   # n_mtp = 3
    assert resolve_spec_arg(0, {}) == (0, None)
    assert resolve_spec_arg("6", heads)[0] == 6
    assert resolve_spec_arg(6, heads) == (6, None)
    tau, pol = resolve_spec_arg("auto", heads)
    assert tau == 4 and isinstance(pol, AutoSpecPolicy) and pol.tau == 4
    tau, pol = resolve_spec_arg("auto:3", heads)
    assert tau == 3
    tau, _ = resolve_spec_arg("auto:99", heads)
    assert tau == 4               # capped at the checkpoint's n_mtp + 1
    assert resolve_spec_arg("auto", {}) == (0, None)    # no heads -> plain


def test_three_arm_waves_probe_all_arms_and_switch(monkeypatch):
    """Real serve waves under a 3-arm policy: the probe phase exercises
    {0, 2, 4}, greedy audio is identical whichever arm serves, and a forced
    flip of the measured throughputs switches the serving arm (VERDICT r03
    #6 'a CPU-mesh test drives an arm switch')."""
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32", n_mtp=3)
    params = init_params(cfg, jax.random.PRNGKey(42))
    rng = np.random.default_rng(0)
    reqs = [(rng.integers(0, cfg.text_vocab_size, 8).astype(np.int32),
             rng.integers(0, cfg.audio_vocab_size,
                          (cfg.n_codebooks, 16)).astype(np.int32))]
    g = SamplingConfig(temperature=0.0, silence_tokens=())

    policy = AutoSpecPolicy(taus=[2, 4], probe_waves=1, reprobe_every=4,
                            window=2)
    outs, modes = [], []
    for _ in range(3):
        mode = policy.next_mode()
        stats: dict = {}
        outs.append(serve_tts_batch(params, cfg, reqs, g, seed=5,
                                    spec=mode, stats=stats))
        modes.append(mode)
        policy.observe(mode, stats["frames"], stats["seconds"],
                       tok_per_pass=stats["tok_per_pass"])
    assert set(modes) == {0, 2, 4}
    for o in outs[1:]:
        np.testing.assert_array_equal(o[0][1], outs[0][0][1])
    # force a regime where tau=2 is fastest and watch the bandit move there
    before = policy.snapshot()["serving_mode"]
    for _ in range(20):
        m = policy.next_mode()
        policy.observe(m, frames=1000 if m == 2 else 10, seconds=1.0)
    assert policy.snapshot()["serving_mode"] == 2
    assert {before, 2} <= {0, 2, 4}


def test_waves_fill_stats_and_mode_choice_is_invisible():
    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32", n_mtp=3)
    params = init_params(cfg, jax.random.PRNGKey(42))
    rng = np.random.default_rng(0)
    reqs = []
    for b in range(2):
        x = rng.integers(0, cfg.text_vocab_size, 8 + 4 * b).astype(np.int32)
        y = rng.integers(0, cfg.audio_vocab_size,
                         (cfg.n_codebooks, 16 + 8 * b)).astype(np.int32)
        reqs.append((x, y))
    g = SamplingConfig(temperature=0.0, silence_tokens=())

    policy = AutoSpecPolicy(tau=4, probe_waves=1, reprobe_every=3)
    outs = []
    for _ in range(4):
        mode = policy.next_mode()
        stats: dict = {}
        outs.append((mode, serve_tts_batch(params, cfg, reqs, g, seed=5,
                                           spec=mode, stats=stats)))
        assert stats["spec"] == mode
        assert stats["frames"] > 0 and stats["seconds"] > 0
        if mode:
            # mean(t)/n_passes can dip below 1.0 when one lane finishes
            # early and freezes while passes continue for the other
            assert stats["tok_per_pass"] > 0.0
        else:
            assert stats["tok_per_pass"] is None
        policy.observe(mode, stats["frames"], stats["seconds"],
                       tok_per_pass=stats["tok_per_pass"])
    modes = {m for m, _ in outs}
    assert modes == {0, 4}        # the probe phase exercised both arms
    ref = outs[0][1]
    for _, o in outs[1:]:         # greedy f32: mode choice never changes audio
        for (fr, gr), (fo, go) in zip(ref, o):
            np.testing.assert_array_equal(gr, go)
            np.testing.assert_array_equal(fr, fo)
    snap = policy.snapshot()
    assert snap["plain_fps"] and snap["spec_fps"] and snap["tok_per_pass"]
