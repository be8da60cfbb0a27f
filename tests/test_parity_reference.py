"""Golden parity tests against the PyTorch reference implementation.

These import the read-only reference at /root/reference (with a torchmetrics
stub), build a tiny model with random torch init, port the weights through
utils/convert.py, and require:

  * teacher-forced training loss parity (fixed mask intervals),
  * greedy (top_k=1) zero-shot TTS token parity,
  * greedy multi-span speech-editing token parity,
  * edit_utils.get_span behavioural parity.

Skipped automatically when the reference checkout is unavailable.
"""

import os
import sys
import types
import dataclasses
from argparse import Namespace

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_vc():
    import torch  # noqa
    tm = types.ModuleType("torchmetrics")
    tmc = types.ModuleType("torchmetrics.classification")

    class MulticlassAccuracy(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, *a, **k):
            return torch.tensor(0.0)

    tmc.MulticlassAccuracy = MulticlassAccuracy
    tm.classification = tmc
    sys.modules.setdefault("torchmetrics", tm)
    sys.modules.setdefault("torchmetrics.classification", tmc)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models import voicecraft as ref_module
    return ref_module


def tiny_cfg():
    from voicecraft_tpu.config import tiny_test
    return dataclasses.replace(tiny_test(), compute_dtype="float32")


def make_ref_model(ref_vc, cfg, seed=0):
    import torch
    torch.manual_seed(seed)
    args = Namespace(**{f.name: getattr(cfg, f.name)
                        for f in dataclasses.fields(cfg)
                        if f.name not in ("compute_dtype", "param_dtype")})
    args.codebook_weight = None
    model = ref_vc.VoiceCraft(args)
    model.eval()
    return model


@pytest.fixture(scope="module")
def models(ref_vc):
    from voicecraft_tpu.utils.convert import from_reference_state_dict
    cfg = tiny_cfg()
    ref = make_ref_model(ref_vc, cfg)
    params = from_reference_state_dict(ref.state_dict(), cfg)
    return cfg, ref, params


def test_weight_roundtrip(models):
    from voicecraft_tpu.utils.convert import to_reference_state_dict
    cfg, ref, params = models
    back = to_reference_state_dict(params, cfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
          if "accuracy" not in k and k not in ("eog", "eos")}
    for k, v in sd.items():
        np.testing.assert_allclose(back[k], v, atol=0, err_msg=k)


def test_forward_loss_parity(models, monkeypatch):
    import torch
    import jax, jax.numpy as jnp
    from voicecraft_tpu.data import spans
    from voicecraft_tpu.models import voicecraft as vc

    cfg, ref, params = models
    rng = np.random.default_rng(7)
    K = cfg.n_codebooks
    B = 2
    y_lens = [64, 90]
    Sx = 14
    x_lens = [11, 14]
    x = np.full((B, Sx), cfg.text_pad_token, np.int64)
    for b in range(B):
        x[b, :x_lens[b]] = rng.integers(0, cfg.text_vocab_size, x_lens[b])
    y = np.full((B, K, max(y_lens)), cfg.audio_pad_token, np.int64)
    for b in range(B):
        y[b, :, :y_lens[b]] = rng.integers(0, cfg.audio_vocab_size,
                                           (K, y_lens[b]))

    fixed_masks = [[(5, 12), (30, 40)], [(10, 20)]]
    fixed_non = [
        [(0, 5), (12, 30), (40, 64)],
        [(0, 10), (20, 90)],
    ]
    monkeypatch.setattr(
        ref.__class__, "prepare_mask_intervals",
        lambda self, yl: (fixed_masks, fixed_non))

    batch = {
        "x": torch.from_numpy(x),
        "x_lens": torch.tensor(x_lens),
        "y": torch.from_numpy(y),
        "y_lens": torch.tensor(y_lens),
    }
    with torch.no_grad():
        out_ref = ref(batch)

    # ---- my side: compose the equivalent static batch ----
    comps = [spans.compose_sequence(y[b, :, :y_lens[b]].astype(np.int32),
                                    fixed_masks[b], fixed_non[b], cfg)
             for b in range(B)]
    Sy = max(c.length for c in comps)
    y_tok = np.full((B, K, Sy), cfg.audio_pad_token, np.int32)
    midx = np.full((B, Sy), -1, np.int32)
    tval = np.zeros((B, K, Sy), bool)
    for b, c in enumerate(comps):
        y_tok[b, :, :c.length] = c.tokens
        midx[b, :c.length] = c.mask_emb_idx
        tval[b, :, :c.length] = spans.target_valid_from_real(c.real)

    tb = vc.TrainBatch(jnp.asarray(x.astype(np.int32)), jnp.asarray(x_lens),
                       jnp.asarray(y_tok),
                       jnp.asarray([c.length for c in comps]),
                       jnp.asarray(midx), jnp.asarray(tval))
    out = vc.forward_train(params, cfg, tb, rng=None, remat=False)

    assert int(out["effective_ntoken"]) == int(out_ref["effective_ntoken"])
    np.testing.assert_allclose(float(out["loss"]),
                               float(out_ref["loss"]), rtol=2e-4)


def _delayed_steps(gen: np.ndarray, cfg) -> np.ndarray:
    """Reconstruct the per-step delayed-space samples [num_gen, K] from an
    unshifted generated span [K, Tg] (inverse of patterns.unshift_span,
    including forced empties and the trailing eog cascade)."""
    K, Tg = gen.shape
    steps = np.full((Tg + K, K), cfg.empty_token, np.int64)
    for q in range(K):
        steps[q + np.arange(Tg), q] = gen[q]
        steps[Tg + q, q] = cfg.eog_inference
    return steps


def test_tts_greedy_parity(models):
    """Greedy decode token parity.  Exact equality is required until the
    first step where the reference's own top-2 logit margin is below a
    float32 tie threshold (with random weights near-ties occur and torch/XLA
    accumulation order may legitimately differ there)."""
    import torch
    from voicecraft_tpu.inference.tts import inference_tts
    from voicecraft_tpu.models.voicecraft import SamplingConfig
    import models as ref_pkg  # /root/reference/models package
    from models import voicecraft as ref_module

    cfg, ref, params = models
    rng = np.random.default_rng(3)
    K = cfg.n_codebooks
    Lx, T = 8, 25
    x = rng.integers(0, cfg.text_vocab_size, (1, Lx))
    y = rng.integers(0, cfg.audio_vocab_size, (1, T, K))
    sil = [5, 7]

    step_logits = []
    orig_topk = ref_module.topk_sampling

    def recording_topk(logits, **kw):
        step_logits.append(logits.detach().clone().numpy())
        return orig_topk(logits, **kw)

    ref_module.topk_sampling = recording_topk
    try:
        with torch.no_grad():
            res_ref, gen_ref = ref.inference_tts(
                torch.from_numpy(x), torch.tensor([Lx]), torch.from_numpy(y),
                top_k=1, top_p=1.0, temperature=1.0, stop_repetition=3,
                kvcache=1, silence_tokens=sil)
    finally:
        ref_module.topk_sampling = orig_topk
    gen_ref = gen_ref[0].numpy()          # [K, Tg]

    scfg = SamplingConfig(top_k=1, top_p=1.0, temperature=1.0,
                          stop_repetition=3, silence_tokens=tuple(sil))
    full, gen = inference_tts(params, cfg, x[0].astype(np.int32),
                              y[0].T.astype(np.int32), scfg, seed=0)
    np.testing.assert_array_equal(full[:, :T], y[0].T)

    steps_ref = _delayed_steps(gen_ref, cfg)
    steps_my = _delayed_steps(gen, cfg)
    matched = 0
    for j in range(min(len(steps_ref), len(steps_my))):
        if np.array_equal(steps_ref[j], steps_my[j]):
            matched += 1
            continue
        lj = step_logits[j]
        top2 = np.sort(lj, axis=-1)[:, -2:]
        margin = float(np.min(top2[:, 1] - top2[:, 0]))
        assert margin < 1e-3, (
            f"divergence at step {j} with decisive ref margin {margin}")
        break
    else:
        assert steps_ref.shape == steps_my.shape
    assert matched >= 10, f"only {matched} steps matched before divergence"


def test_tts_teacher_forced_logits_parity(models):
    """Feed the reference's own greedy trajectory through this repo's
    full-attention forward and require per-step logits parity — immune to
    sampling ties, exercises positions/masks/cache-equivalent math."""
    import torch
    import jax.numpy as jnp
    from models import voicecraft as ref_module
    from voicecraft_tpu.data import spans
    from voicecraft_tpu.models import voicecraft as vc
    from voicecraft_tpu.models import transformer as trm
    from voicecraft_tpu.models.embedding import sine_table
    from voicecraft_tpu.ops.attention import causal_padding_bias

    cfg, ref, params = models
    rng = np.random.default_rng(3)
    K = cfg.n_codebooks
    Lx, T = 8, 25
    x = rng.integers(0, cfg.text_vocab_size, (1, Lx))
    y = rng.integers(0, cfg.audio_vocab_size, (1, T, K))

    step_logits = []
    orig_topk = ref_module.topk_sampling

    def recording_topk(logits, **kw):
        step_logits.append(logits.detach().clone().numpy())
        return orig_topk(logits, **kw)

    ref_module.topk_sampling = recording_topk
    try:
        with torch.no_grad():
            _, gen_ref = ref.inference_tts(
                torch.from_numpy(x), torch.tensor([Lx]), torch.from_numpy(y),
                top_k=1, top_p=1.0, temperature=1.0, stop_repetition=3,
                kvcache=1, silence_tokens=[5, 7])
    finally:
        ref_module.topk_sampling = orig_topk

    gen_ref = gen_ref[0].numpy()
    steps = _delayed_steps(gen_ref, cfg)          # [num_gen, K]
    num_gen = len(steps)

    prefix = spans.compose_tts_prefix(y[0].T.astype(np.int32), cfg)
    y_delayed = np.concatenate(
        [prefix.tokens, steps[:-1].T.astype(np.int32)], axis=1)  # [K, P+num_gen-1]
    Sy = y_delayed.shape[1]

    pe = jnp.asarray(sine_table(vc.MAX_POS, cfg.d_model))
    x_emb = jnp.take(params["text_emb"]["weight"], jnp.asarray(x), axis=0)
    x_in = x_emb + params["alpha_text"] * pe[:Lx]
    y_emb = vc.embed_audio_tokens(params["audio_emb"],
                                  jnp.asarray(y_delayed)[None])
    y_in = y_emb + params["alpha_audio"] * pe[:Sy]
    xy = jnp.concatenate([x_in, y_in], axis=1)
    bias = causal_padding_bias(Lx + Sy, Lx + Sy, None)
    h = trm.apply_stack(params["decoder"], xy, bias, cfg.nhead)
    logits = np.asarray(vc.apply_heads(params["heads"], h))[0]  # [Lx+Sy, K, card]

    P = prefix.length
    for j in range(num_gen):
        mine = logits[Lx + P - 1 + j]                 # [K, card]
        want = step_logits[j]
        # the recorder sees the reference's *post-ban* logits (in-place
        # -10000 writes, voicecraft.py:1021-1025); exclude banned cells
        ok = want > -5000.0
        np.testing.assert_allclose(mine[ok], want[ok], atol=5e-3,
                                   err_msg=f"step {j}")


def _replay_ref_edit_steps(step_logits, cfg, P, Lx, n_spans):
    """Reconstruct the reference editing loop's final per-step samples from
    the recorded (post-ban) logits — a numpy replica of the sample_helper
    post-processing + loop bookkeeping (voicecraft.py:718-787, 789-871) for
    the greedy top_k=1 case."""
    K = cfg.n_codebooks
    eog = cfg.eog
    out = []            # (span, samples[K])
    codebook_eog = np.zeros(K, bool)
    cur_num_gen = 0
    fed = 0
    span = 0
    for lj in step_logits:
        n_eog = int(codebook_eog.sum())
        s = np.argmax(lj, axis=-1)
        if n_eog == 0:
            s = np.where(np.arange(K) > cur_num_gen, cfg.empty_token, s)
            ylen = P + fed
            if s[0] == eog or np.argmax(lj[0]) == eog or ylen > Lx * 10:
                s[0] = eog
                codebook_eog[0] = True
        else:
            s = np.where(np.arange(K) < n_eog, cfg.empty_token, s)
            s[n_eog] = eog
            codebook_eog[n_eog] = True
        out.append((span, s.copy()))
        cur_num_gen += 1
        fed += 1
        if codebook_eog.all():
            codebook_eog[:] = False
            cur_num_gen = 0
            span += 1
            if span < n_spans:
                fed += 2      # mask + empty feeds (3-token resume)
            else:
                break
    return out


def test_edit_greedy_parity(models):
    """Greedy multi-span editing parity, tie-aware: exact per-step sample
    equality until the first reference near-tie (float32 argmax flip)."""
    import torch
    from models import voicecraft as ref_module
    from voicecraft_tpu.data import spans
    from voicecraft_tpu.inference.tts import run_decode
    from voicecraft_tpu.inference.editing import inference_edit
    from voicecraft_tpu.models.voicecraft import SamplingConfig

    cfg, ref, params = models
    rng = np.random.default_rng(11)
    K = cfg.n_codebooks
    Lx, T = 20, 60
    x = rng.integers(0, cfg.text_vocab_size, (1, Lx))
    y = rng.integers(0, cfg.audio_vocab_size, (1, T, K))
    intervals = [(8, 15), (30, 42)]
    sil = [5, 7]

    step_logits = []
    orig_topk = ref_module.topk_sampling

    def recording_topk(logits, **kw):
        step_logits.append(logits.detach().clone().numpy())
        return orig_topk(logits, **kw)

    ref_module.topk_sampling = recording_topk
    try:
        with torch.no_grad():
            res_ref = ref.inference(
                torch.from_numpy(x), torch.tensor([Lx]), torch.from_numpy(y),
                torch.tensor([intervals]),
                top_k=1, top_p=1.0, temperature=1.0, stop_repetition=3,
                kvcache=1, silence_tokens=sil)
    finally:
        ref_module.topk_sampling = orig_topk
    res_ref = res_ref[0].numpy()          # [K, T']

    scfg = SamplingConfig(top_k=1, top_p=1.0, temperature=1.0,
                          stop_repetition=3, silence_tokens=tuple(sil))
    prefix, queue_ids = spans.compose_edit_prefix(
        y[0].T.astype(np.int32), intervals, cfg)
    gen_buf, span_buf = run_decode(
        params, cfg, is_tts=False, x_tokens=x[0].astype(np.int32),
        prefix=prefix, queue_mask_ids=queue_ids, n_spans=len(intervals),
        scfg=scfg, seed=0, return_raw=True)

    ref_steps = _replay_ref_edit_steps(step_logits, cfg, prefix.length,
                                       Lx, len(intervals))
    matched = 0
    for j in range(min(len(ref_steps), len(gen_buf))):
        span_r, s_r = ref_steps[j]
        if span_r == span_buf[j] and np.array_equal(s_r, gen_buf[j]):
            matched += 1
            continue
        lj = step_logits[j]
        top2 = np.sort(lj, axis=-1)[:, -2:]
        margin = float(np.min(top2[:, 1] - top2[:, 0]))
        assert margin < 2e-3, (
            f"divergence at step {j} with decisive ref margin {margin}")
        break
    else:
        assert len(ref_steps) == len(gen_buf)
    assert matched >= 20, f"only {matched} steps matched before divergence"

    # and the splice driver returns shape-consistent output on its own run
    res = inference_edit(params, cfg, x[0].astype(np.int32),
                         y[0].T.astype(np.int32), intervals, scfg, seed=0)
    assert res.shape[0] == K
    # unedited regions must be preserved verbatim
    np.testing.assert_array_equal(res[:, :8], y[0].T[:, :8])
    np.testing.assert_array_equal(res[:, -18:], y[0].T[:, -18:])


def test_get_span_parity():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import edit_utils as ref_edit
    from voicecraft_tpu.inference.editing import get_span

    cases = [
        ("the quick brown fox", "the quick red fox", "substitution"),
        ("a b c d e", "a b x y c d e", "insertion"),
        ("a b c d e", "a b e", "deletion"),
        ("hello world", "hello brave new world", "insertion"),
        ("x y z", "x q z", "substitution"),
        ("a b c d", "a x y d", "substitution"),
    ]
    for orig, new, et in cases:
        r = ref_edit.get_span(orig, new, et)
        m = get_span(orig, new, et)
        assert tuple(map(tuple, m)) == tuple(map(tuple, r)), (orig, new, et, m, r)
    # both raise when the edited block reaches the end of the transcript
    with pytest.raises(RuntimeError):
        ref_edit.get_span("one two three", "one two", "deletion")
    with pytest.raises(RuntimeError):
        get_span("one two three", "one two", "deletion")


def test_tts_greedy_parity_eos_variant(ref_vc):
    """The TTS-enhanced model family ends with eos (eos>0, n_special=4,
    reduced_eog — reference z_scripts/e830M.sh:56-60).  Greedy parity with
    the same tie-aware protocol."""
    import torch
    from voicecraft_tpu.config import tiny_test
    from voicecraft_tpu.utils.convert import from_reference_state_dict
    from voicecraft_tpu.inference.tts import inference_tts
    from voicecraft_tpu.models.voicecraft import SamplingConfig
    from models import voicecraft as ref_module

    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32",
                              eos=131, n_special=4, reduced_eog=1)
    ref = make_ref_model(ref_vc, cfg, seed=2)
    params = from_reference_state_dict(ref.state_dict(), cfg)

    rng = np.random.default_rng(13)
    K = cfg.n_codebooks
    Lx, T = 7, 20
    x = rng.integers(0, cfg.text_vocab_size, (1, Lx))
    y = rng.integers(0, cfg.audio_vocab_size, (1, T, K))
    sil = [5, 7]

    step_logits = []
    orig_topk = ref_module.topk_sampling

    def rec(logits, **kw):
        step_logits.append(logits.detach().clone().numpy())
        return orig_topk(logits, **kw)

    ref_module.topk_sampling = rec
    try:
        with torch.no_grad():
            _, gen_ref = ref.inference_tts(
                torch.from_numpy(x), torch.tensor([Lx]), torch.from_numpy(y),
                top_k=1, top_p=1.0, temperature=1.0, stop_repetition=3,
                kvcache=1, silence_tokens=sil)
    finally:
        ref_module.topk_sampling = orig_topk
    gen_ref = gen_ref[0].numpy()

    scfg = SamplingConfig(top_k=1, stop_repetition=3, silence_tokens=(5, 7))
    _, gen = inference_tts(params, cfg, x[0].astype(np.int32),
                           y[0].T.astype(np.int32), scfg, seed=0)

    steps_ref = _delayed_steps(gen_ref, cfg)
    steps_my = _delayed_steps(gen, cfg)
    matched = 0
    for j in range(min(len(steps_ref), len(steps_my))):
        if np.array_equal(steps_ref[j], steps_my[j]):
            matched += 1
            continue
        top2 = np.sort(step_logits[j], axis=-1)[:, -2:]
        margin = float(np.min(top2[:, 1] - top2[:, 0]))
        assert margin < 1e-3, (j, margin)
        break
    else:
        assert steps_ref.shape == steps_my.shape
    assert matched >= 10, matched


def test_get_mask_interval_parity(ref_vc):
    """Our row-indexed get_mask_interval vs the reference implementation on
    the committed demo alignment CSV."""
    import ast
    import csv as _csv
    # the reference script's module-level imports need audiocraft/phonemizer;
    # extract and exec just the pure-python get_mask_interval function
    tree = ast.parse(open(os.path.join(
        REF, "inference_speech_editing_scale.py")).read())
    fn_node = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
                   and n.name == "get_mask_interval")
    ns = {}
    exec(compile(ast.Module(body=[fn_node], type_ignores=[]),
                 "ref_get_mask_interval", "exec"), ns)

    class mod:
        get_mask_interval = staticmethod(ns["get_mask_interval"])

    from voicecraft_tpu.inference.editing import get_mask_interval
    ali_fn = os.path.join(REF, "demo/temp/mfa_alignments",
                          "5895_34622_000026_000002.csv")
    with open(ali_fn) as f:
        rows = list(_csv.DictReader(f))

    for span, et in [("2,2", "substitution"), ("1,4", "substitution"),
                     ("3,3", "deletion"), ("2,3", "insertion")]:
        want = mod.get_mask_interval(ali_fn, span, et)
        s, e = (int(v) for v in (span.split(",")[0], span.split(",")[-1]))
        got = get_mask_interval(rows, (s, e), et)
        assert got == want, (span, et, got, want)
