"""Parity tests for the JAX icefall scaling toolbox (models/scaling.py)
against the vendored torch reference (/root/reference/models/modules/
scaling.py).

Each gradient-steering function is compared against the reference autograd
Function with the stochastic scheduling stripped (the JAX versions apply the
expected gain deterministically; the underlying math must match exactly).
DoubleSwish's backward is compared against the analytic derivative — the
reference's uint8-compressed backward is itself a stochastic approximation
of the same quantity.

Skipped automatically when the reference checkout is unavailable.
"""

import os
import sys
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

from voicecraft_tpu.models import scaling as S          # noqa: E402


@pytest.fixture(scope="module")
def ref_scaling():
    import torch  # noqa: F401
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.modules import scaling as ref
    return ref


def _t(x):
    import torch
    return torch.tensor(np.asarray(x), dtype=torch.float32, requires_grad=True)


# ---------------------------------------------------------------------------
# DoubleSwish
# ---------------------------------------------------------------------------

def test_double_swish_forward_parity(ref_scaling):
    import torch
    x = np.linspace(-8, 8, 257, dtype=np.float32)
    ours = np.asarray(S.double_swish(jnp.asarray(x)))
    theirs = (torch.tensor(x) * torch.sigmoid(torch.tensor(x) - 1.0)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_double_swish_grad_matches_analytic():
    # reference backward quantises the analytic derivative to uint8 steps of
    # 1.2436/255 ~ 0.0049 (scaling.py:1190-1207); ours caches it in bf16
    # (rel 2^-8).  Both must sit within ~0.005 of the analytic value.
    x = jnp.linspace(-6.0, 6.0, 121)
    g = jax.grad(lambda v: jnp.sum(S.double_swish(v)))(x)
    s = jax.nn.sigmoid(x - 1.0)
    analytic = x * s * (1 - s) + s
    np.testing.assert_allclose(np.asarray(g), np.asarray(analytic), atol=5e-3)


# ---------------------------------------------------------------------------
# BasicNorm
# ---------------------------------------------------------------------------

def test_basic_norm_parity(ref_scaling):
    import torch
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 5, 16)).astype(np.float32)
    m = ref_scaling.BasicNorm(16, eps=0.25)
    m.eval()
    with torch.no_grad():
        theirs = m(torch.tensor(x)).numpy()
    p = S.basic_norm_init(eps=0.25)
    ours = np.asarray(S.basic_norm(jnp.asarray(x), p["log_eps"]))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_basic_norm_channel_dim_and_clamp():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 8, 6)).astype(np.float32))
    p = S.basic_norm_init()
    y = S.basic_norm(x, p["log_eps"], channel_dim=1)
    ms = np.mean(np.asarray(x) ** 2, axis=1, keepdims=True)
    expect = np.asarray(x) / np.sqrt(ms + 0.25)
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5)
    assert float(S.clamp_log_eps(jnp.asarray(5.0))) == 3.0
    assert float(S.clamp_log_eps(jnp.asarray(-5.0))) == -3.0


# ---------------------------------------------------------------------------
# ActivationBalancer
# ---------------------------------------------------------------------------

def test_activation_balancer_grad_parity(ref_scaling):
    """Our deterministic balancer == the reference ActivationBalancerFunction
    fed with factors from _compute_{sign,scale}_factor at the same gains."""
    import torch
    rng = np.random.default_rng(2)
    x = rng.normal(size=(7, 11)).astype(np.float32) * 2.0
    cfg = S.BalancerConfig()     # defaults == reference module defaults
    g_in = rng.normal(size=x.shape).astype(np.float32)

    xt = _t(x)
    sign_factor = ref_scaling._compute_sign_factor(
        xt.detach(), -1, cfg.min_positive, cfg.max_positive,
        gain_factor=cfg.sign_gain_factor, max_factor=cfg.max_factor)
    scale_factor = ref_scaling._compute_scale_factor(
        xt.detach(), -1, min_abs=cfg.min_abs, max_abs=cfg.max_abs,
        gain_factor=cfg.scale_gain_factor, max_factor=cfg.max_factor)
    y = ref_scaling.ActivationBalancerFunction.apply(
        xt, scale_factor, sign_factor, -1)
    y.backward(torch.tensor(g_in))
    theirs = xt.grad.numpy()

    _, vjp = jax.vjp(lambda v: S.activation_balancer(v, cfg), jnp.asarray(x))
    (ours,) = vjp(jnp.asarray(g_in))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-6)


def test_activation_balancer_identity_forward_and_channel_dim():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(5, 9, 4)).astype(np.float32))
    cfg = S.BalancerConfig(channel_dim=1, min_abs=10.0)  # force steering on
    y = S.activation_balancer(x, cfg)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    g = jax.grad(lambda v: jnp.sum(S.activation_balancer(v, cfg)))(x)
    # min_abs violated everywhere -> positive scale factor -> gradients of
    # positive entries shrink, negative entries grow (push |x| up)
    assert not np.allclose(np.asarray(g), 1.0)
    assert np.isfinite(np.asarray(g)).all()


def test_activation_balancer_steers_sign_proportion(ref_scaling):
    """Behavioral mirror of reference _test_activation_balancer_sign
    (scaling.py:1299-1322): gradient descent through the balancer pushes the
    per-channel positive proportion toward [min_positive, max_positive]."""
    rng = np.random.default_rng(4)
    # channel 0 always negative, channel 1 always positive: both violate
    x = jnp.asarray(np.stack([-np.abs(rng.normal(size=200)) - 1.0,
                              np.abs(rng.normal(size=200)) + 1.0],
                             axis=1).astype(np.float32))
    cfg = S.BalancerConfig(min_positive=0.05, max_positive=0.95,
                           max_factor=0.2, min_abs=0.0)
    # loss whose plain gradient is zero-mean noise; the balancer's steering
    # must create a net drift of the violating channels toward the band
    probe = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    g = jax.grad(lambda v: jnp.sum(S.activation_balancer(v, cfg) * probe))(x)
    drift = g - probe     # steering term: -|probe| * factor
    # channel 0 (all negative): sign_factor > 0 -> drift negative-mean? the
    # steering subtracts |g|*factor; factor>0 shrinks positive grads: for a
    # violating all-negative channel the update direction must push x up
    # (i.e. gradient *descent* direction -g has positive mean shift).
    assert np.mean(np.asarray(drift)[:, 0]) < 0.0
    assert np.mean(np.asarray(drift)[:, 1]) > 0.0


# ---------------------------------------------------------------------------
# Whitening
# ---------------------------------------------------------------------------

def test_whitening_metric_parity(ref_scaling):
    import torch
    rng = np.random.default_rng(5)
    x = rng.normal(size=(60, 12)).astype(np.float32)
    x[:, 0] *= 5.0   # decidedly non-white
    for groups in (1, 2, 3):
        theirs = float(ref_scaling._whitening_metric(torch.tensor(x), groups))
        ours = float(S.whitening_metric(jnp.asarray(x), groups))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_whiten_grad_parity(ref_scaling):
    import torch
    rng = np.random.default_rng(6)
    x = rng.normal(size=(40, 8)).astype(np.float32)
    x[:, 0] *= 4.0
    g_in = rng.normal(size=x.shape).astype(np.float32)

    xt = _t(x)
    y = ref_scaling.WhiteningPenaltyFunction.apply(xt, 2, 1.1, 0.02)
    y.backward(torch.tensor(g_in))
    theirs = xt.grad.numpy()

    _, vjp = jax.vjp(lambda v: S.whiten(v, 2, 1.1, 0.02), jnp.asarray(x))
    (ours,) = vjp(jnp.asarray(g_in))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# MaxEig
# ---------------------------------------------------------------------------

def test_max_eig_penalty_grad_parity(ref_scaling):
    import torch
    rng = np.random.default_rng(7)
    x = rng.normal(size=(50, 6)).astype(np.float32)
    x += 3.0 * rng.normal(size=(50, 1)) * rng.normal(size=(1, 6))  # dominant dir
    g_in = rng.normal(size=x.shape).astype(np.float32)

    xc = x - x.mean(axis=0)
    direction, coeffs = S._find_direction_coeffs(jnp.asarray(xc),
                                                 S.max_eig_init(6))
    xt = _t(x)
    y = ref_scaling.MaxEigLimiterFunction.apply(
        xt, torch.tensor(np.asarray(coeffs)), torch.tensor(np.asarray(direction)),
        -1, 0.01)
    y.backward(torch.tensor(g_in))
    theirs = xt.grad.numpy()

    cfg = S.MaxEigConfig(channel_dim=-1, max_var_per_eig=0.0, scale=0.01)
    _, vjp = jax.vjp(
        lambda v: S._max_eig_penalty(v, coeffs, direction,
                                     jnp.asarray(1.0, jnp.float32), cfg),
        jnp.asarray(x))
    (ours,) = vjp(jnp.asarray(g_in))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=1e-6)


def test_max_eig_direction_carry_and_inactive():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    d0 = S.max_eig_init(8)
    # white data: constraint inactive -> gradient untouched
    cfg = S.MaxEigConfig(max_var_per_eig=0.9)
    def f(v):
        y, _ = S.max_eig(v, d0, cfg)
        return jnp.sum(y)
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)
    _, d1 = S.max_eig(x, d0, cfg)
    assert np.isclose(float(jnp.linalg.norm(d1)), 1.0, atol=1e-5)
    assert not np.allclose(np.asarray(d1), np.asarray(d0))


# ---------------------------------------------------------------------------
# softmax / penalize / with_loss
# ---------------------------------------------------------------------------

def test_softmax_value_and_grad():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(5, 13)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(S.softmax(x, -1)),
                               np.asarray(jax.nn.softmax(x, axis=-1)),
                               rtol=1e-6)
    probe = jnp.asarray(rng.normal(size=(5, 13)).astype(np.float32))
    g1 = jax.grad(lambda v: jnp.sum(S.softmax(v, -1) * probe))(x)
    g2 = jax.grad(lambda v: jnp.sum(jax.nn.softmax(v, -1) * probe))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_penalize_abs_values_gt_parity(ref_scaling):
    import torch
    rng = np.random.default_rng(10)
    x = (rng.normal(size=(6, 6)) * 8.0).astype(np.float32)
    xt = _t(x)
    y = ref_scaling.penalize_abs_values_gt(xt, limit=5.0, penalty=0.3)
    y.sum().backward()
    theirs = xt.grad.numpy()
    g = jax.grad(lambda v: jnp.sum(S.penalize_abs_values_gt(v, 5.0, 0.3)))(
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), theirs, rtol=1e-6)


def test_with_loss_grad():
    x = jnp.ones((3,))
    y = jnp.full((4,), 2.0)
    gx, gy = jax.grad(lambda a, b: jnp.sum(S.with_loss(a, b)),
                      argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx), 1.0)
    np.testing.assert_allclose(np.asarray(gy), 1.0)   # as if y.sum() added


# ---------------------------------------------------------------------------
# Scaled inits / SRLinear / randomised utils
# ---------------------------------------------------------------------------

def test_scaled_linear_init_scale():
    k = jax.random.PRNGKey(0)
    p1 = S.scaled_linear_init(k, 64, 32, initial_scale=1.0)
    p2 = S.scaled_linear_init(k, 64, 32, initial_scale=0.25)
    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(p1["w"]) * 0.25,
                               rtol=1e-6)
    assert np.abs(np.asarray(p2["b"])).max() <= 0.1 * 0.25 + 1e-7
    c = S.scaled_conv1d_init(k, 8, 16, kernel_size=3, initial_scale=0.5)
    assert c["w"].shape == (3, 8, 16)
    assert np.abs(np.asarray(c["w"])).max() <= 0.5 / np.sqrt(24) + 1e-7


def test_sr_linear_parity(ref_scaling):
    import torch
    torch.manual_seed(0)
    m = ref_scaling.SRLinear(10, 7)
    m.eval()
    # .copy(): torch mutates u in-place during forward, and jnp.asarray on
    # CPU may alias the torch-shared numpy buffer rather than copy it
    p = {
        "w": jnp.asarray(m.weight.detach().numpy().T.copy()),  # [out,in]->[in,out]
        "b": jnp.asarray(m.bias.detach().numpy().copy()),
        "sigma": jnp.asarray(m.sigma.detach().numpy().copy()),
        "u": jnp.asarray(m.u.detach().numpy().copy()),
    }
    rng = np.random.default_rng(11)
    x = rng.normal(size=(4, 10)).astype(np.float32)
    with torch.no_grad():
        theirs = m(torch.tensor(x)).numpy()
        # .copy(): m.u.numpy() is a VIEW of the buffer, which the next
        # forward mutates in-place again
        u_theirs = m.u.numpy().copy()   # updated in-place by get_sigma
    ours, new_u = S.sr_linear_apply(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_u), u_theirs, rtol=1e-4, atol=1e-5)

    # GRADIENT parity: sigma differentiates through W in the reference
    # (get_sigma's einsum runs outside no_grad) — the spectral-
    # regularisation force of arXiv 2303.06296.  Same u buffer on both
    # sides (torch mutated m.u above; p["u"] reloads the pre-forward one).
    m.train()
    xt = torch.tensor(x, requires_grad=False)
    out = m(xt).sum()
    out.backward()
    gw_t = m.weight.grad.numpy().T          # [out,in] -> [in,out]
    gs_t = m.sigma.grad.numpy()
    # the train forward started its power iteration from u_theirs (the
    # buffer state the eval forward left behind)
    p2 = dict(p, u=jnp.asarray(u_theirs.copy()))

    def loss(q):
        y, _ = S.sr_linear_apply(dict(p2, w=q["w"], sigma=q["sigma"]), x)
        return jnp.sum(y)

    g = jax.grad(loss)({"w": p2["w"], "sigma": p2["sigma"]})
    np.testing.assert_allclose(np.asarray(g["w"]), gw_t, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g["sigma"]), gs_t, rtol=1e-4,
                               atol=1e-5)


def test_random_clamp_and_cast():
    k = jax.random.PRNGKey(1)
    x = jnp.linspace(-3, 3, 1001)
    y = S.random_clamp(k, x, min=-1.0, max=1.0, prob=1.0)
    np.testing.assert_allclose(np.asarray(y), np.clip(np.asarray(x), -1, 1))
    g = jax.grad(lambda v: jnp.sum(S.random_clamp(k, v, min=-1.0, max=1.0,
                                                  prob=1.0)))(x)
    np.testing.assert_array_equal(np.asarray(g),
                                  (np.abs(np.asarray(x)) <= 1.0))
    # stochastic rounding: expectation-preserving within a few ulp
    big = jnp.full((200_000,), 1.0 + 1.0 / 512.0)   # halfway between bf16 reps
    cast = S.random_cast(jax.random.PRNGKey(2), big, jnp.bfloat16)
    assert abs(float(jnp.mean(cast.astype(jnp.float32))) - (1.0 + 1 / 512)) < 1e-4


# ---------------------------------------------------------------------------
# End-to-end wiring: config-selectable norm/activation through the model
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("norm,act", [("basicnorm", "doubleswish"),
                                      ("balancedbasicnorm", "balanceddoubleswish"),
                                      ("layernorm", "gelu")])
def test_model_wiring_train_and_decode(norm, act):
    from voicecraft_tpu.config import tiny_test
    from voicecraft_tpu.models import voicecraft as vc
    from voicecraft_tpu.data import spans
    from voicecraft_tpu.models.voicecraft import SamplingConfig, init_params
    from voicecraft_tpu.inference.tts import inference_tts

    cfg = dataclasses.replace(tiny_test(), compute_dtype="float32",
                              norm=norm, ffn_activation=act)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(12)
    x = rng.integers(0, cfg.text_vocab_size, 12).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size,
                     (cfg.n_codebooks, 24)).astype(np.int32)

    # training forward + grads are finite through the new norm/activation
    K = cfg.n_codebooks
    mi, nmi = spans.sample_mask_intervals(rng, 60, cfg)
    yb = rng.integers(0, cfg.audio_vocab_size, (K, 60)).astype(np.int32)
    comp = spans.compose_sequence(yb, mi, nmi, cfg)
    tval = spans.target_valid_from_real(comp.real)
    batch = vc.TrainBatch(
        jnp.asarray(x[None]), jnp.asarray([12]),
        jnp.asarray(comp.tokens[None]), jnp.asarray([comp.length]),
        jnp.asarray(comp.mask_emb_idx[None]), jnp.asarray(tval[None]))
    def loss_fn(p):
        out = vc.forward_train(p, cfg, batch, remat=False)
        return out["loss"]
    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    if norm in ("basicnorm", "balancedbasicnorm"):
        key = "log_eps" if norm == "basicnorm" else "log_eps_bal"
        assert key in grads["decoder"]["final_ln"]

    # greedy decode runs through prefill + decode_step_fast dispatch and is
    # deterministic
    scfg = SamplingConfig(top_k=1, top_p=1.0, temperature=1.0,
                          stop_repetition=-1, silence_tokens=())
    full, gen = inference_tts(params, cfg, x, y, scfg, seed=3)
    full2, gen2 = inference_tts(params, cfg, x, y, scfg, seed=3)
    assert gen.shape[0] == cfg.n_codebooks and gen.shape[1] > 0
    np.testing.assert_array_equal(full[:, :y.shape[1]], y)
    np.testing.assert_array_equal(gen, gen2)


def test_norm_family_init_matches_reference_wrappers():
    """The transformer family wrappers construct _BasicNorm with
    eps=layer_norm_eps=1e-5 (reference transformer.py:112-121, 134-159),
    NOT the icefall library default 0.25; and layer_norm_cls=IdentityNorm
    forces the pre-FFN norm to BalancedBasicNorm (transformer.py:245-252)
    while the stack-final norm is always the caller's LayerNorm
    (voicecraft.py:175)."""
    from voicecraft_tpu.models import transformer as trm
    k = jax.random.PRNGKey(0)
    lyr = trm.init_layer(k, 16, 32, norm="basicnorm")
    np.testing.assert_allclose(float(lyr["ln1"]["log_eps"]), np.log(1e-5),
                               rtol=1e-6)
    # library default stays the icefall 0.25
    np.testing.assert_allclose(float(S.basic_norm_init()["log_eps"]),
                               np.log(0.25), rtol=1e-6)
    lyr = trm.init_layer(k, 16, 32, norm="identity")
    assert lyr["ln1"] == {}                       # IdentityNorm pre-attn
    assert "log_eps_bal" in lyr["ln2"]            # BalancedBasicNorm pre-FFN
    np.testing.assert_allclose(float(lyr["ln2"]["log_eps_bal"]),
                               np.log(1e-5), rtol=1e-6)
    stack = trm.init_stack(k, 2, 16, 32, norm="identity")
    assert set(stack["final_ln"]) == {"g", "b"}   # LayerNorm final


def test_basic_norm_train_ballast():
    """train=True applies the expected-ballast form of the reference's
    stochastic eps repair (reference scaling.py:495-503: w.p. 0.25 clamp
    log-eps into [-3, 3]): identity for in-range log-eps, the scheme's
    expected ballast for runaway values — with a nonzero gradient path back
    into range."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16)),
                    jnp.float32)
    in_range = jnp.asarray(-1.0)
    np.testing.assert_array_equal(
        np.asarray(S.basic_norm(x, in_range, train=True)),
        np.asarray(S.basic_norm(x, in_range, train=False)))
    runaway = jnp.asarray(np.log(1e-5))           # the family init, < -3
    y = np.asarray(S.basic_norm(x, runaway, train=True))
    ballast = 0.75 * 1e-5 + 0.25 * np.exp(-3.0)
    ms = np.mean(np.asarray(x) ** 2, axis=-1, keepdims=True)
    np.testing.assert_allclose(y, np.asarray(x) / np.sqrt(ms + ballast),
                               rtol=1e-5)
    g = jax.grad(lambda le: jnp.sum(S.basic_norm(x, le, train=True) ** 2))(
        runaway)
    assert float(jnp.abs(g)) > 0.0                # recoverable parameter


def test_adaptive_layer_norm_parity(ref_scaling):
    import torch
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.modules import transformer as ref_trm
    from voicecraft_tpu.models import transformer as trm

    torch.manual_seed(1)
    m = ref_trm.AdaptiveLayerNorm(8, ref_trm.LayerNorm(8))
    m.eval()
    p = {
        "project": {"w": jnp.asarray(m.project_layer.weight.detach().numpy().T.copy()),
                    "b": jnp.asarray(m.project_layer.bias.detach().numpy().copy())},
        "norm": {"g": jnp.asarray(m.norm.weight.detach().numpy().copy()),
                 "b": jnp.asarray(m.norm.bias.detach().numpy().copy())},
    }
    rng = np.random.default_rng(13)
    x = rng.normal(size=(3, 5, 8)).astype(np.float32)
    emb = rng.normal(size=(3, 5, 8)).astype(np.float32)
    with torch.no_grad():
        theirs = m(torch.tensor(x), embedding=torch.tensor(emb)).numpy()
    ours = trm.adaptive_layer_norm(p, jnp.asarray(x), jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-6)
