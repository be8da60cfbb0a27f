"""icefall "scaling" toolbox, re-designed for JAX/TPU.

The reference vendors icefall's scaling toolbox (reference
models/modules/scaling.py:41-1242): gradient-steering regularisers
(ActivationBalancer scaling.py:644-767, Whiten :887-967, MaxEig :1007-1159),
the BasicNorm replacement for LayerNorm (:366-429), the DoubleSwish
activation with a memory-compressed derivative (:1161-1242), scaled init
helpers (ScaledLinear/ScaledConv1d :432-487), spectral-regularised linears
(SRLinear :556-618), and small autograd utilities (softmax :288-322,
penalize_abs_values_gt :769-794, with_loss :970-987, random_clamp :186-225).

In the instantiated VoiceCraft model the toolbox is dormant — the shipped
configs use plain LayerNorm + ReLU (reference models/voicecraft.py:166-174,
transformer.py:188) — but the classes are selectable through
TransformerEncoderLayer's ``layer_norm_cls``/``activation`` arguments
(reference transformer.py:179-265).  This module provides the same family so
voicecraft-tpu models can be configured with them (config.ModelConfig.norm /
ffn_activation; wiring in models/transformer.py).

TPU-first redesign notes (deliberate deviations, all documented per symbol):

* Every "modify the backprop only" module becomes a ``jax.custom_vjp``
  function whose primal is the identity — under ``jax.grad`` the factor
  computation runs in the VJP forward; in pure inference it compiles to
  nothing (the reference pays a host ``random.random()`` and an ``x > 0``
  every forward, scaling.py:719-724).
* The reference applies these regularisers *stochastically* with a
  count-decayed probability ``prob`` and compensates by dividing the gain by
  ``prob`` (scaling.py:735-752).  That schedule exists to avoid CPU-GPU
  sync of the step counter and to desynchronise layers — both non-issues
  under jit.  Here the steering is applied deterministically every step with
  the *expected* gain (gain_factor, not gain_factor/prob), which preserves
  the expected update outside the clamp-saturated regime.
* DoubleSwish's derivative is cached in bfloat16 instead of
  stochastically-rounded uint8 (scaling.py:1190-1207): same 1 byte/elem...
  (2 on TPU) class of saving, deterministic, and comparable quantisation
  error (bf16 relative 2^-8 vs uint8's absolute 1.24/255).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# softmax with output-only residual (reference scaling.py:288-322)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(1,))
def softmax(x, axis: int = -1):
    """Numerically standard softmax whose VJP keeps only the output.

    The reference SoftmaxFunction saves just ``ans`` and reconstructs the
    gradient as ``ans * (g - sum(g * ans))`` (scaling.py:306-315); default
    autodiff would additionally keep the input.  Accumulates in f32.
    """
    return _softmax_fwd_value(x, axis)


def _softmax_fwd_value(x, axis):
    xf = x.astype(jnp.float32)
    return jax.nn.softmax(xf, axis=axis).astype(x.dtype)


def _softmax_fwd(x, axis):
    ans = _softmax_fwd_value(x, axis)
    return ans, ans


def _softmax_bwd(axis, ans, g):
    gf = g.astype(jnp.float32)
    af = ans.astype(jnp.float32)
    xg = af * (gf - jnp.sum(gf * af, axis=axis, keepdims=True))
    return (xg.astype(ans.dtype),)


softmax.defvjp(_softmax_fwd, _softmax_bwd)


# ---------------------------------------------------------------------------
# DoubleSwish (reference scaling.py:1161-1242)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def double_swish(x):
    """double_swish(x) = x * sigmoid(x - 1)  (reference scaling.py:1220-1228).

    Close numerical approximation of swish(swish(x)).  The VJP caches the
    derivative ``y*(1-s) + s`` in bfloat16 (see module docstring for why not
    the reference's stochastic uint8 compression).
    """
    return x * jax.nn.sigmoid(x - 1.0)


def _dsw_fwd(x):
    s = jax.nn.sigmoid(x.astype(jnp.float32) - 1.0)
    y = x.astype(jnp.float32) * s
    deriv = (y * (1.0 - s) + s).astype(jnp.bfloat16)
    return y.astype(x.dtype), deriv


def _dsw_bwd(deriv, g):
    # the output dtype equals the input dtype, so g's dtype is the cotangent's
    return ((g.astype(jnp.float32) * deriv.astype(jnp.float32)).astype(g.dtype),)


double_swish.defvjp(_dsw_fwd, _dsw_bwd)


# ---------------------------------------------------------------------------
# BasicNorm (reference scaling.py:366-429)
# ---------------------------------------------------------------------------

def basic_norm(x, log_eps, channel_dim: int = -1, train: bool = False):
    """LayerNorm replacement without mean subtraction or gain/bias:

        y = x * (mean(x^2, channel) + exp(log_eps))**-0.5

    ``log_eps`` is a learnable scalar (library init log(0.25), reference
    scaling.py:477-480 in-class; the transformer family wrappers init it to
    log(1e-5), reference transformer.py:112-121).

    ``train=True`` applies the deterministic expected-ballast stand-in for
    the reference's train-time stochastic eps repair (scaling.py:495-503:
    with probability 0.25 each forward, log-eps is clamped into
    [eps_min, eps_max] = [-3, 3]): the ballast becomes
    0.75*exp(log_eps) + 0.25*exp(clip(log_eps, -3, 3)).  For in-range
    log_eps this is exactly exp(log_eps) (the clamp is the identity), so
    eval == train there; for runaway values the forward uses the stochastic
    scheme's EXPECTED ballast and the unclamped 0.75 share carries the same
    expected gradient that lets the parameter recover.  Stats in f32.
    """
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=channel_dim, keepdims=True)
    le = log_eps.astype(jnp.float32)
    if train:
        ballast = 0.75 * jnp.exp(le) + 0.25 * jnp.exp(jnp.clip(le, -3.0, 3.0))
    else:
        ballast = jnp.exp(le)
    scale = jax.lax.rsqrt(ms + ballast)
    return (xf * scale).astype(x.dtype)


def basic_norm_init(eps: float = 0.25, dtype=jnp.float32):
    """Parameter pytree for :func:`basic_norm`."""
    return {"log_eps": jnp.asarray(math.log(eps), dtype)}


def clamp_log_eps(log_eps, eps_min: float = -3.0, eps_max: float = 3.0):
    """Hard projection of the log-eps parameter into range.  NOTE: the
    training path does NOT use this — :func:`basic_norm` with ``train=True``
    applies the expected-ballast form of the reference's stochastic clamp
    (scaling.py:495-503) inside the forward instead, which preserves the
    reference's init regime (the family wrappers init log-eps to log(1e-5),
    far below eps_min; a hard projection would destroy that).  Kept as a
    library utility for icefall-style recipes that do want the projection."""
    return jnp.clip(log_eps, eps_min, eps_max)


# ---------------------------------------------------------------------------
# ActivationBalancer (reference scaling.py:41-144, 644-767)
# ---------------------------------------------------------------------------

class BalancerConfig(NamedTuple):
    """Hyperparameters of :func:`activation_balancer` (defaults = reference
    ActivationBalancer.__init__, scaling.py:686-696)."""
    channel_dim: int = -1
    min_positive: float = 0.05
    max_positive: float = 0.95
    max_factor: float = 0.04
    sign_gain_factor: float = 0.01
    scale_gain_factor: float = 0.02
    min_abs: float = 0.2
    max_abs: float = 100.0


def _channel_stats_axes(ndim: int, channel_dim: int):
    if channel_dim < 0:
        channel_dim += ndim
    return channel_dim, tuple(d for d in range(ndim) if d != channel_dim)


def _broadcast_channel(v, ndim: int, channel_dim: int):
    shape = [1] * ndim
    shape[channel_dim] = v.shape[0]
    return v.reshape(shape)


def _balancer_factors(x, cfg: BalancerConfig):
    """Per-channel sign/scale steering factors (reference
    _compute_sign_factor scaling.py:111-144 and _compute_scale_factor
    :82-108), computed with the expected gains (see module docstring)."""
    channel_dim, axes = _channel_stats_axes(x.ndim, cfg.channel_dim)
    xf = x.astype(jnp.float32)

    # sign factor: push per-channel P(x>0) into [min_positive, max_positive]
    if cfg.min_positive != 0.0 or cfg.max_positive != 1.0:
        prop_pos = jnp.mean((xf > 0).astype(jnp.float32), axis=axes)
        if cfg.min_positive != 0.0:
            f1 = jnp.clip((cfg.min_positive - prop_pos)
                          * (cfg.sign_gain_factor / cfg.min_positive),
                          0.0, cfg.max_factor)
        else:
            f1 = 0.0
        if cfg.max_positive != 1.0:
            f2 = jnp.clip((prop_pos - cfg.max_positive)
                          * (cfg.sign_gain_factor / (1.0 - cfg.max_positive)),
                          0.0, cfg.max_factor)
        else:
            f2 = 0.0
        sign_factor = f1 - f2
    else:
        sign_factor = None

    # scale factor: push per-channel mean |x| into [min_abs, max_abs]
    x_abs_mean = jnp.mean(jnp.abs(xf), axis=axes)
    if cfg.min_abs == 0.0:
        below = 0.0
    else:
        below = jnp.clip((cfg.min_abs - x_abs_mean)
                         * (cfg.scale_gain_factor / cfg.min_abs),
                         0.0, cfg.max_factor)
    above = jnp.clip((x_abs_mean - cfg.max_abs)
                     * (cfg.scale_gain_factor / cfg.max_abs),
                     0.0, cfg.max_factor)
    scale_factor = below - above
    return sign_factor, scale_factor, channel_dim


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def activation_balancer(x, cfg: BalancerConfig = BalancerConfig()):
    """Identity in the forward; steers the gradient so each channel keeps a
    target sign proportion and mean magnitude (reference ActivationBalancer,
    scaling.py:644-767; gradient rule ActivationBalancerFunction :61-79):

        grad -= |grad| * (sign_factor + scale_factor * ((x>0) - 0.5))

    Deterministic expected-gain variant of the reference's stochastic
    schedule (see module docstring).  Zero cost when not differentiated.
    """
    return x


def _ab_fwd(x, cfg):
    sign_factor, scale_factor, channel_dim = _balancer_factors(x, cfg)
    return x, (x > 0, sign_factor, scale_factor, channel_dim)


def _ab_bwd(cfg, res, g):
    xgt0, sign_factor, scale_factor, channel_dim = res
    scale_b = _broadcast_channel(scale_factor, g.ndim, channel_dim)
    factor = scale_b * (xgt0.astype(jnp.float32) - 0.5)
    if sign_factor is not None:
        factor = factor + _broadcast_channel(sign_factor, g.ndim, channel_dim)
    gf = g.astype(jnp.float32)
    out = gf - jnp.abs(gf) * factor
    return (out.astype(g.dtype),)


activation_balancer.defvjp(_ab_fwd, _ab_bwd)


def balanced_double_swish(x, d_model: Optional[int] = None,
                          channel_dim: int = -1, max_abs: float = 10.0):
    """ActivationBalancer -> DoubleSwish (reference BalancedDoubleSwish,
    scaling.py:1230-1242).  ``d_model`` accepted for signature parity only —
    the functional balancer infers the channel count from ``x``."""
    cfg = BalancerConfig(channel_dim=channel_dim, max_abs=max_abs)
    return double_swish(activation_balancer(x, cfg))


def balanced_basic_norm(x, log_eps, channel_dim: int = -1,
                        train: bool = False):
    """ActivationBalancer(min_positive=0.45, max_positive=0.55, max_abs=6.0)
    -> BasicNorm (reference transformer.py:133-154 BalancedBasicNorm)."""
    cfg = BalancerConfig(channel_dim=channel_dim, min_positive=0.45,
                         max_positive=0.55, max_abs=6.0)
    return basic_norm(activation_balancer(x, cfg), log_eps, channel_dim,
                      train=train)


# ---------------------------------------------------------------------------
# penalize_abs_values_gt / with_loss (reference scaling.py:769-794, 970-987)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def penalize_abs_values_gt(x, limit: float, penalty: float):
    """Identity forward; adds ``penalty * d/dx sum(relu(|x| - limit))`` to
    the gradient (reference scaling.py:769-794, which routes the same
    derivative through with_loss).  Used to stop implausible pre-softmax
    scores."""
    return x


def _pen_fwd(x, limit, penalty):
    return x, (jnp.sign(x) * (jnp.abs(x) > limit).astype(x.dtype),)


def _pen_bwd(limit, penalty, res, g):
    (signed_over,) = res
    return (g + jnp.asarray(penalty, g.dtype) * signed_over.astype(g.dtype),)


penalize_abs_values_gt.defvjp(_pen_fwd, _pen_bwd)


@jax.custom_vjp
def with_loss(x, y):
    """Returns ``x`` but behaves as if ``y.sum()`` had been added to the
    loss (reference WithLoss, scaling.py:970-987).  Idiomatic JAX is to
    return auxiliary losses explicitly; this exists for call-compatible
    translations of reference code."""
    return x


def _wl_fwd(x, y):
    return x, jnp.zeros_like(y)


def _wl_bwd(y_zeros, g):
    return g, jnp.ones_like(y_zeros)


with_loss.defvjp(_wl_fwd, _wl_bwd)


# ---------------------------------------------------------------------------
# Whitening penalty (reference scaling.py:797-967)
# ---------------------------------------------------------------------------

def whitening_metric(x, num_groups: int = 1):
    """>= 1.0; equals 1.0 iff the centered per-group feature covariance is a
    multiple of I with the same trace across groups (reference
    _whitening_metric, scaling.py:808-844)."""
    xf = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    num_frames, num_channels = xf.shape
    assert num_channels % num_groups == 0
    cpg = num_channels // num_groups
    xg = xf.reshape(num_frames, num_groups, cpg).transpose(1, 0, 2)
    xg = xg - jnp.mean(xg, axis=1, keepdims=True)
    covar = jnp.matmul(xg.transpose(0, 2, 1), xg)       # [G, C/G, C/G]
    mean_diag = jnp.mean(jnp.diagonal(covar, axis1=1, axis2=2))
    covarsq_mean_diag = jnp.sum(covar ** 2) / (num_groups * cpg)
    return covarsq_mean_diag / (mean_diag ** 2 + 1.0e-20)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def whiten(x, num_groups: int = 1, whitening_limit: float = 2.0,
           grad_scale: float = 0.02):
    """Identity forward; in the backward, adds the gradient of
    ``relu(whitening_metric(x) - limit)`` scaled to ``grad_scale`` of the
    incoming gradient norm (reference Whiten + WhiteningPenaltyFunction,
    scaling.py:846-967).  Deterministic variant of the reference's
    probabilistic application."""
    return x


def _whiten_fwd(x, num_groups, whitening_limit, grad_scale):
    return x, x


def _whiten_bwd(num_groups, whitening_limit, grad_scale, x, g):
    def pen(xd):
        return jax.nn.relu(whitening_metric(xd, num_groups) - whitening_limit)

    penalty_grad = jax.grad(pen)(x.astype(jnp.float32))
    gf = g.astype(jnp.float32)
    scale = grad_scale * (jnp.linalg.norm(gf)
                          / (jnp.linalg.norm(penalty_grad) + 1.0e-20))
    return ((gf + penalty_grad * scale).astype(g.dtype),)


whiten.defvjp(_whiten_fwd, _whiten_bwd)


# ---------------------------------------------------------------------------
# MaxEig (reference scaling.py:325-363, 1007-1159)
# ---------------------------------------------------------------------------

class MaxEigConfig(NamedTuple):
    """Defaults = reference MaxEig.__init__ (scaling.py:1028-1035)."""
    channel_dim: int = -1
    max_var_per_eig: float = 0.2
    scale: float = 0.01


def max_eig_init(num_channels: int):
    """Initial power-iteration direction (reference scaling.py:1045-1050:
    arange normalised, chosen to leave model RNG untouched)."""
    d = jnp.arange(num_channels, dtype=jnp.float32)
    return d / jnp.linalg.norm(d)


def _find_direction_coeffs(x2d, prev_direction):
    # reference MaxEig._find_direction_coeffs (scaling.py:1131-1159)
    coeffs = jnp.sum(x2d * prev_direction, axis=1, keepdims=True) + 1.0e-10
    cur_direction = (jnp.sum(x2d * coeffs, axis=0)
                     / (jnp.sum(coeffs ** 2) + 1.0e-20))
    return cur_direction, coeffs


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _max_eig_penalty(x, coeffs, direction, active_f32, cfg: MaxEigConfig):
    return x


def _mep_fwd(x, coeffs, direction, active_f32, cfg):
    return x, (x, coeffs, direction, active_f32)


def _mep_bwd(cfg, res, g):
    x, coeffs, direction, active_f32 = res
    channel_dim = cfg.channel_dim % x.ndim
    num_channels = x.shape[channel_dim]

    def variance_proportion(xd):
        x2 = jnp.moveaxis(xd, channel_dim, -1).reshape(-1, num_channels)
        x2 = x2 - jnp.mean(x2, axis=0)
        x_var = jnp.mean(x2 ** 2)
        resid = x2 - coeffs * direction
        return (x_var - jnp.mean(resid ** 2)) / (x_var + 1.0e-20)

    penalty_grad = jax.grad(variance_proportion)(x.astype(jnp.float32))
    gf = g.astype(jnp.float32)
    extra = (penalty_grad * cfg.scale * jnp.linalg.norm(gf)
             / (jnp.linalg.norm(penalty_grad) + 1.0e-20))
    out = gf + extra * active_f32
    return (out.astype(g.dtype), jnp.zeros_like(coeffs),
            jnp.zeros_like(direction), jnp.zeros_like(active_f32))


_max_eig_penalty.defvjp(_mep_fwd, _mep_bwd)


def max_eig(x, direction, cfg: MaxEigConfig = MaxEigConfig()):
    """Discourages any single direction of activation space from holding
    more than ``max_var_per_eig`` of the variance (reference MaxEig,
    scaling.py:1007-1159).

    Functional form of the reference module's buffer state: pass the current
    power-iteration ``direction`` (see :func:`max_eig_init`) and carry the
    returned one.  The penalty gradient (MaxEigLimiterFunction,
    scaling.py:325-363) is applied whenever the constraint is active —
    deterministic stand-in for the reference's cur_prob schedule.

    Returns ``(x, new_direction)``.
    """
    channel_dim = cfg.channel_dim % x.ndim
    num_channels = x.shape[channel_dim]
    xf = jax.lax.stop_gradient(x.astype(jnp.float32))
    x2 = jnp.moveaxis(xf, channel_dim, -1).reshape(-1, num_channels)
    x2 = x2 - jnp.mean(x2, axis=0)
    new_direction, coeffs = _find_direction_coeffs(x2, direction)
    x_var = jnp.mean(x2 ** 2)
    x_residual_var = jnp.mean((x2 - coeffs * new_direction) ** 2)
    variance_proportion = (x_var - x_residual_var) / (x_var + 1.0e-20)

    # keep nonzero even for x == 0 (reference scaling.py:1090-1093)
    blended = 0.1 * direction + new_direction
    blended = blended / jnp.linalg.norm(blended)
    # guard inf/nan as reference _set_direction does (scaling.py:1117-1129)
    ok = jnp.isfinite(jnp.sum(blended))
    out_direction = jnp.where(ok, blended, direction)

    active = (variance_proportion >= cfg.max_var_per_eig).astype(jnp.float32)
    y = _max_eig_penalty(x, coeffs, new_direction, active, cfg)
    return y, out_direction


# ---------------------------------------------------------------------------
# Scaled init helpers (reference scaling.py:432-554)
# ---------------------------------------------------------------------------

def scaled_linear_init(key, in_features: int, out_features: int,
                       initial_scale: float = 1.0, bias: bool = True,
                       dtype=jnp.float32):
    """nn.Linear default init with the weight scaled by ``initial_scale``
    and the bias re-drawn from U(-0.1*s, 0.1*s) (reference ScaledLinear,
    scaling.py:432-454).  Weight layout [in, out] (y = x @ w + b) to match
    models/transformer.py convention."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    w = jax.random.uniform(kw, (in_features, out_features), dtype,
                           -bound, bound) * initial_scale
    if not bias:
        return {"w": w}
    b = jax.random.uniform(kb, (out_features,), dtype,
                           -0.1 * initial_scale, 0.1 * initial_scale)
    return {"w": w, "b": b}


def scaled_conv1d_init(key, in_channels: int, out_channels: int,
                       kernel_size: int = 3, initial_scale: float = 1.0,
                       bias: bool = True, dtype=jnp.float32):
    """nn.Conv1d default init scaled by ``initial_scale`` (reference
    ScaledConv1d, scaling.py:457-487).  Weight layout [width, in, out]
    for lax.conv_general_dilated with ("NWC", "WIO", "NWC")."""
    kw, kb = jax.random.split(key)
    fan_in = in_channels * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (kernel_size, in_channels, out_channels),
                           dtype, -bound, bound) * initial_scale
    if not bias:
        return {"w": w}
    b = jax.random.uniform(kb, (out_channels,), dtype,
                           -0.1 * initial_scale, 0.1 * initial_scale)
    return {"w": w, "b": b}


# ---------------------------------------------------------------------------
# SRLinear — spectral-regularised linear (reference scaling.py:556-618)
# ---------------------------------------------------------------------------

def sr_linear_init(key, in_features: int, out_features: int,
                   bias: bool = True, dtype=jnp.float32):
    """Params + power-iteration state for :func:`sr_linear_apply`
    (arXiv 2303.06296; reference SRLinear scaling.py:556-589).  ``u`` is a
    buffer (exclude from the optimizer), ``sigma`` is learnable."""
    kw, kb, ku = jax.random.split(key, 3)
    bound = 1.0 / math.sqrt(in_features)
    w = jax.random.uniform(kw, (in_features, out_features), dtype,
                           -bound, bound)
    u = jax.random.normal(ku, (in_features,), jnp.float32)
    u = u / jnp.linalg.norm(u)
    p = {"w": w, "sigma": jnp.ones((1,), dtype), "u": u}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_features,), dtype, -bound, bound)
    return p


def sr_linear_apply(p, x):
    """One power-iteration step + spectrally-normalised matmul.  Returns
    ``(y, new_u)``; the caller carries ``new_u`` back into ``p["u"]``
    (functional replacement for the reference's in-place buffer update,
    scaling.py:573-580)."""
    w = p["w"].astype(jnp.float32)                 # [in, out]
    u = p["u"]
    # the power-iteration vector updates are buffer writes (reference runs
    # them under no_grad, scaling.py:573-580) ...
    v = jax.lax.stop_gradient(w).T @ u             # torch weight.mv(u): [out]
    v = v / jnp.linalg.norm(v)
    new_u = jax.lax.stop_gradient(w) @ v           # torch weight.T.mv(v)
    new_u = new_u / jnp.linalg.norm(new_u)
    # ... but sigma itself DIFFERENTIATES through W (the reference computes
    # the einsum outside no_grad): d sigma / dW = u' v^T, which is the
    # spectral-regularisation force of arXiv 2303.06296 — stop-gradding it
    # silently drops the method
    sigma = jnp.einsum("c,dc,d->", v, w, new_u)    # v^T W u' (W torch [out,in])
    weight = (p["sigma"].astype(jnp.float32) / sigma) * w
    y = jnp.dot(x.astype(jnp.float32), weight)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype), jax.lax.stop_gradient(new_u)


# ---------------------------------------------------------------------------
# Randomised numeric utilities (reference scaling.py:186-286)
# ---------------------------------------------------------------------------

def random_clamp(key, x, min: Optional[float] = None,
                 max: Optional[float] = None, prob: float = 0.5,
                 reflect: float = 0.0):
    """Element-wise: with probability ``prob`` clamp to [min, max]
    (reference RandomClampFunction, scaling.py:186-225, with an explicit
    PRNG key instead of global RNG).  ``reflect`` mixes in ``-reflect * x``
    the same way the reference does; gradients flow through unclamped
    elements only (times (1+reflect))."""
    lo = -jnp.inf if min is None else min
    hi = jnp.inf if max is None else max
    clamped = jnp.clip(x, lo, hi)
    mask = jax.random.uniform(key, x.shape) < prob
    ans = jnp.where(mask, clamped, x)
    is_same = jax.lax.stop_gradient((ans == x).astype(x.dtype))
    # straight-through on kept elements: forward value is `ans`, gradient is
    # g * is_same (then reflected), matching the reference backward exactly.
    ans = x * is_same + jax.lax.stop_gradient(ans - x * is_same)
    if reflect != 0.0:
        ans = ans * (1.0 + reflect) - x * reflect
    return ans


def random_cast(key, x, dtype=jnp.bfloat16):
    """Expectation-preserving stochastic rounding of f32 to a 16-bit float
    (reference random_cast_to_half, scaling.py:228-240, retargeted from fp16
    to TPU-native bf16 via low-bit dithering of the f32 pattern)."""
    if dtype == jnp.bfloat16:
        bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
        noise = jax.random.randint(key, x.shape, 0, 1 << 16,
                                   dtype=jnp.uint32)
        rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
        return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(dtype)
    # generic fallback: round-to-nearest
    return x.astype(dtype)
