"""Variational-bound / likelihood machinery for Gaussian diffusion.

Parity target: reference models/diffusion/gaussian_diffusion.py:202-868 and
diffusion_utils.py — the KL / discretized-Gaussian NLL terms, full
p(x_{t-1}|x_t) posterior with all ModelMeanType/ModelVarType combinations,
VB training losses (KL / RESCALED_KL and the learned-variance `vb` term
added to MSE), and the bits-per-dim evaluation loop.

MLA's active configuration (EPSILON mean, FIXED_SMALL variance, MSE loss)
never enters this module at train time — it exists for inventory parity and
for likelihood evaluation. TPU notes: tables stay precomputed numpy
(folded into the jitted graph as constants), the bpd loop is a `lax.scan`
over timesteps instead of the reference's python loop, and the learned-
variance split follows the reference's channel convention (axis 1).
"""

from __future__ import annotations

import enum
import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu.diffusion.gaussian import (
    Schedule,
    _extract,
    pred_xstart_from_eps,
    q_posterior_mean,
    q_sample,
)


class ModelMeanType(enum.Enum):
    PREVIOUS_X = enum.auto()
    START_X = enum.auto()
    EPSILON = enum.auto()


class ModelVarType(enum.Enum):
    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


class LossType(enum.Enum):
    MSE = enum.auto()
    RESCALED_MSE = enum.auto()
    KL = enum.auto()
    RESCALED_KL = enum.auto()

    def is_vb(self) -> bool:
        return self in (LossType.KL, LossType.RESCALED_KL)


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch axes."""
    return x.reshape(x.shape[0], -1).mean(axis=1)


def normal_kl(mean1, logvar1, mean2, logvar2) -> jnp.ndarray:
    """KL(N(mean1, var1) || N(mean2, var2)) in nats, elementwise."""
    mean1, logvar1 = jnp.asarray(mean1), jnp.asarray(logvar1)
    mean2, logvar2 = jnp.asarray(mean2), jnp.asarray(logvar2)
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))


def continuous_gaussian_log_likelihood(x, *, means, log_scales) -> jnp.ndarray:
    z = (x - means) * jnp.exp(-log_scales)
    return -0.5 * (z**2 + math.log(2 * math.pi))


def discretized_gaussian_log_likelihood(x, *, means, log_scales) -> jnp.ndarray:
    """Log-likelihood of values discretized into 256 uint8 bins rescaled to
    [-1, 1] (reference diffusion_utils.py:62-88)."""
    inv_stdv = jnp.exp(-log_scales)
    centered = x - means
    cdf_plus = approx_standard_normal_cdf(inv_stdv * (centered + 1.0 / 255.0))
    cdf_min = approx_standard_normal_cdf(inv_stdv * (centered - 1.0 / 255.0))
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    log_cdf_delta = jnp.log(jnp.clip(cdf_plus - cdf_min, 1e-12))
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, log_cdf_delta),
    )


# --------------------------------------------------------------------------- #
# q / p distributions
# --------------------------------------------------------------------------- #


def q_mean_variance(sched: Schedule, x_start, t):
    """Moments of q(x_t | x_0) (reference gaussian_diffusion.py:202-213)."""
    mean = _extract(sched.sqrt_alphas_cumprod, t, x_start.shape) * x_start
    variance = _extract(1.0 - sched.alphas_cumprod, t, x_start.shape)
    log_variance = _extract(np.log(1.0 - sched.alphas_cumprod), t, x_start.shape)
    return mean, variance, log_variance


def pred_xstart_from_xprev(sched: Schedule, x_t, t, xprev):
    """Invert the posterior mean for PREVIOUS_X models
    (reference _predict_xstart_from_xprev in the IDDPM original)."""
    c1 = _extract(sched.posterior_mean_coef1, t, x_t.shape)
    c2 = _extract(sched.posterior_mean_coef2, t, x_t.shape)
    return xprev / c1 - (c2 / c1) * x_t


def pred_eps_from_xstart(sched: Schedule, x_t, t, x0):
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, x_t.shape) * x_t - x0
    ) / _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.shape)


# model_fn: (x, t_model) -> model_output (channels doubled on axis 1 when the
# variance is learned)
ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _t_model(sched: Schedule, t):
    return jnp.take(jnp.asarray(sched.timestep_map, dtype=jnp.int32), t)


def p_mean_variance(
    sched: Schedule,
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mean_type: ModelMeanType = ModelMeanType.EPSILON,
    var_type: ModelVarType = ModelVarType.FIXED_SMALL,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
    model_output: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Moments of p(x_{t-1} | x_t) + the x_0 prediction
    (reference gaussian_diffusion.py:254-341). `model_output` short-circuits
    the model call (the reference's frozen-output trick for the learned-
    variance VB term)."""
    if model_output is None:
        model_output = model_fn(x, _t_model(sched, t))

    if var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        C = x.shape[1]
        model_output, var_values = model_output[:, :C], model_output[:, C:]
        if var_type == ModelVarType.LEARNED:
            log_variance = var_values
            variance = jnp.exp(log_variance)
        else:
            min_log = _extract(sched.posterior_log_variance_clipped, t, x.shape)
            max_log = _extract(np.log(sched.betas), t, x.shape)
            frac = (var_values + 1) / 2  # [-1, 1] -> [min, max]
            log_variance = frac * max_log + (1 - frac) * min_log
            variance = jnp.exp(log_variance)
    else:
        if var_type == ModelVarType.FIXED_LARGE:
            # first entry swapped for the posterior's to keep the decoder
            # log-likelihood finite (reference :307-311)
            var_table = np.append(sched.posterior_variance[1], sched.betas[1:])
            variance = _extract(var_table, t, x.shape)
            log_variance = _extract(np.log(var_table), t, x.shape)
        else:
            variance = _extract(sched.posterior_variance, t, x.shape)
            log_variance = _extract(sched.posterior_log_variance_clipped, t, x.shape)

    def process(x0):
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        return jnp.clip(x0, -1, 1) if clip_denoised else x0

    if mean_type == ModelMeanType.START_X:
        pred_xstart = process(model_output)
    elif mean_type == ModelMeanType.PREVIOUS_X:
        pred_xstart = process(pred_xstart_from_xprev(sched, x, t, model_output))
    else:
        pred_xstart = process(pred_xstart_from_eps(sched, x, t, model_output))
    mean = q_posterior_mean(sched, pred_xstart, x, t)
    return {"mean": mean, "variance": variance, "log_variance": log_variance,
            "pred_xstart": pred_xstart}


def vb_terms_bpd(
    sched: Schedule,
    model_fn: ModelFn,
    x_start: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mean_type: ModelMeanType = ModelMeanType.EPSILON,
    var_type: ModelVarType = ModelVarType.FIXED_SMALL,
    clip_denoised: bool = True,
    model_output: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """One term of the variational lower bound, in bits
    (reference _vb_terms_bpd, gaussian_diffusion.py:690-722)."""
    true_mean = q_posterior_mean(sched, x_start, x_t, t)
    true_log_var = _extract(sched.posterior_log_variance_clipped, t, x_t.shape)
    out = p_mean_variance(
        sched, model_fn, x_t, t, mean_type=mean_type, var_type=var_type,
        clip_denoised=clip_denoised, model_output=model_output,
    )
    kl = mean_flat(normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"]))
    kl = kl / math.log(2.0)
    decoder_nll = -mean_flat(
        discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
    ) / math.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out["pred_xstart"]}


def training_losses(
    sched: Schedule,
    model_fn: ModelFn,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    mean_type: ModelMeanType = ModelMeanType.EPSILON,
    var_type: ModelVarType = ModelVarType.FIXED_SMALL,
    loss_type: LossType = LossType.MSE,
) -> Dict[str, jnp.ndarray]:
    """Per-example diffusion losses (reference training_losses,
    gaussian_diffusion.py:723-795). `noise` is explicit (no implicit RNG
    inside jit)."""
    x_t = q_sample(sched, x_start, t, noise)
    terms: Dict[str, jnp.ndarray] = {}

    if loss_type.is_vb():
        terms["loss"] = vb_terms_bpd(
            sched, model_fn, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=False,
        )["output"]
        if loss_type == LossType.RESCALED_KL:
            terms["loss"] = terms["loss"] * sched.num_timesteps
        return terms

    model_output = model_fn(x_t, _t_model(sched, t))
    if var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        C = x_t.shape[1]
        mean_out, var_values = model_output[:, :C], model_output[:, C:]
        # variance learns through the VB term only; the mean is frozen there
        frozen = jnp.concatenate([jax.lax.stop_gradient(mean_out), var_values], axis=1)
        terms["vb"] = vb_terms_bpd(
            sched, model_fn, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=False,
            model_output=frozen,
        )["output"]
        if loss_type == LossType.RESCALED_MSE:
            terms["vb"] = terms["vb"] * (sched.num_timesteps / 1000.0)
        model_output = mean_out

    target = {
        ModelMeanType.PREVIOUS_X: lambda: q_posterior_mean(sched, x_start, x_t, t),
        ModelMeanType.START_X: lambda: x_start,
        ModelMeanType.EPSILON: lambda: noise,
    }[mean_type]()
    terms["mse"] = mean_flat((target - model_output) ** 2)
    terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
    return terms


def prior_bpd(sched: Schedule, x_start: jnp.ndarray) -> jnp.ndarray:
    """KL(q(x_T | x_0) || N(0, I)) in bits/dim (reference _prior_bpd)."""
    B = x_start.shape[0]
    t = jnp.full((B,), sched.num_timesteps - 1, dtype=jnp.int32)
    qt_mean, _, qt_log_var = q_mean_variance(sched, x_start, t)
    kl = normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
    return mean_flat(kl) / math.log(2.0)


def calc_bpd_loop(
    sched: Schedule,
    model_fn: ModelFn,
    x_start: jnp.ndarray,
    key: jax.Array,
    *,
    mean_type: ModelMeanType = ModelMeanType.EPSILON,
    var_type: ModelVarType = ModelVarType.FIXED_SMALL,
    clip_denoised: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Full variational bound in bits/dim (reference calc_bpd_loop,
    gaussian_diffusion.py:813-861) — a lax.scan over timesteps T-1..0
    instead of the reference's python loop."""
    B = x_start.shape[0]
    T = sched.num_timesteps
    keys = jax.random.split(key, T)

    def step(_, inputs):
        t_scalar, k = inputs
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        noise = jax.random.normal(k, x_start.shape, dtype=x_start.dtype)
        x_t = q_sample(sched, x_start, t, noise)
        out = vb_terms_bpd(
            sched, model_fn, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
        )
        eps = pred_eps_from_xstart(sched, x_t, t, out["pred_xstart"])
        return None, (
            out["output"],
            mean_flat((out["pred_xstart"] - x_start) ** 2),
            mean_flat((eps - noise) ** 2),
        )

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    _, (vb, xstart_mse, mse) = jax.lax.scan(step, None, (ts, keys))
    vb, xstart_mse, mse = (jnp.swapaxes(v, 0, 1) for v in (vb, xstart_mse, mse))
    prior = prior_bpd(sched, x_start)
    return {
        "total_bpd": vb.sum(axis=1) + prior,
        "prior_bpd": prior,
        "vb": vb,
        "xstart_mse": xstart_mse,
        "mse": mse,
    }
