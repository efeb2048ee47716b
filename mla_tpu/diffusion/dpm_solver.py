"""DPM-Solver++(2M) for the in-LLM action diffusion head.

A beyond-parity serving feature (the reference ships DDIM/DDPM only,
models/diffusion/gaussian_diffusion.py): a second-order multistep ODE solver
in data-prediction form (Lu et al., "DPM-Solver++", arXiv 2211.01095) that
reaches DDIM-8-grade sample quality in 4-5 model evaluations. The denoise
loop is weight-bandwidth-bound at 7B (docs/kernels.md), so halving the eval
count nearly halves per-chunk latency — exposed as
`predict_action_diff(..., sampler="dpm", num_ddim_steps=K)`; the default
path remains the reference-exact DDIM-8.

Formulation (data prediction, eps-parameterized model):
  alpha_t = sqrt(alpha_bar_t), sigma_t = sqrt(1 - alpha_bar_t),
  lambda_t = log(alpha_t / sigma_t)   (increases toward clean data)
  x0(x, t) = (x - sigma_t * eps(x, t)) / alpha_t
2M multistep update from state s to t (h = lambda_t - lambda_s):
  D = x0_s                                     (first step)
      (1 + 1/(2 r)) x0_s - 1/(2 r) x0_prev     (r = h_prev / h)
  x_t = (sigma_t / sigma_s) x_s - alpha_t (exp(-h) - 1) D
The final step targets lambda = +inf (sigma -> 0): x_end = D.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from mla_tpu.diffusion.gaussian import Schedule


def dpm_solver_pp_2m(
    sched: Schedule,
    denoise_fn: Callable,   # (x, t_model[int32 per-batch]) -> eps, like the DDIM loop's
    noise: jnp.ndarray,     # [B, ...] x_T ~ N(0, I)
    *,
    num_steps: int = 4,
    spacing: str = "index",
) -> jnp.ndarray:
    """Sample with `num_steps` model evaluations over the TRAIN schedule's
    noise levels. The python loop unrolls under jit — num_steps is small and
    static, matching how the DDIM loop is built (gaussian.py).

    spacing: 'index' places evaluations uniformly over the discrete training
    timesteps (the ddimN convention — best at very small step counts on the
    100-step grid); 'lambda' places them uniformly in log-SNR (better for
    num_steps >= 8; measured on the analytic-gaussian testbed in
    tests/test_dpm_solver.py)."""
    n_train = len(sched.timestep_map)
    acp_all = np.asarray(sched.alphas_cumprod, np.float64)
    if spacing == "index":
        # e.g. 4 steps over 100: 99, 66, 33, 0
        ts = np.unique(np.linspace(0, n_train - 1, num_steps).round().astype(int))[::-1]
    elif spacing == "lambda":
        lam_all = np.log(np.sqrt(acp_all) / np.sqrt(1.0 - acp_all))
        targets = np.linspace(lam_all[-1], lam_all[0], num_steps)
        ts = np.unique([int(np.abs(lam_all - lt).argmin()) for lt in targets])[::-1]
    else:
        raise ValueError(f"unknown spacing {spacing!r}")
    t_model_map = np.asarray(sched.timestep_map)[ts]

    acp = acp_all[ts]
    alpha = np.sqrt(acp)
    sigma = np.sqrt(1.0 - acp)
    lam = np.log(alpha / sigma)

    B = noise.shape[0]
    x = noise.astype(jnp.float32)
    x0_prev = None
    h_prev = None
    for i in range(len(ts)):
        t_model = jnp.full((B,), int(t_model_map[i]), jnp.int32)
        eps = denoise_fn(x, t_model).astype(jnp.float32)
        x0 = (x - float(sigma[i]) * eps) / float(alpha[i])

        if i == len(ts) - 1:
            # final projection to lambda = +inf (sigma -> 0): the exponential
            # integrator reduces to the plain x0 estimate. First order, per
            # the official sampler's lower_order_final for small step counts.
            return x0

        h = lam[i + 1] - lam[i]
        if x0_prev is None:
            D = x0  # first step: first order
        else:
            r = h_prev / h
            D = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
        x = (
            float(sigma[i + 1] / sigma[i]) * x
            - float(alpha[i + 1] * (np.exp(-h) - 1.0)) * D
        )
        x0_prev = x0
        h_prev = h
    return x
