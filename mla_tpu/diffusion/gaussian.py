"""Gaussian diffusion for the in-LLM action head — JAX-native.

Parity target: the reference's OpenAI-IDDPM port
(models/diffusion/gaussian_diffusion.py, respace.py, __init__.py:10-47) with
the MLA configuration: squaredcos_cap_v2 betas, 100 train steps,
epsilon-prediction, FIXED_SMALL variance, MSE loss, optional "ddimN"
respacing (default ddim8 at inference, model_mla.py:97,602).

TPU-first design:
  * Schedules are precomputed numpy arrays baked into the jitted graph as
    constants (`Schedule` is a frozen dataclass of np arrays).
  * Sampling loops are `lax.scan` over a jitted denoise step — no host
    round-trips between steps, in contrast to the reference's python loop
    of full forward passes (gaussian_diffusion.py:608-681).
  * All gather-by-timestep is `jnp.take`, so `t` may be a traced array.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def betas_for_alpha_bar(num_steps: int, alpha_bar: Callable[[float], float], max_beta: float = 0.999) -> np.ndarray:
    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    if name == "linear":
        scale = 1000 / num_steps
        return np.linspace(scale * 0.0001, scale * 0.02, num_steps, dtype=np.float64)
    if name == "squaredcos_cap_v2":
        return betas_for_alpha_bar(
            num_steps, lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        )
    raise NotImplementedError(f"unknown beta schedule: {name}")


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """Subset of original timesteps to keep (reference respace.py:12-66)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            if desired_count == 1:
                # the reference hardcodes {50} (respace.py:34-35) — an IDDPM
                # quirk that assumes the 100-step training schedule. Keep
                # bit-parity there; for shorter schedules {50} would be out
                # of range, so anchor the single step at the midpoint.
                return {50} if num_timesteps > 50 else {num_timesteps // 2}
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired_count} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx, all_steps = 0, []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur_idx, taken = 0.0, []
        for _ in range(section_count):
            taken.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken
        start_idx += size
    return set(all_steps)


@dataclass(frozen=True)
class Schedule:
    """Precomputed diffusion quantities (float64 numpy, as the reference)."""

    betas: np.ndarray
    # map from local timestep index -> original-process timestep fed to the
    # model (identity for the unspaced schedule; respace.py _WrappedModel).
    timestep_map: np.ndarray

    alphas_cumprod: np.ndarray = field(init=False)
    alphas_cumprod_prev: np.ndarray = field(init=False)
    sqrt_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_one_minus_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_recip_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_recipm1_alphas_cumprod: np.ndarray = field(init=False)
    posterior_variance: np.ndarray = field(init=False)
    posterior_log_variance_clipped: np.ndarray = field(init=False)
    posterior_mean_coef1: np.ndarray = field(init=False)
    posterior_mean_coef2: np.ndarray = field(init=False)

    def __post_init__(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas, axis=0)
        acp_prev = np.append(1.0, acp[:-1])
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        object.__setattr__(self, "alphas_cumprod", acp)
        object.__setattr__(self, "alphas_cumprod_prev", acp_prev)
        object.__setattr__(self, "sqrt_alphas_cumprod", np.sqrt(acp))
        object.__setattr__(self, "sqrt_one_minus_alphas_cumprod", np.sqrt(1.0 - acp))
        object.__setattr__(self, "sqrt_recip_alphas_cumprod", np.sqrt(1.0 / acp))
        object.__setattr__(self, "sqrt_recipm1_alphas_cumprod", np.sqrt(1.0 / acp - 1))
        object.__setattr__(self, "posterior_variance", post_var)
        object.__setattr__(
            self,
            "posterior_log_variance_clipped",
            np.log(np.append(post_var[1], post_var[1:])) if len(post_var) > 1 else np.array([]),
        )
        object.__setattr__(
            self, "posterior_mean_coef1", betas * np.sqrt(acp_prev) / (1.0 - acp)
        )
        object.__setattr__(
            self, "posterior_mean_coef2", (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)
        )

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def create_schedule(
    timestep_respacing: str = "",
    noise_schedule: str = "squaredcos_cap_v2",
    diffusion_steps: int = 100,
) -> Schedule:
    """Factory matching reference create_diffusion (+ SpacedDiffusion folding):
    respaced schedules recompute betas from the kept alphas_cumprod and carry
    the original-timestep map."""
    base_betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if not timestep_respacing:
        return Schedule(betas=base_betas, timestep_map=np.arange(diffusion_steps))
    use_timesteps = sorted(space_timesteps(diffusion_steps, timestep_respacing))
    base_acp = np.cumprod(1.0 - base_betas)
    last_acp, new_betas = 1.0, []
    for i in use_timesteps:
        new_betas.append(1 - base_acp[i] / last_acp)
        last_acp = base_acp[i]
    return Schedule(betas=np.array(new_betas), timestep_map=np.array(use_timesteps))


def _extract(arr: np.ndarray, t, broadcast_shape) -> jnp.ndarray:
    """arr[t] broadcast to shape (float32 on device; the fp64 tables keep
    precision at table-build time, matching reference _extract_into_tensor)."""
    out = jnp.take(jnp.asarray(arr, dtype=jnp.float32), t)
    return out.reshape(out.shape + (1,) * (len(broadcast_shape) - out.ndim))


def q_sample(sched: Schedule, x_start, t, noise):
    """Sample q(x_t | x_0) (reference gaussian_diffusion.py:214-229)."""
    return (
        _extract(sched.sqrt_alphas_cumprod, t, x_start.shape) * x_start
        + _extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.shape) * noise
    )


def pred_xstart_from_eps(sched: Schedule, x_t, t, eps):
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, x_t.shape) * x_t
        - _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.shape) * eps
    )


def q_posterior_mean(sched: Schedule, x_start, x_t, t):
    return (
        _extract(sched.posterior_mean_coef1, t, x_t.shape) * x_start
        + _extract(sched.posterior_mean_coef2, t, x_t.shape) * x_t
    )


# --------------------------------------------------------------------------- #
# Sampling loops (lax.scan)
# --------------------------------------------------------------------------- #

# denoise_fn signature: (x, t_original) -> eps   where t_original is the
# already-remapped model timestep array [B].
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _model_eps(sched: Schedule, denoise_fn: DenoiseFn, x, t_local):
    t_model = jnp.take(jnp.asarray(sched.timestep_map, dtype=jnp.int32), t_local)
    return denoise_fn(x, t_model)


def ddim_sample_loop(
    sched: Schedule,
    denoise_fn: DenoiseFn,
    noise: jnp.ndarray,
    *,
    key: Optional[jax.Array] = None,
    eta: float = 0.0,
    clip_denoised: bool = False,
) -> jnp.ndarray:
    """DDIM sampler (reference gaussian_diffusion.py:521-567,608) as a scan
    from t=T-1 down to 0. With eta=0 (MLA default) the loop is deterministic
    and `key` may be None."""
    B = noise.shape[0]
    T = sched.num_timesteps
    if eta != 0.0 and key is None:
        raise ValueError("eta > 0 requires a PRNG key")
    keys = (
        jax.random.split(key, T)
        if key is not None
        else jnp.zeros((T, 2), dtype=jnp.uint32)
    )

    def step(x, inputs):
        t_scalar, k = inputs
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        eps = _model_eps(sched, denoise_fn, x, t)
        x0 = pred_xstart_from_eps(sched, x, t, eps)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        # re-derive eps from (possibly clipped) x0, as the reference does
        eps = (
            _extract(sched.sqrt_recip_alphas_cumprod, t, x.shape) * x - x0
        ) / _extract(sched.sqrt_recipm1_alphas_cumprod, t, x.shape)
        alpha_bar = _extract(sched.alphas_cumprod, t, x.shape)
        alpha_bar_prev = _extract(sched.alphas_cumprod_prev, t, x.shape)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        mean_pred = x0 * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        if eta != 0.0:
            z = jax.random.normal(k, x.shape, dtype=x.dtype)
            nonzero = (t_scalar != 0).astype(x.dtype)
            mean_pred = mean_pred + nonzero * sigma * z
        return mean_pred, None

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    final, _ = jax.lax.scan(step, noise, (ts, keys))
    return final


def ddpm_sample_loop(
    sched: Schedule,
    denoise_fn: DenoiseFn,
    noise: jnp.ndarray,
    *,
    key: jax.Array,
    clip_denoised: bool = False,
) -> jnp.ndarray:
    """Ancestral (DDPM) sampler with FIXED_SMALL variance
    (reference p_sample_loop, gaussian_diffusion.py:373-427)."""
    B = noise.shape[0]
    T = sched.num_timesteps
    keys = jax.random.split(key, T)

    def step(x, inputs):
        t_scalar, k = inputs
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        eps = _model_eps(sched, denoise_fn, x, t)
        x0 = pred_xstart_from_eps(sched, x, t, eps)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = q_posterior_mean(sched, x0, x, t)
        log_var = _extract(sched.posterior_log_variance_clipped, t, x.shape)
        z = jax.random.normal(k, x.shape, dtype=x.dtype)
        nonzero = (t_scalar != 0).astype(x.dtype)
        sample = mean + nonzero * jnp.exp(0.5 * log_var) * z
        return sample, None

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    final, _ = jax.lax.scan(step, noise, (ts, keys))
    return final
