"""Timestep samplers for diffusion training.

Parity target: reference models/diffusion/timestep_sampler.py (150 LoC) —
UniformSampler and LossSecondMomentResampler (importance-sample timesteps by
the running second moment of their losses, with importance weights).

JAX-native: the resampler keeps its loss history as explicit state arrays
threaded through the train step (no in-place mutation)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def uniform_sample(key: jax.Array, batch: int, num_timesteps: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (t [B], weights [B]=1). The reference default."""
    t = jax.random.randint(key, (batch,), 0, num_timesteps)
    return t, jnp.ones((batch,), jnp.float32)


def init_loss_second_moment_state(num_timesteps: int, history: int = 10) -> Dict[str, jnp.ndarray]:
    return {
        "loss_history": jnp.zeros((num_timesteps, history), jnp.float32),
        "loss_counts": jnp.zeros((num_timesteps,), jnp.int32),
    }


def loss_second_moment_sample(
    state: Dict[str, jnp.ndarray], key: jax.Array, batch: int, uniform_prob: float = 0.001
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance-sample t ~ sqrt(E[loss^2]) once all bins are warm; uniform
    before that. Returns (t, importance weights 1/(T*p[t]))."""
    T, H = state["loss_history"].shape
    warmed = jnp.all(state["loss_counts"] == H)
    w = jnp.sqrt(jnp.mean(state["loss_history"] ** 2, axis=-1))
    p = w / jnp.maximum(w.sum(), 1e-12)
    p = p * (1 - uniform_prob) + uniform_prob / T
    p_uniform = jnp.full((T,), 1.0 / T)
    probs = jnp.where(warmed, p, p_uniform)
    t = jax.random.choice(key, T, shape=(batch,), p=probs)
    weights = 1.0 / (T * probs[t])
    return t, weights


def update_loss_second_moment(
    state: Dict[str, jnp.ndarray], t: jnp.ndarray, losses: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Ring-buffer update of per-timestep loss history (scatter; ties within
    a batch resolve to the last write, adequate for resampling statistics)."""
    hist, counts = state["loss_history"], state["loss_counts"]
    H = hist.shape[1]
    slot = jnp.minimum(counts[t], H - 1)
    # shift-left when full, else append at count position
    full = counts[t] == H
    row = hist[t]
    shifted = jnp.concatenate([row[:, 1:], losses[:, None]], axis=1)
    appended = row.at[jnp.arange(t.shape[0]), slot].set(losses)
    new_rows = jnp.where(full[:, None], shifted, appended)
    hist = hist.at[t].set(new_rows)
    counts = counts.at[t].set(jnp.minimum(counts[t] + 1, H))
    return {"loss_history": hist, "loss_counts": counts}
