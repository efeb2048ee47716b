"""DPM-Solver++(2M): accuracy against the ANALYTIC probability-flow ODE
endpoint.

For data ~ N(mu, s^2 I) the optimal eps model is affine and the flow map has
a closed form: writing z = (x_T - a_T mu) / sqrt(a_T^2 s^2 + sigma_T^2), the
ODE preserves the gaussian quantile, so the endpoint (after the final
x0-projection to lambda=inf) is exactly mu + s z. This pins absolute solver
accuracy — DDIM-100 itself carries ~1.5% first-order discretization error on
this testbed, which is why the solvers are NOT compared against it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.diffusion import gaussian as gd
from mla_tpu.diffusion.dpm_solver import dpm_solver_pp_2m

SCHED = gd.create_schedule("", diffusion_steps=100)
ACP = np.asarray(SCHED.alphas_cumprod, np.float64)
MU = jnp.asarray(np.linspace(-0.5, 0.5, 12).reshape(1, 4, 3), jnp.float32)
S = 0.3


def eps_model(x, t_model):
    acp = jnp.asarray(ACP, jnp.float32)
    a = jnp.sqrt(acp[t_model])[:, None, None]
    sig = jnp.sqrt(1.0 - acp[t_model])[:, None, None]
    return (x - a * MU) * sig / (a * a * S * S + sig * sig)


def analytic_endpoint(noise):
    aT = float(np.sqrt(ACP[-1]))
    sT = float(np.sqrt(1.0 - ACP[-1]))
    z = (noise - aT * MU) / np.sqrt(aT * aT * S * S + sT * sT)
    return MU + S * z


NOISE = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3))
TARGET = analytic_endpoint(NOISE)
SCALE = float(jnp.abs(TARGET).max())


def _err(x):
    return float(jnp.abs(x - TARGET).max()) / SCALE


def test_dpm4_beats_ddim8():
    """The serving claim: 4 solver evaluations reach better ODE accuracy
    than the reference's default DDIM-8 — i.e. half the (weight-bandwidth-
    bound) denoise cost at no quality loss."""
    dpm4 = dpm_solver_pp_2m(SCHED, eps_model, NOISE, num_steps=4)
    ddim8 = gd.ddim_sample_loop(
        gd.create_schedule("ddim8", diffusion_steps=100), eps_model, NOISE
    )
    assert _err(dpm4) < _err(ddim8), (_err(dpm4), _err(ddim8))


def test_dpm_beats_ddim_at_equal_step_count():
    for K in (4, 8):
        sched_k = gd.create_schedule(f"ddim{K}", diffusion_steps=100)
        e_ddim = _err(gd.ddim_sample_loop(sched_k, eps_model, NOISE))
        e_dpm = _err(dpm_solver_pp_2m(SCHED, eps_model, NOISE, num_steps=K))
        assert e_dpm < 0.75 * e_ddim, (K, e_dpm, e_ddim)


def test_dpm_lambda_spacing_converges_past_ddim100():
    """log-SNR spacing at 20 evals lands closer to the true endpoint than a
    full 100-step DDIM pass."""
    e_ddim100 = _err(gd.ddim_sample_loop(SCHED, eps_model, NOISE))
    e_dpm20 = _err(
        dpm_solver_pp_2m(SCHED, eps_model, NOISE, num_steps=20, spacing="lambda")
    )
    assert e_dpm20 < e_ddim100, (e_dpm20, e_ddim100)
    assert e_dpm20 < 0.02, e_dpm20


def test_first_order_limit_matches_ddim():
    """At one eval per training timestep the exponential-integrator update
    is algebraically the DDIM update — the discrete limits coincide."""
    d = dpm_solver_pp_2m(SCHED, eps_model, NOISE, num_steps=100)
    ddim = gd.ddim_sample_loop(SCHED, eps_model, NOISE)
    # 2M's second-order correction converges to the same limit
    assert float(jnp.abs(d - ddim).max()) < 0.05 * SCALE


def test_policy_dpm_sampler_end_to_end():
    """predict_action_diff(sampler='dpm') runs through the full policy path
    and lands within the action bounds like the DDIM path."""
    from mla_tpu.models import mla as mla_mod
    from tests.tiny import tiny_config, tiny_model

    cfg = tiny_config(use_contrastive=False)
    params, state = tiny_model(cfg)
    stats = {
        "rlbench": {
            "action": {"q01": [-1.0] * 7, "q99": [1.0] * 7},
            "proprio": {"q01": [-1.0] * 7, "q99": [1.0] * 7},
        }
    }
    policy = mla_mod.MLAPolicy(params, state, cfg, tokenizer=None, norm_stats=stats)
    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    img = np.concatenate(
        [rng.normal(size=(3, size, size)).astype(np.float32), np.ones((1, size, size), np.float32)]
    )
    pc = rng.uniform(-0.5, 0.5, size=(cfg.point.input_points, 3)).astype(np.float32)
    ids = np.asarray([[1, 5, 7, 29871]], np.int32)

    a_dpm = policy.predict_action_diff(
        img, pc, "x", input_ids=ids, sampler="dpm", num_dpm_steps=4, seed=0
    )
    a_ddim = policy.predict_action_diff(img, pc, "x", input_ids=ids, seed=0)
    assert a_dpm.shape == a_ddim.shape == (cfg.action_horizon, cfg.action_dim)
    assert np.isfinite(a_dpm).all()

    # conflicting request: dpm is an ODE sampler — combining it with an
    # explicit DDPM (use_ddim=False) ask must be rejected, not overridden
    with pytest.raises(ValueError, match="dpm"):
        policy.predict_action_diff(
            img, pc, "x", input_ids=ids, sampler="dpm", use_ddim=False
        )


def test_dpm4_fidelity_on_real_trained_model():
    """Sampler fidelity on the REAL composed model (VERDICT r2 #2), not the
    analytic-Gaussian testbed: briefly train mla-tiny on the production
    diffusion objective (so the eps field is consistent — an untrained
    model's DDIM trajectories diverge chaotically and qualify nothing),
    then compare DPM-4 and DDIM-8 against the DDIM-100 fidelity reference
    from the same weights/observations/noise. DPM-4 must track DDIM-100 at
    least as closely as the reference-exact DDIM-8 does. The full sweep
    (more seeds/scenarios/step counts) is scripts/qualify_samplers.py."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import qualify_samplers as qs

    policy = qs.build_policy("mla-tiny", 0, train_steps=40)
    img, pc, proprio = qs.make_scenarios(policy, 2, None)[1]
    noise = np.random.default_rng(9001).normal(
        size=(policy.cfg.action_horizon, policy.cfg.action_dim)
    ).astype(np.float32)
    common = dict(cur_robot_state=proprio, unnorm_key="qualify", noise=noise,
                  instruction="close the jar", return_normalized=True)
    ref = policy.predict_action_diff(img, pc, num_ddim_steps=100, **common)
    d8 = policy.predict_action_diff(img, pc, num_ddim_steps=8, **common)
    dpm4 = policy.predict_action_diff(img, pc, sampler="dpm", num_dpm_steps=4, **common)
    # the 2-eval edge (Euler step + final x0 projection) — a measured
    # aggressive mode (docs/kernels.md table); pinning it here also guards
    # the solver's first-order bootstrap path
    dpm2 = policy.predict_action_diff(img, pc, sampler="dpm", num_dpm_steps=2, **common)

    def rms(a):
        return float(np.sqrt(np.mean((a[:, :-1] - ref[:, :-1]) ** 2)))

    assert np.isfinite(dpm4).all() and np.isfinite(d8).all()
    assert rms(dpm4) <= rms(d8) * 1.05, (rms(dpm4), rms(d8))
    assert np.isfinite(dpm2).all()
    assert rms(dpm2) <= rms(d8) * 1.05, (rms(dpm2), rms(d8))
