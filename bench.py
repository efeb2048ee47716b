"""Benchmark: end-to-end action-chunk prediction latency on one chip.

Measures the deployment hot path (reference predict_action_diff,
model_mla.py:592-775): denoise of a 16-action chunk conditioned on a
672x672 image + 1024-point cloud + language prompt, through the flagship
Llama-2-7B-backed MLA model.

The headline `value` is the DPM-Solver++(2M) 4-eval serving mode —
qualified against the DDIM-100 fine-grained solution on the real composed
model (it tracks DDIM-100 far closer than the reference's own DDIM-8 does;
scripts/qualify_samplers.py, docs/kernels.md). The reference-exact DDIM-8
latency is published alongside as ddim8_chunks_per_sec / p50_ms.

Prints ONE JSON line:
    {"metric": "action_chunks_per_sec_chip", "value": N,
     "unit": "chunks/s", "vs_baseline": N, ...extras}

vs_baseline is measured against an analytic A100 estimate of the reference
implementation (which recomputes the full ~560-token 7B prefix on each of
the 8 DDIM steps): 8 x 2*6.7e9*560 FLOPs at ~45% MFU on 312 TFLOPS bf16
=> ~427 ms/chunk => ~2.3 chunks/s. The repo publishes no numbers
(BASELINE.md), so this estimate is the comparison anchor.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent XLA compile cache: repeat bench runs skip the (slow, tunneled)
# TPU compilation entirely
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mla_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# env setdefault alone is DEAD in-process on this box (the axon .pth imports
# jax at interpreter startup, freezing env-derived config defaults) — the
# helper force-enables the cache via jax.config.update. Kept env vars above
# so spawned subprocesses inherit them at startup, where they DO work.
from mla_tpu.utils.compile_cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()

# Published serving configuration: bf16 prefill score tensors (softmax in
# fp32). Qualified vs the fp32-scores path on the real trained model up the
# tiny->2b scale ladder (chunk rel-rms 2e-4, gripper agreement 1.0 —
# qualify_samplers --compare_bf16s) and a measured net win on the chip:
# prefill 25.5 -> 23.1 ms, DPM-4 14.32 -> 14.70 chunks/s single-stream,
# batch-4 DPM-4 18.48 -> 21.25 (docs/kernels.md). Override with
# MLA_PREFILL_SCORES=fp32 for the bit-exact-prefill configuration.
os.environ.setdefault("MLA_PREFILL_SCORES", "bf16")

BASELINE_A100_CHUNKS_PER_SEC = 2.3  # analytic estimate, see module docstring

# Analytic A100 anchor for the AR head (reference predict_action_ar,
# model_mla.py:494-589): one ~574-token multimodal prefill + 7 KV-cached
# greedy single-token decode steps on the bf16 7B. Prefill: 2*6.7e9*574
# = 7.7 TFLOP at the same favorable 45% MFU granted to the diffusion
# anchor => 55 ms. Decode: each step reads the 13.4 GB bf16 weights; at a
# favorable 70% of A100's 2.04 TB/s HBM => 9.4 ms/step x 7 = 66 ms.
# => ~121 ms/action => ~8.3 actions/s. Full derivation + sensitivity in
# BASELINE.md ("The AR-head anchor").
BASELINE_A100_AR_ACTIONS_PER_SEC = 8.3


def _host_load1():
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except Exception:
        return None


def _wait_host_idle(threshold: float = 0.8, max_wait_s: float = 90.0):
    """Idle-host guard (VERDICT r4 #2): on the 1-core box any concurrent
    host work skews p50 latencies. Wait (bounded) for load to drop; return
    the load at measurement start so a contaminated run is visible in the
    JSON."""
    t0 = time.time()
    load = _host_load1()
    while load is not None and load > threshold and time.time() - t0 < max_wait_s:
        time.sleep(10)
        load = _host_load1()
    return load


def _zeros_model(cfg):
    import jax
    import jax.numpy as jnp

    from mla_tpu.models import prismatic

    shapes = jax.eval_shape(lambda k: prismatic.mla_model_init(k, cfg), jax.random.PRNGKey(0))
    z = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    return z


def build_policy(model_id: str):
    import jax

    from mla_tpu.conf.models import get_model_config
    from mla_tpu.models import mla as mla_mod

    quantize = None
    base_id = model_id
    for suffix in ("-int8", "-int4"):
        if model_id.endswith(suffix):
            quantize = suffix[1:]
            base_id = model_id[: -len(suffix)]
    cfg = get_model_config(base_id, use_contrastive=False)
    if quantize:
        # build the QUANTIZED tree directly from shapes — quantizing real
        # zeros on-device would materialize fp32 transients and OOM the chip
        import jax.numpy as jnp

        from mla_tpu.models import prismatic
        from mla_tpu.ops.quantization import quantize_model, quantize_model_int4

        qfn = quantize_model if quantize == "int8" else quantize_model_int4
        shapes = jax.eval_shape(
            lambda k: prismatic.mla_model_init(k, cfg), jax.random.PRNGKey(0)
        )
        q_shapes = jax.eval_shape(qfn, shapes[0])
        params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), q_shapes)
        # unit scales so dequant produces finite (zero) weights
        params["llm_backbone"] = jax.tree_util.tree_map_with_path(
            lambda p, x: jnp.ones(x.shape, x.dtype) if "scale" in str(p[-1]) else x,
            params["llm_backbone"],
        )
        state = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes[1]
        )
    else:
        params, state = _zeros_model(cfg)
    stats = {
        "rlbench": {
            "action": {"q01": [-1.0] * cfg.action_dim, "q99": [1.0] * cfg.action_dim},
            "proprio": {"q01": [-1.0] * cfg.action_dim, "q99": [1.0] * cfg.action_dim},
        }
    }
    return mla_mod.MLAPolicy(params, state, cfg, tokenizer=None, norm_stats=stats), cfg


def run_bench(model_id: str, iters: int = 20, warmup: int = 2):
    """Times the jitted action-prediction graph with device-resident inputs
    (what a serving process would do: observations stream to the device
    asynchronously while the previous chunk executes). The dev box reaches
    its chip through a network tunnel, so host->device transfer time here
    measures the tunnel, not the framework — reported separately as
    transfer_ms from an end-to-end timing."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    t_start = time.time()
    host_load1 = _wait_host_idle()
    policy, cfg = build_policy(model_id)
    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    img = np.concatenate(
        [rng.normal(size=(3, size, size)).astype(np.float32), np.ones((1, size, size), np.float32)]
    )
    pc = rng.uniform(
        [-0.3, -0.45, 0.75], [0.7, 0.45, 1.6], size=(cfg.point.input_points, 3)
    ).astype(np.float32)
    # realistic RLBench prompt length: "In: What action should the robot
    # take to close the box?\nOut:" + diff-mode surgery => ~22 ids
    ids = np.concatenate(
        [[1], rng.integers(100, 20000, 20), [29871]]
    ).astype(np.int32)[None, :]

    # build + warm the jitted graph through the public API
    for i in range(warmup):
        policy.predict_action_diff(img, pc, "bench", input_ids=ids, seed=i)

    # device-resident timing of the same graph. Timing rules for this box
    # (scripts/profile_serving.py docstring): force completion by fetching a
    # scalar with device_get (block_until_ready can return early on the
    # tunnel backend), and vary an input every call (identical calls are served
    # from a remote result cache).
    # NB: wrapping a policy graph in an outer jit inlines it — the outer
    # compile must carry the policy's compiler options or they are lost.
    # And they must ride the OUTER jit only: JAX rejects compiler_options
    # on a nested jit outright, so the policy graph is unwrapped
    # (__wrapped__) before re-jitting.
    def _scalar_wrap(fn, reduce=lambda out: out.astype(jnp.float32).sum()):
        raw = getattr(fn, "__wrapped__", fn)
        return jax.jit(lambda *a: reduce(raw(*a)),
                       compiler_options=policy.compiler_options)

    fn = policy._diff_fn(ids.shape[1] - 1, 1, use_ddpm=False)
    fn_s = _scalar_wrap(fn)
    images_d = {"front_image": jnp.asarray(img[None])}
    pc_d = jnp.asarray(pc[None])
    prefix_ids = jnp.asarray(ids[:, :-1])
    tail_ids = jnp.asarray(ids[:, -1:])
    proprio_d = jnp.zeros((1, 1, cfg.action_dim), jnp.float32)
    key = jax.random.PRNGKey(0)

    noise0 = jax.random.normal(key, (1, cfg.action_horizon, cfg.action_dim))
    float(jax.device_get(fn_s(policy.params, policy.state, prefix_ids, tail_ids, images_d, pc_d, proprio_d, noise0, key)))

    times = []
    for i in range(iters):
        noise = jax.random.normal(jax.random.fold_in(key, i), (1, cfg.action_horizon, cfg.action_dim))
        noise.block_until_ready()
        t0 = time.perf_counter()
        float(jax.device_get(fn_s(policy.params, policy.state, prefix_ids, tail_ids, images_d, pc_d, proprio_d, noise, key)))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)

    # fixed per-dispatch network RTT of the dev tunnel (a colocated serving
    # host would not pay this); measured with a trivial op, reported so both
    # gross and net latencies are visible
    null_fn = jax.jit(lambda a: (a * 2.0).sum())
    null_in = jnp.zeros((8, 128), jnp.float32)
    float(jax.device_get(null_fn(null_in)))
    rtts = []
    for i in range(max(min(iters, 16), 8)):
        nv = null_in + jnp.float32(i)
        nv.block_until_ready()
        t0 = time.perf_counter()
        float(jax.device_get(null_fn(nv)))
        rtts.append(time.perf_counter() - t0)
    rtt_s = float(np.percentile(rtts, 50))
    # the tunnel RTT drifts several ms between sessions (measured 25-32 ms
    # across one day) and every NET reading inherits it — publish the
    # in-run spread so a shifted headline is attributable
    rtt_spread_ms = float(np.percentile(rtts, 90) - np.percentile(rtts, 10)) * 1e3

    # end-to-end (numpy-in) timing for the transfer overhead estimate
    e2e = []
    for i in range(min(iters, 5)):
        t0 = time.perf_counter()
        policy.predict_action_diff(img, pc, "bench", input_ids=ids, seed=100 + i)
        e2e.append(time.perf_counter() - t0)

    mode_min_s = {}  # mode name -> best (min) gross seconds, for the phase split
    mode_stats = {}  # mode name -> {p50_s, min_s, n} variance record

    def timed_mode(B: int, fold_base: int, _min_key=None, iters_override=None,
                   **diff_kwargs):
        """chunks/s for one serving-mode graph, following the tunnel timing
        rules (CLAUDE.md): scalar-reduced jit, completion forced by
        device_get, one input perturbed per call, RTT netted out. Returns
        None when the mode does not fit (e.g. large-batch KV-cache OOM)."""
        try:
            if B == 1:
                inp = (prefix_ids, tail_ids, images_d, pc_d, proprio_d)
            else:
                inp = (
                    jnp.repeat(prefix_ids, B, axis=0),
                    jnp.repeat(tail_ids, B, axis=0),
                    {"front_image": jnp.repeat(images_d["front_image"], B, axis=0)},
                    jnp.repeat(pc_d, B, axis=0),
                    jnp.zeros((B, 1, cfg.action_dim), jnp.float32),
                )
            fn = policy._diff_fn(ids.shape[1] - 1, 1, use_ddpm=False, **diff_kwargs)
            fn_scalar = _scalar_wrap(fn)

            def run(noise):
                return float(jax.device_get(
                    fn_scalar(policy.params, policy.state, *inp, noise, key)
                ))

            run(jax.random.normal(key, (B, cfg.action_horizon, cfg.action_dim)))  # warm
            ts = []
            for i in range(iters_override or max(iters // 2, 2)):
                noise = jax.random.normal(
                    jax.random.fold_in(key, fold_base + i),
                    (B, cfg.action_horizon, cfg.action_dim),
                )
                noise.block_until_ready()
                t0 = time.perf_counter()
                run(noise)
                ts.append(time.perf_counter() - t0)
            if _min_key:
                mode_min_s[_min_key] = float(np.min(ts))
                mode_stats[_min_key] = {
                    "p50_s": float(np.percentile(ts, 50)),
                    "min_s": float(np.min(ts)),
                    "n": len(ts),
                }
            return B / max(float(np.percentile(ts, 50)) - rtt_s, 1e-6)
        except Exception:
            return None

    def timed_ar():
        """actions/s through the AR head (reference predict_action_ar,
        model_mla.py:494-589): prefill with last-position logits + greedy
        scan decode of action_dim discretized tokens."""
        try:
            fn = policy._ar_fn(ids.shape[1], cfg.action_dim)
            fn_scalar = _scalar_wrap(
                fn, reduce=lambda out: sum(x.astype(jnp.float32).sum() for x in out)
            )
            ids_d = jnp.asarray(ids)

            def run(img_in):
                return float(jax.device_get(fn_scalar(
                    policy.params, policy.state, ids_d,
                    {"front_image": img_in}, pc_d, proprio_d,
                )))

            run(images_d["front_image"])  # warm/compile
            ts = []
            for i in range(max(iters // 2, 2)):
                img_in = images_d["front_image"] + jnp.float32((i + 1) * 1e-4)
                img_in.block_until_ready()
                t0 = time.perf_counter()
                run(img_in)
                ts.append(time.perf_counter() - t0)
            return 1.0 / max(float(np.percentile(ts, 50)) - rtt_s, 1e-6)
        except Exception:
            return None

    # AR head latency (the reference's other headline inference path)
    ar_throughput = timed_ar()
    # throughput mode: batched serving (weights amortize across the batch);
    # B=4 fits beside the 7B int8 weights on a 16GB chip (B=8 KV cache OOMs)
    batch_throughput = timed_mode(4, 100)
    # DPM-Solver++(2M) 4-eval mode — the qualified serving flagship; the
    # HEADLINE, so it gets the full iteration budget for a stable p50
    dpm4 = timed_mode(1, 200, _min_key="dpm4", iters_override=max(iters, 2),
                      sampler="dpm", num_dpm_steps=4)
    # compound mode: batched serving WITH the DPM-4 sampler — both levers
    # multiply (weight reads amortize across B AND across half the evals)
    batch_dpm4 = timed_mode(4, 300, sampler="dpm", num_dpm_steps=4)
    # DPM-2/3 floor probes (qualified alongside DPM-4 up the scale ladder,
    # docs/kernels.md). Each is its own unrolled 7B program (~10 min cold
    # remote compile, instant on a warm /tmp compile cache), so they are
    # budget-gated rather than env-gated (VERDICT r4 #3): run when the
    # bench still has wall-clock headroom inside the driver's 7200 s child
    # timeout. MLA_BENCH_DPM23=0 disables; =1 forces regardless of budget.
    dpm2 = dpm3 = None
    gate = os.environ.get("MLA_BENCH_DPM23", "auto")
    if gate != "0":
        budget_ok = (time.time() - t_start) < float(
            os.environ.get("MLA_BENCH_DPM23_BUDGET_S", "3000")
        )
        if gate == "1" or budget_ok:
            dpm2 = timed_mode(1, 400, _min_key="dpm2", sampler="dpm", num_dpm_steps=2)
            dpm3 = timed_mode(1, 500, _min_key="dpm3", sampler="dpm", num_dpm_steps=3)

    # phase split derived in-graph: the DDIM-8 / DPM-k graphs are identical
    # except for the denoise-eval count (8 vs k suffix forwards), so net
    # latency is linear in evals: latency(n) = prefill + n * suffix. With
    # DPM-2/3/4 + DDIM-8 all measured, fit the line by least squares over
    # every available (n, min-net-latency) point — the r4 two-point split
    # amplified min-time noise 8x into the prefill intercept (one run
    # implied mfu_prefill 0.95 from a 2 ms swing). MIN times, not p50:
    # host-side contention only ever ADDS latency.
    suffix_ms = prefill_ms = mfu_prefill = None
    pts = [(8.0, float(np.min(times)))]  # DDIM-8 from the main timing loop
    for k, n_evals in (("dpm2", 2.0), ("dpm3", 3.0), ("dpm4", 4.0)):
        if mode_min_s.get(k):
            pts.append((n_evals, mode_min_s[k]))
    if dpm4 and len(pts) >= 2:
        ns = np.asarray([p[0] for p in pts])
        ys = np.asarray([max(p[1] - rtt_s, 1e-6) for p in pts])
        slope, intercept = np.polyfit(ns, ys, 1)
        suffix_ms = max(float(slope) * 1e3, 0.0)
        prefill_ms = max(float(intercept) * 1e3, 0.0)
        # int8 MXU utilization of the prefill phase: 2 * weight_params * P
        # MACs through the 394 TOPS v5e int8 path. Only the DECODE-LAYER
        # linears count (prefill runs compute_logits=False so lm_head never
        # multiplies, and the embedding table is a gather); P is derived
        # from the actual prompt + fused token block.
        n_weights = sum(
            int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(policy.params["llm_backbone"]["layers"])
            if getattr(l, "dtype", None) == jnp.int8 and l.ndim >= 2
        )
        if n_weights and prefill_ms:
            prefix_tokens = (ids.shape[1] - 1) + cfg.fused_len
            flops = 2.0 * n_weights * prefix_tokens
            mfu_prefill = flops / (prefill_ms * 1e-3) / 394e12
            if mfu_prefill > 1.0:
                # physically impossible => the two timing passes were skewed
                # (e.g. host contention). The suffix/prefill split is derived
                # from the SAME two skewed inputs, so publish none of the
                # three rather than an impossible MFU next to the noise that
                # produced it.
                suffix_ms = prefill_ms = mfu_prefill = None

    # variance record for the headline mode (VERDICT r4 #2): a single cold
    # driver run must be interpretable — publish spread (p50 vs min) and n
    # so a host-noise-skewed p50 is visible next to the robust min
    dpm4_stats = mode_stats.get("dpm4")
    variance = None
    if dpm4_stats:
        net_p50 = max(dpm4_stats["p50_s"] - rtt_s, 1e-6)
        net_min = max(dpm4_stats["min_s"] - rtt_s, 1e-6)
        variance = {
            "n": dpm4_stats["n"],
            "dpm4_chunks_per_sec_min": 1.0 / net_min,
            "p50_vs_min_spread_pct": (net_p50 / net_min - 1.0) * 100.0,
            "rtt_spread_ms": rtt_spread_ms,
            "host_load1_at_start": host_load1,
        }

    return {
        "p50_s": float(np.percentile(times, 50)),
        "p90_s": float(np.percentile(times, 90)),
        "mean_s": float(times.mean()),
        "min_s": float(np.min(times)),
        "n_ddim8": int(times.size),
        "variance": variance,
        "rtt_s": rtt_s,
        "transfer_ms": float(max(np.percentile(e2e, 50) - np.percentile(times, 50), 0.0) * 1e3),
        "batch_chunks_per_sec": batch_throughput, "throughput_batch": 4,
        "ar_actions_per_sec": ar_throughput,
        "dpm4_chunks_per_sec": dpm4,
        "batch_dpm4_chunks_per_sec": batch_dpm4,
        "dpm2_chunks_per_sec": dpm2,
        "dpm3_chunks_per_sec": dpm3,
        "suffix_ms_per_step": suffix_ms,
        "prefill_ms": prefill_ms,
        "mfu_prefill": mfu_prefill,
    }


def _emit(result, model_used, backend, extra=None):
    rtt_s = result.get("rtt_s", 0.0)
    p50_net_s = max(result["p50_s"] - rtt_s, 1e-6)
    ddim8_chunks_per_sec = 1.0 / p50_net_s
    dpm4 = result.get("dpm4_chunks_per_sec")
    # flagship = the serving default: DPM-Solver++(2M) with 4 evals, which
    # tracks the DDIM-100 fine-grained solution far CLOSER than the
    # reference's DDIM-8 does on the real composed model (measured, same
    # weights/observations/noise: scripts/qualify_samplers.py +
    # tests/test_dpm_solver.py::test_dpm4_fidelity_on_real_trained_model;
    # table in docs/kernels.md). The reference-exact DDIM-8 number is kept
    # as ddim8_chunks_per_sec. DDIM-8's own floor is structural: 8 evals x
    # 6.48 GB of int8 weight reads = 63.8 ms before any compute.
    chunks_per_sec = dpm4 if dpm4 else ddim8_chunks_per_sec
    out = {
        "metric": "action_chunks_per_sec_chip",
        "value": round(chunks_per_sec, 3),
        "unit": "chunks/s",
        "vs_baseline": round(chunks_per_sec / BASELINE_A100_CHUNKS_PER_SEC, 3),
        # metric_version 3 (round 3+): value/vs_baseline are the DPM-4
        # serving mode, NET of the dev tunnel's dispatch RTT. version 2
        # published net DDIM-8; version 1 gross DDIM-8. All three readings
        # are carried below (p50_ms / ddim8_chunks_per_sec / value).
        "metric_version": 3,
        "sampler": "dpm4" if dpm4 else "ddim8",
        "p50_ms": round(result["p50_s"] * 1e3, 2),
        "p50_net_ms": round(p50_net_s * 1e3, 2),
        "dispatch_rtt_ms": round(rtt_s * 1e3, 2),
        "p90_ms": round(result["p90_s"] * 1e3, 2),
        "model": model_used,
        "backend": backend,
        "prefill_scores": os.environ.get("MLA_PREFILL_SCORES", "fp32"),
        "xla_options": os.environ.get("MLA_XLA_OPTIONS") or None,
        "ddim_steps": 8,
        "ddim8_chunks_per_sec": round(ddim8_chunks_per_sec, 3),
        "transfer_ms": round(result.get("transfer_ms", 0.0), 2),
        "batch_chunks_per_sec": round(result["batch_chunks_per_sec"], 2)
        if result.get("batch_chunks_per_sec")
        else None,
        "dpm4_chunks_per_sec": round(result["dpm4_chunks_per_sec"], 2)
        if result.get("dpm4_chunks_per_sec")
        else None,
        "batch_dpm4_chunks_per_sec": round(result["batch_dpm4_chunks_per_sec"], 2)
        if result.get("batch_dpm4_chunks_per_sec")
        else None,
        "dpm2_chunks_per_sec": round(result["dpm2_chunks_per_sec"], 2)
        if result.get("dpm2_chunks_per_sec")
        else None,
        "dpm3_chunks_per_sec": round(result["dpm3_chunks_per_sec"], 2)
        if result.get("dpm3_chunks_per_sec")
        else None,
        # the AR action head (reference predict_action_ar): 7 greedy tokens
        # against the cached multimodal prefix. Anchored against its own
        # analytic A100 estimate (~8.3 actions/s — prefill-compute +
        # 7 bandwidth-bound KV-cached decode steps; BASELINE.md "The
        # AR-head anchor"). The AR decode is HBM-bandwidth-bound, where
        # v5e (819 GB/s) gives away 2.5x to A100 (2.04 TB/s) — int8
        # weights claw back 2x — so parity-ish, not 5x, is the physical
        # ceiling for this head on this chip; the 5x target is defined on
        # the diffusion chunk path (the reference's serving default).
        "ar_actions_per_sec": round(result["ar_actions_per_sec"], 2)
        if result.get("ar_actions_per_sec")
        else None,
        "ar_vs_baseline": round(
            result["ar_actions_per_sec"] / BASELINE_A100_AR_ACTIONS_PER_SEC, 3
        )
        if result.get("ar_actions_per_sec")
        else None,
        # perf split (least-squares fit of net latency vs denoise-eval count
        # over DPM-2/3/4 + DDIM-8; prefill_ms includes the ~1.6 ms front-end)
        "suffix_ms_per_step": round(result["suffix_ms_per_step"], 2)
        if result.get("suffix_ms_per_step") is not None
        else None,
        "prefill_ms": round(result["prefill_ms"], 2)
        if result.get("prefill_ms") is not None
        else None,
        "mfu_prefill": round(result["mfu_prefill"], 3)
        if result.get("mfu_prefill") is not None
        else None,
        # run-interpretability block (VERDICT r4 #2): sample counts, the
        # min-based (host-noise-immune) headline alternative, the p50/min
        # spread, and the host load when timing started
        "variance": (
            {
                "n_dpm4": result["variance"]["n"],
                "n_ddim8": result.get("n_ddim8"),
                "dpm4_chunks_per_sec_min": round(
                    result["variance"]["dpm4_chunks_per_sec_min"], 2
                ),
                "p50_vs_min_spread_pct": round(
                    result["variance"]["p50_vs_min_spread_pct"], 2
                ),
                "rtt_spread_ms": round(result["variance"]["rtt_spread_ms"], 2),
                "host_load1_at_start": result["variance"]["host_load1_at_start"],
            }
            if result.get("variance")
            else None
        ),
        "baseline_note": (
            "vs analytic A100 estimate of reference predict_action_diff (~2.3 "
            "chunks/s, derivation in BASELINE.md); repo publishes no numbers. "
            + (
                "value/vs_baseline are the DPM-Solver++(2M) 4-eval serving "
                "mode (qualified against DDIM-100 on the real model, "
                "scripts/qualify_samplers.py; docs/kernels.md)"
                if dpm4
                else "value/vs_baseline are the reference-exact DDIM-8 mode "
                "(the DPM-4 timing pass failed this run — see 'sampler')"
            )
            + " net of the dev tunnel's fixed per-dispatch RTT "
            "(dispatch_rtt_ms, measured with a trivial op — a serving host "
            "colocated with the chip does not pay it). The reference-exact "
            "DDIM-8 reading is ddim8_chunks_per_sec / p50_ms (gross) / "
            "p50_net_ms (net)."
        ),
    }
    if extra:
        out.update(extra)
    print(json.dumps(out))


def _run_single(model_id: str):
    """Child-process mode: bench one model, print its JSON, exit 0/1."""
    import jax

    backend = jax.default_backend()
    if backend == "tpu":
        # Published serving configuration: XLA latency-hiding scheduler on
        # the serving graphs — overlaps decode-chain weight DMA with MXU
        # work, suffix step 10.84 -> 9.91 ms/step on the real v5e (chained
        # A/B, scripts/sweep_suffix_flags.py; docs/kernels.md). TPU-gated:
        # the option names are TPU-compiler-only and a CPU-degraded bench
        # run must not feed them to the CPU client. Override with
        # MLA_XLA_OPTIONS='{}' for the stock-scheduler configuration.
        os.environ.setdefault(
            "MLA_XLA_OPTIONS",
            '{"xla_tpu_enable_latency_hiding_scheduler": "true"}',
        )
    iters = 20 if backend == "tpu" else 3
    try:
        result = run_bench(model_id, iters=iters)
    except Exception as e:
        print(json.dumps({"error": f"{type(e).__name__}: {e}"[:400]}), file=sys.stderr)
        sys.exit(1)
    _emit(result, model_id, backend)


def _probe_backend(timeout_s: int = 900):
    """Resolve jax.default_backend() in a BOUNDED subprocess. Backend init
    goes through the axon tunnel on this box and blocks indefinitely when
    the tunnel is down — the bench must degrade to a CPU reading, not hang
    the driver. Returns the backend string, or None on timeout/failure."""
    try:
        p = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        if p.returncode == 0 and p.stdout.strip():
            return p.stdout.strip().splitlines()[-1]
    except subprocess.TimeoutExpired:
        pass
    return None


def _augment_degraded(json_line: str, on_tpu: bool, backend):
    """On-TPU readings pass through untouched. A CPU fallback reading (tunnel
    down / no TPU) is re-labeled so its value is never mistaken for a chip
    measurement: vs_baseline is zeroed (an mla-tiny CPU number has no
    relationship to the A100 7B anchor) and the newest recorded TPU bench is
    attached for context."""
    if on_tpu:
        return json_line
    try:
        out = json.loads(json_line)
    except json.JSONDecodeError:
        return json_line
    out["vs_baseline"] = 0.0
    out["degraded"] = (
        "tpu-tunnel-down: cpu fallback on a tiny model — NOT a chip "
        "measurement; see last_tpu_bench for the newest recorded TPU reading"
        if backend is None
        else f"non-tpu backend '{backend}': not comparable to the A100 anchor"
    )
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        recs = sorted(
            f for f in os.listdir(here)
            if f.startswith("BENCH_r") and f.endswith(".json")
        )
        for rec in reversed(recs):
            with open(os.path.join(here, rec)) as fh:
                prev = json.load(fh)
            # the driver's record wraps the bench JSON line in its "tail"
            bench_lines = [
                l for l in prev.get("tail", "").splitlines() if l.startswith("{")
            ]
            if not bench_lines:
                continue
            prev_out = json.loads(bench_lines[-1])
            if prev_out.get("backend") != "tpu":
                continue
            out["last_tpu_bench"] = {
                "file": rec,
                "value": prev_out.get("value"),
                "vs_baseline": prev_out.get("vs_baseline"),
                "backend": prev_out.get("backend"),
            }
            break
    except Exception:
        pass
    return json.dumps(out)


def _json_probe(cmd, timeout_s, env):
    """Run a side-probe script in a bounded subprocess; return its last JSON
    stdout line (or an error marker). The probes (training step time/MFU,
    on-chip kernel revalidation) must never hang or fail the headline bench."""
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout_s, env=env)
        lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
        if lines:
            return json.loads(lines[-1])
        return {"error": (p.stderr.strip().splitlines() or ["no output"])[-1][:300]}
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout_s}s"}
    except Exception as e:  # noqa: BLE001
        return {"error": f"{type(e).__name__}: {e}"[:300]}


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--model":
        _run_single(sys.argv[2])
        return

    backend = _probe_backend()
    on_tpu = backend == "tpu"
    child_env = dict(os.environ)
    if backend is None:
        # tunnel down: pin the children to CPU (the axon plugin registers at
        # interpreter startup whenever PALLAS_AXON_TPU_GEN is present-and-
        # nonempty OR absent; set-but-empty is the clean kill-switch)
        child_env.update({"PALLAS_AXON_TPU_GEN": "", "JAX_PLATFORMS": "cpu"})
    # int8 weight-only 7B serves from one 16GB chip (bf16-7B needs TP over a
    # v5e-8 — the single tunnel chip can't hold it); 2b is the fallback
    candidates = ["mla-7b-int8", "mla-2b"] if on_tpu else ["mla-tiny"]

    # each candidate runs in its own process so a failed (e.g. OOM) attempt's
    # device allocations are fully released before the fallback runs
    last_err = None
    for model_id in candidates:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--model", model_id],
            capture_output=True, text=True, timeout=7200, env=child_env,
        )
        lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if proc.returncode == 0 and lines:
            out_line = lines[-1]
            if on_tpu:
                # chip-only side measurements (VERDICT r3 items 2-3), each
                # bounded and failure-tolerant so they can't sink the
                # headline: one real mla-small train step (step time /
                # tokens-per-s / MFU) + Pallas kernel revalidation at real
                # tile shapes (interpret mode can't catch TPU tiling bugs)
                here = os.path.dirname(os.path.abspath(__file__))
                # headline training probe: the LARGEST single-chip-trainable
                # scale (mla-2b, ~1.6B decoder params, masked adafactor —
                # fp32 Adam moments don't fit beside the bf16 params at this
                # scale; VERDICT r4 #1). mla-small stays alongside for
                # continuity with earlier rounds.
                training = _json_probe(
                    [sys.executable, os.path.join(here, "scripts", "tpu_smoke.py"),
                     "--model", "mla-2b", "--optimizer", "adafactor",
                     "--batch", "8", "--steps", "5"],
                    timeout_s=2700, env=child_env,
                )
                training_small = _json_probe(
                    [sys.executable, os.path.join(here, "scripts", "tpu_smoke.py"),
                     "--model", "mla-small", "--batch", "8", "--steps", "6"],
                    timeout_s=1800, env=child_env,
                )
                kernels = _json_probe(
                    [sys.executable, os.path.join(here, "scripts", "kernel_check.py")],
                    timeout_s=1800, env=child_env,
                )
                try:
                    merged = json.loads(out_line)
                    merged["training"] = training
                    merged["training_small"] = training_small
                    merged["kernel_revalidation"] = kernels
                    out_line = json.dumps(merged)
                except json.JSONDecodeError:
                    pass
            print(_augment_degraded(out_line, on_tpu, backend))
            return
        last_err = (proc.stderr.strip().splitlines() or ["unknown"])[-1]
    print(json.dumps({"metric": "action_chunks_per_sec_chip", "value": 0.0,
                      "unit": "chunks/s", "vs_baseline": 0.0, "error": str(last_err)[:400]}))


if __name__ == "__main__":
    main()
