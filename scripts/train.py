"""Training entry point.

Parity target: reference scripts/train.py train() (:157-429) — run-dir
setup, model build/load, stage inference from freeze flags, dataset +
collator wiring, strategy setup, and the training loop; driven by the
conf/vla.py experiment registry with --key value overrides.

Usage:
    python scripts/train.py --vla.type prism-dinosiglip-224px+oxe+diffusion \
        --vla.per_device_batch_size 8 --data_root_dir /data/rlds \
        [--model mla-7b] [--max_steps 1000] [--dp 1] [--tp 1]

Stage matrix (reference launch scripts scripts/{pretrain,sft_*,post_*}.sh):
    pretrain      : everything trainable, contrastive on
    sft/finetune  : --vla.freeze_vision_tower true
    post-training : --use_generation true --gen_image/--gen_pointcloud/...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import signal
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="MLA-TPU trainer")
    p.add_argument("--vla.type", dest="vla_type", default="prism-dinosiglip-224px+oxe+diffusion")
    p.add_argument("--model", default=None, help="model registry id (default: config.base_vlm)")
    p.add_argument("--data_root_dir", default=None, help="RLDS/TFDS data root (dummy data if unset)")
    p.add_argument("--dp", type=int, default=1, help="data-parallel (DCN) mesh axis")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh axis")
    p.add_argument("--hf_llama_dir", default=None, help="HF Llama base weights to initialize from")
    p.add_argument("--vlm_stage", default=None, choices=["align", "finetune"],
                   help="run the VLM-pretraining loop (reference run_training, "
                        "base_strategy_mla.py:124-247) instead of the VLA loop: "
                        "align = projector warmup, finetune = instruct tuning")
    p.add_argument("--vlm_dataset", default="llava-v15",
                   help="conf/datasets.py dataset id for --vlm_stage")
    p.add_argument("--vlm_max_length", type=int, default=512,
                   help="pad/truncate length for the LM collator (--vlm_stage)")
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer path/id for --vlm_stage (default: the "
                        "deterministic SimpleTokenizer — data-free smokes)")
    args, unknown = p.parse_known_args(argv)

    # --vla.foo bar / --foo bar overrides onto VLATrainConfig
    overrides = {}
    i = 0
    while i < len(unknown):
        key = unknown[i]
        if not key.startswith("--"):
            raise ValueError(f"unexpected arg {key}")
        key = key[2:]
        if key.startswith("vla."):
            key = key[4:]
        if i + 1 < len(unknown) and not unknown[i + 1].startswith("--"):
            val = unknown[i + 1]
            i += 2
        else:
            val = "true"
            i += 1
        overrides[key] = val
    return args, overrides


def _coerce(cfg_cls, overrides):
    import typing

    fields = {f.name: f for f in dataclasses.fields(cfg_cls)}
    out = {}
    for k, v in overrides.items():
        if k not in fields:
            raise ValueError(f"unknown override --{k} (valid: {sorted(fields)})")
        t = fields[k].type
        if isinstance(v, str):
            tl = str(t)
            if "bool" in tl:
                v = v.lower() in ("1", "true", "yes")
            elif "int" in tl:
                v = int(v) if v.lower() != "none" else None
            elif "float" in tl:
                v = float(v)
        out[k] = v
    return out


def train_vlm(args, overrides):
    """VLM-pretraining loop — parity target: reference `run_training`
    (training/strategies/base_strategy_mla.py:124-247): map-style LLaVA-era
    data (conf/datasets.py stage components) through SplitModalitySampler +
    PaddedCollatorForLanguageModeling into the SAME jitted train step the
    VLA path uses, with the AR CE objective (use_diff=False). Multimodal
    batches splice the image token block right after BOS (the reference's
    'insert after the BOS token' layout, via build_splice_map with d=0);
    language-only batches take vlm_forward's unimodal branch (the
    reference's empty-multimodal_indices branch, prismatic.py:911-924).

    Dummy-data mode (no --data_root_dir) synthesizes LLaVA-schema examples
    so the loop is smoke-testable end-to-end without the LLaVA downloads.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mla_tpu.conf.datasets import get_dataset_config
    from mla_tpu.conf.models import get_model_config
    from mla_tpu.diffusion import gaussian as gd
    from mla_tpu.models import prismatic
    from mla_tpu.parallel import make_mesh, shard_batch
    from mla_tpu.training import checkpointing as ckpt_mod
    from mla_tpu.training import metrics as metrics_mod
    from mla_tpu.training import optim, strategy
    from mla_tpu.utils import initialize_overwatch, set_global_seed
    from mla_tpu.vla.sampler import SplitModalitySampler
    from mla_tpu.vla.tokenizer import SimpleTokenizer, load_llama_tokenizer
    from mla_tpu.vla.vlm_datasets import get_vlm_dataset_and_collator

    overwatch = initialize_overwatch("train-vlm")
    stage = f"vlm-{args.vlm_stage}"
    model_id = args.model or "mla-7b"

    def g(k, d):
        if k not in overrides:
            return d
        v = overrides[k]
        if isinstance(d, bool):
            return str(v).lower() in ("1", "true", "yes")
        return type(d)(v)
    seed = g("seed", 7)
    epochs = g("epochs", 1)
    max_steps = g("max_steps", 0) or None
    global_batch_size = g("global_batch_size", 4)
    learning_rate = g("learning_rate", 1e-3 if args.vlm_stage == "align" else 2e-5)
    run_root_dir = g("run_root_dir", "runs")

    # vision-language only: no pointcloud / diffusion / contrastive heads
    cfg = get_model_config(
        model_id, use_diff=False, use_pointcloud=False, use_tactile=False,
        use_contrastive=False, use_generation=False,
    )
    rng = set_global_seed(seed)
    init_key, rng = jax.random.split(rng)
    params, mstate = prismatic.mla_model_init(init_key, cfg)
    if args.hf_llama_dir:
        from mla_tpu.models import load as load_mod

        params = load_mod.load_base_llm(args.hf_llama_dir, cfg, params)

    tokenizer = (
        load_llama_tokenizer(args.tokenizer) if args.tokenizer else SimpleTokenizer()
    )
    ds, collator = get_vlm_dataset_and_collator(
        stage=args.vlm_stage,
        dataset_cfg=get_dataset_config(args.vlm_dataset),
        data_root_dir=args.data_root_dir,
        tokenizer=tokenizer,
        image_size=cfg.vision.image_size,
        max_length=args.vlm_max_length,
    )
    lengths = (
        ds.get_modality_lengths(n_image_patches=cfg.fused_len)
        if args.vlm_stage == "align" else ds.get_modality_lengths()
    )
    sampler = SplitModalitySampler(
        lengths, global_batch_size=global_batch_size,
        num_replicas=jax.process_count(), rank=jax.process_index(),
        seed=seed, drop_last=False,
    )
    per_host = global_batch_size // jax.process_count()
    steps_per_epoch = max(len(sampler) // per_host, 1)
    num_steps = max_steps or epochs * steps_per_epoch
    overwatch.info(
        f"VLM {stage} :: model={model_id} dataset={args.vlm_dataset} "
        f"examples={len(ds)} gbs={global_batch_size} steps={num_steps}"
    )

    tcfg = strategy.TrainConfig(
        learning_rate=learning_rate, grad_accumulation_steps=1,
        repeated_diffusion_steps=1, stage=stage,
        num_training_steps=num_steps,
        enable_gradient_checkpointing=g("enable_gradient_checkpointing", True),
    )
    tx, schedule, _ = optim.make_optimizer(
        params, learning_rate=learning_rate, num_training_steps=num_steps,
        stage=stage,
    )
    sched = gd.create_schedule("", diffusion_steps=100)
    mesh = make_mesh(dp=args.dp, tp=args.tp,
                     fsdp=len(jax.devices()) // (args.dp * args.tp))
    state = strategy.shard_train_state(
        strategy.init_train_state(params, tx, mstate), mesh, use_tp=args.tp > 1
    )
    del params, mstate
    step_fn = strategy.make_train_step(cfg, tcfg, tx, sched, mesh)

    run_id = g("run_id", f"vlm-{args.vlm_stage}+{args.vlm_dataset}+x{seed}")
    run_dir = Path(run_root_dir) / run_id
    metrics = metrics_mod.VLAMetrics(
        g("trackers", "jsonl").split(","), run_id, run_dir,
        hparams={"stage": stage, "dataset": args.vlm_dataset,
                 "global_batch_size": global_batch_size, "lr": learning_rate},
        flops_per_token=metrics_mod.decoder_flops_per_token(
            state["params"]["llm_backbone"], use_diff=False
        ),
        peak_flops=(metrics_mod.TPU_V5E_BF16_PEAK_FLOPS * jax.device_count()
                    if jax.default_backend() == "tpu" else None),
    )

    def model_batch(cb):
        """Collator output -> vlm_forward batch. SplitModalitySampler batches
        are modality-homogeneous: all-multimodal or all-unimodal."""
        n_mm = len(cb["multimodal_indices"])
        B = cb["input_ids"].shape[0]
        assert n_mm in (0, B), f"mixed-modality batch ({n_mm}/{B} multimodal)"
        out = {
            "input_ids": cb["input_ids"],
            "attention_mask": cb["attention_mask"],
            "labels": cb["labels"],
        }
        if n_mm:
            out["images"] = {"front_image": cb["pixel_values"]}
            # fused block goes right after BOS; no diffusion block (d=0)
            out["splice_idx"] = np.ones((B,), np.int32)
        return out

    step = 0
    for epoch in range(epochs if max_steps is None else 10**6):
        sampler.set_epoch(epoch)
        idx_iter = list(iter(sampler))
        for bstart in range(0, len(idx_iter) - per_host + 1, per_host):
            rows = [ds[i] for i in idx_iter[bstart : bstart + per_host]]
            host_batch = model_batch(collator(rows))
            batch = shard_batch(
                jax.tree_util.tree_map(jnp.asarray, host_batch), mesh
            )
            step_key = jax.random.fold_in(rng, step)
            state, step_metrics = step_fn(state, batch, step_key)
            metrics.commit(
                global_step=step, epoch=epoch, lr=float(schedule(step)),
                update_step_time=True,
                tokens=int(host_batch["input_ids"].shape[0])
                * jax.process_count() * int(host_batch["input_ids"].shape[1]),
                **{k: v for k, v in step_metrics.items()},
            )
            if step % 10 == 0 or step == num_steps - 1:
                overwatch.info(metrics.push())
            step += 1
            if step >= num_steps:
                break
        if step >= num_steps:
            break
    ckpt_mod.save_checkpoint(
        run_dir, state, step=step, epoch=epoch,
        loss=float(step_metrics["total_loss"]), model_cfg=cfg, async_save=False,
    )
    metrics.finalize()
    overwatch.info("done")


def main(argv=None):
    args, overrides = parse_args(argv)

    if args.vlm_stage:
        return train_vlm(args, overrides)

    import jax

    from mla_tpu.conf.models import get_model_config
    from mla_tpu.conf.vla import get_vla_config
    from mla_tpu.diffusion import gaussian as gd
    from mla_tpu.models import load as load_mod
    from mla_tpu.models import prismatic
    from mla_tpu.parallel import make_mesh, shard_batch
    from mla_tpu.parallel.mesh import initialize_distributed
    from mla_tpu.training import checkpointing as ckpt_mod
    from mla_tpu.training import optim, strategy
    from mla_tpu.training import metrics as metrics_mod
    from mla_tpu.training.metrics import VLAMetrics
    from mla_tpu.utils import initialize_overwatch, set_global_seed
    from mla_tpu.vla.materialize import get_vla_dataset_and_collator

    overwatch = initialize_overwatch("train")
    initialize_distributed()

    tc0 = get_vla_config(args.vla_type)
    tc = get_vla_config(args.vla_type, **_coerce(type(tc0), overrides))
    model_id = args.model or tc.base_vlm
    stage = tc.stage
    overwatch.info(f"MLA-TPU :: vla={tc.vla_id} model={model_id} stage={stage}")
    if tc.unfreeze_last_llm_layer:
        # accepted for config parity; the reference also only LOGS this flag
        # (scripts/train.py:320 — no freeze path consumes it), and our
        # scan-stacked decoder layers share one leaf, so a last-layer-only
        # mask is not expressible. Warn instead of silently ignoring.
        overwatch.warning(
            "unfreeze_last_llm_layer is inert (as in the reference, whose "
            "freeze logic never reads it); with freeze_llm_backbone=true the "
            "WHOLE decoder stays frozen"
        )

    # --- run dir -----------------------------------------------------------
    run_id = tc.run_id or f"{tc.vla_id}+n{jax.process_count()}+b{tc.per_device_batch_size}+x{tc.seed}"
    run_dir = Path(tc.run_root_dir) / run_id
    rng = set_global_seed(tc.seed)

    # --- model -------------------------------------------------------------
    cfg = get_model_config(
        model_id,
        use_diff=tc.use_diff,
        use_pointcloud=tc.use_pointcloud,
        use_tactile=tc.use_tactile,
        use_contrastive=tc.use_contrastive,
        use_generation=tc.use_generation,
        use_roi=tc.use_roi,
        camera_name=tc.camera_name,
        action_dim=tc.action_dim,
        future_action_window_size=tc.future_action_window_size,
        class_dropout_prob=tc.class_dropout_prob,
        num_extra_views=tc.num_extra_views,
    )
    if tc.use_generation:
        # stage flags gen_image/gen_pointcloud/gen_tactile map onto gen cfg
        gen = dataclasses.replace(
            cfg.gen, use_image=tc.gen_image, use_pointcloud=tc.gen_pointcloud,
            use_tactile=tc.gen_tactile,
        )
        cfg = dataclasses.replace(cfg, gen=gen)

    # training keeps fp32 MASTER weights (the reference's FSDP MixedPrecision
    # casts bf16 for compute but AdamW steps fp32 originals, fsdp.py:184-199);
    # compute stays bf16 via compute_dtype
    import jax.numpy as jnp

    if tc.enable_mixed_precision_training and cfg.llama.param_dtype != jnp.float32:
        cfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(cfg.llama, param_dtype=jnp.float32)
        )

    if tc.pretrained_checkpoint:
        params, mstate, cfg, _stats = load_mod.load_vla(
            tc.pretrained_checkpoint, model_id=model_id, load_for_training=True
        )
    else:
        init_key, rng = jax.random.split(rng)
        params, mstate = prismatic.mla_model_init(init_key, cfg)
        if args.hf_llama_dir:
            params = load_mod.load_base_llm(args.hf_llama_dir, cfg, params)

    # --- strategy sizing ----------------------------------------------------
    n_devices = len(jax.devices())
    mesh = make_mesh(dp=args.dp, tp=args.tp, fsdp=n_devices // (args.dp * args.tp))
    global_bsz_per_step = tc.per_device_batch_size * n_devices
    grad_accum = max(tc.global_batch_size // global_bsz_per_step, 1)
    per_host_batch = tc.per_device_batch_size * jax.local_device_count() * grad_accum

    # --- data --------------------------------------------------------------
    dataset, collator, dataset_statistics, dataset_len = get_vla_dataset_and_collator(
        data_root_dir=args.data_root_dir,
        data_mix=tc.data_mix,
        model_cfg=cfg,
        per_host_batch_size=per_host_batch,
        shuffle_buffer_size=tc.shuffle_buffer_size,
        action_tokenizer_exist=tc.action_tokenizer_exist,
        seed=tc.seed,
    )
    # epoch length from the REAL interleaved-mixture transition count when
    # the pipeline knows it; the shuffle-buffer heuristic only remains for
    # the synthetic DummyDataset (which has no epoch boundary at all)
    steps_per_epoch = max(
        (dataset_len or tc.shuffle_buffer_size) // tc.global_batch_size, 1
    )
    num_steps = tc.max_steps or (tc.epochs * steps_per_epoch)
    ckpt_mod.write_run_metadata(run_dir, tc, cfg, dataset_statistics)

    train_cfg = strategy.TrainConfig(
        learning_rate=tc.learning_rate,
        weight_decay=tc.weight_decay,
        max_grad_norm=tc.max_grad_norm,
        lr_scheduler_type=tc.lr_scheduler_type,
        warmup_ratio=tc.warmup_ratio,
        num_training_steps=num_steps,
        grad_accumulation_steps=grad_accum,
        repeated_diffusion_steps=tc.repeated_diffusion_steps,
        stage=stage,
        use_ema=tc.use_ema,
        enable_gradient_checkpointing=tc.enable_gradient_checkpointing,
    )
    extra_frozen = ("llm_backbone",) if tc.freeze_llm_backbone else ()
    if cfg.use_diff:
        # diffusion-mode training discards the LM CE from the total exactly
        # like the reference (model_mla.py:206-216), so lm_head receives no
        # gradient — freeze it (no Adam state, no zero-grad clip-norm work)
        extra_frozen = extra_frozen + ("lm_head",)
    tx, schedule, _ = optim.make_optimizer(
        params,
        learning_rate=tc.learning_rate,
        weight_decay=tc.weight_decay,
        max_grad_norm=tc.max_grad_norm,
        lr_scheduler_type=tc.lr_scheduler_type,
        warmup_ratio=tc.warmup_ratio,
        num_training_steps=num_steps,
        stage=stage,
        extra_frozen=extra_frozen,
    )
    sched = gd.create_schedule("", diffusion_steps=100)
    state = strategy.init_train_state(params, tx, mstate, use_ema=tc.use_ema)
    state = strategy.shard_train_state(state, mesh, use_tp=args.tp > 1)
    del params, mstate
    step_fn = strategy.make_train_step(cfg, train_cfg, tx, sched, mesh)
    viz_fn = None  # built lazily on first --visualize_interval cadence hit

    start_step = 0
    if tc.is_resume and (latest := ckpt_mod.latest_checkpoint(run_dir)) is not None:
        overwatch.info(f"resuming from {latest}")
        state = ckpt_mod.load_checkpoint(latest, state)
        start_step = int(state["step"])

    overwatch.info(
        f"GSPMD strategy :: mesh={dict(mesh.shape)} global_bsz={tc.global_batch_size} "
        f"per-device={tc.per_device_batch_size} grad_accum={grad_accum} steps={num_steps}"
    )

    # throughput observability: 6N model-FLOPs per token against the mesh's
    # total bf16 peak. The per-token FLOP accounting (which leaves count,
    # PaLM 6N convention) lives in ONE place —
    # training/metrics.decoder_flops_per_token — shared with tpu_smoke.py
    # and the bench training block so the three cannot drift.
    peak_flops = (
        metrics_mod.TPU_V5E_BF16_PEAK_FLOPS * jax.device_count()
        if jax.default_backend() == "tpu" else None
    )
    metrics = VLAMetrics(
        tc.trackers.split(","), run_id, run_dir,
        hparams=dataclasses.asdict(tc), resume_step=start_step or None,
        flops_per_token=metrics_mod.decoder_flops_per_token(
            state["params"]["llm_backbone"], tc.use_diff
        ),
        peak_flops=peak_flops,
    )

    # --- preemption-safe checkpointing (beyond the reference's crash-and-
    # restart model, SURVEY §5): TPU-pod preemptions deliver SIGTERM with a
    # grace window. The handler only sets a flag — saving from inside a
    # signal frame would capture in-flight device state — and the loop
    # drains it at the next step boundary with ONE synchronous checkpoint,
    # then exits cleanly for `--is_resume true` to continue from.
    preempt = {"hit": False}

    def _on_preempt(signum, frame):
        # flag ONLY — a stream write here is not async-signal-safe (reentrant
        # BufferedWriter crash if the signal lands inside another log call);
        # the loop logs when it drains the flag
        preempt["hit"] = True

    prev_handlers = {
        s: signal.signal(s, _on_preempt) for s in (signal.SIGTERM, signal.SIGUSR1)
    }

    # --- loop (reference run_vla_training, base_strategy_mla.py:251-404) ---
    data_iter = iter(dataset)
    for step in range(start_step, num_steps):
        if collator is not None:
            host_batch = collator([next(data_iter) for _ in range(per_host_batch)])
        else:
            host_batch = next(data_iter)
        batch = shard_batch(host_batch, mesh)
        step_key = jax.random.fold_in(rng, step)
        state, step_metrics = step_fn(state, batch, step_key)
        # decoder tokens actually run this step: prompt + fused block
        # (+ the diffusion [proprio, t, x_0..15] splice, repeated
        # repeated_diffusion_steps times with independent noise/t draws)
        bsz, ids_len = host_batch["input_ids"].shape[:2]
        seq_len = ids_len + cfg.fused_len
        reps = 1
        if tc.use_diff:
            seq_len += 2 + cfg.action_horizon
            reps = tc.repeated_diffusion_steps
        metrics.commit(
            global_step=step, epoch=step // steps_per_epoch,
            lr=float(schedule(step)), update_step_time=True,
            # host_batch already spans the per-host accumulation rows
            # (per_host_batch above); scale to the global batch by host count
            tokens=bsz * jax.process_count() * reps * seq_len,
            **{k: v for k, v in step_metrics.items()},
        )
        if step % 10 == 0 or step == num_steps - 1:
            overwatch.info(metrics.push())
        saved_this_step = (step + 1) % tc.save_interval == 0 or step == num_steps - 1
        if saved_this_step:
            loss = float(step_metrics["total_loss"])
            ckpt_mod.save_checkpoint(
                run_dir, state, step=step + 1, epoch=0, loss=loss, model_cfg=cfg,
                async_save=tc.async_checkpoints,
            )
        if preempt["hit"]:
            if not saved_this_step:
                ckpt_mod.save_checkpoint(
                    run_dir, state, step=step + 1, epoch=0,
                    loss=float(step_metrics["total_loss"]), model_cfg=cfg,
                    async_save=False,
                )
            overwatch.info(f"preempted: checkpoint saved at step {step + 1}, exiting")
            break
        if (
            tc.visualize_interval
            and cfg.use_generation
            and (step + 1) % tc.visualize_interval == 0
        ):
            if viz_fn is None:
                viz_fn = strategy.make_visualize_step(cfg, sched)
            from mla_tpu.utils.visualize import save_generation_visualization

            gen_outs = jax.device_get(viz_fn(state, batch, step_key))
            save_generation_visualization(
                gen_outs,
                host_batch.get("next_images"),
                host_batch.get("next_point_cloud"),
                run_dir / "visualizations",
                step=step + 1,
                image_patch_size=cfg.gen.image.image_patch_size,
            )
    for s, h in prev_handlers.items():
        signal.signal(s, h)
    ckpt_mod.wait_for_async_saves()
    metrics.finalize()
    overwatch.info("done")


if __name__ == "__main__":
    main()
