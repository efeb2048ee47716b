"""Optimizer construction: AdamW with decay/no-decay groups, warmup-cosine
or constant schedules, global-norm clipping, and trainable-module masking.

Parity target: reference training/strategies/fsdp.py:228-306 —
  * no weight decay for params with ndim <= 1 or '.bias' names,
  * 'linear-warmup+cosine-decay' (HF get_cosine_schedule_with_warmup,
    decaying to 0) or 'constant',
  * grad clip by global norm (fsdp.py clip_grad_norm),
and the stage-wise freezing of freeze_backbones (prismatic.py:415-529),
realized here as an optax mask over module paths instead of requires_grad_.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from mla_tpu.utils.tree import map_with_path

# torch rule: ndim <= 1 or name ends in .bias -> no decay. Our functional
# equivalents: 'b' leaves (biases), norm/bn 'scale'/'bias' leaves, 1-d
# embeddings. We decide by path suffix + stacked-aware effective ndim.
_NO_DECAY_KEYS = ("scale", "bias", "class_embedding", "split_embedding", "uncondition")


def is_no_decay(path: str, leaf) -> bool:
    last = path.rsplit("/", 1)[-1]
    if last == "b" or last in _NO_DECAY_KEYS:
        return True
    # scan-stacked llama layers add a leading L axis; effective ndim is
    # ndim-1 there (but NOT for python-list "layers" like the projector's)
    eff_ndim = leaf.ndim - (1 if "llm_backbone/layers/" in path else 0)
    return eff_ndim <= 1


# --- stage freezing (reference freeze_backbones, prismatic.py:415-529) ------

STAGE_FROZEN_MODULES = {
    # stage -> top-level module keys frozen in the reference
    "pretrain": (),
    "finetune": ("vision_tower_2d", "vision_tower_3d"),
    "post-training": ("vision_tower_2d", "vision_tower_3d"),
    # VLM-pretraining stages (reference run_training,
    # base_strategy_mla.py:124-247; LLaVA-lineage freeze recipe):
    # align = projector warmup (vision + LLM frozen, projectors train),
    # vlm-finetune = instruct tuning with the vision towers frozen
    "vlm-align": ("vision_tower_2d", "vision_tower_3d", "llm_backbone"),
    "vlm-finetune": ("vision_tower_2d", "vision_tower_3d"),
}


def trainable_mask(params: Any, stage: str = "pretrain", extra_frozen: Sequence[str] = ()) -> Any:
    """True = trained. The z_embedder 'uncondition' zeros buffer is always
    frozen (a non-Parameter buffer in the reference, models.py:76)."""
    if stage not in STAGE_FROZEN_MODULES:
        # a typo'd stage silently training everything would also change the
        # masked opt_state layout vs correctly-spelled runs (resume breaks);
        # the reference's freeze_backbones raises on unknown stages too
        raise ValueError(
            f"unknown stage {stage!r}; expected one of {sorted(STAGE_FROZEN_MODULES)}"
        )
    frozen = set(STAGE_FROZEN_MODULES[stage]) | set(extra_frozen)

    def decide(path: str, leaf) -> bool:
        # a frozen name matches any path segment ("lm_head" freezes
        # llm_backbone/lm_head/*), not just the top-level module
        if any(seg in frozen for seg in path.split("/")):
            return False
        if path.endswith("uncondition"):
            return False
        return True

    return map_with_path(decide, params)


def make_lr_schedule(
    lr_scheduler_type: str,
    learning_rate: float,
    num_training_steps: int,
    warmup_ratio: float = 0.0,
) -> optax.Schedule:
    if lr_scheduler_type == "linear-warmup+cosine-decay":
        warmup = int(num_training_steps * warmup_ratio)
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=max(warmup, 1),
            decay_steps=num_training_steps,
            end_value=0.0,
        )
    if lr_scheduler_type == "constant":
        return optax.constant_schedule(learning_rate)
    raise ValueError(f"LR schedule `{lr_scheduler_type}` is not supported!")


def make_optimizer(
    params: Any,
    *,
    learning_rate: float = 2e-5,
    weight_decay: float = 0.0,
    max_grad_norm: float = 1.0,
    lr_scheduler_type: str = "constant",
    warmup_ratio: float = 0.0,
    num_training_steps: int = 1000,
    stage: str = "pretrain",
    extra_frozen: Sequence[str] = (),
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    optimizer: str = "adamw",
):
    """Returns (tx, schedule_fn, mask_tree). Frozen leaves receive zero
    updates (and no decay), equivalent to requires_grad_=False + param
    groups in the reference.

    optimizer='adafactor' swaps adamw for factored-second-moment Adafactor
    inside the SAME masked layout — the single-chip rung for billion-param
    models (fp32 Adam moments at mla-2b are ~15 GB and do not fit the 16 GB
    dev chip beside the bf16 params; factored moments do)."""
    schedule = make_lr_schedule(lr_scheduler_type, learning_rate, num_training_steps, warmup_ratio)
    train_mask = trainable_mask(params, stage, extra_frozen)
    # decay only trainable leaves: masked-out leaves are MaskedNode inside
    # optax.masked, and add_decayed_weights must not touch them
    decay_mask = jax.tree_util.tree_map(
        lambda d, t: bool(d and t),
        map_with_path(lambda p, x: not is_no_decay(p, x), params),
        train_mask,
    )

    # optax.masked: frozen leaves never enter the clip/adam pipeline — the
    # global norm is computed over TRAINABLE params only, matching the
    # reference (frozen torch params have requires_grad=False -> grad None
    # -> excluded from FSDP clip_grad_norm_). NOTE this is a behavior
    # change vs the pre-round-3 chain, which clipped by the norm INCLUDING
    # frozen-module grads before zeroing them: freeze-stage runs now take
    # the reference's (larger) effective steps. For diffusion-mode
    # lm_head (grads identically zero) numerics are unchanged. Masking
    # also allocates no Adam state for frozen leaves (~1.5 GB for the
    # 131M-param lm_head) and stops XLA constant-folding a 131M-element
    # zero-grad norm at compile time (an 83 s stall in the multichip
    # dryrun). _zero_frozen then kills the passed-through raw grads of the
    # frozen leaves.
    if optimizer == "adafactor":
        if weight_decay:
            # optax.adafactor applies weight_decay_rate AFTER its internal
            # lr scaling — a constant, schedule-independent per-step shrink
            # (wd=0.01 decays params 1%/step at ANY lr), NOT the lr-scaled
            # decoupled decay the same argument means under adamw. Refuse
            # rather than silently change semantics between the two.
            raise ValueError(
                "weight_decay with optimizer='adafactor' is not supported: "
                "optax.adafactor's weight_decay_rate is a constant per-step "
                "shrink, not adamw's lr-scaled decoupled decay. Use adamw, "
                "or set weight_decay=0 and add schedule-scaled decay "
                "explicitly."
            )
        inner = optax.adafactor(learning_rate=schedule)
    elif optimizer == "adamw":
        inner = optax.adamw(
            learning_rate=schedule, b1=b1, b2=b2, eps=eps,
            weight_decay=weight_decay, mask=decay_mask,
        )
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    tx = optax.chain(
        optax.masked(
            optax.chain(
                optax.clip_by_global_norm(max_grad_norm),
                inner,
            ),
            train_mask,
        ),
        _zero_frozen(train_mask),
    )
    return tx, schedule, train_mask


def _zero_frozen(train_mask: Any) -> optax.GradientTransformation:
    """Zero the final updates of frozen leaves."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        new = jax.tree_util.tree_map(
            lambda u, m: u if m else jnp.zeros_like(u), updates, train_mask
        )
        return new, state

    return optax.GradientTransformation(init_fn, update_fn)
