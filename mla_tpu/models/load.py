"""Model loading: run dirs, reference checkpoints, HF bases.

Parity target: reference models/load.py —
  * load_vla (:253-369): MLA from a run dir (config.json +
    dataset_statistics.json + checkpoints/*.pt) -> ready policy
  * load (:52-140): base VLM from an HF-style directory
  * the module-keyed permissive loading of model_mla.py:311-492.

This loader reads BOTH our orbax run dirs and the reference's torch run
dirs (auto-detected), so a user can point it at an existing reference
checkpoint and get a TPU policy back.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu.conf.models import MODEL_REGISTRY, get_model_config
from mla_tpu.models import convert, prismatic
from mla_tpu.models.mla import MLAPolicy
from mla_tpu.utils.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)

_MODEL_FLAG_KEYS = (
    "use_diff", "use_pointcloud", "use_tactile", "use_contrastive",
    "use_generation", "use_roi", "camera_name", "action_dim",
    "future_action_window_size", "class_dropout_prob",
)


def _read_json(path: Path) -> Optional[Dict]:
    try:
        return json.loads(Path(path).read_text())
    except Exception:
        return None


def load_vla(
    checkpoint_or_run_dir,
    *,
    model_id: Optional[str] = None,
    tokenizer=None,
    load_for_training: bool = False,
    use_ema: bool = False,
    **flag_overrides,
) -> MLAPolicy | Tuple[Dict[str, Any], Dict[str, Any], Any, Dict]:
    """Build an MLA policy from a run directory or checkpoint path.

    Accepts:
      * our run dir (config.json with {"train": ..., "model": ...} + orbax
        checkpoints/),
      * a reference run dir (config.json + dataset_statistics.json +
        checkpoints/*.pt),
      * a bare reference .pt file.

    With load_for_training=True returns (params, state, cfg, norm_stats)
    instead of a policy.

    use_ema=True serves the exponential-moving-average weights a --use_ema
    training run maintains (reference update_ema,
    training/strategies/base_strategy_mla.py:32-41); requires a full
    train-state orbax checkpoint that carries `ema_params`."""
    path = Path(checkpoint_or_run_dir)
    run_dir = path if path.is_dir() else path.parent.parent
    norm_stats = _read_json(run_dir / "dataset_statistics.json") or {}
    run_config = _read_json(run_dir / "config.json") or {}

    flags = {}
    cfg_src = run_config.get("train", run_config)
    for k in _MODEL_FLAG_KEYS:
        if isinstance(cfg_src, dict) and k in cfg_src:
            flags[k] = cfg_src[k]
    flags.update(flag_overrides)
    if model_id is None:
        # our run dirs record the model under train.base_vlm (scripts/train.py
        # config dump); the reference's base_vlm id is registered too. Fall
        # back to the 7B flagship for bare reference .pt checkpoints.
        recorded = cfg_src.get("base_vlm") if isinstance(cfg_src, dict) else None
        model_id = recorded if recorded in MODEL_REGISTRY else "mla-7b"
    cfg = get_model_config(model_id, **flags)

    params, state = prismatic.mla_model_init(jax.random.PRNGKey(0), cfg)

    ckpt_path = _resolve_checkpoint(path)
    if use_ema and (ckpt_path is None or ckpt_path.suffix == ".pt"):
        raise ValueError(
            "use_ema=True needs a full train-state orbax checkpoint with "
            f"ema_params; got {ckpt_path} (reference-format .pt checkpoints "
            "carry no EMA state)"
        )
    if ckpt_path is None:
        overwatch.warning(f"no checkpoint found under {path}; random init")
    elif ckpt_path.suffix == ".pt":
        overwatch.info(f"loading reference-format checkpoint {ckpt_path}")
        host_params = jax.tree_util.tree_map(np.asarray, params)
        host_state = jax.tree_util.tree_map(np.asarray, state)
        params, state = convert.load_reference_checkpoint(
            ckpt_path, cfg, base_params=host_params, base_state=host_state
        )
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype=cfg.llama.param_dtype)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else jnp.asarray(x),
            params,
        )
        state = jax.tree_util.tree_map(jnp.asarray, state)
    else:
        overwatch.info(f"loading orbax checkpoint {ckpt_path}")
        from mla_tpu.training import checkpointing as ckpt_mod

        # the checkpointed opt_state's STRUCTURE depends on the run's frozen
        # modules (optax.masked stores leafless MaskedNodes there): rebuild
        # the same stage/extra_frozen layout scripts/train.py used from the
        # run's recorded train config — the default (unmasked) mask would
        # make orbax reject every diffusion-mode checkpoint (lm_head
        # frozen). The unmasked layout stays as a fallback for checkpoints
        # produced outside the trainer.
        from mla_tpu.training import optim, strategy

        layouts = [_run_optimizer_layout(cfg_src, cfg)]
        if layouts[0] != ("pretrain", ()):
            layouts.append(("pretrain", ()))

        def _try_full_restore(with_ema: bool):
            err = None
            for st, ef in layouts:
                tx, _, _ = optim.make_optimizer(
                    params, num_training_steps=1, stage=st, extra_frozen=ef
                )
                full = strategy.init_train_state(params, tx, state, use_ema=with_ema)
                try:
                    return ckpt_mod.load_checkpoint(ckpt_path, full)
                except Exception as e:
                    err = e
            raise err

        if use_ema:
            # EMA weights only exist in full train-state checkpoints
            try:
                full_restored = _try_full_restore(with_ema=True)
            except Exception as e:
                raise ValueError(
                    f"use_ema=True but {ckpt_path} holds no ema_params "
                    "(was the run trained with --use_ema?)"
                ) from e
            restored = {
                "params": full_restored["ema_params"],
                "model_state": full_restored["model_state"],
            }
        else:
            abstract = {"params": params, "model_state": state}
            try:
                restored = ckpt_mod.load_checkpoint(ckpt_path, abstract)
            except Exception:
                # full train-state checkpoints include optimizer state etc.
                # (and --use_ema runs additionally carry ema_params)
                try:
                    full_restored = _try_full_restore(with_ema=False)
                except Exception:
                    full_restored = _try_full_restore(with_ema=True)
                restored = {
                    "params": full_restored["params"],
                    "model_state": full_restored["model_state"],
                }
        params, state = restored["params"], restored["model_state"]

    if load_for_training:
        return params, state, cfg, norm_stats
    return MLAPolicy(params, state, cfg, tokenizer=tokenizer, norm_stats=norm_stats)


def _run_optimizer_layout(cfg_src, cfg) -> tuple:
    """(stage, extra_frozen) exactly as scripts/train.py constructed them,
    reconstructed from the run's recorded train config (conf/vla.py stage
    inference + the diffusion-mode lm_head freeze)."""
    src = cfg_src if isinstance(cfg_src, dict) else {}
    if src.get("use_generation"):
        stage = "post-training"
    elif src.get("freeze_vision_tower"):
        stage = "finetune"
    else:
        stage = "pretrain"
    extra_frozen = ("llm_backbone",) if src.get("freeze_llm_backbone") else ()
    if cfg.use_diff:
        extra_frozen = extra_frozen + ("lm_head",)
    return stage, extra_frozen


def _resolve_checkpoint(path: Path) -> Optional[Path]:
    if path.is_file() and path.suffix == ".pt":
        return path
    if path.is_dir() and (path / "checkpoints").exists():
        from mla_tpu.training.checkpointing import latest_checkpoint

        latest = latest_checkpoint(path)
        if latest is not None and latest.exists():
            return latest
        pts = sorted((path / "checkpoints").glob("*.pt"))
        if pts:
            return pts[-1]
    if path.is_dir():
        # orbax checkpoint dir given directly
        if any(path.glob("*")):
            metas = list(path.glob("_CHECKPOINT_METADATA")) + list(path.glob("manifest.ocdbt"))
            if metas or (path / "d").exists():
                return path
    return None


def load_openvla(
    model_dir,
    cfg: prismatic.MLAModelConfig,
    params: Dict[str, Any],
    *,
    vision_backbone_id: str = "dinosiglip-vit-so-224px",
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Import an OpenVLA-style safetensors checkpoint (reference
    load_openvla, models/load.py:143-250): merge the shards, split by module
    prefix ('language_model' -> llm, 'vision_backbone.featurizer' /
    '.fused_featurizer' -> dino/siglip ViTs, 'projector.fcN').

    Returns (params, legacy) where `params` has llm_backbone + projector
    loaded, and `legacy` carries the converted ViT backbones + fused
    projector for the legacy prediction paths (these towers are NOT in the
    encoder-free forward)."""
    from pathlib import Path

    from mla_tpu.models import vision_backbones as vb
    from mla_tpu.models.convert import _lin

    model_dir = Path(model_dir)
    merged = convert.merge_hf_shards(model_dir, bin_globs=("*.bin", "*.pt"))

    llm_sd = {k.replace("language_model.", ""): v for k, v in merged.items() if "language_model" in k}
    dino_sd = {
        k.replace("vision_backbone.featurizer.", ""): v
        for k, v in merged.items()
        if "vision_backbone.featurizer" in k
    }
    siglip_sd = {
        k.replace("vision_backbone.fused_featurizer.", ""): v
        for k, v in merged.items()
        if "vision_backbone.fused_featurizer" in k
    }
    proj_sd = {k.replace("projector.", ""): v for k, v in merged.items() if k.startswith("projector.")}

    params = dict(params)
    if llm_sd:
        params["llm_backbone"] = convert.convert_llama(
            llm_sd, cfg.llama.num_layers, prefix="", target_vocab=cfg.llama.vocab_size
        )

    legacy: Dict[str, Any] = {}
    fused_ids = vb.FUSED_BACKBONES.get(vision_backbone_id)
    if dino_sd and fused_ids:
        dino_cfg = vb.VIT_CONFIGS[fused_ids[0]]
        legacy["dino_featurizer"] = vb.convert_timm_vit(dino_sd, dino_cfg)
        legacy["dino_cfg"] = dino_cfg
    if siglip_sd and fused_ids:
        siglip_cfg = vb.VIT_CONFIGS[fused_ids[1]]
        legacy["siglip_featurizer"] = vb.convert_timm_vit(siglip_sd, siglip_cfg)
        legacy["siglip_cfg"] = siglip_cfg
    if proj_sd:
        # fused-gelu-mlp projector (util/nn_utils.py:37-53): fc1/fc2/fc3
        legacy["projector"] = {
            "fc1": _lin(proj_sd, "fc1"),
            "fc2": _lin(proj_sd, "fc2"),
            "fc3": _lin(proj_sd, "fc3"),
        }
    return params, legacy


def load_base_llm(hf_dir, cfg: prismatic.MLAModelConfig, params: Dict[str, Any]) -> Dict[str, Any]:
    """Load an HF Llama base (the reference `load()` base-VLM path) into an
    existing param tree, padding the vocab to cfg.llama.vocab_size."""
    llm = convert.load_hf_llama(hf_dir, cfg)
    params = dict(params)
    params["llm_backbone"] = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, cfg.llama.param_dtype), llm
    )
    return params
