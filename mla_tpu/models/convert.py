"""Checkpoint conversion: reference PyTorch checkpoints <-> our pytrees.

The reference's checkpoint layout is a public API this framework can read
and write (SURVEY.md section 5): a module-keyed dict
    {"model": {"llm_backbone": {...}, "vision_tower_2d": {...}, ...}}
saved by FSDPStrategy.save_checkpoint (training/strategies/fsdp.py:100-155),
plus config.json + dataset_statistics.json in the run dir
(models/load.py:253-369).

Conventions bridged here:
  * torch nn.Linear stores [out, in]; we store [in, out]  -> transpose
  * torch Conv1d/Conv2d 1x1 kernels [out, in, 1(,1)]      -> squeeze + T
  * the patchify conv [C, 3, 14, 14]                      -> [3*14*14, C]
  * per-layer llama modules                               -> scan-stacked [L, ...]
  * packed qkv (in_proj_weight)                           -> our qkv.w
  * BatchNorm running stats live in our model *state*, not params

All numeric work is numpy on host (torch is CPU-only in this image).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (host)."""
    if hasattr(x, "detach"):
        x = x.detach()
    if hasattr(x, "float") and str(getattr(x, "dtype", "")).startswith("torch.bfloat16"):
        x = x.float()
    return np.asarray(x.cpu().numpy() if hasattr(x, "cpu") else x)


def _lin(sd: Dict[str, Any], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    p = {"w": _t(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


def _ln(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _conv1x1(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    w = _t(sd[f"{prefix}.weight"])  # [out, in, 1] or [out, in, 1, 1]
    w = w.reshape(w.shape[0], w.shape[1]).T
    p = {"w": w}
    if f"{prefix}.bias" in sd:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


def _bn(sd: Dict[str, Any], prefix: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}
    state = {
        "mean": _t(sd[f"{prefix}.running_mean"]),
        "var": _t(sd[f"{prefix}.running_var"]),
    }
    return params, state


def _mha_packed(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.MultiheadAttention -> our {qkv, proj}."""
    return {
        "qkv": {
            "w": _t(sd[f"{prefix}.in_proj_weight"]).T,
            "b": _t(sd[f"{prefix}.in_proj_bias"]),
        },
        "proj": _lin(sd, f"{prefix}.out_proj"),
    }


def _decoder_layer(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """torch nn.TransformerDecoderLayer -> generation.decoder_layer params."""
    return {
        "self_attn": _mha_packed(sd, f"{prefix}.self_attn"),
        "cross_attn": _mha_packed(sd, f"{prefix}.multihead_attn"),
        "linear1": _lin(sd, f"{prefix}.linear1"),
        "linear2": _lin(sd, f"{prefix}.linear2"),
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "norm3": _ln(sd, f"{prefix}.norm3"),
    }


# --------------------------------------------------------------------------- #
# module converters (reference state_dict -> our params/state)
# --------------------------------------------------------------------------- #


def convert_llama(
    sd: Dict[str, Any], num_layers: int, prefix: str = "llm.",
    target_vocab: Optional[int] = None,
) -> Dict[str, Any]:
    """Modified LlamaForCausalLM (reference base_llm.py wraps it as `self.llm`)
    -> models/llama.py stacked pytree.

    `target_vocab` pads the embedding/lm_head rows with their means — the
    reference's smart_tokenizer_and_embedding_resize for <PAD>/<BOD>/<EOD>
    plus pad-to-64 (scripts/train.py:132-155, llama2.py:75-77)."""

    def k(s):
        return f"{prefix}{s}"

    def stack(fmt: str) -> np.ndarray:
        return np.stack([_t(sd[k(fmt.format(i=i))]).T for i in range(num_layers)])

    def stack_vec(fmt: str) -> np.ndarray:
        return np.stack([_t(sd[k(fmt.format(i=i))]) for i in range(num_layers)])

    embed_table = _t(sd[k("model.embed_tokens.weight")])
    lm_head_w = _t(sd[k("lm_head.weight")]).T
    if target_vocab is not None and embed_table.shape[0] < target_vocab:
        n_new = target_vocab - embed_table.shape[0]
        embed_pad = np.tile(embed_table.mean(axis=0, keepdims=True), (n_new, 1))
        embed_table = np.concatenate([embed_table, embed_pad], axis=0)
        head_pad = np.tile(lm_head_w.mean(axis=1, keepdims=True), (1, n_new))
        lm_head_w = np.concatenate([lm_head_w, head_pad], axis=1)

    return {
        "embed": {"table": embed_table},
        "layers": {
            "attn": {
                "q": {"w": stack("model.layers.{i}.self_attn.q_proj.weight")},
                "k": {"w": stack("model.layers.{i}.self_attn.k_proj.weight")},
                "v": {"w": stack("model.layers.{i}.self_attn.v_proj.weight")},
                "o": {"w": stack("model.layers.{i}.self_attn.o_proj.weight")},
            },
            "mlp": {
                "gate": {"w": stack("model.layers.{i}.mlp.gate_proj.weight")},
                "up": {"w": stack("model.layers.{i}.mlp.up_proj.weight")},
                "down": {"w": stack("model.layers.{i}.mlp.down_proj.weight")},
            },
            "input_ln": {"scale": stack_vec("model.layers.{i}.input_layernorm.weight")},
            "post_ln": {"scale": stack_vec("model.layers.{i}.post_attention_layernorm.weight")},
        },
        "final_ln": {"scale": _t(sd[k("model.norm.weight")])},
        "lm_head": {"w": lm_head_w},
    }


def convert_mistral(
    sd: Dict[str, Any], num_layers: int, prefix: str = "llm.",
    target_vocab: Optional[int] = None,
) -> Dict[str, Any]:
    """HF MistralForCausalLM -> models/llama.py stacked pytree. Mistral
    shares llama2's key layout (q/k/v/o + gate/up/down + RMSNorms,
    reference models/backbones/llm/mistral.py); only the shapes differ
    (GQA: k/v project to num_kv_heads * head_dim)."""
    return convert_llama(sd, num_layers, prefix=prefix, target_vocab=target_vocab)


def convert_phi(
    sd: Dict[str, Any], num_layers: int, prefix: str = "llm.",
    target_vocab: Optional[int] = None,
) -> Dict[str, Any]:
    """HF PhiForCausalLM (reference models/backbones/llm/phi.py wraps it as
    `self.llm`) -> models/phi.py stacked pytree, with the same mean-padding
    vocab resize as convert_llama."""
    from mla_tpu.models.phi import convert_hf_phi

    params = convert_hf_phi(sd, num_layers, prefix=prefix)
    embed_table = params["embed"]["table"]
    if target_vocab is not None and embed_table.shape[0] < target_vocab:
        n_new = target_vocab - embed_table.shape[0]
        embed_pad = np.tile(embed_table.mean(axis=0, keepdims=True), (n_new, 1))
        params["embed"]["table"] = np.concatenate([embed_table, embed_pad], axis=0)
        head_w, head_b = params["lm_head"]["w"], params["lm_head"]["b"]
        w_pad = np.tile(head_w.mean(axis=1, keepdims=True), (1, n_new))
        params["lm_head"]["w"] = np.concatenate([head_w, w_pad], axis=1)
        params["lm_head"]["b"] = np.concatenate([head_b, np.full((n_new,), head_b.mean(), head_b.dtype)])
    return params


def convert_contrastive(sd: Dict[str, Any], prefix: str = "llm.") -> Dict[str, Any]:
    """The contrastive projection heads grafted onto the reference's llama
    (modeling_llama.py:1143-1156) -> our models/contrastive.py params."""

    def head(p):
        return {"fc1": _lin(sd, f"{p}.0"), "fc2": _lin(sd, f"{p}.2")}

    out: Dict[str, Any] = {}
    coord = f"{prefix}coordinate_aware_contrastive_loss_module"
    if f"{coord}.image_projection_head.0.weight" in sd:
        out["coord"] = {
            "image_head": head(f"{coord}.image_projection_head"),
            "pointcloud_head": head(f"{coord}.pointcloud_projection_head"),
        }
    tac = f"{prefix}tactile_contrastive_loss_module"
    if f"{tac}.tactile_projection_head.0.weight" in sd:
        out["tactile"] = {
            "tactile_head": head(f"{tac}.tactile_projection_head"),
            "pointcloud_head": head(f"{tac}.pointcloud_projection_head"),
            "image_head": head(f"{tac}.image_projection_head"),
        }
    return out


def convert_vision_tokenizer(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference VisionTokenizer state dict -> vision_tokenizer params."""

    def attn_block(p):
        return {
            "q_ln": _ln(sd, f"{p}.q.0"),
            "q": _lin(sd, f"{p}.q.1", bias=False),
            "kv_ln": _ln(sd, f"{p}.kv.0"),
            "kv": _lin(sd, f"{p}.kv.1", bias=False),
            "proj": _lin(sd, f"{p}.proj"),
        }

    pw = _t(sd["patch_embedding.weight"])  # [C, 3, 14, 14]
    C = pw.shape[0]
    return {
        "patch_embedding": {"w": pw.reshape(C, -1).T},  # (3,kh,kw) flatten == our patchify
        "class_embedding": _t(sd["class_embedding"]),
        "split_embedding": _t(sd["split_embedding"]),
        "local_attention": attn_block("local_attention"),
        "global_attention": attn_block("global_attention"),
    }


def convert_point_tokenizer(
    sd: Dict[str, Any], num_stages: int = 2, lga_blocks=(2, 1)
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference PointTokenizer (Point_PN_scan inside, pointvit.py:17-82)
    -> (params, state). Keys: patch_embed.EncP.*, proj, cls_token, pos_embed,
    norm."""
    raw_p: Dict[str, Any] = {"conv": _conv1x1(sd, "patch_embed.EncP.raw_point_embed.net.0")}
    bn_p, bn_s = _bn(sd, "patch_embed.EncP.raw_point_embed.net.1")
    raw_p["bn"] = bn_p
    raw_s = {"bn": bn_s}

    stages_p, stages_s = [], []
    for si in range(num_stages):
        blocks_p, blocks_s = [], []
        for bi in range(lga_blocks[si]):
            base = f"patch_embed.EncP.LGA_list.{si}.linear2.{bi}"
            n1_conv = _conv1x1(sd, f"{base}.net1.0")
            n1_bn_p, n1_bn_s = _bn(sd, f"{base}.net1.1")
            n2_conv = _conv1x1(sd, f"{base}.net2.0")
            n2_bn_p, n2_bn_s = _bn(sd, f"{base}.net2.1")
            blocks_p.append(
                {"net1": {"conv": n1_conv, "bn": n1_bn_p}, "net2": {"conv": n2_conv, "bn": n2_bn_p}}
            )
            blocks_s.append({"net1": {"bn": n1_bn_s}, "net2": {"bn": n2_bn_s}})
        stages_p.append({"blocks": blocks_p})
        stages_s.append({"blocks": blocks_s})

    params = {
        "raw_embed": raw_p,
        "stages": stages_p,
        "proj": _lin(sd, "proj"),
        "cls_token": _t(sd["cls_token"]),
        "pos_embed": _t(sd["pos_embed"]),
        "norm": _ln(sd, "norm"),
    }
    state = {"raw_embed": raw_s, "stages": stages_s}
    return params, state


def convert_mlp_gelu(sd: Dict[str, Any], depth: int = 2, prefix: str = "mlp") -> Dict[str, Any]:
    """MLP_GELU projector (vision_tokenizer.py:79-89): Sequential indices
    0, 2, 4, ... are the Linears."""
    return {"layers": [_lin(sd, f"{prefix}.{2 * i}") for i in range(depth)]}


def convert_mlp_projector(sd: Dict[str, Any], prefix: str = "projector") -> Dict[str, Any]:
    """MLPProjector gelu-mlp (util/nn_utils.py:21-34)."""
    return {"fc1": _lin(sd, f"{prefix}.0"), "fc2": _lin(sd, f"{prefix}.2")}


def convert_action_embedder(sd: Dict[str, Any], prefix: str = "mlp") -> Dict[str, Any]:
    """ActionEmbedder timm Mlp (models/diffusion/models.py:112-123)."""
    return {"fc1": _lin(sd, f"{prefix}.fc1"), "fc2": _lin(sd, f"{prefix}.fc2")}


def convert_timestep_embedder(sd: Dict[str, Any], prefix: str = "mlp") -> Dict[str, Any]:
    return {"fc1": _lin(sd, f"{prefix}.0"), "fc2": _lin(sd, f"{prefix}.2")}


def convert_final_layer(sd: Dict[str, Any]) -> Dict[str, Any]:
    return {
        "norm": {"scale": _t(sd["norm_final.weight"])},
        "mlp": {"fc1": _lin(sd, "mlp.fc1"), "fc2": _lin(sd, "mlp.fc2")},
    }


def convert_generation_manager(sd: Dict[str, Any], gen_cfg) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """MultimodalGenerationManager (models/mla/generation/models.py:433-539)."""
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    if gen_cfg.use_image:
        p = "image_gen_module"
        params["image_gen_module"] = {
            "image_gen_queries": _t(sd[f"{p}.image_gen_queries"]),
            "mae_mask_token": _t(sd[f"{p}.mae_mask_token"]),
            "mae_pos_embed": _t(sd[f"{p}.mae_pos_embed"]),
            "intent_decoder": [
                _decoder_layer(sd, f"{p}.intent_decoder.layers.{i}") for i in range(2)
            ],
            "mae_decoder": [
                _decoder_layer(sd, f"{p}.mae_decoder.layers.{i}")
                for i in range(gen_cfg.image.decoder_layers)
            ],
            "mae_patch_norm": _ln(sd, f"{p}.mae_patch_norm"),
            "mae_delta_head": _lin(sd, f"{p}.mae_delta_head"),
            "mae_alpha_head": _lin(sd, f"{p}.mae_alpha_head"),
            "mae_offset_head": _lin(sd, f"{p}.mae_offset_head"),
        }

    if gen_cfg.use_pointcloud:
        p = "pointcloud_gen_module"
        blocks = []
        for i in range(gen_cfg.point.decoder_layers):
            b = f"{p}.decoder_blocks.{i}"
            blocks.append(
                {
                    "attn": _mha_packed(sd, f"{b}.attn"),
                    "norm1": _ln(sd, f"{b}.norm1"),
                    "norm2": _ln(sd, f"{b}.norm2"),
                    "fc1": _lin(sd, f"{b}.mlp.0"),
                    "fc2": _lin(sd, f"{b}.mlp.3"),
                }
            )
        bn_p, bn_s = _bn(sd, f"{p}.future_predictor.1")
        params["pointcloud_gen_module"] = {
            "feature_projector": _lin(sd, f"{p}.feature_projector"),
            "seq_to_patch": _lin(sd, f"{p}.seq_to_patch"),
            "pos_embed": _t(sd[f"{p}.pos_embed"]),
            "blocks": blocks,
            "pred_conv1": _conv1x1(sd, f"{p}.future_predictor.0"),
            "pred_bn": bn_p,
            "pred_conv2": _conv1x1(sd, f"{p}.future_predictor.3"),
        }
        state["pointcloud_gen_module"] = {"pred_bn": bn_s}

    if gen_cfg.use_tactile:
        p = "tactile_gen_module"
        params["tactile_gen_module"] = {
            "feature_projector": _lin(sd, f"{p}.feature_projector"),
            "tactile_query": _t(sd[f"{p}.tactile_query"]),
            "decoder": [
                _decoder_layer(sd, f"{p}.decoder.layers.{i}")
                for i in range(gen_cfg.tactile.decoder_layers)
            ],
            "output_head": _lin(sd, f"{p}.output_head"),
        }
    return params, state


# --------------------------------------------------------------------------- #
# top-level checkpoint reader
# --------------------------------------------------------------------------- #


def load_reference_checkpoint(
    ckpt_path, cfg, *, base_params: Optional[Dict[str, Any]] = None,
    base_state: Optional[Dict[str, Any]] = None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read a reference `.pt` checkpoint (module-keyed, fsdp.py:100-155) into
    (params, state) pytrees for this framework. Missing module groups fall
    back to `base_params`/`base_state` (permissive loading like
    model_mla.py:360-465's init-if-missing)."""
    import torch

    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    model = blob["model"] if "model" in blob else blob
    # strip the reference's "vlm." prefix variance (fsdp.py:131-136)
    model = { (k[4:] if k.startswith("vlm.") else k): v for k, v in model.items() }

    params = dict(base_params) if base_params else {}
    state = dict(base_state) if base_state else {}

    if "llm_backbone" in model:
        sd = model["llm_backbone"]
        params["llm_backbone"] = convert_llama(sd, cfg.llama.num_layers)
        contr = convert_contrastive(sd)
        if contr and cfg.use_contrastive:
            base_contr = params.get("contrastive", {})
            params["contrastive"] = {**base_contr, **contr}
    if "vision_tower_2d" in model:
        params["vision_tower_2d"] = convert_vision_tokenizer(model["vision_tower_2d"])
    if "projector_2d" in model:
        params["projector_2d"] = convert_mlp_gelu(model["projector_2d"])
    if "vision_tower_3d" in model:
        p, s = convert_point_tokenizer(
            model["vision_tower_3d"], cfg.point.num_stages, cfg.point.lga_blocks
        )
        params["vision_tower_3d"] = p
        state["vision_tower_3d"] = s
    if "projector_3d" in model:
        params["projector_3d"] = convert_mlp_projector(model["projector_3d"])
    if "proprio_embedder" in model:
        params["proprio_embedder"] = convert_action_embedder(model["proprio_embedder"])
    if "x_embedder" in model:
        params["x_embedder"] = convert_action_embedder(model["x_embedder"])
    if "t_embedder" in model:
        params["t_embedder"] = convert_timestep_embedder(model["t_embedder"])
    if "tactile_embedder" in model:
        params["tactile_embedder"] = convert_action_embedder(model["tactile_embedder"])
    if "final_layer" in model:
        params["final_layer"] = convert_final_layer(model["final_layer"])
    if "generation_manager" in model and cfg.use_generation:
        p, s = convert_generation_manager(model["generation_manager"], cfg.gen)
        params["generation_manager"] = p
        if s:
            state["generation_manager"] = s
    if cfg.use_diff and "z_embedder" not in params:
        # uncondition is a plain (non-state-dict) zeros tensor in the
        # reference (models.py:76); recreate it
        params.setdefault("z_embedder", {"uncondition": np.zeros((1, cfg.token_size), np.float32)})
    return params, state


def load_hf_llama(model_dir, cfg) -> Dict[str, Any]:
    """Load a HuggingFace Llama checkpoint directory (safetensors or .bin)
    into our llama pytree — the `load()`-from-base-VLM path
    (models/load.py:52-140)."""
    from pathlib import Path

    sd = merge_hf_shards(model_dir, bin_globs=("pytorch_model*.bin",))
    return convert_llama(sd, cfg.llama.num_layers, prefix="", target_vocab=cfg.llama.vocab_size)


def merge_hf_shards(model_dir, bin_globs=("*.bin", "*.pt")) -> Dict[str, Any]:
    """Merge an HF-style sharded checkpoint directory into one flat state
    dict: *.safetensors shards when present, else torch-pickled shards
    matching `bin_globs` (shared by load_hf_llama and models.load.load_openvla)."""
    from pathlib import Path

    model_dir = Path(model_dir)
    sd: Dict[str, Any] = {}
    st_files = sorted(model_dir.glob("*.safetensors"))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(str(f), framework="np") as sf:
                for k in sf.keys():
                    sd[k] = sf.get_tensor(k)
    else:
        import torch

        for pat in bin_globs:
            for f in sorted(model_dir.glob(pat)):
                sd.update(torch.load(str(f), map_location="cpu", weights_only=False))
    return sd


# --------------------------------------------------------------------------- #
# export: our pytrees -> reference-format state dicts (.pt)
# --------------------------------------------------------------------------- #


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32) if hasattr(x, "dtype") else np.asarray(x)


def _exp_lin(p: Dict[str, Any], prefix: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.weight"] = _np(p["w"]).T
    if "b" in p:
        out[f"{prefix}.bias"] = _np(p["b"])


def _exp_ln(p: Dict[str, Any], prefix: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])


def _exp_conv1x1(p: Dict[str, Any], prefix: str, out: Dict[str, np.ndarray], conv2d: bool) -> None:
    w = _np(p["w"]).T  # [out, in]
    out[f"{prefix}.weight"] = w[..., None, None] if conv2d else w[..., None]
    if "b" in p:
        out[f"{prefix}.bias"] = _np(p["b"])


def _exp_bn(p: Dict[str, Any], s: Dict[str, Any], prefix: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])
    out[f"{prefix}.running_mean"] = _np(s["mean"])
    out[f"{prefix}.running_var"] = _np(s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_llama(params: Dict[str, Any], prefix: str = "llm.") -> Dict[str, np.ndarray]:
    """Inverse of convert_llama (scan-stacked -> per-layer HF keys)."""
    out: Dict[str, np.ndarray] = {}
    out[f"{prefix}model.embed_tokens.weight"] = _np(params["embed"]["table"])
    lp = params["layers"]
    L = _np(lp["input_ln"]["scale"]).shape[0]
    names = {
        "self_attn.q_proj": lp["attn"]["q"]["w"],
        "self_attn.k_proj": lp["attn"]["k"]["w"],
        "self_attn.v_proj": lp["attn"]["v"]["w"],
        "self_attn.o_proj": lp["attn"]["o"]["w"],
        "mlp.gate_proj": lp["mlp"]["gate"]["w"],
        "mlp.up_proj": lp["mlp"]["up"]["w"],
        "mlp.down_proj": lp["mlp"]["down"]["w"],
    }
    for i in range(L):
        for name, w in names.items():
            out[f"{prefix}model.layers.{i}.{name}.weight"] = _np(w[i]).T
        out[f"{prefix}model.layers.{i}.input_layernorm.weight"] = _np(lp["input_ln"]["scale"][i])
        out[f"{prefix}model.layers.{i}.post_attention_layernorm.weight"] = _np(lp["post_ln"]["scale"][i])
    out[f"{prefix}model.norm.weight"] = _np(params["final_ln"]["scale"])
    out[f"{prefix}lm_head.weight"] = _np(params["lm_head"]["w"]).T
    return out


def export_contrastive(params: Dict[str, Any], prefix: str = "llm.") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}

    def head(p, pre):
        _exp_lin(p["fc1"], f"{pre}.0", out)
        _exp_lin(p["fc2"], f"{pre}.2", out)

    if "coord" in params:
        c = f"{prefix}coordinate_aware_contrastive_loss_module"
        head(params["coord"]["image_head"], f"{c}.image_projection_head")
        head(params["coord"]["pointcloud_head"], f"{c}.pointcloud_projection_head")
    if "tactile" in params:
        t = f"{prefix}tactile_contrastive_loss_module"
        head(params["tactile"]["tactile_head"], f"{t}.tactile_projection_head")
        head(params["tactile"]["pointcloud_head"], f"{t}.pointcloud_projection_head")
        head(params["tactile"]["image_head"], f"{t}.image_projection_head")
    return out


def export_vision_tokenizer(params: Dict[str, Any], patch_stride: int = 14) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    w = _np(params["patch_embedding"]["w"]).T  # [C, 3*k*k]
    C = w.shape[0]
    out["patch_embedding.weight"] = w.reshape(C, 3, patch_stride, patch_stride)
    out["class_embedding"] = _np(params["class_embedding"])
    out["split_embedding"] = _np(params["split_embedding"])
    for name in ("local_attention", "global_attention"):
        p = params[name]
        _exp_ln(p["q_ln"], f"{name}.q.0", out)
        _exp_lin(p["q"], f"{name}.q.1", out)
        _exp_ln(p["kv_ln"], f"{name}.kv.0", out)
        _exp_lin(p["kv"], f"{name}.kv.1", out)
        _exp_lin(p["proj"], f"{name}.proj", out)
    return out


def export_point_tokenizer(
    params: Dict[str, Any], state: Dict[str, Any], lga_blocks=(2, 1)
) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    _exp_conv1x1(params["raw_embed"]["conv"], "patch_embed.EncP.raw_point_embed.net.0", out, conv2d=False)
    _exp_bn(params["raw_embed"]["bn"], state["raw_embed"]["bn"], "patch_embed.EncP.raw_point_embed.net.1", out)
    for si, nblocks in enumerate(lga_blocks):
        for bi in range(nblocks):
            base = f"patch_embed.EncP.LGA_list.{si}.linear2.{bi}"
            bp = params["stages"][si]["blocks"][bi]
            bs = state["stages"][si]["blocks"][bi]
            _exp_conv1x1(bp["net1"]["conv"], f"{base}.net1.0", out, conv2d=True)
            _exp_bn(bp["net1"]["bn"], bs["net1"]["bn"], f"{base}.net1.1", out)
            _exp_conv1x1(bp["net2"]["conv"], f"{base}.net2.0", out, conv2d=True)
            _exp_bn(bp["net2"]["bn"], bs["net2"]["bn"], f"{base}.net2.1", out)
    _exp_lin(params["proj"], "proj", out)
    out["cls_token"] = _np(params["cls_token"])
    out["pos_embed"] = _np(params["pos_embed"])
    _exp_ln(params["norm"], "norm", out)
    return out


def export_reference_checkpoint(params: Dict[str, Any], state: Dict[str, Any], cfg) -> Dict[str, Dict[str, np.ndarray]]:
    """Our (params, state) -> the reference's module-keyed {"model": {...}}
    payload (numpy values; caller torch.save's it). Inverse of
    load_reference_checkpoint for the module groups we own."""
    model: Dict[str, Dict[str, np.ndarray]] = {}
    llm = export_llama(params["llm_backbone"])
    if "contrastive" in params:
        llm.update(export_contrastive(params["contrastive"]))
    model["llm_backbone"] = llm
    # every module is guarded like the loader side (load_reference_checkpoint
    # is permissive per-module) — LLM-only/ablation trees must export too
    if "vision_tower_2d" in params:
        model["vision_tower_2d"] = export_vision_tokenizer(
            params["vision_tower_2d"], cfg.vision.patch_stride
        )
    if "projector_2d" in params:
        pj2 = {}
        for i, lp in enumerate(params["projector_2d"]["layers"]):
            _exp_lin(lp, f"mlp.{2 * i}", pj2)
        model["projector_2d"] = pj2
    if "vision_tower_3d" in params:
        model["vision_tower_3d"] = export_point_tokenizer(
            params["vision_tower_3d"], state["vision_tower_3d"], cfg.point.lga_blocks
        )
    if "projector_3d" in params:
        pj3 = {}
        _exp_lin(params["projector_3d"]["fc1"], "projector.0", pj3)
        _exp_lin(params["projector_3d"]["fc2"], "projector.2", pj3)
        model["projector_3d"] = pj3
    for name in ("proprio_embedder", "x_embedder", "tactile_embedder"):
        if name in params:
            e = {}
            _exp_lin(params[name]["fc1"], "mlp.fc1", e)
            _exp_lin(params[name]["fc2"], "mlp.fc2", e)
            model[name] = e
    if "t_embedder" in params:
        e = {}
        _exp_lin(params["t_embedder"]["fc1"], "mlp.0", e)
        _exp_lin(params["t_embedder"]["fc2"], "mlp.2", e)
        model["t_embedder"] = e
    if "final_layer" in params:
        e = {"norm_final.weight": _np(params["final_layer"]["norm"]["scale"])}
        _exp_lin(params["final_layer"]["mlp"]["fc1"], "mlp.fc1", e)
        _exp_lin(params["final_layer"]["mlp"]["fc2"], "mlp.fc2", e)
        model["final_layer"] = e
    return {"model": model}
