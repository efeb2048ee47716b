"""The composed multimodal VLA model (PrismaticVLM-equivalent).

Parity target: reference models/vlm/prismatic.py:148-1144 — owns the 2D/3D/
tactile tokenizer front-ends, their LLM-width projectors, the diffusion
embedders (proprio/x/t/z + final layer), the generation manager, and the
modified-Llama backbone; builds the fused token sequence and runs the LLM
with contrastive plumbing.

Token layout (reference :932-952 and :981-1046):

    [BOS | 256 PC | 256 img | extra views.. | tactile | prompt.. (answer)]
           \\________________ fused block _______________/
    diffusion mode additionally splices [proprio, t, x_0..x_15] immediately
    before the tag token (training: last EOS id 2; inference: last 29871),
    and reads noise_pred off the final layer at the x positions.

TPU-first redesign — the static splice:
  The reference locates the tag with `torch.where(input_ids == tag)` and
  concatenates per-sample ragged pieces in a python loop (:981-1046). Here
  the collator provides `splice_idx` [B] (host-side search), and the device
  assembles the sequence as ONE gather: build the source tensor
  [text_embeds | fused | (proprio,t,x)] and a per-sample index map computed
  with vectorized arithmetic — every shape static, no loops, batch-uniform.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mla_tpu import nn
from mla_tpu.models import contrastive as contrastive_mod
from mla_tpu.models import embedders
from mla_tpu.models import generation as gen_mod
from mla_tpu.models import llama as llama_mod
from mla_tpu.models import point_tokenizer as pt_mod
from mla_tpu.models import vision_tokenizer as vt_mod
from mla_tpu.ops import projection as proj_ops
from mla_tpu.ops import pointops


def get_decoder(cfg: "MLAModelConfig"):
    """Decoder-family module for cfg.llm_family ('llama' covers llama2 /
    vicuna / mistral via GQA; 'phi' is the parallel-block Phi-2 family —
    reference models/backbones/llm/{llama2,mistral,phi}.py)."""
    from mla_tpu.models import phi as phi_mod

    return {"llama": llama_mod, "phi": phi_mod}[cfg.llm_family]


@dataclass(frozen=True)
class MLAModelConfig:
    # decoder config: a LlamaConfig for llm_family='llama'/'mistral', a
    # PhiConfig for 'phi' (field name kept for checkpoint/config compat)
    llm_family: str = "llama"
    llama: llama_mod.LlamaConfig = field(default_factory=lambda: llama_mod.LLAMA2_7B)
    vision: vt_mod.VisionTokenizerConfig = field(default_factory=vt_mod.VisionTokenizerConfig)
    point: pt_mod.PointTokenizerConfig = field(default_factory=pt_mod.PointTokenizerConfig)
    gen: gen_mod.GenerationConfig = field(default_factory=gen_mod.GenerationConfig)

    action_dim: int = 7
    future_action_window_size: int = 15
    past_action_window_size: int = 0
    class_dropout_prob: float = 0.0
    tactile_dim: int = 12

    use_diff: bool = True
    use_pointcloud: bool = True
    use_tactile: bool = False
    use_contrastive: bool = True
    use_generation: bool = False
    use_roi: bool = False

    camera_name: str = "rlbench_front"
    image_hidden_dim: int = 1024
    point_token_dim: int = 768
    num_extra_views: int = 0  # wrist cameras etc., 256 tokens each

    def __post_init__(self):
        if self.use_tactile and not self.use_pointcloud:
            # tactile positives are nearest-PC-token indices (reference
            # prismatic.py:740-750) — there is no tactile path without the
            # point tokenizer's centers
            raise ValueError(
                "use_tactile=True requires use_pointcloud=True: tactile "
                "contrastive positives are nearest point-cloud tokens"
            )

    @property
    def token_size(self) -> int:
        return self.llama.hidden_size

    @property
    def n_arms(self) -> int:
        return max(self.action_dim // 7, 1)

    @property
    def n_tac_tokens(self) -> int:
        # one token per arm when tactile is on; a single zero token otherwise
        # (reference get_fused_tokens :752-763 always appends one)
        return self.n_arms if self.use_tactile else 1

    @property
    def num_image_tokens(self) -> int:
        return self.vision.num_tokens  # 256

    @property
    def num_pc_tokens(self) -> int:
        return self.point.num_tokens  # 256

    @property
    def fused_len(self) -> int:
        return (
            self.num_pc_tokens
            + self.num_image_tokens * (1 + self.num_extra_views)
            + self.n_tac_tokens
        )

    @property
    def diff_block_len(self) -> int:
        # [proprio, t, x_0..x_{W}] where W = future_action_window_size
        return 2 + (self.future_action_window_size + 1)

    @property
    def action_horizon(self) -> int:
        return self.future_action_window_size + 1  # 16


def mla_model_init(key: jax.Array, cfg: MLAModelConfig) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (params, state). Module keys mirror the reference's
    all_module_keys (prismatic.py:272-283) for checkpoint mapping."""
    ks = jax.random.split(key, 12)
    D = cfg.token_size
    params: Dict[str, Any] = {
        "llm_backbone": get_decoder(cfg).init(ks[0], cfg.llama),
        "vision_tower_2d": vt_mod.vision_tokenizer_init(ks[1], cfg.vision),
        "projector_2d": nn.mlp_gelu_init(ks[2], cfg.image_hidden_dim, D, depth=2),
        "proprio_embedder": embedders.action_embedder_init(ks[3], cfg.action_dim, D),
    }
    state: Dict[str, Any] = {}

    if cfg.use_pointcloud:
        pt_params, pt_state = pt_mod.point_tokenizer_init(ks[4], cfg.point)
        params["vision_tower_3d"] = pt_params
        state["vision_tower_3d"] = pt_state
        params["projector_3d"] = embedders.mlp_projector_init(ks[5], cfg.point_token_dim, D)

    if cfg.use_tactile:
        params["tactile_embedder"] = embedders.action_embedder_init(ks[6], cfg.tactile_dim, D)

    if cfg.use_diff:
        params["x_embedder"] = embedders.action_embedder_init(ks[7], cfg.action_dim, D)
        params["t_embedder"] = embedders.timestep_embedder_init(ks[8], D)
        params["z_embedder"] = embedders.label_embedder_init(D)
        params["final_layer"] = embedders.final_layer_init(ks[9], D, cfg.action_dim)

    if cfg.use_contrastive:
        params["contrastive"] = {
            "coord": contrastive_mod.coordinate_contrastive_init(ks[10], cfg.llama.hidden_size)
        }
        if cfg.use_tactile:
            params["contrastive"]["tactile"] = contrastive_mod.tactile_contrastive_init(
                jax.random.fold_in(ks[10], 1), cfg.llama.hidden_size
            )

    if cfg.use_generation:
        gp, gs = gen_mod.generation_manager_init(ks[11], cfg.gen)
        params["generation_manager"] = gp
        state["generation_manager"] = gs

    return params, state


# --------------------------------------------------------------------------- #
# Fused multimodal tokens
# --------------------------------------------------------------------------- #


def get_fused_tokens(
    params: Dict[str, Any],
    state: Dict[str, Any],
    cfg: MLAModelConfig,
    images: Dict[str, jnp.ndarray],
    point_cloud: Optional[jnp.ndarray],
    tactile: Optional[jnp.ndarray],
    gripper_xyz: Optional[jnp.ndarray],
    *,
    training: bool = False,
    fps_key: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Reference get_fused_tokens (prismatic.py:598-769).

    images: dict with 'front_image' [B,4,672,672] (+ optional extra views).
    Returns dict with fused tokens, projection pairing, tactile positives,
    the projected front-image features (for the generation heads), and
    updated batch-norm state."""
    # the tokenizer front-end computes in the LLM compute dtype (bf16 on the
    # 7B flagship), matching the reference's autocast over the vision tower
    # (prismatic.py:1049 autocast bf16; vision_tokenizer.py:124 casts pixels
    # to the module dtype). fp32 pixels would silently upcast every front-end
    # matmul — measured ~1.5 ms/call at serving time.
    cdt = cfg.llama.compute_dtype
    images = {k: v.astype(cdt) for k, v in images.items()}
    front = images["front_image"]
    B = front.shape[0]
    D = cfg.token_size

    img_raw = vt_mod.vision_tokenizer(params["vision_tower_2d"], front, cfg.vision)
    img_tokens = nn.mlp_gelu(params["projector_2d"], img_raw)  # [B,256,D]

    new_state = dict(state)
    if cfg.use_pointcloud and point_cloud is not None:
        pc_raw, centers, pt_state = pt_mod.point_tokenizer(
            params["vision_tower_3d"], state["vision_tower_3d"], point_cloud, cfg.point,
            training=training, fps_key=fps_key,
        )
        new_state["vision_tower_3d"] = pt_state
        pc_tokens = embedders.mlp_projector(params["projector_3d"], pc_raw)
        cam = proj_ops.get_camera_params(cfg.camera_name)
        patch_indices, valid_mask = proj_ops.project_3d_to_2d(
            centers, cam, (cfg.vision.image_size,) * 2,
            cfg.vision.patch_stride, cfg.vision.conv_stride,
        )
    else:
        centers = None
        pc_tokens = jnp.zeros((B, cfg.num_pc_tokens, D), img_tokens.dtype)
        patch_indices = jnp.zeros((B, cfg.num_pc_tokens, 2), jnp.int32)
        valid_mask = jnp.zeros((B, cfg.num_pc_tokens), bool)

    parts = [pc_tokens, img_tokens]
    for view_key in sorted(k for k in images if k != "front_image"):
        view_raw = vt_mod.vision_tokenizer(params["vision_tower_2d"], images[view_key], cfg.vision)
        parts.append(nn.mlp_gelu(params["projector_2d"], view_raw))

    positive_pc_idx = None
    positive_img_idx = None
    if cfg.use_tactile and tactile is not None:
        n = cfg.n_arms
        tac_flat = tactile.reshape(B, n, cfg.tactile_dim)
        tac_emb = embedders.action_embedder(params["tactile_embedder"], tac_flat)  # [B,n,D]
        parts.append(tac_emb)
        if centers is not None and gripper_xyz is not None:
            # nearest PC token per gripper (prismatic.py:740-750); positives
            # exist only when the batch carries gripper poses (training-time
            # contrastive supervision — inference batches omit them)
            grip = gripper_xyz.reshape(B, n, 3)
            d = pointops.square_distance(grip, centers)  # [B,n,256]
            positive_pc_idx = jnp.argmin(d, axis=-1)[..., None]  # [B,n,1]
            patch_w = cfg.vision.out_grid
            # (row, col) of each positive point's image patch: [B, n, 2]
            pi = jax.vmap(lambda p_ind, pos: p_ind[pos[:, 0]])(patch_indices, positive_pc_idx)
            positive_img_idx = (pi[..., 0] * patch_w + pi[..., 1])[..., None]  # [B,n,1]
    else:
        parts.append(jnp.zeros((B, 1, D), img_tokens.dtype))

    fused = jnp.concatenate(parts, axis=1)
    return {
        "fused": fused,
        "img_tokens": img_tokens,
        "patch_indices": patch_indices,
        "valid_mask": valid_mask,
        "positive_pc_idx": positive_pc_idx,
        "positive_img_idx": positive_img_idx,
        "centers": centers,
        "state": new_state,
    }


# --------------------------------------------------------------------------- #
# Static sequence assembly (the gather splice)
# --------------------------------------------------------------------------- #


def build_splice_map(
    L: int, F: int, d: int, splice_idx: jnp.ndarray
) -> jnp.ndarray:
    """Index map [B, S] into the source [text(L) | fused(F) | diff(d)].

    Output layout per sample (splice_idx = s):
      pos 0            -> text 0 (BOS)
      pos 1..F         -> fused 0..F-1
      pos F+1..F+s-1   -> text 1..s-1
      pos F+s..F+s+d-1 -> diff 0..d-1
      pos F+s+d..      -> text s..L-1
    """
    S = L + F + d
    j = jnp.arange(S)[None, :]  # [1,S]
    s = splice_idx[:, None]  # [B,1]
    idx = jnp.where(j == 0, 0, 0)
    idx = jnp.where((j >= 1) & (j <= F), L + (j - 1), idx)
    idx = jnp.where((j > F) & (j < F + s), j - F, idx)
    idx = jnp.where((j >= F + s) & (j < F + s + d), L + F + (j - F - s), idx)
    idx = jnp.where(j >= F + s + d, j - F - d, idx)
    return idx


def _gather_seq(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """src [B, N, ...], idx [B, S] -> [B, S, ...]."""
    if src.ndim == 2:
        return jnp.take_along_axis(src, idx, axis=1)
    return jnp.take_along_axis(src, idx[..., None], axis=1)


# --------------------------------------------------------------------------- #
# Full forward
# --------------------------------------------------------------------------- #


def vlm_forward(
    params: Dict[str, Any],
    state: Dict[str, Any],
    cfg: MLAModelConfig,
    batch: Dict[str, Any],
    *,
    training: bool = False,
    use_diff: Optional[bool] = None,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    use_flash: Optional[bool] = None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Run the composed model (reference PrismaticVLM.forward :840-1144).

    batch keys:
      input_ids [B,L] int32, attention_mask [B,L] bool, splice_idx [B] int32
      images {name: [B,4,672,672]}, point_cloud [B,N,3]?, tactile?,
      gripper_xyz?, labels [B,L]? (AR supervision),
      x [B,16,action_dim]? t [B]? proprio [B,1,action_dim]  (diffusion mode)
      next_images / next_point_cloud / next_tactile  (generation stage)

    Returns (outputs, new_state); outputs has last_hidden, logits?, loss
    pieces per enabled flags, noise_pred (diffusion), generation outputs.
    """
    use_diff = cfg.use_diff if use_diff is None else use_diff
    rngs = {}
    if rng is not None:
        for i, name in enumerate(["fps", "zdrop", "gen"]):
            rngs[name] = jax.random.fold_in(rng, i)

    input_ids = batch["input_ids"]
    B, L = input_ids.shape

    # language-only batches (the reference's empty multimodal_indices branch,
    # prismatic.py:911-924, fed by SplitModalitySampler's unimodal batches):
    # plain LM forward, no fused block / splice
    if batch.get("images") is None or not batch.get("images"):
        decoder = get_decoder(cfg)
        text_emb = decoder.embed_tokens(params["llm_backbone"], input_ids)
        llm_out = decoder.forward(
            params["llm_backbone"], cfg.llama, text_emb,
            key_mask=batch["attention_mask"].astype(bool),
            remat=remat, use_flash=use_flash, compute_logits=True,
        )
        outputs = {"last_hidden": llm_out["last_hidden"], "logits": llm_out["logits"]}
        if batch.get("labels") is not None:
            outputs["lm_loss"] = llama_mod.causal_lm_loss(llm_out["logits"], batch["labels"])
        return outputs, state

    F = cfg.fused_len
    D = cfg.token_size

    fused_out = get_fused_tokens(
        params, state, cfg,
        batch["images"], batch.get("point_cloud"), batch.get("tactile"),
        batch.get("gripper_xyz"), training=training, fps_key=rngs.get("fps"),
    )
    new_state = fused_out["state"]
    fused = fused_out["fused"]
    assert fused.shape[1] == F, f"fused length {fused.shape[1]} != cfg.fused_len {F}"

    decoder = get_decoder(cfg)
    text_emb = decoder.embed_tokens(params["llm_backbone"], input_ids)

    # CFG condition dropout applies to the conditioning (text+fused) segments
    # (reference applies z_embedder to the spliced z, :956-957). Both
    # segments share ONE per-sample drop mask: label_embedder draws it from
    # the same key on both calls.
    if use_diff and cfg.class_dropout_prob > 0 and training:
        drop_kw = dict(
            dropout_prob=cfg.class_dropout_prob, training=True,
            key=rngs.get("zdrop"),
        )
    elif use_diff and batch.get("force_uncondition", False):
        drop_kw = dict(force_drop_ids=jnp.ones((B,), jnp.int32))
    else:
        drop_kw = None
    if drop_kw is not None:
        text_emb = embedders.label_embedder(params["z_embedder"], text_emb, **drop_kw)
        fused = embedders.label_embedder(params["z_embedder"], fused, **drop_kw)

    if use_diff:
        proprio = embedders.action_embedder(
            params["proprio_embedder"], batch["proprio"].astype(text_emb.dtype)
        )  # [B,1,D]
        x_emb = embedders.action_embedder(
            params["x_embedder"], batch["x"].astype(text_emb.dtype)
        )  # [B,16,D]
        t_emb = embedders.timestep_embedder(params["t_embedder"], batch["t"])[:, None, :]
        diff_block = jnp.concatenate(
            [proprio, t_emb.astype(text_emb.dtype), x_emb], axis=1
        )  # [B, 18, D]
        d_len = diff_block.shape[1]
    else:
        diff_block = jnp.zeros((B, 0, D), text_emb.dtype)
        d_len = 0

    splice_idx = batch["splice_idx"]
    idx_map = build_splice_map(L, F, d_len, splice_idx)
    src_emb = jnp.concatenate([text_emb, fused.astype(text_emb.dtype), diff_block], axis=1)
    seq_emb = _gather_seq(src_emb, idx_map)  # [B, S, D]

    attn_src = jnp.concatenate(
        [batch["attention_mask"].astype(bool),
         jnp.ones((B, F + d_len), bool)], axis=1,
    )
    seq_mask = _gather_seq(attn_src, idx_map)

    labels = batch.get("labels")
    seq_labels = None
    if labels is not None:
        lab_src = jnp.concatenate(
            [labels, jnp.full((B, F + d_len), -100, labels.dtype)], axis=1
        )
        seq_labels = _gather_seq(lab_src, idx_map)

    llm_out = decoder.forward(
        params["llm_backbone"], cfg.llama, seq_emb,
        key_mask=seq_mask, remat=remat, use_flash=use_flash,
        compute_logits=(seq_labels is not None) or not use_diff,
    )

    outputs: Dict[str, Any] = {
        "last_hidden": llm_out["last_hidden"],
        "seq_mask": seq_mask,
    }
    if "logits" in llm_out:
        outputs["logits"] = llm_out["logits"]
    if seq_labels is not None:
        outputs["lm_loss"] = llama_mod.causal_lm_loss(llm_out["logits"], seq_labels)

    # --- contrastive losses on the mid-stack hidden state (layer 8) --------
    if cfg.use_contrastive and training:
        hmid = llm_out["hidden_mid"]
        pc_start = 1
        pc_end = pc_start + cfg.num_pc_tokens
        img_end = pc_end + cfg.num_image_tokens
        pc_feats = hmid[:, pc_start:pc_end]
        img_feats = hmid[:, pc_end:img_end]
        outputs["img_pc_contrastive_loss"] = contrastive_mod.coordinate_contrastive_loss(
            params["contrastive"]["coord"], img_feats, pc_feats,
            fused_out["patch_indices"], fused_out["valid_mask"],
        )
        if cfg.use_tactile and fused_out["positive_pc_idx"] is not None:
            tac_start = img_end + cfg.num_image_tokens * cfg.num_extra_views
            tac_feats = hmid[:, tac_start : tac_start + cfg.n_arms]
            outputs["tactile_contrastive_loss"] = contrastive_mod.tactile_contrastive_loss(
                params["contrastive"]["tactile"], tac_feats, pc_feats, img_feats,
                fused_out["positive_pc_idx"], fused_out["positive_img_idx"],
            )

    # --- generation heads (post-training stage) ----------------------------
    if cfg.use_generation and training:
        roi_2d = jnp.ones((B, cfg.vision.out_grid, cfg.vision.out_grid), bool)
        curr_patches = None
        if cfg.gen.use_image:
            curr_patches = gen_mod.images_to_patches(
                batch["images"]["front_image"][:, :3], cfg.gen.image.image_patch_size
            )
            if cfg.use_roi:
                roi_2d = gen_mod.create_roi_mask_from_indices(
                    fused_out["patch_indices"], cfg.vision.out_grid
                )
        gen_outs, gen_state = gen_mod.generation_manager_forward(
            params["generation_manager"], state.get("generation_manager", {}), cfg.gen,
            llm_out["last_hidden"],
            current_image_features=fused_out["img_tokens"],
            current_images_patches=curr_patches,
            current_point_cloud=None,  # reference passes None (prismatic.py:1098)
            roi_mask_2d=roi_2d,
            training=training, key=rngs.get("gen"),
        )
        new_state = {**new_state, "generation_manager": gen_state}
        outputs["generation_outputs"] = gen_outs
        outputs["generation_losses"] = gen_mod.compute_generation_losses(
            cfg.gen, gen_outs,
            next_images=batch.get("next_images"),
            next_point_cloud=batch.get("next_point_cloud"),
            next_tactile=batch.get("next_tactile"),
        )

    # --- diffusion noise prediction ----------------------------------------
    if use_diff:
        # x tokens sit at positions [F + splice + 2, F + splice + 2 + horizon).
        # Gather the 16 x-token hiddens BEFORE final_layer — it is
        # position-wise, so this is numerically identical to projecting all
        # S~575 positions and gathering after, but skips ~35x of the
        # D->D->action_dim MLP compute and its [B,S,D] backprop activation
        base = F + splice_idx + 2  # [B]
        pos = base[:, None] + jnp.arange(cfg.action_horizon)[None, :]  # [B,16]
        x_hidden = jnp.take_along_axis(llm_out["last_hidden"], pos[..., None], axis=1)
        outputs["noise_pred"] = embedders.final_layer(params["final_layer"], x_hidden)

    return outputs, new_state
