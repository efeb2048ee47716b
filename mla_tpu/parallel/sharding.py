"""Parameter/batch sharding specs — the GSPMD analogue of FSDP wrap policies.

The reference assigns FSDP units per module class (prismatic.py:572-596,
model_mla.py:279-303, base_llm.py:182-188); with GSPMD the equivalent is a
PartitionSpec per parameter leaf, and XLA inserts the all-gathers /
reduce-scatters that FSDP would issue (reference fsdp.py internals).

Rules:
  * fsdp: shard each leaf's largest divisible dim over the 'fsdp' axis.
    For scan-stacked llama layers ([L, ...] leaves under 'layers/') the
    leading L axis is never sharded — sharding it would turn the layer scan
    into a per-step all-gather.
  * tp: megatron-style for the llama block — q/k/v/gate/up split on the
    output dim, o/down on the input dim, embed/lm_head on vocab. Composes
    with fsdp on the remaining dim.
  * batch: leading dim over ('dp', 'fsdp') — every chip gets a micro-batch,
    params replicate over 'dp' only (HYBRID_SHARD semantics).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mla_tpu.utils.tree import path_str

# llama leaf paths (suffix match) -> tp dim counted from the END (negative
# indexing works for both stacked [L, in, out] and flat [in, out] leaves)
_TP_RULES = {
    "layers/attn/q/w": -1,
    "layers/attn/k/w": -1,
    "layers/attn/v/w": -1,
    "layers/attn/o/w": -2,
    "layers/mlp/gate/w": -1,
    "layers/mlp/up/w": -1,
    "layers/mlp/down/w": -2,
    "embed/table": -2,   # vocab dim of [V, D]
    "lm_head/w": -1,     # vocab dim of [D, V]
}


def _spec_for_leaf(path: str, leaf, mesh: Mesh, use_tp: bool) -> P:
    if not hasattr(leaf, "ndim") or leaf.ndim == 0:
        return P()
    ndim = leaf.ndim
    spec = [None] * ndim

    fsdp_size = mesh.shape.get("fsdp", 1)
    tp_size = mesh.shape.get("tp", 1)
    # scan-stacked decoder leaves carry a leading num_layers axis that must
    # stay unsharded (CLAUDE.md invariant). Key on the 'layers/' subtree
    # itself, not only the llm_backbone root name — a bare decoder tree
    # (standalone-LLM checkpoint) has paths starting at 'layers/'.
    # (List-of-dict "layers" like the projector's flatten to 'layers/0/...'
    # integer segments and stay 2-D, so min_dim=1 is harmless there.)
    is_stacked = "llm_backbone/layers/" in path or path.startswith("layers/")
    min_dim = 1 if is_stacked else 0

    if use_tp and tp_size > 1:
        # int8-quantized leaves follow their bf16 leaf's rule: w_q [.., K, N]
        # splits like w; per-out-channel w_scale [.., 1, N] splits only on
        # N-split (-1) rules and replicates under K-split rules. (int4 w_q4
        # packs K/2 — memory mode, not a tp target; left replicated.)
        rule_path, is_scale = path, False
        if path.endswith("/w_q"):
            rule_path = path[: -len("_q")]
        elif path.endswith("/w_scale"):
            rule_path, is_scale = path[: -len("_scale")], True
        for suffix, tp_dim in _TP_RULES.items():
            if rule_path.endswith(suffix):
                if is_scale and tp_dim != -1:
                    break
                d = ndim + (-1 if is_scale else tp_dim)
                if 0 <= d < ndim and leaf.shape[d] % tp_size == 0:
                    spec[d] = "tp"
                break

    if fsdp_size > 1:
        # shard the largest still-unsharded dim that divides evenly
        order = sorted(range(min_dim, ndim), key=lambda i: -leaf.shape[i])
        for i in order:
            if spec[i] is None and leaf.shape[i] % fsdp_size == 0 and leaf.shape[i] >= fsdp_size:
                spec[i] = "fsdp"
                break
    return P(*spec)


def param_shardings(params: Any, mesh: Mesh, use_tp: bool = False) -> Any:
    """Pytree of NamedShardings matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, _spec_for_leaf(path_str(p), x, mesh, use_tp)),
        params,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim data sharding over (dp, fsdp)."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh, use_tp: bool = False) -> Any:
    """Device-put params with their shardings (host -> sharded device arrays)."""
    shardings = param_shardings(params, mesh, use_tp)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch with leading-dim sharding. Scalars and
    0-d leaves replicate.

    Multi-process: the incoming batch is HOST-LOCAL (each host loaded its
    own disjoint RLDS shard, scripts/train.py per_host_batch); the global
    array is assembled from the per-process pieces. A plain device_put
    would instead treat each host's local rows as the (differing) full
    global array — silently wrong data on every host past the first."""
    data = batch_sharding(mesh)
    rep = replicate(mesh)
    multiprocess = jax.process_count() > 1

    def put(x):
        if hasattr(x, "ndim") and x.ndim > 0:
            if multiprocess:
                import numpy as np

                return jax.make_array_from_process_local_data(data, np.asarray(x))
            return jax.device_put(x, data)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, batch)
