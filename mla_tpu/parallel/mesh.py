"""Device-mesh construction for GSPMD training/serving.

TPU-native analogue of the reference's torchrun+NCCL world
(SURVEY.md section 2.10): the reference's only strategy is FSDP
HYBRID_SHARD = shard within a node, replicate across nodes
(training/strategies/fsdp.py:88-93). Here that maps to a 2-axis mesh:

    ('dp', 'fsdp')  —  params sharded over 'fsdp' (the ICI-local axis),
                       replicated over 'dp' (the DCN axis); the global
                       batch splits over BOTH axes.

An optional 'tp' axis enables megatron-style tensor parallelism for
serving (beyond the reference's capabilities; collectives ride ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    fsdp: Optional[int] = None,
    dp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('dp', 'fsdp', 'tp') mesh. With defaults, all devices go to
    the fsdp axis (single-slice ZeRO-style sharding)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if fsdp is None:
        assert n % (dp * tp) == 0, f"{n} devices not divisible by dp*tp={dp * tp}"
        fsdp = n // (dp * tp)
    assert dp * fsdp * tp == n, f"dp*fsdp*tp={dp * fsdp * tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, ("dp", "fsdp", "tp"))


def initialize_distributed() -> None:
    """Multi-host init (reference boundary: accelerate.PartialState /
    torchrun rendezvous, util/overwatch/overwatch.py:47-54). On TPU pods the
    coordinator address comes from the environment; safe no-op single-host.

    ORDER MATTERS: jax.distributed.initialize() must run before ANY backend
    query — jax.process_count()/jax.devices() initialize the local backend,
    after which initialize() raises and N hosts would silently train N
    divergent un-synchronized single-process replicas.

    Clusters without an auto-detectable scheduler (bare CPU/GPU nodes; the
    2-process e2e test) configure the rendezvous explicitly via
    MLA_COORDINATOR_ADDRESS / MLA_NUM_PROCESSES / MLA_PROCESS_ID — the
    explicit path raises on misconfiguration instead of degrading to
    single-process."""
    import os

    import jax

    try:
        if jax.distributed.is_initialized():
            return
    except Exception:
        pass
    addr = os.environ.get("MLA_COORDINATOR_ADDRESS")
    if addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["MLA_NUM_PROCESSES"]),
            process_id=int(os.environ["MLA_PROCESS_ID"]),
        )
        return
    try:
        jax.distributed.initialize()
    except Exception:
        # single-process (CPU tests / single-chip, no coordinator in the
        # env) — nothing to do
        pass
