"""Child process for the 2-process `jax.distributed` e2e test
(tests/test_training.py::test_two_process_distributed_train_step).

Run with env:
    MLA_COORDINATOR_ADDRESS=localhost:<port> MLA_NUM_PROCESSES=2
    MLA_PROCESS_ID=<0|1>  JAX_PLATFORMS=cpu  PALLAS_AXON_TPU_GEN=""
    XLA_FLAGS=--xla_force_host_platform_device_count=2
    [MLA_CHILD_DATA_DIR=<tfds fixture dir>]

Exercises the REAL multi-host production path end-to-end:
  1. `initialize_distributed()` before any backend query (the round-4
     ordering fix: a backend query first would leave each host a silent
     single-process replica — asserted via process_count()==2);
  2. per-host batches assembled into one global array
     (`parallel.shard_batch` -> make_array_from_process_local_data);
  3. one real optimizer step on the global 4-device mesh;
  4. per-host RLDS dataset sharding (`make_dataset_from_rlds`
     shard_by_host) over an on-disk tfds fixture.

Emits one JSON line on stdout for the parent to assert on. Reference
analogue: torchrun rendezvous + accelerate.PartialState
(/root/reference/util/overwatch/overwatch.py:47-54) + the FSDP strategy's
per-rank sampler sharding.
"""

import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))  # repo root
sys.path.insert(0, _here)  # tests/ (tiny.py)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mla_tpu.parallel.mesh import initialize_distributed, make_mesh  # noqa: E402

# MUST run before jax.process_count()/jax.devices() — the ordering this
# test exists to pin down.
initialize_distributed()

assert jax.distributed.is_initialized()
n_proc = jax.process_count()
pid = jax.process_index()
assert n_proc == 2, f"expected 2 processes, got {n_proc} (init ordering broken?)"

import numpy as np  # noqa: E402

from mla_tpu.diffusion import gaussian as gd  # noqa: E402
from mla_tpu.parallel import shard_batch  # noqa: E402
from mla_tpu.training import optim, strategy  # noqa: E402
from tiny import tiny_batch, tiny_config, tiny_model  # noqa: E402

cfg = tiny_config(use_contrastive=False)
params, mstate = tiny_model(cfg)  # same seed on both hosts -> identical init
sched = gd.create_schedule("", diffusion_steps=100)
tcfg = strategy.TrainConfig(
    learning_rate=1e-3, grad_accumulation_steps=1, repeated_diffusion_steps=1,
    enable_gradient_checkpointing=False, num_training_steps=10,
)
tx, _, _ = optim.make_optimizer(params, learning_rate=1e-3, num_training_steps=10)

mesh = make_mesh()  # 2 local devices/process -> 4 global, all on fsdp
assert len(mesh.devices.flatten()) == 4

state = strategy.init_train_state(params, tx, mstate)
state = strategy.shard_train_state(state, mesh)
step_fn = strategy.make_train_step(cfg, tcfg, tx, sched, mesh)

# per-host HALF of the global batch, deliberately DIFFERENT per host
host_batch = tiny_batch(cfg, B=4, seed=100 + pid)
local_pc_sum = float(np.sum(np.asarray(host_batch["point_cloud"], np.float64)))
batch = shard_batch(host_batch, mesh)
# the assembled global array must span BOTH hosts' rows
global_pc_sum = float(jax.jit(
    lambda b: jax.numpy.sum(b["point_cloud"].astype(jax.numpy.float64))
)(batch))

state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
loss = float(metrics["total_loss"])
# one global scalar over the (sharded) post-step params: identical on both
# hosts iff they ran ONE synchronized update rather than two replicas
param_norm = float(jax.jit(
    lambda p: jax.numpy.sqrt(sum(jax.numpy.sum(x.astype(jax.numpy.float32) ** 2)
                                 for x in jax.tree_util.tree_leaves(p)))
)(state["params"]))

# --- RLDS per-host sharding over a real on-disk tfds fixture ---
shard_lens = None
data_dir = os.environ.get("MLA_CHILD_DATA_DIR")
if data_dir:
    from mla_tpu.vla.rlds.dataset import make_dataset_from_rlds

    ds, _ = make_dataset_from_rlds(
        "rlbench", data_dir, train=True, shuffle=False, load_pointcloud=True,
        shard_by_host=True, stats_cache_dir=os.path.join(data_dir, f"cache{pid}"),
    )
    # trajectory lengths identify the fixture episodes (10/12/8)
    shard_lens = sorted(int(t["action"].shape[0]) for t in ds.as_numpy_iterator())

print(json.dumps({
    "pid": pid,
    "process_count": n_proc,
    "local_devices": jax.local_device_count(),
    "global_devices": jax.device_count(),
    "loss": loss,
    "param_norm": param_norm,
    "local_pc_sum": local_pc_sum,
    "global_pc_sum": global_pc_sum,
    "step": int(state["step"]),
    "shard_lens": shard_lens,
}))
