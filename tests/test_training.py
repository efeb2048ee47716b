"""Training runtime tests: optimizer masking, one sharded train step on the
virtual 8-device CPU mesh (the multi-chip path), grad accumulation, EMA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.diffusion import gaussian as gd
from mla_tpu.parallel import make_mesh, param_shardings, shard_batch, sharding as shard_mod
from mla_tpu.training import optim, strategy
from mla_tpu.training.metrics import VLAMetrics

from tiny import tiny_batch, tiny_config, tiny_model


def test_no_decay_rule():
    p = {
        "llm_backbone": {
            "layers": {"input_ln": {"scale": jnp.ones((4, 8))}},
            "embed": {"table": jnp.ones((16, 8))},
        },
        "projector_2d": {"layers": [{"w": jnp.ones((4, 8)), "b": jnp.ones((8,))}]},
    }
    assert optim.is_no_decay("llm_backbone/layers/input_ln/scale", jnp.ones((4, 8)))
    assert not optim.is_no_decay("llm_backbone/embed/table", jnp.ones((16, 8)))
    assert optim.is_no_decay("projector_2d/layers/0/b", jnp.ones((8,)))
    assert not optim.is_no_decay("projector_2d/layers/0/w", jnp.ones((4, 8)))


def test_stage_freezing():
    cfg = tiny_config()
    params, _ = tiny_model(cfg)
    mask = optim.trainable_mask(params, stage="finetune")
    flat = jax.tree_util.tree_leaves_with_path(mask)
    from mla_tpu.utils.tree import path_str

    for path, trainable in flat:
        p = path_str(path)
        if p.startswith("vision_tower_2d") or p.startswith("vision_tower_3d"):
            assert not trainable, p
        elif p.startswith("llm_backbone"):
            assert trainable, p


def test_adafactor_masked_layout():
    """optimizer='adafactor' (the single-chip rung for billion-param models:
    fp32 Adam moments at mla-2b are ~15 GB and OOM the 16 GB dev chip) keeps
    the production masked layout: frozen leaves get ZERO updates and carry
    no optimizer state, second moments are factored (no full-size fp32
    moment per weight), and trainable leaves actually move."""
    cfg = tiny_config()
    params, _ = tiny_model(cfg)
    tx, _, mask = optim.make_optimizer(
        params, stage="finetune", num_training_steps=10, optimizer="adafactor",
    )
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 0.01, params)
    updates, _ = tx.update(grads, opt_state, params)
    flat_mask = dict(jax.tree_util.tree_leaves_with_path(mask))
    for path, u in jax.tree_util.tree_leaves_with_path(updates):
        if flat_mask[path]:
            assert float(jnp.abs(u).max()) > 0.0, path
        else:
            assert float(jnp.abs(u).max()) == 0.0, path
    # factored second moments: optax only factors dims >= 128 (the tiny
    # model's dims are below that), so check the memory claim at a
    # production-like width — state floats must be far under one full
    # fp32 moment per weight element
    big = {"llm_backbone": {"layers": {"mlp": {"w": jnp.zeros((512, 2048))}}}}
    tx2, _, _ = optim.make_optimizer(big, num_training_steps=10, optimizer="adafactor")
    n_state = sum(
        x.size for x in jax.tree_util.tree_leaves(tx2.init(big))
        if hasattr(x, "size")
    )
    assert n_state < 0.1 * 512 * 2048, n_state


def test_adafactor_rejects_weight_decay():
    """optax.adafactor's weight_decay_rate is a constant per-step shrink,
    NOT adamw's lr-scaled decoupled decay — make_optimizer must refuse
    rather than silently change semantics between the two optimizers."""
    cfg = tiny_config()
    params, _ = tiny_model(cfg)
    with pytest.raises(ValueError, match="adafactor"):
        optim.make_optimizer(
            params, num_training_steps=10, optimizer="adafactor",
            weight_decay=0.01,
        )


def test_lr_schedules():
    s = optim.make_lr_schedule("linear-warmup+cosine-decay", 1e-4, 100, warmup_ratio=0.1)
    assert float(s(0)) < 1e-5
    assert float(s(10)) == pytest.approx(1e-4, rel=1e-2)
    assert float(s(100)) < 1e-6
    c = optim.make_lr_schedule("constant", 2e-5, 100)
    assert float(c(50)) == pytest.approx(2e-5)


def test_mesh_shapes():
    mesh = make_mesh()  # all 8 virtual devices on fsdp
    assert mesh.shape["fsdp"] == 8
    mesh2 = make_mesh(dp=2, fsdp=4)
    assert mesh2.shape == {"dp": 2, "fsdp": 4, "tp": 1}


def test_param_shardings_avoid_layer_axis():
    cfg = tiny_config()
    params, _ = tiny_model(cfg)
    mesh = make_mesh()
    sh = param_shardings(params, mesh)
    # stacked llama q weight [L=4, 64, 64]: L axis must not carry 'fsdp'
    spec = sh["llm_backbone"]["layers"]["attn"]["q"]["w"].spec
    assert spec[0] is None
    assert "fsdp" in [s for s in spec if s]


def test_tp_rules():
    cfg = tiny_config()
    params, _ = tiny_model(cfg)
    mesh = make_mesh(fsdp=2, tp=4)
    sh = param_shardings(params, mesh, use_tp=True)
    q = sh["llm_backbone"]["layers"]["attn"]["q"]["w"].spec
    o = sh["llm_backbone"]["layers"]["attn"]["o"]["w"].spec
    assert q[-1] == "tp" and o[-2] == "tp"
    head = sh["llm_backbone"]["lm_head"]["w"].spec
    assert head[-1] == "tp"


@pytest.mark.parametrize("accum", [1, 2])
def test_train_step_runs_and_descends(accum):
    """Two optimizer steps on the 8-device mesh must reduce the diff loss
    deterministically (same rng) and keep everything finite."""
    cfg = tiny_config(use_contrastive=False)
    params, mstate = tiny_model(cfg)
    sched = gd.create_schedule("", diffusion_steps=100)
    tcfg = strategy.TrainConfig(
        learning_rate=1e-3, grad_accumulation_steps=accum,
        repeated_diffusion_steps=1, enable_gradient_checkpointing=False,
        num_training_steps=10, use_ema=True,
    )
    tx, _, _ = optim.make_optimizer(
        params, learning_rate=tcfg.learning_rate, num_training_steps=10
    )
    mesh = make_mesh()
    state = strategy.init_train_state(params, tx, mstate, use_ema=True)
    state = strategy.shard_train_state(state, mesh)
    step_fn = strategy.make_train_step(cfg, tcfg, tx, sched, mesh)

    batch = tiny_batch(cfg, B=8)  # divisible by the 8-device mesh
    batch = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(0)

    losses = []
    for i in range(3):
        state, metrics = step_fn(state, batch, rng)  # same rng -> same noise draw
        losses.append(float(metrics["total_loss"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["grad_norm"]))
    assert losses[2] < losses[0], losses
    assert int(state["step"]) == 3
    # EMA tracked
    assert "ema_params" in state


def test_vla_metrics_jsonl(tmp_path):
    m = VLAMetrics(["jsonl"], "test-run", tmp_path, {"lr": 1e-4})
    m.commit(global_step=1, lr=1e-4, update_step_time=True, total_loss=0.5, diff_loss=0.4)
    line = m.push()
    assert "Loss :: 0.5" in line
    assert (tmp_path / "test-run.jsonl").exists()
    assert (tmp_path / "run-metrics.jsonl").exists()


def test_preemption_checkpoint_and_resume(tmp_path):
    """Preemption-safe training (beyond the reference's crash-and-restart):
    SIGTERM mid-run makes the loop save ONE checkpoint at the next step
    boundary and exit cleanly; --is_resume continues from it. TPU-pod
    preemptions deliver exactly this signal with a grace window."""
    import signal
    import subprocess
    import sys as _sys
    import time as _time
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    args = [
        _sys.executable, str(repo / "scripts" / "train.py"),
        "--vla.type", "mla-tiny-debug",
        "--run_id", "preempt-e2e",
        "--max_steps", "50",            # far more than will run
        "--save_interval", "1000",      # no cadence saves before the signal
        "--per_device_batch_size", "1",
        "--global_batch_size", "8",
        "--run_root_dir", str(tmp_path),
        "--use_contrastive", "false",
    ]
    run_dir = tmp_path / "preempt-e2e"
    # stdout goes to a FILE, not a pipe: XLA's cpu_aot_loader machine-feature
    # warnings can emit hundreds of KB — an undrained PIPE fills and blocks
    # the trainer's writes, deadlocking it before the first step completes
    log_path = tmp_path / "trainer.log"
    with open(log_path, "w") as log_f:
        proc = subprocess.Popen(args, cwd=repo, stdout=log_f,
                                stderr=subprocess.STDOUT, text=True)
        try:
            # wait until the first metrics push proves a step completed
            deadline = _time.time() + 600
            jsonl = run_dir / "preempt-e2e.jsonl"
            while _time.time() < deadline:
                if jsonl.exists() and jsonl.read_text().strip():
                    break
                if proc.poll() is not None:
                    raise AssertionError(f"trainer died early:\n{log_path.read_text()[-4000:]}")
                _time.sleep(2)
            else:
                raise AssertionError(
                    f"no training step completed within 10 min:\n{log_path.read_text()[-4000:]}"
                )
            proc.send_signal(signal.SIGTERM)
            proc.wait(timeout=300)
        finally:
            if proc.poll() is None:
                proc.kill()
    out = log_path.read_text()
    assert proc.returncode == 0, out[-4000:]
    assert "preempted: checkpoint saved" in out, out[-4000:]

    ckpts = sorted((run_dir / "checkpoints").glob("step-*"))
    assert ckpts, out
    saved_step = max(int(c.name.split("-")[1]) for c in ckpts)
    assert 1 <= saved_step < 50

    # resume one more step from the preemption checkpoint
    _sys.path.insert(0, str(repo / "scripts"))
    import importlib

    train_mod = importlib.import_module("train")
    train_mod.main([a for a in args[2:]] + [
        "--max_steps", str(saved_step + 1), "--is_resume", "true",
    ])
    after = {c.name for c in (run_dir / "checkpoints").glob("step-*")}
    assert any(n.startswith(f"step-{saved_step + 1:06d}") for n in after), after


def test_vla_metrics_throughput(tmp_path):
    import json

    m = VLAMetrics(
        ["jsonl"], "tp-run", tmp_path, {},
        flops_per_token=6.0 * 1e9, peak_flops=197e12,
    )
    m.step_start_time -= 2.0  # fake a 2 s step
    m.commit(global_step=1, update_step_time=True, tokens=10_000, total_loss=0.1)
    m.push()
    rec = json.loads((tmp_path / "tp-run.jsonl").read_text().splitlines()[-1])
    tps = rec["VLA Train/Tokens per Sec"]
    assert tps == pytest.approx(5000.0, rel=0.1)
    assert rec["VLA Train/MFU"] == pytest.approx(tps * 6e9 / 197e12, rel=1e-6)


def test_two_process_distributed_train_step(tmp_path):
    """2-process jax.distributed e2e (localhost coordinator, CPU backend):
    both hosts must run ONE synchronized update — identical post-step
    params/loss across processes, a global batch spanning both hosts' rows
    (the shard_batch make_array_from_process_local_data path), and disjoint
    RLDS per-host data shards. Guards the initialize-before-backend-query
    ordering (commit 2cd54d2): broken ordering leaves process_count()==1
    and the child asserts out."""
    import json
    import os
    import socket
    import subprocess
    import sys as _sys
    from pathlib import Path

    # free localhost port for the coordinator
    with socket.socket() as s:
        try:
            s.bind(("127.0.0.1", 0))
        except OSError:
            pytest.skip("no localhost sockets available")
        port = s.getsockname()[1]

    # on-disk tfds fixture for the RLDS shard-disjointness half
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_tfds_builder import write_rlbench_fixture

    data_dir = tmp_path / "data"
    write_rlbench_fixture(data_dir)

    child = Path(__file__).parent / "distributed_child.py"
    procs, logs = [], []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            PALLAS_AXON_TPU_GEN="",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            MLA_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            MLA_NUM_PROCESSES="2",
            MLA_PROCESS_ID=str(pid),
            MLA_CHILD_DATA_DIR=str(data_dir),
        )
        # stream to files: an unread PIPE deadlocks on XLA's chatty stderr
        log = open(tmp_path / f"child{pid}.log", "w+")
        logs.append(log)
        procs.append(subprocess.Popen(
            [_sys.executable, str(child)], env=env, stdout=log, stderr=subprocess.STDOUT,
        ))
    try:
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    outs = []
    for pid, (p, log) in enumerate(zip(procs, logs)):
        log.seek(0)
        text = log.read()
        log.close()
        assert p.returncode == 0, f"child {pid} failed:\n{text[-3000:]}"
        outs.append(json.loads(
            [l for l in text.splitlines() if l.startswith("{")][-1]
        ))

    a, b = sorted(outs, key=lambda o: o["pid"])
    assert (a["process_count"], b["process_count"]) == (2, 2)
    assert a["global_devices"] == b["global_devices"] == 4
    assert a["step"] == b["step"] == 1
    # ONE synchronized model: bit-identical global loss and post-step params
    assert a["loss"] == b["loss"]
    assert a["param_norm"] == b["param_norm"]
    # the global batch really contains BOTH hosts' (different) local rows
    assert a["local_pc_sum"] != b["local_pc_sum"]
    assert a["global_pc_sum"] == b["global_pc_sum"]
    assert a["global_pc_sum"] == pytest.approx(
        a["local_pc_sum"] + b["local_pc_sum"], rel=1e-6
    )
    # RLDS per-host shards: disjoint, and together exactly the fixture
    # episodes (lengths 10/12/8)
    assert a["shard_lens"] and b["shard_lens"]
    assert sorted(a["shard_lens"] + b["shard_lens"]) == [8, 10, 12]
