"""Coverage for config registries, loader edge cases, and registry metadata."""

import json

import numpy as np
import pytest

from tiny import tiny_config


def test_vla_config_registry_and_overrides():
    from mla_tpu.conf.vla import VLA_REGISTRY, get_vla_config

    assert "prism-dinosiglip-224px+oxe+diffusion" in VLA_REGISTRY
    tc = get_vla_config("prism-dinosiglip-224px+oxe+diffusion", learning_rate=1e-4, use_tactile=True)
    assert tc.learning_rate == 1e-4 and tc.use_tactile
    # reference Exp_MLA_Finetune hyperparameters preserved
    base = VLA_REGISTRY["prism-dinosiglip-224px+oxe+diffusion"]
    assert base.learning_rate == 2e-5 and base.data_mix == "rlbench"
    assert base.global_batch_size == 256 and base.per_device_batch_size == 16
    with pytest.raises(ValueError):
        get_vla_config("prism-dinosiglip-224px+oxe+diffusion", not_a_field=1)
    with pytest.raises(ValueError):
        get_vla_config("nope")


def test_stage_inference_from_flags():
    from mla_tpu.conf.vla import get_vla_config

    assert get_vla_config("prism-dinosiglip-224px+oxe+diffusion").stage == "pretrain"
    assert get_vla_config("prism-dinosiglip-224px+oxe+diffusion", freeze_vision_tower=True).stage == "finetune"
    assert get_vla_config("prism-dinosiglip-224px+oxe+diffusion", use_generation=True).stage == "post-training"


def test_model_registry():
    from mla_tpu.conf.models import MODEL_REGISTRY, get_model_config

    for mid in ("mla-7b", "mla-2b", "mla-small", "mla-tiny"):
        assert mid in MODEL_REGISTRY
    cfg = get_model_config("mla-7b")
    assert cfg.llama.num_layers == 32 and cfg.llama.hidden_size == 4096
    assert cfg.fused_len == 256 + 256 + 1
    # the reference's base_vlm id aliases to the flagship
    assert get_model_config("prism-dinosiglip-224px+7b").llama.hidden_size == 4096
    with pytest.raises(ValueError):
        get_model_config("unknown-model")


def test_dataset_registry():
    from mla_tpu.conf.datasets import DATASET_REGISTRY, get_dataset_config

    # the reference's five LLaVA-era variants, id-for-id (conf/datasets.py:33-124)
    assert set(DATASET_REGISTRY) == {
        "llava-v15", "llava-multimodal", "llava-lvis4v", "llava-lrv",
        "llava-lvis4v-lrv",
    }
    c = get_dataset_config("llava-v15")
    assert c.components_for_stage("align")[0].endswith("chat.json")
    assert c.components_for_stage("finetune")[0].endswith("mix665k.json")
    assert get_dataset_config("llava-lvis4v-lrv").finetune_stage_components[0].endswith(
        "lvis4v_lrv_mix1231k.json"
    )
    c2 = get_dataset_config("llava-v15", dataset_root_dir="/data")
    assert c2.dataset_root_dir == "/data"
    with pytest.raises(ValueError):
        get_dataset_config("nope")
    with pytest.raises(ValueError):
        c.components_for_stage("nope")


def test_zoo_metadata_registry():
    from mla_tpu.models.registry import (
        GLOBAL_REGISTRY,
        LLM_BACKBONE_REGISTRY,
        get_model_description,
    )

    d = get_model_description("prism-dinosiglip-224px+7b")
    assert d["vision_backbone_id"] == "dinosiglip-vit-so-224px"
    assert d["llm_backbone_id"] == "llama2-7b-pure"
    assert "Prism-DINOSigLIP 224px 7B" in GLOBAL_REGISTRY
    assert LLM_BACKBONE_REGISTRY["mistral-v0.1-7b-pure"]["cfg"]["num_kv_heads"] == 8
    with pytest.raises(ValueError):
        get_model_description("nope")


def test_resolve_checkpoint_edges(tmp_path):
    from mla_tpu.models.load import _resolve_checkpoint

    # bare .pt file
    pt = tmp_path / "ck.pt"
    pt.write_bytes(b"x")
    assert _resolve_checkpoint(pt) == pt
    # empty run dir -> None
    (tmp_path / "empty" / "checkpoints").mkdir(parents=True)
    assert _resolve_checkpoint(tmp_path / "empty") is None
    # reference-style dir with .pt files picks the last
    ckdir = tmp_path / "ref" / "checkpoints"
    ckdir.mkdir(parents=True)
    (ckdir / "step-000100.pt").write_bytes(b"a")
    (ckdir / "step-000200.pt").write_bytes(b"b")
    assert _resolve_checkpoint(tmp_path / "ref").name == "step-000200.pt"


def test_load_vla_random_init_without_checkpoint(tmp_path):
    """Pointing load_vla at a dir without checkpoints gives a working
    random-init policy (warn path)."""
    from mla_tpu.models.load import load_vla

    (tmp_path / "dataset_statistics.json").write_text(
        json.dumps({"d": {"action": {"q01": [-1] * 7, "q99": [1] * 7},
                          "proprio": {"q01": [-1] * 7, "q99": [1] * 7}}})
    )
    policy = load_vla(tmp_path, model_id="mla-tiny")
    assert policy.cfg.action_dim == 7
    assert policy.norm_stats["d"]["action"]["q99"] == [1] * 7


def test_simple_tokenizer_determinism():
    from mla_tpu.vla.tokenizer import SimpleTokenizer

    tok = SimpleTokenizer()
    a = tok("close the box")["input_ids"]
    b = tok("close the box")["input_ids"]
    assert a == b and a[0] == 1
    assert tok("<BOD><EOD>")["input_ids"][1:] == [32001, 32002]


def test_bench_emit_json_contract(capsys):
    """The driver parses bench.py's single JSON line; pin the schema keys
    and the net-of-RTT metric derivation."""
    import json
    import sys

    sys.path.insert(0, ".")
    import bench

    bench._emit(
        {"p50_s": 0.139, "p90_s": 0.145, "mean_s": 0.14, "rtt_s": 0.026,
         "transfer_ms": 100.0, "batch_chunks_per_sec": 14.8,
         "dpm4_chunks_per_sec": 14.5, "throughput_batch": 4,
         "ar_actions_per_sec": 9.5,
         "suffix_ms_per_step": 10.7, "prefill_ms": 26.0, "mfu_prefill": 0.68},
        "mla-7b-int8", "tpu",
    )
    out = json.loads(capsys.readouterr().out.strip())
    assert out["metric"] == "action_chunks_per_sec_chip"
    assert out["unit"] == "chunks/s"
    # metric_version 3: value is the qualified DPM-4 serving mode (net of
    # RTT); the reference-exact DDIM-8 reading is carried alongside
    assert out["metric_version"] >= 3
    assert out["sampler"] == "dpm4"
    assert out["value"] == 14.5
    assert abs(out["ddim8_chunks_per_sec"] - 1.0 / (0.139 - 0.026)) < 1e-2
    assert out["p50_ms"] == 139.0 and out["p50_net_ms"] == 113.0
    assert out["vs_baseline"] == round(out["value"] / 2.3, 3)
    for k in ("dispatch_rtt_ms", "batch_chunks_per_sec", "dpm4_chunks_per_sec",
              "baseline_note", "model", "backend", "ddim_steps"):
        assert k in out, k
    # machine-readable perf split (VERDICT r2 #8): suffix step, prefill, MFU
    assert out["suffix_ms_per_step"] == 10.7
    assert out["prefill_ms"] == 26.0
    assert out["mfu_prefill"] == 0.68
    assert out["ar_actions_per_sec"] == 9.5


def test_bench_degraded_relabel():
    """A CPU fallback reading (TPU tunnel down) must never masquerade as a
    chip measurement: vs_baseline zeroed, degraded note attached, newest
    recorded TPU bench carried for context. On-TPU lines pass through."""
    import json
    import sys

    sys.path.insert(0, ".")
    import bench

    line = json.dumps({"metric": "action_chunks_per_sec_chip", "value": 0.4,
                       "vs_baseline": 0.174, "backend": "cpu"})
    assert bench._augment_degraded(line, on_tpu=True, backend="tpu") == line

    out = json.loads(bench._augment_degraded(line, on_tpu=False, backend=None))
    assert out["vs_baseline"] == 0.0
    assert "tunnel-down" in out["degraded"]
    # the repo carries BENCH_r0*.json records; the newest is attached
    assert out["last_tpu_bench"]["file"].startswith("BENCH_r")
    assert out["last_tpu_bench"]["value"] > 0

    out2 = json.loads(bench._augment_degraded(line, on_tpu=False, backend="cpu"))
    assert "not comparable" in out2["degraded"]
