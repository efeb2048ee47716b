"""Dynamic-batching serving host (mla_tpu/serving/ + scripts/serve.py).

Logic tests run against a fake policy (no JAX dispatch); one smoke test runs
the real composed mla-tiny model through the server end to end; the HTTP
front-end is exercised with a live ThreadingHTTPServer on a loopback port.
"""

from __future__ import annotations

import io
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

from mla_tpu.models.mla import build_prompt_ids
from mla_tpu.serving import BatchingServer
from mla_tpu.vla.tokenizer import SimpleTokenizer

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


class FakePolicy:
    """Shape-faithful stand-in: row b of the output encodes (row index into
    the submitted batch, mean of that row's image) so tests can verify that
    each caller gets its own row back and padding rows are dropped."""

    def __init__(self, action_dim=7, horizon=16, fail=False, delay_s=0.0):
        self.cfg = SimpleNamespace(
            action_dim=action_dim, action_horizon=horizon,
            vision=SimpleNamespace(image_size=32),
        )
        self.tokenizer = SimpleTokenizer()
        self.calls = []
        self.fail = fail
        self.delay_s = delay_s

    def dispatch_action_diff_batched(self, images, pcs, instruction=None, *,
                                     input_ids=None, cur_robot_states=None,
                                     unnorm_key=None, seed=0, sampler="ddim",
                                     num_dpm_steps=4, num_ddim_steps=None):
        # mirrors the real policy's async contract: dispatch is cheap and
        # records the call; finalize simulates blocking on device execution
        if self.fail:
            raise RuntimeError("device on fire")
        B = images.shape[0]
        call = {
            "B": B, "L": int(input_ids.shape[1]), "sampler": sampler,
            "unnorm_key": unnorm_key,
            # keep as-is: the real policy accepts per-row None entries
            "proprio": cur_robot_states,
            "dispatch_t": time.monotonic(),
        }
        self.calls.append(call)

        def finalize():
            if self.delay_s:
                time.sleep(self.delay_s)
            call["finalize_t"] = time.monotonic()
            out = np.zeros((B, self.cfg.action_horizon, self.cfg.action_dim), np.float32)
            out[:, 0, 0] = np.arange(B)
            out[:, 0, 1] = images.reshape(B, -1).mean(axis=1)
            return out

        return finalize

    def predict_action_diff_batched(self, *args, **kwargs):
        return self.dispatch_action_diff_batched(*args, **kwargs)()


def _obs(v: float, size=32, pts=64):
    img = np.full((4, size, size), v, np.float32)
    pc = np.full((pts, 3), v, np.float32)
    return img, pc


def test_concurrent_requests_coalesce_into_one_padded_call():
    policy = FakePolicy(delay_s=0.3)
    with BatchingServer(policy, buckets=(1, 2, 4), max_wait_ms=5) as srv:
        # the first request's batching window (5 ms) closes before the others
        # are submitted; its slow device call (300 ms) then keeps the worker
        # busy while the next three queue up — they must coalesce into ONE
        # bucketed call
        futs = [srv.submit(*_obs(0.0), "close the box")]
        time.sleep(0.1)
        futs += [srv.submit(*_obs(float(i)), "close the box") for i in (1, 2, 3)]
        results = [f.result(timeout=10) for f in futs]

    assert [c["B"] for c in policy.calls] == [1, 4]  # 1 warm + 3 coalesced→pad 4
    # each caller got its own row back (row index ∧ image mean round-trip)
    for i, r in enumerate(results):
        assert r.shape == (16, 7)
        assert r[0, 1] == pytest.approx(float(i))
    s = srv.stats()
    assert s["requests"] == 4 and s["device_calls"] == 2
    assert s["padded_rows"] == 1 and s["errors"] == 0
    assert s["avg_batch_size"] == pytest.approx(2.5)


def test_requests_group_by_prompt_length_and_unnorm_key():
    policy = FakePolicy(delay_s=0.3)
    tok = SimpleTokenizer()
    short = build_prompt_ids(tok, "go", mode="diff")
    long = build_prompt_ids(tok, "carefully close the upper drawer", mode="diff")
    assert short.shape[1] != long.shape[1]
    with BatchingServer(policy, buckets=(1, 2, 4), max_wait_ms=5) as srv:
        warm = srv.submit(*_obs(9.0), input_ids=short)
        time.sleep(0.1)
        futs = [
            srv.submit(*_obs(1.0), input_ids=short),
            srv.submit(*_obs(2.0), input_ids=long),
            srv.submit(*_obs(3.0), input_ids=short),
        ]
        for f in [warm] + futs:
            f.result(timeout=10)
    post_warm = policy.calls[1:]
    assert sorted((c["B"], c["L"]) for c in post_warm) == sorted(
        [(2, short.shape[1]), (1, long.shape[1])]
    )


def test_depth2_pipelining_dispatches_next_batch_during_execution():
    """With more waiting requests than one bucket holds, the worker must
    dispatch batch 2 BEFORE blocking on batch 1's results (JAX async
    dispatch hides host batching under device execution)."""
    policy = FakePolicy(delay_s=0.25)
    with BatchingServer(policy, buckets=(1, 2), max_wait_ms=5) as srv:
        warm = srv.submit(*_obs(9.0), "x")
        time.sleep(0.05)
        # four requests arrive while the warm call executes -> two B=2
        # batches; batch 2's dispatch must precede batch 1's finalize
        futs = [srv.submit(*_obs(float(i)), "x") for i in range(4)]
        for f in [warm] + futs:
            f.result(timeout=10)
    b1, b2 = policy.calls[1], policy.calls[2]
    assert (b1["B"], b2["B"]) == (2, 2)
    assert b2["dispatch_t"] < b1["finalize_t"], (
        "second batch was not dispatched while the first executed"
    )


def test_dispatch_ahead_depth_is_capped_at_two():
    """Under sustained overload the worker must never queue more than two
    device calls ahead (bounds device-side input-buffer memory): call i's
    dispatch waits for call i-2's results."""
    policy = FakePolicy(delay_s=0.1)
    with BatchingServer(policy, buckets=(1,), max_wait_ms=1) as srv:
        futs = [srv.submit(*_obs(float(i)), "x") for i in range(6)]
        for f in futs:
            f.result(timeout=10)
    calls = policy.calls
    assert len(calls) == 6
    for i in range(2, len(calls)):
        assert calls[i]["dispatch_t"] >= calls[i - 2]["finalize_t"], (
            f"call {i} dispatched before call {i - 2} finished"
        )


def test_error_propagates_to_every_caller_and_server_survives():
    policy = FakePolicy(fail=True)
    with BatchingServer(policy, max_wait_ms=1) as srv:
        f1 = srv.submit(*_obs(0.0), "x")
        f2 = srv.submit(*_obs(1.0), "x")
        for f in (f1, f2):
            with pytest.raises(RuntimeError, match="device on fire"):
                f.result(timeout=10)
        policy.fail = False
        ok = srv.submit(*_obs(2.0), "x").result(timeout=10)
        assert ok.shape == (16, 7)
        assert srv.stats()["errors"] >= 1


def test_per_request_proprio_reaches_the_batch():
    policy = FakePolicy()
    with BatchingServer(policy, max_wait_ms=1) as srv:
        srv.submit(*_obs(0.0), "x", cur_robot_state=np.full(7, 0.5, np.float32)) \
           .result(timeout=10)
    assert policy.calls[-1]["proprio"] is not None
    np.testing.assert_allclose(policy.calls[-1]["proprio"][0], np.full(7, 0.5))


def test_proprio_less_rows_pass_none_through_mixed_batches():
    """A proprio-less request coalesced with proprio-bearing ones must reach
    the policy as a per-row None (-> normalized-zero), NOT a raw zero vector
    (whose normalization depends on the stats and would make the result
    depend on batch composition)."""
    policy = FakePolicy(delay_s=0.3)
    with BatchingServer(policy, buckets=(1, 2, 4), max_wait_ms=5) as srv:
        futs = [srv.submit(*_obs(0.0), "x")]            # no proprio
        time.sleep(0.1)
        futs.append(srv.submit(*_obs(1.0), "x"))        # no proprio
        futs.append(srv.submit(*_obs(2.0), "x",
                               cur_robot_state=np.full(7, 0.5, np.float32)))
        for f in futs:
            f.result(timeout=10)
    mixed = next(c for c in policy.calls if c["B"] >= 2)
    assert mixed["proprio"] is not None
    assert mixed["proprio"][0] is None
    np.testing.assert_allclose(np.asarray(mixed["proprio"][1]), np.full(7, 0.5))


def test_max_pending_sheds_load_and_recovers():
    from mla_tpu.serving import QueueFull

    policy = FakePolicy(delay_s=0.2)
    with BatchingServer(policy, buckets=(1,), max_wait_ms=1, max_pending=2) as srv:
        f1 = srv.submit(*_obs(0.0), "x")
        f2 = srv.submit(*_obs(1.0), "x")
        with pytest.raises(QueueFull):
            srv.submit(*_obs(2.0), "x")
        assert srv.stats()["rejected"] == 1
        f1.result(timeout=10)
        f2.result(timeout=10)
        # capacity frees as futures resolve
        assert srv.submit(*_obs(3.0), "x").result(timeout=10).shape == (16, 7)


def test_http_503_on_overload():
    from http.server import ThreadingHTTPServer

    import serve as serve_mod

    policy = FakePolicy(delay_s=0.5)
    with BatchingServer(policy, buckets=(1,), max_wait_ms=1, max_pending=1) as srv:
        httpd = ThreadingHTTPServer(
            ("127.0.0.1", 0), serve_mod.make_handler(srv, policy.cfg)
        )
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            def body(v):
                img, pc = _obs(v)
                buf = io.BytesIO()
                np.savez(buf, image=img, pointcloud=pc,
                         instruction=np.asarray("x"))
                return buf.getvalue()

            base = f"http://127.0.0.1:{port}"
            slow = threading.Thread(
                target=lambda: urllib.request.urlopen(
                    urllib.request.Request(f"{base}/predict", data=body(0.0),
                                           method="POST"), timeout=30).read(),
                daemon=True,
            )
            slow.start()
            time.sleep(0.1)   # first request now occupies the only slot
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(
                    urllib.request.Request(f"{base}/predict", data=body(1.0),
                                           method="POST"), timeout=10)
            assert ei.value.code == 503
            slow.join(timeout=10)
        finally:
            httpd.shutdown()
            t.join(timeout=10)


def test_bucket_validation():
    with pytest.raises(ValueError, match="buckets"):
        BatchingServer(FakePolicy(), buckets=(4, 2))
    with pytest.raises(ValueError, match="buckets"):
        BatchingServer(FakePolicy(), buckets=())


def test_http_front_end_round_trip():
    from http.server import ThreadingHTTPServer

    import serve as serve_mod

    policy = FakePolicy()
    with BatchingServer(policy, max_wait_ms=1) as srv:
        httpd = ThreadingHTTPServer(
            ("127.0.0.1", 0), serve_mod.make_handler(srv, policy.cfg)
        )
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{port}"
            with urllib.request.urlopen(f"{base}/healthz", timeout=10) as r:
                assert json.load(r) == {"ok": True}

            img, pc = _obs(2.0)
            buf = io.BytesIO()
            np.savez(buf, image=img, pointcloud=pc,
                     instruction=np.asarray("close the box"),
                     proprio=np.zeros(7, np.float32))
            req = urllib.request.Request(f"{base}/predict", data=buf.getvalue(),
                                         method="POST")
            with urllib.request.urlopen(req, timeout=30) as r:
                actions = np.asarray(json.load(r)["actions"])
            assert actions.shape == (16, 7)
            assert actions[0, 1] == pytest.approx(2.0)

            with urllib.request.urlopen(f"{base}/stats", timeout=10) as r:
                stats = json.load(r)
            assert stats["requests"] == 1 and stats["device_calls"] == 1

            # malformed body reports a client error, does not kill the server
            bad = urllib.request.Request(f"{base}/predict", data=b"not an npz",
                                         method="POST")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad, timeout=10)
            assert ei.value.code == 400
        finally:
            httpd.shutdown()
            t.join(timeout=10)


def test_latency_stats_and_batch_histogram():
    policy = FakePolicy(delay_s=0.05)
    with BatchingServer(policy, buckets=(1, 2, 4), max_wait_ms=5) as srv:
        warm = srv.submit(*_obs(0.0), "close the box")
        time.sleep(0.1)
        futs = [srv.submit(*_obs(float(i)), "close the box") for i in (1, 2, 3)]
        for f in [warm] + futs:
            f.result(timeout=10)
        s = srv.stats()
    # 1 warm call (B=1) + 3 coalesced into one padded B=4 call
    assert s["batch_size_hist"] == {1: 1, 4: 1}
    assert s["pending"] == 0
    for key in ("queue_wait_ms", "e2e_ms"):
        assert s[key]["window"] == 4
        assert 0.0 <= s[key]["p50"] <= s[key]["p95"] <= s[key]["max"]
    # every request waited for the device call to finish (>= 50 ms fake
    # execution), and the coalesced ones additionally queued behind the warm
    # call, so e2e must dominate queue wait
    assert s["e2e_ms"]["p50"] >= 50.0
    assert s["e2e_ms"]["max"] >= s["queue_wait_ms"]["max"]


def test_reset_latency_stats_clears_rings_keeps_counters():
    """Benchmarks reset after warmup so percentiles are steady-state only."""
    policy = FakePolicy(delay_s=0.01)
    with BatchingServer(policy, buckets=(1,), max_wait_ms=1) as srv:
        srv.submit(*_obs(0.0), "close the box").result(timeout=10)
        srv.reset_latency_stats()
        s = srv.stats()
        # counters survive the reset; the latency rings do not
        assert s["requests"] == 1 and s["device_calls"] == 1
        assert "e2e_ms" not in s and "queue_wait_ms" not in s
        # rings repopulate from post-reset traffic only
        srv.submit(*_obs(1.0), "close the box").result(timeout=10)
        s = srv.stats()
        assert s["e2e_ms"]["window"] == 1
        assert s["requests"] == 2


def test_metrics_endpoint_prometheus_format():
    from http.server import ThreadingHTTPServer

    import serve as serve_mod

    policy = FakePolicy()
    with BatchingServer(policy, max_wait_ms=1) as srv:
        httpd = ThreadingHTTPServer(
            ("127.0.0.1", 0), serve_mod.make_handler(srv, policy.cfg)
        )
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{port}"
            img, pc = _obs(1.0)
            buf = io.BytesIO()
            np.savez(buf, image=img, pointcloud=pc,
                     instruction=np.asarray("close the box"))
            req = urllib.request.Request(f"{base}/predict", data=buf.getvalue(),
                                         method="POST")
            urllib.request.urlopen(req, timeout=30).read()

            with urllib.request.urlopen(f"{base}/metrics", timeout=10) as r:
                assert r.headers["Content-Type"].startswith("text/plain")
                body = r.read().decode()
        finally:
            httpd.shutdown()
            t.join(timeout=10)
    assert "# TYPE mla_serve_requests counter" in body
    assert "mla_serve_requests 1" in body
    assert "mla_serve_device_calls 1" in body
    assert 'mla_serve_batches{bucket="1"} 1' in body
    assert 'mla_serve_e2e_ms{quantile="p50"}' in body


def test_uint8_on_device_preprocess_matches_host_path():
    """Serving accepts RAW uint8 CHW frames; CLIP normalization + mask
    channel run on-device (models/mla.py _device_clip_preprocess) and must
    reproduce the host clip_preprocess/add_mask_channel math (the two
    paths ship 5.3x different byte counts but identical conditioning)."""
    import jax

    from mla_tpu.conf.models import get_model_config
    from mla_tpu.models import prismatic
    from mla_tpu.models.mla import MLAPolicy, build_prompt_ids
    from mla_tpu.vla.datasets import CLIP_MEAN, CLIP_STD

    cfg = get_model_config("mla-tiny", use_contrastive=False)
    params, state = prismatic.mla_model_init(jax.random.PRNGKey(0), cfg)
    stats = {"t": {
        "action": {"q01": [-1.0] * cfg.action_dim, "q99": [1.0] * cfg.action_dim},
        "proprio": {"q01": [-1.0] * cfg.action_dim, "q99": [1.0] * cfg.action_dim},
    }}
    policy = MLAPolicy(params, state, cfg, tokenizer=SimpleTokenizer(), norm_stats=stats)

    rng = np.random.default_rng(3)
    size = cfg.vision.image_size
    raw_hwc = rng.integers(0, 256, size=(size, size, 3)).astype(np.uint8)
    # host reference path: float32 normalize + mask channel
    f = raw_hwc.astype(np.float32) / 255.0
    f = ((f - CLIP_MEAN) / CLIP_STD).transpose(2, 0, 1)
    host_img = np.concatenate([f, np.ones((1, size, size), np.float32)])
    pc = rng.normal(size=(cfg.point.input_points, 3)).astype(np.float32)
    ids = build_prompt_ids(policy.tokenizer, "close the box", mode="diff")

    kw = dict(input_ids=ids, unnorm_key="t", seed=5, sampler="dpm", num_dpm_steps=2)
    a_host = policy.predict_action_diff_batched(host_img[None], pc[None], **kw)
    a_dev = policy.predict_action_diff_batched(
        raw_hwc.transpose(2, 0, 1)[None], pc[None], **kw
    )
    np.testing.assert_allclose(a_dev, a_host, rtol=1e-4, atol=1e-5)


def test_real_tiny_policy_through_server():
    """End-to-end: the real composed model behind the batching server — two
    concurrent heterogeneous-proprio requests, one batched device call, and
    the server's rows match a direct predict_action_diff_batched call with
    the identical batch composition."""
    import jax

    from mla_tpu.conf.models import get_model_config
    from mla_tpu.models import prismatic
    from mla_tpu.models.mla import MLAPolicy

    cfg = get_model_config("mla-tiny", use_contrastive=False)
    params, state = prismatic.mla_model_init(jax.random.PRNGKey(0), cfg)
    stats = {"t": {
        "action": {"q01": [-1.0] * cfg.action_dim, "q99": [1.0] * cfg.action_dim},
        "proprio": {"q01": [-1.0] * cfg.action_dim, "q99": [1.0] * cfg.action_dim},
    }}
    policy = MLAPolicy(params, state, cfg, tokenizer=SimpleTokenizer(), norm_stats=stats)

    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    obs = []
    for i in range(2):
        img = np.concatenate([
            rng.normal(size=(3, size, size)).astype(np.float32),
            np.ones((1, size, size), np.float32),
        ])
        pc = rng.normal(size=(cfg.point.input_points, 3)).astype(np.float32)
        obs.append((img, pc))
    proprios = [np.full(cfg.action_dim, 0.25, np.float32),
                np.full(cfg.action_dim, -0.5, np.float32)]

    with BatchingServer(policy, buckets=(1, 2), max_wait_ms=500,
                        sampler="dpm", num_dpm_steps=2) as srv:
        # warm the worker alone first (compiles the B=1 graph), then submit
        # two concurrent requests — the 500 ms window coalesces them into one
        # B=2 device call
        srv.submit(obs[0][0], obs[0][1], "warm",
                   cur_robot_state=proprios[0], unnorm_key="t").result(timeout=600)
        futs = [
            srv.submit(obs[i][0], obs[i][1], "close the box",
                       cur_robot_state=proprios[i], unnorm_key="t", seed=5)
            for i in range(2)
        ]
        rows = [f.result(timeout=600) for f in futs]
    assert srv.stats()["device_calls"] == 2

    ids = build_prompt_ids(policy.tokenizer, "close the box", mode="diff")
    direct = policy.predict_action_diff_batched(
        np.stack([obs[0][0], obs[1][0]]), np.stack([obs[0][1], obs[1][1]]),
        input_ids=np.concatenate([ids, ids], axis=0),
        cur_robot_states=np.stack(proprios),
        unnorm_key="t", seed=5, sampler="dpm", num_dpm_steps=2,
    )
    np.testing.assert_allclose(np.stack(rows), direct, rtol=1e-5, atol=1e-5)
    assert np.isfinite(direct).all()

    # batch-composition invariance of a proprio-less row: per-row None maps
    # to NORMALIZED zero — equal to the stats midpoint's raw value, and NOT
    # to normalize(raw 0). Only visible under asymmetric proprio stats, in
    # NORMALIZED (pre-clip) space, and with the eps head randomized: fresh
    # weights carry the reference's ZERO-init final_layer (prismatic.py:320),
    # so eps==0 and the sampler output would be proprio-independent (the same
    # vacuousness the golden drivers guard against).
    import jax.numpy as jnp

    params2 = dict(params)
    fl = {k: dict(v) if isinstance(v, dict) else v
          for k, v in params["final_layer"].items()}
    fl["mlp"] = dict(fl["mlp"])
    fl["mlp"]["fc2"] = dict(fl["mlp"]["fc2"])
    fl["mlp"]["fc2"]["w"] = 1e-2 * jax.random.normal(
        jax.random.PRNGKey(7), params["final_layer"]["mlp"]["fc2"]["w"].shape,
        jnp.float32,
    )
    params2["final_layer"] = fl
    stats["t2"] = {
        "action": {"q01": [-1.0] * cfg.action_dim, "q99": [1.0] * cfg.action_dim},
        "proprio": {"q01": [0.0] * cfg.action_dim, "q99": [1.0] * cfg.action_dim},
    }
    policy2 = MLAPolicy(params2, state, cfg, tokenizer=SimpleTokenizer(),
                        norm_stats=stats)
    imgs = np.stack([obs[0][0], obs[1][0]])
    pcs = np.stack([obs[0][1], obs[1][1]])
    kw = dict(input_ids=np.concatenate([ids, ids], axis=0), unnorm_key="t2",
              seed=5, sampler="dpm", num_dpm_steps=2, return_normalized=True)
    mixed = policy2.predict_action_diff_batched(
        imgs, pcs, cur_robot_states=[None, proprios[1]], **kw)
    midpoint = policy2.predict_action_diff_batched(
        imgs, pcs, cur_robot_states=[np.full(cfg.action_dim, 0.5, np.float32),
                                     proprios[1]], **kw)
    raw_zero = policy2.predict_action_diff_batched(
        imgs, pcs, cur_robot_states=[np.zeros(cfg.action_dim, np.float32),
                                     proprios[1]], **kw)
    np.testing.assert_allclose(mixed[0], midpoint[0], rtol=1e-5, atol=1e-5)
    assert not np.allclose(mixed[0], raw_zero[0], atol=1e-4)


def test_warm_buckets_compiles_every_bucket_before_traffic():
    """scripts/serve.py --warm_len pre-drives one batch per (prompt length,
    bucket) so live requests never eat a compile; stats rings are reset
    afterwards but the compile calls remain counted."""
    import serve as serve_mod

    policy = FakePolicy()
    with BatchingServer(policy, buckets=(1, 2, 4), max_wait_ms=1) as srv:
        serve_mod.warm_buckets(srv, [22], log=False)
        s = srv.stats()
        # one device call per bucket, each exactly bucket-sized (coalesced)
        assert s["batch_size_hist"] == {1: 1, 2: 1, 4: 1}
        assert s["device_calls"] == 3 and s["padded_rows"] == 0
        # latency rings were reset so steady-state percentiles stay clean
        assert "e2e_ms" not in s
        # warmed graphs saw the raw-uint8 protocol and the requested length
        assert all(c["L"] == 22 for c in policy.calls)
        # the batching window was restored after warmup
        assert srv.max_wait_s == pytest.approx(1e-3)

    with pytest.raises(ValueError, match="warm_len"):
        with BatchingServer(FakePolicy(), buckets=(1,)) as srv2:
            serve_mod.warm_buckets(srv2, [1], log=False)
