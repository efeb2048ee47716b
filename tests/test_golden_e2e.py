"""End-to-end golden parity vs the reference composed model (SURVEY §7.2
minimum slice / BASELINE config 1): build the reference MLA with real (seeded)
weights, export its checkpoint, load it through OUR `load_vla`, and reproduce
`predict_action_diff` (DDIM-8 chunk) and `predict_action_ar` (7 greedy ids).

Runs in a subprocess: the harness swaps the reference's vendored
transformers 4.40.1 into sys.modules, which must not leak into other tests.

Observed parity on this box is BIT-EXACT on the pre-clip samples (both sides
round intermediates to bf16 with fp32 accumulation); the asserted tolerances
are looser so library-version drift doesn't turn a numerics nit into a
failure."""

import json
import os
import subprocess
import sys

import pytest

torch = pytest.importorskip("torch")


@pytest.mark.timeout(2400)
def test_golden_e2e_matches_reference():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "golden_e2e_driver.py")],
        capture_output=True, text=True, timeout=2400, env=env,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("GOLDEN_E2E_RESULT ")]
    assert proc.returncode == 0 and lines, (
        f"driver failed rc={proc.returncode}\nstdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-3000:]}"
    )
    r = json.loads(lines[-1][len("GOLDEN_E2E_RESULT "):])

    # the continuous (pre-clip) samples are the sensitive check: they carry
    # the full LLM forward, the splice layout, and all 8 denoise steps
    assert r["raw_std"] > 1.0, r  # guard: outputs actually depend on the model
    assert r["raw_max_rel_err"] < 1e-2, r

    # public API contracts
    assert r["diff_max_abs_err"] < 1e-3, r
    assert r["ar_ids_equal"], r
    assert r["ar_max_abs_err"] < 1e-5, r
