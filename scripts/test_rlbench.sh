#!/usr/bin/env bash
# Eval sweep over the 12 RLBench tasks (reference scripts/test_rlbench.sh);
# requires a simulator workstation (CoppeliaSim + Xvfb + lift3d).
set -euo pipefail
RUN_DIR=${1:?usage: test_rlbench.sh <run_dir>}
xvfb-run -a python scripts/eval_rlbench.py --run_dir "$RUN_DIR" --tasks all --num_episodes 20
