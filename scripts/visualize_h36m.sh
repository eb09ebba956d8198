#!/usr/bin/env bash
# Render GIF/PNG skeleton visualizations from a trained h36m checkpoint.
# Counterpart of the reference's scripts/visualize_h36m.sh.
set -e
cd "$(dirname "$0")/.."

time=$(date "+%Y%m%d")
exp_name="${time}_dstdgcn_h36m_vis"
save_dir="runs/${exp_name}"
mkdir -p "${save_dir}"

python - "${save_dir}" <<'PY'
import os, sys

from dstdgcn_tpu.runner import get_runner
from dstdgcn_tpu.utils.config import get_config
from dstdgcn_tpu.utils.logging import setup_logger

run_dir = sys.argv[1]
opts = get_config("configs/dstdgcn_h36m_test.yaml")
opts["mode"] = "test-visualize"
opts["save"]["path"]["base"] = run_dir
opts["logger"] = setup_logger("prediction", run_dir, 0)
get_runner(opts["runner"], opts).run()
PY
