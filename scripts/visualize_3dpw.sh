#!/usr/bin/env bash
# Render GIF/PNG skeleton visualizations from a trained 3dpw checkpoint.
# Counterpart of the reference's scripts/visualize_3dpw.sh.
set -e
cd "$(dirname "$0")/.."

time=$(date "+%Y%m%d")
exp_name="${time}_dstdgcn_3dpw_vis"
save_dir="runs/${exp_name}"
mkdir -p "${save_dir}"

python - "${save_dir}" <<'PY'
import os, sys

from dstdgcn_tpu.runner import get_runner
from dstdgcn_tpu.utils.config import get_config
from dstdgcn_tpu.utils.logging import setup_logger

run_dir = sys.argv[1]
opts = get_config("configs/dstdgcn_3dpw_test.yaml")
opts["mode"] = "test-visualize"
opts["save"]["path"]["base"] = run_dir
opts["logger"] = setup_logger("prediction", run_dir, 0)
get_runner(opts["runner"], opts).run()
PY
