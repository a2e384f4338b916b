#!/bin/bash
# BASELINE config 4: relationship-constrained decoding (batched backtracking).
set -e
J=${JOB_DIR:-tmp/jobs/ralf_pku_relation}
python -m ralf_tpu.cli.train --experiment ralf --dataset pku10 \
  --job-dir "$J" --task relation "$@"
python -m ralf_tpu.cli.inference --job-dir "$J" --cond relation --split test
python -m ralf_tpu.cli.evaluate --input-dir "$J/generated_samples_relation"
