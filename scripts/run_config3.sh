#!/bin/bash
# BASELINE config 3: constrained tasks c / cwh / partial / refinement (RALF, CGL).
set -e
J=${JOB_DIR:-tmp/jobs/ralf_cgl_multitask}
python -m ralf_tpu.cli.train --experiment ralf --dataset cgl \
  --job-dir "$J" --task multitask "$@"
for COND in c cwh partial refinement; do
  python -m ralf_tpu.cli.inference --job-dir "$J" --cond $COND --split test
  python -m ralf_tpu.cli.evaluate --input-dir "$J/generated_samples_$COND"
done
