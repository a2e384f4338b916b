#!/bin/bash
# BASELINE config 2: RALF unconstrained, PKU, top-16 retrieval + fusion.
set -e
J=${JOB_DIR:-tmp/jobs/ralf_pku_uncond}
python -m ralf_tpu.cli.train --experiment ralf --dataset pku10 \
  --job-dir "$J" --task uncond "$@"
python -m ralf_tpu.cli.inference --job-dir "$J" --cond uncond --split test
python -m ralf_tpu.cli.evaluate --input-dir "$J/generated_samples_uncond"
