#!/bin/bash
# BASELINE config 1: Autoreg Baseline, unconstrained, PKU, greedy decode.
# CPU-runnable: JAX_PLATFORMS=cpu works (tests force it the same way).
# Use --data-dir <pku10 parquet dump> for real data; --synthetic otherwise.
set -e
J=${JOB_DIR:-tmp/jobs/autoreg_pku_uncond}
python -m ralf_tpu.cli.train --experiment autoreg --dataset pku10 \
  --job-dir "$J" --task uncond "$@" \
  sampling.name=deterministic
python -m ralf_tpu.cli.inference --job-dir "$J" --cond uncond --split test
python -m ralf_tpu.cli.evaluate --input-dir "$J/generated_samples_uncond"
