#!/bin/bash
# BASELINE config 5: MaskGIT + VQDiffusion (+ RA-LayoutDM) non-AR decoders, CGL.
set -e
for EXP in maskgit vqdiffusion layoutdm_ra; do
  J=${JOB_ROOT:-tmp/jobs}/${EXP}_cgl
  python -m ralf_tpu.cli.train --experiment $EXP --dataset cgl --job-dir "$J" "$@"
  python -m ralf_tpu.cli.inference --job-dir "$J" --cond uncond --split test
  python -m ralf_tpu.cli.evaluate --input-dir "$J/generated_samples_uncond"
done
