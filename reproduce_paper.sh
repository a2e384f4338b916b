#!/usr/bin/env bash
# Full reproduction chain for the reference's released artifacts
# (`/root/reference/README.md:105-137`) on ralf_tpu.  Every step below is
# exercised hermetically today (fabricated artifacts) by the named tests;
# this script documents the exact commands for the day the real downloads
# are present.
#
#   bash reproduce_paper.sh /path/to/unzipped/cache /path/to/data_splits
set -euo pipefail

CACHE_ROOT=${1:?usage: reproduce_paper.sh CACHE_ROOT [DATA_SPLITS]}
DATA_SPLITS=${2:-data_splits}

# ---------------------------------------------------------------------------
# 0. Readiness: ingest EVERY artifact through the real machinery and emit a
#    manifest (torch .pt/.pth -> utils/torch_port converters -> flax trees;
#    parquet -> HFParquetDataset; relationship dict; retrieval yaml;
#    training_logs jobs -> converted ralf_tpu job dirs with orbax ckpts).
#    Tested: tests/test_ingest.py.
python scripts/ingest_reference_artifacts.py --scan "$CACHE_ROOT" \
    --out readiness.json

# Converter-vs-live-reference numerics (no artifacts needed):
#   python scripts/ingest_reference_artifacts.py --self-check

# ---------------------------------------------------------------------------
# 1. (from scratch instead of cache/dataset) Offline dataset build.
#    Tested: tests/test_build_dataset.py.
# python -m ralf_tpu.cli.build_dataset --dataset-type pku \
#     --dataset-root "$PKU_RAW" --splits-dir "$DATA_SPLITS/splits/pku" \
#     --output-dir "$CACHE_ROOT/dataset/pku10"

# ---------------------------------------------------------------------------
# 2. Offline caches: kmeans vocabularies, retrieval tables (+MMR/LPIPS/
#    cross-dataset arms), relationship table.  Tested: tests/test_cache.py,
#    tests/test_lpips.py, tests/test_preprocess.py.
python -m ralf_tpu.cli.build_caches --what clusters \
    --data-dir "$CACHE_ROOT/dataset/pku10" --cache-dir "$CACHE_ROOT"
python -m ralf_tpu.cli.build_caches --what retrieval \
    --data-dir "$CACHE_ROOT/dataset/pku10" --cache-dir "$CACHE_ROOT"
python -m ralf_tpu.cli.build_caches --what relationships \
    --data-dir "$CACHE_ROOT/dataset/pku10" --cache-dir "$CACHE_ROOT"

# ---------------------------------------------------------------------------
# 3. FIDNet feature extractor (or ingest the released weights via step 0).
#    Tested: tests/test_train_infra.py (fid trainer), e2e in MODELS_E2E.md.
python -m ralf_tpu.cli.fid_train --data-dir "$CACHE_ROOT/dataset/pku10" \
    --job-dir tmp/fidnet_pku

# ---------------------------------------------------------------------------
# 4. Train the flagship (or skip: step 0 already converted the released
#    training_logs checkpoints into cli.inference-ready job dirs under
#    $CACHE_ROOT/converted_jobs/).  Tested: tests/test_e2e_cli.py.
python -m ralf_tpu.cli.train --experiment ralf --dataset pku10 \
    --data-dir "$CACHE_ROOT/dataset/pku10" --cache-dir "$CACHE_ROOT" \
    --job-dir tmp/jobs/ralf_pku

# ---------------------------------------------------------------------------
# 5. Inference: every task arm, 3 seeds (the paper protocol), then the
#    unannotated split.  Tested: tests/test_e2e_cli.py,
#    tests/test_build_dataset.py (unannotated legs).
for COND in uncond c cwh partial refinement relation; do
  python -m ralf_tpu.cli.inference --job-dir tmp/jobs/ralf_pku \
      --cond "$COND" --split test --num-seeds 3
done
python -m ralf_tpu.cli.inference --job-dir tmp/jobs/ralf_pku \
    --cond uncond --split test --unannotated

# ---------------------------------------------------------------------------
# 6. Evaluation: heuristics + layout FID/prdc (+ image metrics), the
#    unannotated variant, and the LaTeX export.  FID/prdc math is A/B'd
#    against the reference implementation in tests/test_fid_ab.py.
python -m ralf_tpu.cli.evaluate \
    --input-dir tmp/jobs/ralf_pku/generated_samples_uncond \
    --job-dir tmp/jobs/ralf_pku --split both --fidnet-dir tmp/fidnet_pku \
    --image-metrics --cache-dir "$CACHE_ROOT"
python -m ralf_tpu.cli.evaluate \
    --input-dir tmp/jobs/ralf_pku/generated_samples_uncond_unanno \
    --job-dir tmp/jobs/ralf_pku --unannotated --cache-dir "$CACHE_ROOT"
python -m ralf_tpu.eval.export_tex --jobs-root tmp/jobs

# ---------------------------------------------------------------------------
# 7. Throughput headline + training-performance contract on the chip.
python bench.py
python scripts/bench_train.py --out bench_train.json
