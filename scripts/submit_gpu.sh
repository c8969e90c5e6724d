#!/usr/bin/env bash
# GPU-cluster submit recipe (see DEPLOY.md for the knob-by-knob rationale).
# Usage: N_EXECUTORS=32 INPUT=s3a://corpus/documents/ OUT=s3a://corpus/spans/ \
#        LINEAGE=s3a://corpus/lineage/ RUN_ID=prod-20260817 ./scripts/submit_gpu.sh
set -euo pipefail

N_EXECUTORS="${N_EXECUTORS:?set N_EXECUTORS (and 4x it for the scaling run)}"
INPUT="${INPUT:?set INPUT}"
OUT="${OUT:?set OUT}"
LINEAGE="${LINEAGE:?set LINEAGE}"
# REQUIRED and must be STABLE across retries: resume keys on the lineage
# table for this run_id — a fresh id reprocesses every group from scratch
RUN_ID="${RUN_ID:?set RUN_ID (keep it identical when re-running to resume)}"
QUANT="${QUANT:-none}"          # none | int8 | int4
GROUPS="${GROUPS:-4096}"
CORES_PER_EXECUTOR="${CORES_PER_EXECUTOR:-8}"

cd "$(dirname "$0")/.."
zip -rq engine.zip docling_ocr_qwen3vl_spark

exec spark-submit \
  --master "${SPARK_MASTER:-yarn}" --deploy-mode client \
  --py-files engine.zip \
  --num-executors "$N_EXECUTORS" \
  --executor-cores "$CORES_PER_EXECUTOR" \
  --executor-memory 24g \
  --conf spark.executor.resource.gpu.amount=1 \
  --conf spark.executor.resource.gpu.discoveryScript="${GPU_DISCOVERY:-/opt/spark/examples/src/main/scripts/getGpusResources.sh}" \
  --conf spark.task.resource.gpu.amount=1 \
  --conf spark.executor.pyspark.memory=8g \
  --conf spark.python.worker.reuse=true \
  --conf spark.dynamicAllocation.enabled=false \
  --conf spark.sql.shuffle.partitions=$((N_EXECUTORS * CORES_PER_EXECUTOR * 3)) \
  scripts/run_extract.py \
    --input "$INPUT" \
    --output "$OUT" \
    --lineage "$LINEAGE" \
    --run-id "$RUN_ID" \
    --groups "$GROUPS" \
    --backend qwen3vl \
    --prompt-mode qwenvl_html \
    --page-scale 2.0 \
    --quantization "$QUANT"
