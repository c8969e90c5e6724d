"""spark-submit entry point (north_rule deployment surface).

Cluster:
  zip -r engine.zip docling_ocr_qwen3vl_spark
  spark-submit --py-files engine.zip \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.task.resource.gpu.amount=1 \
    scripts/run_extract.py --input <docs> --output <spans> \
    --lineage <lineage> --run-id prod-2026-08-16 --groups 4096

Sandbox:
  python scripts/run_extract.py --input /root/testdata/sf0.01 \
    --output /tmp/spans --lineage /tmp/lineage --run-id demo

Re-running the same command after a kill resumes from the lineage table
(committed groups are skipped — see plans/checkpoint.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="sf dir or documents parquet")
    parser.add_argument("--output", required=True)
    parser.add_argument("--lineage", required=True)
    parser.add_argument("--run-id", required=True)
    parser.add_argument("--groups", type=int, default=16)
    parser.add_argument("--master", default=None)
    args = parser.parse_args()

    from docling_ocr_qwen3vl_spark.plans.checkpoint import (
        CheckpointedRun,
        run_checkpointed_extract,
    )
    from docling_ocr_qwen3vl_spark.plans.session import build_session

    spark = build_session(app_name=f"extract-{args.run_id}", master=args.master)
    run = CheckpointedRun(
        run_id=args.run_id,
        out_path=args.output,
        lineage_path=args.lineage,
        n_groups=args.groups,
    )
    n = run_checkpointed_extract(spark, args.input, run)
    print(f"processed {n} groups (others already committed)")
    spark.stop()


if __name__ == "__main__":
    main()
