"""spark-submit entry point (north_rule deployment surface).

Cluster (full GPU recipe with every conf explained: DEPLOY.md, or run
scripts/submit_gpu.sh):
  zip -r engine.zip docling_ocr_qwen3vl_spark
  spark-submit --py-files engine.zip \
    --conf spark.executor.resource.gpu.amount=1 \
    --conf spark.task.resource.gpu.amount=1 \
    scripts/run_extract.py --input <docs> --output <spans> \
    --lineage <lineage> --run-id prod-2026-08-16 --groups 4096 \
    --backend qwen3vl --quantization int8

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
    # decode-backend knobs (DEPLOY.md): everything below flows into
    # ExtractConfig and from there to the per-executor decoder singletons
    parser.add_argument(
        "--backend", default="deterministic",
        choices=("deterministic", "qwen3vl"),
        help="'qwen3vl' = the GPU VLM path (requires torch/transformers "
        "on the executors and spark.task.resource.gpu.amount)",
    )
    parser.add_argument("--prompt-mode", default="qwenvl_html")
    parser.add_argument("--page-scale", type=float, default=2.0)
    parser.add_argument("--force-valid-json", action="store_true",
                        help="T12: per-value guaranteed-valid JSON walk for "
                        "layout/table stages (slower, never needs repair)")
    parser.add_argument("--model-repo-id", default=None)
    parser.add_argument("--quantization", default=None,
                        choices=("none", "int8", "int4"),
                        help="BitsAndBytes weight quantization for the VLM")
    args = parser.parse_args()

    from docling_ocr_qwen3vl_spark.config import ExtractConfig
    from docling_ocr_qwen3vl_spark.plans.checkpoint import (
        CheckpointedRun,
        run_checkpointed_extract,
    )
    from docling_ocr_qwen3vl_spark.plans.session import build_session

    decoder_options = {}
    if args.model_repo_id:
        decoder_options["model_repo_id"] = args.model_repo_id
    if args.quantization:
        decoder_options["quantization"] = args.quantization
    config = ExtractConfig(
        decoder_backend=args.backend,
        prompt_mode=args.prompt_mode,
        page_scale=args.page_scale,
        force_valid_json=args.force_valid_json,
        decoder_options=decoder_options,
    )

    spark = build_session(app_name=f"extract-{args.run_id}", master=args.master)
    run = CheckpointedRun(
        run_id=args.run_id,
        out_path=args.output,
        lineage_path=args.lineage,
        n_groups=args.groups,
    )
    n = run_checkpointed_extract(spark, args.input, run, config=config)
    print(f"processed {n} groups (others already committed)")
    spark.stop()


if __name__ == "__main__":
    main()
