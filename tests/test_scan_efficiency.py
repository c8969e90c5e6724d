"""Scan-efficiency regression tests: column pruning and predicate pushdown
must reach the parquet scan — a scan reading all columns for a 2-column
projection silently multiplies I/O by the table width at 100 TB."""

import os

from pyspark.sql import functions as F

from docling_ocr_qwen3vl_spark.plans.pipeline import extract_spans
from docling_ocr_qwen3vl_spark.sources.tables import load_table


def _scan_lines(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [ln for ln in plan.splitlines() if "FileScan parquet" in ln or "ReadSchema" in ln or "PushedFilters" in ln], plan


def test_flagship_scan_prunes_to_doc_id_and_text(spark, sf_dir):
    df = extract_spans(spark, sf_dir)
    _, plan = _scan_lines(df)
    # the documents table has 5 columns; the pipeline needs exactly 2
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" in read_schema
    for unused in ("lang", "source", "n_chars"):
        assert unused not in read_schema, read_schema


def test_filters_push_down_to_parquet(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    ).select("l_returnflag", "l_quantity")
    _, plan = _scan_lines(li)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_shipdate" in pushed, pushed
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema, read_schema


def test_partition_filter_prunes_checkpoint_groups(spark, sf_dir, tmp_path):
    # group=N subdirectories are partition columns: reading one group must
    # plan a partition filter, not a full-directory scan
    docs = load_table(spark, sf_dir, "documents").limit(40)
    spans = extract_spans(spark, sf_dir, documents=docs)
    for g in (0, 1):
        spans.write.mode("overwrite").parquet(
            os.path.join(str(tmp_path), f"group={g}")
        )
    df = spark.read.parquet(str(tmp_path)).filter(F.col("group") == 1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "group" in plan.split("PartitionFilters:")[1].splitlines()[0]
