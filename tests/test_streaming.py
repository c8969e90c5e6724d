"""Streaming surface: incremental file-drop extraction equals the batch run
and is exactly-once across restarts (streaming checkpoint)."""

import os

from docling_ocr_qwen3vl_spark.plans.pipeline import extract_spans
from docling_ocr_qwen3vl_spark.streaming.stream import (
    start_extraction_stream,
    write_batch_idempotent,
)


def _sorted_spans(df):
    return sorted(
        (r.doc_id, r.offset, r.kind, r.text, r.media_ref) for r in df.collect()
    )


def test_stream_matches_batch_and_is_exactly_once(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # first drop: half the docs
    first = docs.filter("doc_id % 2 = 0")
    first.write.mode("overwrite").parquet(in_dir)
    q = start_extraction_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)

    got_first = spark.read.parquet(out_dir)
    want_first = extract_spans(spark, sf_dir, documents=first)
    assert _sorted_spans(got_first) == _sorted_spans(want_first)

    # second drop: the rest arrives; restart processes ONLY the new file
    docs.filter("doc_id % 2 = 1").write.mode("append").parquet(in_dir)
    q2 = start_extraction_stream(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)

    got_all = spark.read.parquet(out_dir)
    want_all = extract_spans(spark, sf_dir, documents=docs)
    assert _sorted_spans(got_all) == _sorted_spans(want_all)

    # third restart with no new data: nothing is reprocessed
    q3 = start_extraction_stream(spark, in_dir, out_dir, ckpt)
    q3.awaitTermination(120)
    assert _sorted_spans(spark.read.parquet(out_dir)) == _sorted_spans(want_all)


def test_batch_sink_is_idempotent_on_retry(spark, sf_dir, tmp_path):
    """foreachBatch retries re-run the SAME batch_id; the per-batch
    partition overwrite must not duplicate rows (exactly-once sink)."""
    out_dir = str(tmp_path / "out")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(20)
    spans = extract_spans(spark, sf_dir, documents=docs)
    write_batch_idempotent(spans, out_dir, batch_id=7)
    once = _sorted_spans(spark.read.parquet(out_dir))
    write_batch_idempotent(spans, out_dir, batch_id=7)  # simulated retry
    assert _sorted_spans(spark.read.parquet(out_dir)) == once
    write_batch_idempotent(spans.limit(0), out_dir, batch_id=8)  # new empty batch
    assert _sorted_spans(spark.read.parquet(out_dir)) == once
