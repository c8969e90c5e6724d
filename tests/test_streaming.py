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


def test_interleaved_stream_matches_batch(spark, tmp_path):
    """input_hint shape over the streaming surface: (doc_id, spans[]) file
    drops through start_interleaved_extraction_stream must equal the batch
    extract_spans_from_interleaved on the same rows, incrementally across
    a restart."""
    from pyspark.sql import Row

    from docling_ocr_qwen3vl_spark.plans.pipeline import (
        extract_spans_from_interleaved,
    )
    from docling_ocr_qwen3vl_spark.streaming.stream import (
        start_interleaved_extraction_stream,
    )

    def span(kind, text, media_ref, offset):
        return Row(kind=kind, text=text, media_ref=media_ref, offset=offset)

    def doc(i):
        return Row(
            doc_id=f"D{i}",
            spans=[
                span("raw_text", f"Alpha {i}.\n\nBeta {i}.", "", 0),
                span("media", "", f"ext://{i}/0", 1),
                span(
                    "raw_html",
                    f'<h1 data-bbox="10 10 900 40">Head {i}</h1>'
                    '<img data-bbox="10 50 500 300"/>',
                    "",
                    2,
                ),
            ],
        )

    from docling_ocr_qwen3vl_spark.streaming.stream import INTERLEAVED_SCHEMA

    def mk(docs_rows):
        # pin the declared stream schema (offset int32): Row inference
        # would write INT64 and the typed file stream refuses the files
        return spark.createDataFrame(docs_rows, INTERLEAVED_SCHEMA)

    first = mk([doc(i) for i in range(4)])
    rest = mk([doc(i) for i in range(4, 7)])
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )

    first.write.mode("overwrite").parquet(in_dir)
    q = start_interleaved_extraction_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    assert _sorted_spans(spark.read.parquet(out_dir)) == _sorted_spans(
        extract_spans_from_interleaved(spark, first)
    )

    # second drop + restart: only the new file processes; union equals batch
    rest.write.mode("append").parquet(in_dir)
    q2 = start_interleaved_extraction_stream(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    both = mk([doc(i) for i in range(7)])
    assert _sorted_spans(spark.read.parquet(out_dir)) == _sorted_spans(
        extract_spans_from_interleaved(spark, both)
    )
