"""Public API surface + ingestion robustness (bad payloads never fail a
task — reference behavior is warn-and-continue, never crash)."""

import os

from pyspark.sql import Row

from docling_ocr_qwen3vl_spark import ExtractConfig, extract
from docling_ocr_qwen3vl_spark.operators.page_decode import decode_pages
from docling_ocr_qwen3vl_spark.operators.spans import assemble_documents, number_spans
from docling_ocr_qwen3vl_spark.plans.pipeline import write_spans


def test_extract_api_flat_and_nested(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(20)
    flat = extract(spark, docs, ExtractConfig(num_partitions=4))
    assert flat.columns == ["doc_id", "offset", "kind", "text", "media_ref"]
    assert flat.count() > 0
    nested = extract(spark, docs, nested=True)
    assert nested.columns == ["doc_id", "spans"]
    # every document with at least one span appears exactly once
    assert 0 < nested.count() <= docs.count()
    assert nested.count() == flat.select("doc_id").distinct().count()


def test_nested_output_survives_parquet_roundtrip(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(30)
    nested = extract(spark, docs, nested=True)
    out = str(tmp_path / "spans_nested")
    write_spans(nested, out)
    back = spark.read.parquet(out)
    want = {r.doc_id: [s.asDict() for s in r.spans] for r in nested.collect()}
    got = {r.doc_id: [s.asDict() for s in r.spans] for r in back.collect()}
    assert got == want
    for spans in got.values():  # offsets stay sorted within the array
        assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_decode_robust_to_garbage(spark):
    rows = [
        Row(doc_id="n", page_no=0, payload_kind="qwenvl_html", payload=None,
            page_width=1.0, page_height=1.0),
        Row(doc_id="u", page_no=0, payload_kind="mystery_kind", payload="  keep me  ",
            page_width=1.0, page_height=1.0),
        Row(doc_id="g", page_no=0, payload_kind="layout_json", payload="\x00{{{[[[",
            page_width=1.0, page_height=1.0),
        Row(doc_id="t", page_no=0, payload_kind="table_json", payload="not json at all",
            page_width=1.0, page_height=1.0),
    ]
    spans = number_spans(decode_pages(spark.createDataFrame(rows))).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert "n" not in by_doc and "g" not in by_doc and "t" not in by_doc
    assert [(r.kind, r.text) for r in by_doc["u"]] == [("text", "keep me")]


def test_assemble_empty_input(spark):
    empty = spark.createDataFrame(
        [], "doc_id string, offset int, kind string, text string, media_ref string"
    )
    assert assemble_documents(empty).count() == 0
