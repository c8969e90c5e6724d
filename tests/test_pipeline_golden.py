"""Golden end-to-end test: hand-built raw pages -> exact span sequences.

This is the BASELINE.json invariant: per-document span-sequence equality
(kind, text, media_ref, order) against goldens derived from the reference
semantics by hand.
"""

import pytest
from pyspark.sql import Row

from docling_ocr_qwen3vl_spark.operators.page_decode import decode_pages
from docling_ocr_qwen3vl_spark.operators.spans import assemble_documents, number_spans

RAW_PAGES = [
    # doc A page 0: html with boilerplate, nested list, img media, bad bbox
    Row(
        doc_id="A",
        page_no=0,
        payload_kind="qwenvl_html",
        payload=(
            '<h1 data-bbox="10 10 900 60">Title  Here</h1>'
            "<style>h1{font-weight:bold}</style>"
            '<ul data-bbox="0 0 1 1"><li data-bbox="10 70 900 100">item one</li></ul>'
            '<img data-bbox="10 110 500 400"/>'
            '<p data-bbox="bad">trailing para</p>'
        ),
        page_width=1000.0,
        page_height=1400.0,
    ),
    # doc A page 1: plain text with blank-line paragraphs
    Row(
        doc_id="A",
        page_no=1,
        payload_kind="plain_text",
        payload="Para one.\n\nPara two.",
        page_width=1000.0,
        page_height=1400.0,
    ),
    # doc B page 0: corrupted layout json (trailing comma + corrupt key)
    Row(
        doc_id="B",
        page_no=0,
        payload_kind="layout_json",
        payload=(
            '[{"label":"title","x1":100,"y1":40,"x2":900,"y2":90},'
            '{"label":"picture","x1":100,"y1:420,"x2":500,"y2":800},'
            '{"label":"table","x1":100,"y1":820,"x2":900,"y2":980},]'
        ),
        page_width=1000.0,
        page_height=1400.0,
    ),
    # doc B page 1: table json, legacy field names
    Row(
        doc_id="B",
        page_no=1,
        payload_kind="table_json",
        payload='{"rows":1,"cols":1,"cells":[{"row":0,"col":0,"text":"x"}]}',
        page_width=1000.0,
        page_height=1400.0,
    ),
    # doc C: rows=0 table -> no spans at all
    Row(
        doc_id="C",
        page_no=0,
        payload_kind="table_json",
        payload='{"rows":0,"cols":2,"cells":[]}',
        page_width=1000.0,
        page_height=1400.0,
    ),
    # doc D: single-newline fallback in plain text
    Row(
        doc_id="D",
        page_no=0,
        payload_kind="plain_text",
        payload="L1.\nL2.\nL3.",
        page_width=1000.0,
        page_height=1400.0,
    ),
    # doc E: elements EMITTED out of layout order — the reading-order sort
    # (y-band/x heuristic, FIXTURES.md §2) must re-sequence them
    Row(
        doc_id="E",
        page_no=0,
        payload_kind="qwenvl_html",
        payload=(
            '<p data-bbox="100 820 900 980">bottom para</p>'
            '<h1 data-bbox="100 40 900 90">Top Title</h1>'
            '<p data-bbox="500 300 900 400">right mid</p>'
            '<p data-bbox="100 310 450 400">left mid</p>'
        ),
        page_width=1000.0,
        page_height=1400.0,
    ),
]

GOLDEN = {
    # doc A page 0: the bbox-less trailing para anchors at the region origin
    # (reference fallback = full-region bbox, model.py:237-245), so the
    # reading-order sort places it in band 0 at x=0, BEFORE the h1 at x=10.
    # media_ref ids carry the EMISSION seq (img was element 2), stable under
    # re-ordering.
    "A": [
        ("text", "trailing para", ""),
        ("text", "Title Here", ""),
        ("text", "item one", ""),
        ("media_ref", "", "media://A/0/2"),
        ("text", "Para one.", ""),
        ("text", "Para two.", ""),
    ],
    "B": [
        ("media_ref", "", "media://B/0/0"),
        ("media_ref", "", "media://B/0/1"),
        ("media_ref", "", "media://B/1/0"),
    ],
    "D": [
        ("text", "L1.", ""),
        ("text", "L2.", ""),
        ("text", "L3.", ""),
    ],
    # doc E: emitted bottom/top/right/left -> read top, left-mid, right-mid
    # (same 24-unit y-band, x breaks the tie), bottom
    "E": [
        ("text", "Top Title", ""),
        ("text", "left mid", ""),
        ("text", "right mid", ""),
        ("text", "bottom para", ""),
    ],
}


@pytest.fixture(scope="module")
def spans(spark):
    raw = spark.createDataFrame(RAW_PAGES)
    return number_spans(decode_pages(raw)).collect()


def test_span_sequences_exact(spans):
    by_doc = {}
    for row in spans:
        by_doc.setdefault(row.doc_id, []).append(row)
    assert set(by_doc) == set(GOLDEN)  # doc C produced nothing
    for doc_id, expected in GOLDEN.items():
        got = sorted(by_doc[doc_id], key=lambda r: r.offset)
        assert [r.offset for r in got] == list(range(len(expected))), doc_id
        assert [(r.kind, r.text, r.media_ref) for r in got] == expected, doc_id


def test_assembled_documents_shape(spans, spark):
    raw = spark.createDataFrame(RAW_PAGES)
    docs = assemble_documents(number_spans(decode_pages(raw)))
    rows = {r.doc_id: r.spans for r in docs.collect()}
    assert [s.asDict() for s in rows["B"]] == [
        {"kind": "media_ref", "text": "", "media_ref": "media://B/0/0", "offset": 0},
        {"kind": "media_ref", "text": "", "media_ref": "media://B/0/1", "offset": 1},
        {"kind": "media_ref", "text": "", "media_ref": "media://B/1/0", "offset": 2},
    ]
    # schema field order matches BASELINE.json input_hint
    span_type = dict(docs.dtypes)["spans"]
    assert span_type.startswith("array<struct<kind:string,text:string,media_ref:string,offset:int")
