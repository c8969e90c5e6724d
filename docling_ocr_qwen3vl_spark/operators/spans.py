"""Span assembly — the engine's output operator (G13, SURVEY.md §2.4).

Text elements become ``text`` spans; figure/table elements become
``media_ref`` spans at their layout offsets; ``offset`` is the document-wide
reading order.  Two shapes:

  * ``number_spans``      — exploded (doc_id, offset, kind, text, media_ref):
                            the analysis-friendly flat table.
  * ``assemble_documents``— the Iceberg output shape of BASELINE.json's
                            input_hint: (doc_id, spans array<struct<kind,
                            text, media_ref, offset>>), spans sorted by
                            offset.

Scale notes: the offset window shuffles once on doc_id — unavoidable, since
offsets are a per-document total order — and per-doc cardinality is bounded
(pages x elements), so no skew beyond what salting upstream already defused.
``assemble_documents`` reuses the exact same hash partitioning (groupBy on
the window's partition key), so AQE plans ONE exchange for both steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def number_spans(elements: DataFrame) -> DataFrame:
    """Assign document-wide offsets in reading order.

    Order: page, then the G4 geometric heuristic over the elements' 0-1000
    layout anchors — y-band (24 units), then x, then emission seq as the
    stable tiebreak (SURVEY.md §7(c): the order must be total and
    deterministic).  Payload kinds without geometry anchor at (0,0), so
    their elements keep emission order; VLM-HTML pages whose elements
    arrive out of layout order are re-sorted into reading order.
    """
    band = F.floor(F.col("y1") / F.lit(24))
    w = Window.partitionBy("doc_id").orderBy("page_no", band, "x1", "seq")
    return elements.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("int").alias("offset"),
        "kind",
        "text",
        "media_ref",
    )


def assemble_documents(spans: DataFrame) -> DataFrame:
    """Flat spans -> one row per document with the ordered spans array.

    ``sort_array`` on struct(offset, ...) sorts by offset first (struct
    field order IS the sort key order), so no second window is needed; a
    final transform reorders the fields to the Iceberg schema of
    BASELINE.json's input_hint: (kind, text, media_ref, offset).
    """
    sorted_spans = F.sort_array(
        F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
    )
    return spans.groupBy("doc_id").agg(
        F.transform(
            sorted_spans,
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans")
    )
