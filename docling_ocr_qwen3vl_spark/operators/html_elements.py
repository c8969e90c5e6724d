"""T1: QwenVL-HTML parse operator — payload -> ordered element rows.

The reference parses VLM HTML output per page into elements with tag,
collapsed text, optional 0-1000 data-bbox, and an element type
(qwen_runner.py:193-292, incl. the DOM boilerplate strip: non-whitelisted
tags open nothing).  Not expressible natively — the stdlib parser's quirks
ARE the semantics — so this is a ``mapInPandas`` stage over the
reference-parity kernel, emitting flat columns (same rationale as
page_decode.py).

Output: doc_id, page_no, seq, tag, element_type, text,
        x1,y1,x2,y2 (int, null when data-bbox absent/malformed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ELEMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("page_no", IntegerType(), False),
        StructField("seq", IntegerType(), False),
        StructField("tag", StringType(), False),
        StructField("element_type", StringType(), False),
        StructField("text", StringType(), False),
        StructField("x1", IntegerType(), True),
        StructField("y1", IntegerType(), True),
        StructField("x2", IntegerType(), True),
        StructField("y2", IntegerType(), True),
    ]
)


def _make_parser(keep_empty_media: bool):
    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from docling_ocr_qwen3vl_spark.semantics.html_parse import parse_qwenvl_html

        for batch in batches:
            cols: dict[str, list] = {name: [] for name in ELEMENTS_SCHEMA.names}
            for doc_id, page_no, payload in zip(
                batch["doc_id"], batch["page_no"], batch["payload"]
            ):
                els = parse_qwenvl_html(payload or "", keep_empty_media=keep_empty_media)
                for seq, el in enumerate(els):
                    cols["doc_id"].append(doc_id)
                    cols["page_no"].append(page_no)
                    cols["seq"].append(seq)
                    cols["tag"].append(el.tag)
                    cols["element_type"].append(el.element_type)
                    cols["text"].append(el.text)
                    if el.bbox is None:
                        for c in ("x1", "y1", "x2", "y2"):
                            cols[c].append(None)
                    else:
                        for c, v in zip(("x1", "y1", "x2", "y2"), el.bbox):
                            cols[c].append(v)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(cols["doc_id"], dtype="object"),
                    "page_no": pd.Series(cols["page_no"], dtype="int32"),
                    "seq": pd.Series(cols["seq"], dtype="int32"),
                    "tag": pd.Series(cols["tag"], dtype="object"),
                    "element_type": pd.Series(cols["element_type"], dtype="object"),
                    "text": pd.Series(cols["text"], dtype="object"),
                    "x1": pd.Series(cols["x1"], dtype="Int32"),
                    "y1": pd.Series(cols["y1"], dtype="Int32"),
                    "x2": pd.Series(cols["x2"], dtype="Int32"),
                    "y2": pd.Series(cols["y2"], dtype="Int32"),
                }
            )

    return parse_batches


def parse_html_elements(
    pages: DataFrame, keep_empty_media: bool = False
) -> DataFrame:
    """(doc_id, page_no, payload) -> one row per parsed element.

    ``keep_empty_media=False`` is exact reference parity (empty <img/> emits
    nothing); True additionally keeps empty figure elements for the media
    span path.
    """
    from pyspark.sql import functions as F

    from .partitioning import spread_for_kernel

    return spread_for_kernel(
        pages.select(
            "doc_id", F.col("page_no").cast("int").alias("page_no"), "payload"
        )
    ).mapInPandas(_make_parser(keep_empty_media), ELEMENTS_SCHEMA)
