"""G5 + T6-T10: layout JSON -> cluster rows (repair cascade + build).

The reference repairs near-JSON from the VLM, then builds clusters with
label mapping, min/max coordinate normalization, zero-area drop, and
0-1000 -> page-coordinate rescale (layout_model.py:184-232,
_vlm_jsonformer.py:163-194).

Split for scale: the repair CASCADE + parse runs in a vectorized pandas UDF
(try/except control flow), emitting normalized 0-1000 clusters; the page
rescale stays JVM-side column arithmetic so Catalyst can fuse it with
downstream filters.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

CLUSTERS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("page_no", IntegerType(), False),
        StructField("cluster_id", IntegerType(), False),
        StructField("label", StringType(), False),
        StructField("confidence", DoubleType(), False),
        StructField("nx1", DoubleType(), False),
        StructField("ny1", DoubleType(), False),
        StructField("nx2", DoubleType(), False),
        StructField("ny2", DoubleType(), False),
        StructField("page_width", DoubleType(), True),
        StructField("page_height", DoubleType(), True),
    ]
)


def _parse_layout_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from docling_ocr_qwen3vl_spark.semantics.geometry import (
        DEFAULT_CONFIDENCE,
        DEFAULT_LABEL,
        LABEL_MAP,
    )
    from docling_ocr_qwen3vl_spark.semantics.json_repair import parse_array

    for batch in batches:
        cols: dict[str, list] = {name: [] for name in CLUSTERS_SCHEMA.names}
        for doc_id, page_no, payload, pw, ph in zip(
            batch["doc_id"], batch["page_no"], batch["payload"],
            batch["page_width"], batch["page_height"]
        ):
            for idx, elem in enumerate(parse_array(payload or "")):
                if not isinstance(elem, dict):
                    continue
                bbox = elem.get("bbox")
                if bbox and isinstance(bbox, list) and len(bbox) == 4:
                    x1, y1, x2, y2 = bbox
                else:
                    x1 = elem.get("x1", 0)
                    y1 = elem.get("y1", 0)
                    x2 = elem.get("x2", 1000)
                    y2 = elem.get("y2", 1000)
                x1, x2 = min(x1, x2), max(x1, x2)
                y1, y2 = min(y1, y2), max(y1, y2)
                if x1 == x2 or y1 == y2:
                    continue
                cols["doc_id"].append(doc_id)
                cols["page_no"].append(page_no)
                cols["cluster_id"].append(idx)
                cols["label"].append(
                    LABEL_MAP.get(str(elem.get("label", "text")).lower(), DEFAULT_LABEL)
                )
                cols["confidence"].append(float(elem.get("confidence", DEFAULT_CONFIDENCE)))
                cols["nx1"].append(float(x1))
                cols["ny1"].append(float(y1))
                cols["nx2"].append(float(x2))
                cols["ny2"].append(float(y2))
                cols["page_width"].append(None if pd.isna(pw) else float(pw))
                cols["page_height"].append(None if pd.isna(ph) else float(ph))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(cols["doc_id"], dtype="object"),
                "page_no": pd.Series(cols["page_no"], dtype="int32"),
                "cluster_id": pd.Series(cols["cluster_id"], dtype="int32"),
                "label": pd.Series(cols["label"], dtype="object"),
                "confidence": pd.Series(cols["confidence"], dtype="float64"),
                "nx1": pd.Series(cols["nx1"], dtype="float64"),
                "ny1": pd.Series(cols["ny1"], dtype="float64"),
                "nx2": pd.Series(cols["nx2"], dtype="float64"),
                "ny2": pd.Series(cols["ny2"], dtype="float64"),
                "page_width": pd.Series(cols["page_width"], dtype="float64"),
                "page_height": pd.Series(cols["page_height"], dtype="float64"),
            }
        )


def parse_layout_clusters(pages: DataFrame) -> DataFrame:
    """(doc_id, page_no, payload, page_width, page_height) -> cluster rows.

    Output: doc_id, page_no, cluster_id, label, confidence, l, t, r, b
    (page coordinates; the (0,0,100,100) fallback applies when the page has
    no size, layout_model.py:221).
    """
    from .partitioning import spread_for_kernel

    # page size passes THROUGH the UDF (output columns) — no join needed
    normalized = spread_for_kernel(
        pages.select(
            "doc_id",
            F.col("page_no").cast("int").alias("page_no"),
            "payload",
            F.col("page_width").cast("double").alias("page_width"),
            F.col("page_height").cast("double").alias("page_height"),
        )
    ).mapInPandas(_parse_layout_batches, CLUSTERS_SCHEMA)
    sized = normalized
    has_size = (
        F.col("page_width").isNotNull()
        & F.col("page_height").isNotNull()
        & (F.col("page_width") > 0)
        & (F.col("page_height") > 0)
    )
    return sized.select(
        "doc_id",
        "page_no",
        "cluster_id",
        "label",
        "confidence",
        F.when(has_size, F.col("nx1") / 1000.0 * F.col("page_width")).otherwise(0.0).alias("l"),
        F.when(has_size, F.col("ny1") / 1000.0 * F.col("page_height")).otherwise(0.0).alias("t"),
        F.when(has_size, F.col("nx2") / 1000.0 * F.col("page_width")).otherwise(100.0).alias("r"),
        F.when(has_size, F.col("ny2") / 1000.0 * F.col("page_height")).otherwise(100.0).alias("b"),
    )
