"""G2/G3: HTML elements -> OCR text cells with page-coordinate bboxes.

Reference semantics (model.py:191-259):
  * 0-1000 data-bbox rescaled into the OCR region rect: page_coord =
    rect_origin + bbox_coord * region_extent / 1000
  * elements with no bbox fall back to the whole region
  * blank-text elements are skipped
  * indices are sequential over EMITTED cells, offset by the running count
    across OCR regions of the page (model.py:97,103 — G3)

All column arithmetic + one window; fully codegen'd, no Python.

G1 (paragraphs -> evenly-distributed cells, model.py:136-189) is the same
shape with computed slots; see ``paragraph_cells`` in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text_fns import ws_trim


def elements_to_cells(elements: DataFrame) -> DataFrame:
    """Element rows -> cell rows.

    Input columns: doc_id, page_no, rect_seq (OCR-region order within the
    page; 0 if single region), seq (element order within region),
    text, x1..y2 (nullable ints, 0-1000), and the region rect
    rect_l, rect_t, rect_r, rect_b.

    Output: doc_id, page_no, cell_index, cell_text, conf, l, t, r, b.
    """
    sx = (F.col("rect_r") - F.col("rect_l")) / 1000.0
    sy = (F.col("rect_b") - F.col("rect_t")) / 1000.0

    kept = elements.filter(ws_trim(F.col("text")) != F.lit(""))

    has_bbox = F.col("x1").isNotNull()
    cell = kept.select(
        "doc_id",
        "page_no",
        "rect_seq",
        "seq",
        ws_trim(F.col("text")).alias("cell_text"),
        F.lit(1.0).alias("conf"),
        F.when(has_bbox, F.col("rect_l") + F.col("x1") * sx)
        .otherwise(F.col("rect_l"))
        .alias("l"),
        F.when(has_bbox, F.col("rect_t") + F.col("y1") * sy)
        .otherwise(F.col("rect_t"))
        .alias("t"),
        F.when(has_bbox, F.col("rect_l") + F.col("x2") * sx)
        .otherwise(F.col("rect_r"))
        .alias("r"),
        F.when(has_bbox, F.col("rect_t") + F.col("y2") * sy)
        .otherwise(F.col("rect_b"))
        .alias("b"),
    )

    # G3: cumulative cell index across regions of a page, in (region,
    # element) order — row_number over emitted cells only, matching
    # index_offset = len(all_ocr_cells)
    w = Window.partitionBy("doc_id", "page_no").orderBy("rect_seq", "seq")
    return cell.withColumn(
        "cell_index", (F.row_number().over(w) - 1).cast("int")
    ).select(
        "doc_id", "page_no", "cell_index", "cell_text", "conf", "l", "t", "r", "b"
    )
