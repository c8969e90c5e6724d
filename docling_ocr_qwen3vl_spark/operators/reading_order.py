"""G4: deterministic reading-order sort (y-band / x heuristic).

The reference delegates cell ordering to docling's post-processing
(model.py:108); the engine needs an explicit, TOTAL, deterministic order or
span offsets flap between runs (SURVEY.md §7 hard part (c)).  The heuristic:
rows whose tops fall in the same horizontal band read left-to-right; bands
read top-to-bottom; a stable sequence column breaks exact ties.

One window over (doc_id, page_no) — the same shuffle the offset assignment
already performs, so Catalyst reuses the exchange when both run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BAND_PX = 24.0


def band(t: Column, band_px: float = DEFAULT_BAND_PX) -> Column:
    return F.floor(t / F.lit(band_px))


def reading_order_rank(
    cells: DataFrame,
    t_col: str = "t",
    l_col: str = "l",
    seq_col: str = "seq",
    band_px: float = DEFAULT_BAND_PX,
    out_col: str = "rank",
) -> DataFrame:
    """Append a 0-based reading-order rank per (doc_id, page_no)."""
    w = Window.partitionBy("doc_id", "page_no").orderBy(
        band(F.col(t_col), band_px), F.col(l_col), F.col(seq_col)
    )
    return cells.withColumn(out_col, (F.row_number().over(w) - 1).cast("int"))


def confidence_scores(clusters: DataFrame, cells: DataFrame | None = None) -> DataFrame:
    """G7: per-page mean confidences (layout_model.py:109-125).

    layout_score = mean cluster confidence; ocr_score = mean cell confidence
    over from_ocr cells when a cells frame is supplied.  Empty groups yield
    null (the reference's NaN-with-suppressed-warning).
    """
    layout = clusters.groupBy("doc_id", "page_no").agg(
        F.avg("confidence").alias("layout_score")
    )
    if cells is None:
        return layout
    ocr = cells.groupBy("doc_id", "page_no").agg(
        F.avg(F.when(F.col("from_ocr"), F.col("conf"))).alias("ocr_score")
    )
    return layout.join(ocr, ["doc_id", "page_no"], "full_outer")
