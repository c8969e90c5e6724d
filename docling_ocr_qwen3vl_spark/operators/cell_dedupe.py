"""G4 second half: geometric overlap-dedupe of OCR cells.

The reference delegates cell post-processing to its docling base
(model.py:108 ``post_process_cells``: dedupe/merge OCR cells against the
programmatic text layer) — so duplicate/overlapping cells never reach span
assembly there.  This operator is the Spark counterpart, slotted between
``elements_to_cells`` and the reading-order sort.

Semantics (deterministic, oracle-expressible): within a page, a cell is
DROPPED when any EARLIER cell (lower ``cell_index`` — the programmatic
text layer precedes OCR cells, so earlier wins) overlaps it with
IoU >= ``threshold``.  "Any earlier" rather than "any earlier survivor":
the decision depends only on the input, so it is a pure self-join with no
iteration order — the property a distributed dedupe needs.

Plan shape: equi self-join on the page key (hash shuffle, bounded by cells
per page — same scale argument as cluster_assign), IoU as a residual
filter, then a left-anti join removes the dropped set.  No window, no
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGE_KEYS = ("doc_id", "page_no")


def dedupe_cells(
    cells: DataFrame,
    threshold: float = 0.8,
    keys: tuple[str, ...] = PAGE_KEYS,
) -> DataFrame:
    """Drop later cells that duplicate an earlier cell's geometry.

    Input columns: ``keys...``, cell_index, l, t, r, b (+ payload columns,
    preserved).  Output: the input minus dropped cells, schema unchanged.
    """
    earlier = cells.select(
        *keys,
        F.col("cell_index").alias("e_idx"),
        F.col("l").alias("e_l"),
        F.col("t").alias("e_t"),
        F.col("r").alias("e_r"),
        F.col("b").alias("e_b"),
    )
    later = cells.select(
        *keys,
        "cell_index",
        F.col("l").alias("c_l"),
        F.col("t").alias("c_t"),
        F.col("r").alias("c_r"),
        F.col("b").alias("c_b"),
    )
    iw = F.greatest(
        F.lit(0.0), F.least("e_r", "c_r") - F.greatest("e_l", "c_l")
    )
    ih = F.greatest(
        F.lit(0.0), F.least("e_b", "c_b") - F.greatest("e_t", "c_t")
    )
    inter = iw * ih
    area_e = (F.col("e_r") - F.col("e_l")) * (F.col("e_b") - F.col("e_t"))
    area_c = (F.col("c_r") - F.col("c_l")) * (F.col("c_b") - F.col("c_t"))
    union = area_e + area_c - inter
    identical = (
        (F.col("e_l") == F.col("c_l")) & (F.col("e_t") == F.col("c_t"))
        & (F.col("e_r") == F.col("c_r")) & (F.col("e_b") == F.col("c_b"))
    )
    # zero-area duplicates (l==r or t==b, common OCR noise) have union 0 and
    # IoU 0/0=null; exactly coincident degenerate boxes must still dedupe
    overlap = F.when(union > 0, inter / union).otherwise(
        F.when(identical, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    dropped = (
        later.join(earlier, list(keys))
        .filter(F.col("e_idx") < F.col("cell_index"))
        .filter(overlap >= F.lit(threshold))
        .select(*keys, "cell_index")
        .distinct()
    )
    return cells.join(dropped, [*keys, "cell_index"], "left_anti")
