"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship interleaved-extraction pipeline at sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 for the sf0.01 DuckDB cross-check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved text+media span extraction at sf0.001."""
    from docling_ocr_qwen3vl_spark.plans.pipeline import extract_spans

    return extract_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from docling_ocr_qwen3vl_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from docling_ocr_qwen3vl_spark.oracles import ORACLES

    return dict(ORACLES)
