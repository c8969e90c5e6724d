"""docling_ocr_qwen3vl_spark — a from-scratch PySpark-native rebuild of the
per-document extraction capabilities of mayflower/docling-ocr-qwen3vl.

Top-level API (the Spark analog of the reference's plugin surface,
plugins.py:8-71 + DocumentConverter.convert):

    from docling_ocr_qwen3vl_spark import ExtractConfig, extract

    spans = extract(spark, documents_df)           # flat span rows
    docs  = extract(spark, documents_df, nested=True)  # (doc_id, spans[])

Stage-level operators live under ``operators/`` (each independently
callable — they are the ``queries()`` entries in __spark_entry__.py);
``plans/`` holds the end-to-end pipeline, checkpoint/resume, and session
builder; ``semantics/`` the pure reference-parity kernels; ``inference/``
the pluggable page-decoder (deterministic stub here, Qwen3-VL singleton on
GPU clusters); ``streaming/`` the incremental surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .config import DEFAULT_PROMPTS, ExtractConfig, resolve_prompt

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_PROMPTS",
    "ExtractConfig",
    "extract",
    "resolve_prompt",
    "__version__",
]


def extract(
    spark: SparkSession,
    documents: DataFrame,
    config: ExtractConfig | None = None,
    nested: bool = False,
    sf_dir: str = "",
) -> DataFrame:
    """documents (doc_id, text, ...) -> interleaved text+media spans.

    Honors the per-stage enables in ``config`` as PLAN predicates — a
    disabled stage's pages never enter the decode pass (see api.py)."""
    from .api import extract as _extract

    return _extract(spark, documents, config, sf_dir, nested)
