"""Top-level API — the analog of ``DocumentConverter.convert`` and the
plugin factory surface (SURVEY.md §2.6, reference plugins.py:8-71).

``extract(spark, documents, config)`` is the one-call entry; per-stage
enables in ``ExtractConfig`` become PLAN predicates — a disabled stage's
pages are filtered out before the decode pass, so Catalyst never schedules
their work (the Spark analog of not registering a plugin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import ExtractConfig
from .operators.page_decode import decode_pages
from .operators.spans import assemble_documents, number_spans
from .sources.synthetic import synth_raw_pages

# payload kinds gated by each stage enable (config.py ExtractConfig)
_STAGE_KINDS = {
    "do_ocr": ("qwenvl_html", "plain_text"),
    "do_layout": ("layout_json",),
    "do_tables": ("table_json",),
}


def extract(
    spark: SparkSession,
    documents: DataFrame | None = None,
    config: ExtractConfig | None = None,
    sf_dir: str = "",
    nested: bool = False,
) -> DataFrame:
    """documents -> interleaved spans under ``config``.

    ``nested=False`` returns the flat (doc_id, offset, kind, text,
    media_ref) table; ``nested=True`` the (doc_id, spans[]) document shape
    (BASELINE input_hint)."""
    cfg = config or ExtractConfig()
    pages = synth_raw_pages(spark, sf_dir, documents, cfg.num_partitions)
    enabled: list[str] = []
    for flag, kinds in _STAGE_KINDS.items():
        if getattr(cfg, flag):
            enabled.extend(kinds)
    if len(enabled) < sum(len(k) for k in _STAGE_KINDS.values()):
        pages = pages.filter(F.col("payload_kind").isin(*enabled))
    spans = number_spans(decode_pages(pages, config=cfg))
    return assemble_documents(spans) if nested else spans


# --------------------------------------------------------------------------
# Plugin factories (reference plugins.py:8-71): each returns the engines the
# stage can run with, keyed like the upstream entry points.
# --------------------------------------------------------------------------

def ocr_engines() -> dict:
    from .inference.decoder import DeterministicDecoder, TorchQwenDecoder

    return {"qwen3vl_ocr": {"deterministic": DeterministicDecoder,
                            "qwen3vl": TorchQwenDecoder}}


def layout_engines() -> dict:
    from .operators.layout import parse_layout_clusters

    return {"qwen3vl_layout": parse_layout_clusters}


def table_structure_engines() -> dict:
    from .operators.tables import parse_table_cells

    return {"qwen3vl_table": parse_table_cells}


def picture_classifier() -> dict:
    from .operators.enrichment import classify_pictures

    return {"qwen3vl_classifier": classify_pictures}


def code_formula() -> dict:
    from .operators.enrichment import enrich_code_formula

    return {"qwen3vl_code_formula": enrich_code_formula}
