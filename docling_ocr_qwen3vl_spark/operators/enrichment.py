"""G10/G11/G12: enrichment parsers — classifier, code/formula, description.

These stay FULLY JVM-side: the reference parses enrichment model output with
a greedy regex block extraction + strict json.loads (no repair cascade —
picture_classifier_model.py:146-155, code_formula_model.py:194-204), which
maps exactly to ``regexp_extract`` + ``from_json`` (null on bad JSON, never
a task failure).

  * classify_pictures: classes array with per-class defaults
    class_name->'other', confidence->0.5; no/empty classes -> null row
    value (picture_classifier_model.py:157-173).
  * enrich_code_formula: kind 'code' + is_code -> text := code (default
    original), language via the 23-entry LANGUAGE_MAP else 'unknown';
    kind 'formula' + is_formula -> text := latex; otherwise unchanged
    (code_formula_model.py:106-139).
  * describe (G12) is an inference output — in this engine a passthrough
    text column minted by the decoder; order preserved by (doc_id, page_no,
    seq) keys.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.json_fns import extract_json_block
from ..semantics.geometry import LANGUAGE_MAP, UNKNOWN_LANGUAGE

_CLASSES_SCHEMA = "struct<classes:array<struct<class_name:string,confidence:double>>>"
_CODE_SCHEMA = (
    "struct<is_code:boolean,is_formula:boolean,language:string,"
    "code:string,latex:string>"
)


def _language_map_col() -> Column:
    return F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in LANGUAGE_MAP.items())
    )


def classify_pictures(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Append ``classes`` (array<struct<class_name, confidence>>, null when
    the payload has no parsable classes)."""
    parsed = F.from_json(extract_json_block(F.col(payload_col)), _CLASSES_SCHEMA)
    classes = F.transform(
        parsed["classes"],
        lambda c: F.struct(
            F.coalesce(c["class_name"], F.lit("other")).alias("class_name"),
            F.coalesce(c["confidence"], F.lit(0.5)).alias("confidence"),
        ),
    )
    return df.withColumn(
        "classes",
        F.when(F.size(classes) > 0, classes),  # empty/missing -> null (G10)
    )


def enrich_code_formula(
    df: DataFrame, kind_col: str = "elem_kind", text_col: str = "text",
    payload_col: str = "payload",
) -> DataFrame:
    """Append ``out_text`` and ``language`` per the reference dispatch."""
    parsed = F.from_json(extract_json_block(F.col(payload_col)), _CODE_SCHEMA)
    is_code = (F.col(kind_col) == "code") & (parsed["is_code"] == True)  # noqa: E712
    is_formula = (F.col(kind_col) == "formula") & (parsed["is_formula"] == True)  # noqa: E712
    out_text = (
        F.when(is_code, F.coalesce(parsed["code"], F.col(text_col), F.lit("")))
        .when(is_formula, F.coalesce(parsed["latex"], F.col(text_col), F.lit("")))
        .otherwise(F.col(text_col))
    )
    language = F.when(
        is_code,
        F.coalesce(
            _language_map_col()[F.lower(F.coalesce(parsed["language"], F.lit("")))],
            F.lit(UNKNOWN_LANGUAGE),
        ),
    )
    return df.withColumn("out_text", out_text).withColumn("language", language)
