"""Pure-Python reference-parity semantics (no Spark imports).

Kernels for the pandas UDFs in ``operators/`` and oracles for the unit
tests.  See each module's docstring for file:line citations into
/root/reference.
"""

from .html_parse import MEDIA_TAGS, TAG_TO_TYPE, ParsedElement, parse_qwenvl_html
from .json_repair import (
    extract_json_block,
    extract_valid_elements,
    fix_corrupted_keys,
    parse_array,
    parse_json_block,
    parse_object,
    repair_json_array,
    repair_json_object,
)
from .geometry import (
    LABEL_MAP,
    LANGUAGE_MAP,
    build_clusters,
    build_otsl,
    build_table,
    classify_picture,
    enrich_code_formula,
    html_elements_to_cells,
    paragraphs_to_cells,
)
from .text import (
    collapse_whitespace,
    elements_to_plain_text,
    split_paragraphs,
    strip_tags_to_plain_text,
    strip_think_prefix,
)

__all__ = [
    "MEDIA_TAGS",
    "TAG_TO_TYPE",
    "ParsedElement",
    "parse_qwenvl_html",
    "extract_json_block",
    "extract_valid_elements",
    "fix_corrupted_keys",
    "parse_array",
    "parse_json_block",
    "parse_object",
    "repair_json_array",
    "repair_json_object",
    "LABEL_MAP",
    "LANGUAGE_MAP",
    "build_clusters",
    "build_otsl",
    "build_table",
    "classify_picture",
    "enrich_code_formula",
    "html_elements_to_cells",
    "paragraphs_to_cells",
    "collapse_whitespace",
    "elements_to_plain_text",
    "split_paragraphs",
    "strip_tags_to_plain_text",
    "strip_think_prefix",
]
