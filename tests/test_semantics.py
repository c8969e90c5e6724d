"""Unit tests for the pure reference-parity semantics.

Cases mirror /root/reference/tests/test_parsing.py plus the parser quirks
documented in SURVEY.md §7 (hard parts a/b) — these define the engine's
correctness contract before any Spark is involved.
"""

import math

from docling_ocr_qwen3vl_spark.semantics import (
    build_clusters,
    build_otsl,
    build_table,
    classify_picture,
    enrich_code_formula,
    extract_valid_elements,
    fix_corrupted_keys,
    html_elements_to_cells,
    paragraphs_to_cells,
    parse_array,
    parse_json_block,
    parse_object,
    parse_qwenvl_html,
    repair_json_array,
    repair_json_object,
    split_paragraphs,
    strip_tags_to_plain_text,
    strip_think_prefix,
)


# ---------------------------------------------------------------- paragraphs
def test_split_blank_lines():
    assert split_paragraphs("First.\n\nSecond.\n\nThird.") == [
        "First.",
        "Second.",
        "Third.",
    ]


def test_split_blank_lines_with_spaces():
    assert split_paragraphs("A.\n  \nB.") == ["A.", "B."]


def test_split_single_newline_fallback():
    assert split_paragraphs("Line one.\nLine two.\nLine three.") == [
        "Line one.",
        "Line two.",
        "Line three.",
    ]


def test_split_empty():
    assert split_paragraphs("") == []
    assert split_paragraphs("   ") == []


def test_split_single_paragraph():
    assert split_paragraphs("Just one paragraph.") == ["Just one paragraph."]


def test_split_fallback_not_applied_when_multiple_paragraphs():
    # two blank-line paragraphs, each containing single newlines: no fallback
    text = "a\nb\n\nc\nd"
    assert split_paragraphs(text) == ["a\nb", "c\nd"]


# ----------------------------------------------------------------- html parse
def test_html_basic_elements_and_bbox():
    html = (
        '<h1 data-bbox="400 80 580 90">Title</h1>'
        '<p data-bbox="100 120 900 150">Body  text</p>'
    )
    els = parse_qwenvl_html(html)
    assert [(e.tag, e.text, e.bbox, e.element_type) for e in els] == [
        ("h1", "Title", (400, 80, 580, 90), "heading"),
        ("p", "Body text", (100, 120, 900, 150), "paragraph"),
    ]


def test_html_boilerplate_stripped():
    html = "<style>p{color:red}</style><script>alert(1)</script><p>keep</p>"
    els = parse_qwenvl_html(html)
    assert [(e.tag, e.text) for e in els] == [("p", "keep")]


def test_html_style_inside_open_tag_leaks():
    # reference quirk: non-whitelisted tags do not reset the open element
    els = parse_qwenvl_html("<p>a<style>x</style>b</p>")
    assert [(e.tag, e.text) for e in els] == [("p", "a x b")]


def test_html_nested_list_emits_inner_only():
    # reference quirk: single current_tag — inner li wins, ul never emits
    els = parse_qwenvl_html(
        '<ul data-bbox="100 200 900 300"><li data-bbox="100 200 900 240">item one</li></ul>'
    )
    assert [(e.tag, e.text, e.bbox) for e in els] == [
        ("li", "item one", (100, 200, 900, 240))
    ]


def test_html_table_emits_cells_only():
    els = parse_qwenvl_html("<table><tr><td>c1</td><td>c2</td></tr></table>")
    assert [(e.tag, e.text) for e in els] == [("td", "c1"), ("td", "c2")]


def test_html_malformed_bbox_kept_element_null_bbox():
    els = parse_qwenvl_html('<p data-bbox="abc">x</p><p data-bbox="10 20 30">y</p>')
    assert [(e.text, e.bbox) for e in els] == [("x", None), ("y", None)]


def test_html_empty_img_dropped_strict_kept_for_media():
    html = '<p>before</p><img data-bbox="1 2 3 4"/><p>after</p>'
    strict = parse_qwenvl_html(html)
    assert [(e.tag, e.text) for e in strict] == [("p", "before"), ("p", "after")]
    media = parse_qwenvl_html(html, keep_empty_media=True)
    assert [(e.tag, e.text, e.bbox) for e in media] == [
        ("p", "before", None),
        ("img", "", (1, 2, 3, 4)),
        ("p", "after", None),
    ]


def test_html_plain_text_fallback():
    els = parse_qwenvl_html("<unknown>some  raw\ntext</unknown>")
    assert [(e.tag, e.text, e.element_type) for e in els] == [
        ("p", "some raw text", "paragraph")
    ]


def test_html_empty_input():
    assert parse_qwenvl_html("") == []
    assert parse_qwenvl_html("   ") == []


def test_strip_tags():
    assert strip_tags_to_plain_text("<a>x</a> <b>y</b>") == "x y"
    assert strip_tags_to_plain_text("<a></a>") == ""


def test_strip_think():
    assert strip_think_prefix("junk</think>answer") == "answer"
    assert strip_think_prefix("a</think>b</think>c") == "c"
    assert strip_think_prefix("no marker") == "no marker"


# ---------------------------------------------------------------- json repair
def test_fix_corrupted_keys():
    assert fix_corrupted_keys('{"y1:890}') == '{"y1":890}'
    assert fix_corrupted_keys('{"y1":890}') == '{"y1":890}'


def test_repair_array_trailing_comma_and_close():
    assert repair_json_array('[{"a":1},]') == '[{"a":1}]'
    assert repair_json_array('[{"a":1},{"b":2}') == '[{"a":1},{"b":2}]'


def test_repair_object_bracket_close():
    assert repair_json_object('{"a":[1,2') == '{"a":[1,2]}'


def test_salvage_objects():
    # "b:2 is key-repaired per object before parsing (reference line 62);
    # the {"d": } object is unrecoverable and dropped
    assert extract_valid_elements('garbage {"a":1} mid {"b:2} {"d": } {"c":3}') == [
        {"a": 1},
        {"b": 2},
        {"c": 3},
    ]


def test_parse_array_cascade():
    assert parse_array('x [{"a":1}] y') == [{"a": 1}]
    assert parse_array('[{"a":1},') == [{"a": 1}]
    assert parse_array('pure garbage {"a":1}') == [{"a": 1}]
    assert parse_array("nothing here") == []


def test_parse_object_cascade():
    assert parse_object('pre {"rows":2} post') == {"rows": 2}
    assert parse_object('{"rows":2,"cells":[') == {"rows": 2, "cells": []}
    assert parse_object("garbage") == {}


def test_parse_json_block_no_repair():
    assert parse_json_block('text {"a": 1} more') == {"a": 1}
    assert parse_json_block('{"a": }') is None
    assert parse_json_block("none") is None


# ------------------------------------------------------------------- geometry
def test_paragraphs_to_cells_distribution():
    cells = paragraphs_to_cells(["First", "Second", "Third"], (0, 0, 200, 300))
    assert [c["index"] for c in cells] == [0, 1, 2]
    assert math.isclose(cells[0]["t"], 0) and math.isclose(cells[0]["b"], 100)
    assert math.isclose(cells[1]["t"], 100) and math.isclose(cells[1]["b"], 200)
    assert math.isclose(cells[2]["t"], 200) and math.isclose(cells[2]["b"], 300)
    assert all(c["l"] == 0 and c["r"] == 200 for c in cells)


def test_paragraphs_to_cells_offset_and_blank_slot():
    cells = paragraphs_to_cells(["Test"], (0, 0, 100, 100), index_offset=5)
    assert cells[0]["index"] == 5
    # blank paragraph consumes a vertical slot but emits no cell
    cells = paragraphs_to_cells(["a", "  ", "b"], (0, 0, 90, 90))
    assert [c["index"] for c in cells] == [0, 1]
    assert math.isclose(cells[1]["t"], 60) and math.isclose(cells[1]["b"], 90)


def test_html_elements_to_cells_rescale_and_fallback():
    els = [
        {"text": "a", "bbox": [0, 0, 500, 1000]},
        {"text": "b", "bbox": None},
        {"text": "  ", "bbox": [1, 1, 2, 2]},
    ]
    cells = html_elements_to_cells(els, (10, 20, 110, 220))
    assert len(cells) == 2
    a, b = cells
    assert (a["l"], a["t"], a["r"], a["b"]) == (10, 20, 60, 220)
    assert (b["l"], b["t"], b["r"], b["b"]) == (10, 20, 110, 220)
    assert [c["index"] for c in cells] == [0, 1]


def test_build_clusters_reference_fixture():
    elements = [
        {"label": "title", "x1": 100, "y1": 50, "x2": 800, "y2": 100},
        {"label": "picture", "bbox": [50, 760, 400, 950]},
        {"label": "unknown_label", "x1": 0, "y1": 0, "x2": 10, "y2": 10},
        {"label": "text", "x1": 500, "y1": 300, "x2": 500, "y2": 400},  # zero area
        {"label": "text", "x1": 900, "y1": 90, "x2": 100, "y2": 20},  # swapped
    ]
    clusters = build_clusters(elements, 1000.0, 2000.0)
    assert [c["id"] for c in clusters] == [0, 1, 2, 4]  # ids skip dropped elem 3
    assert clusters[0]["label"] == "title"
    assert clusters[1]["label"] == "picture"
    assert clusters[2]["label"] == "text"  # unknown -> text
    swapped = clusters[3]
    assert (swapped["l"], swapped["t"], swapped["r"], swapped["b"]) == (
        100.0,
        40.0,
        900.0,
        180.0,
    )
    assert all(c["confidence"] == 0.9 for c in clusters)


def test_build_clusters_no_page_size_fallback():
    clusters = build_clusters([{"label": "text", "x1": 1, "y1": 1, "x2": 2, "y2": 2}], None, None)
    assert (clusters[0]["l"], clusters[0]["b"]) == (0.0, 100.0)


def test_build_otsl():
    assert build_otsl(2, 2) == ["cell", "l", "cell", "nl", "cell", "l", "cell"]
    assert build_otsl(1, 3) == ["cell", "l", "cell", "l", "cell"]


def test_build_table_dual_field_names():
    data = {
        "rows": 2,
        "cols": 2,
        "cells": [
            {"row": 0, "col": 0, "text": "H1", "rs": 1, "cs": 1, "hdr": True,
             "x1": 0, "y1": 0, "x2": 500, "y2": 100},
            {"row": 1, "col": 0, "text": "a", "row_span": 1, "col_span": 2,
             "is_header": False, "bbox": [0, 100, 1000, 200]},
        ],
    }
    table = build_table(data, (100.0, 600.0, 900.0, 1000.0), (1000.0, 1000.0))
    assert table["num_rows"] == 2 and table["num_cols"] == 2
    assert table["otsl_seq"] == ["cell", "l", "cell", "nl", "cell", "l", "cell"]
    c0, c1 = table["cells"]
    assert c0["col_header"] is True and c0["end_col"] == 1
    assert c1["col_span"] == 2 and c1["end_col"] == 2
    # cell bbox: 0-1000 relative to table bbox (800 wide, 400 tall)
    assert c0["bbox"] == (100.0, 600.0, 500.0, 640.0)
    assert c1["bbox"] == (100.0, 640.0, 900.0, 680.0)


def test_build_table_zero_rows_none():
    assert build_table({"rows": 0, "cols": 3}, (0, 0, 1, 1), (10, 10)) is None


def test_classify_picture_defaults():
    data = {"classes": [{"class_name": "chart", "confidence": 0.8}, {}]}
    out = classify_picture(data)
    assert out == [
        {"class_name": "chart", "confidence": 0.8},
        {"class_name": "other", "confidence": 0.5},
    ]
    assert classify_picture({"classes": []}) is None
    assert classify_picture(None) is None


def test_enrich_code_formula():
    out = enrich_code_formula("code", "old", {"is_code": True, "language": "Python", "code": "print(1)"})
    assert out == {"text": "print(1)", "language": "python"}
    out = enrich_code_formula("code", "old", {"is_code": True, "language": "brainfck"})
    assert out == {"text": "old", "language": "unknown"}
    out = enrich_code_formula("formula", "old", {"is_formula": True, "latex": "E=mc^2"})
    assert out == {"text": "E=mc^2", "language": None}
    out = enrich_code_formula("code", "old", {"is_code": False, "is_formula": False})
    assert out == {"text": "old", "language": None}
