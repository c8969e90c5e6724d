"""JSON repair cascade — reference parity (_vlm_jsonformer.py:35-223).

Small VLMs emit near-JSON: corrupted keys (``"y1:890``), trailing commas,
unclosed brackets, garbage around the payload.  The reference repairs rather
than fails; a page never kills the run.  Same contract here: every function
is total — worst case returns ``[]`` / ``{}``.

Used (a) inside the layout/table pandas UDFs, (b) as unit-test oracle for the
Spark ``regexp_replace`` column forms of the regex-expressible steps
(functions/json_fns.py).
"""

from __future__ import annotations

import json
import re
from typing import Any

_KEY_FIX_RE = re.compile(r'"(\w+):(\d)')
_TRAILING_COMMA_RE = re.compile(r",\s*([}\]])")
_OBJECT_RE = re.compile(r"\{[^{}]*\}")
_FULL_ARRAY_RE = re.compile(r"\[[\s\S]*\]")
_PARTIAL_ARRAY_RE = re.compile(r"\[[\s\S]*")
_FULL_OBJECT_RE = re.compile(r"\{[\s\S]*\}")
_PARTIAL_OBJECT_RE = re.compile(r"\{[\s\S]*")


def fix_corrupted_keys(text: str) -> str:
    """``"y1:890`` -> ``"y1":890`` (_vlm_jsonformer.py:35-38)."""
    return _KEY_FIX_RE.sub(r'"\1":\2', text)


def repair_json_array(text: str) -> str:
    """Key fix + trailing-comma strip + close at last ``}`` (lines 41-50)."""
    s = text.strip()
    s = fix_corrupted_keys(s)
    s = _TRAILING_COMMA_RE.sub(r"\1", s)
    if s.startswith("[") and not s.endswith("]"):
        last_brace = s.rfind("}")
        if last_brace > 0:
            s = s[: last_brace + 1] + "]"
    return s


def repair_json_object(text: str) -> str:
    """Key fix + trailing-comma strip + bracket-count close (lines 70-81)."""
    s = text.strip()
    s = fix_corrupted_keys(s)
    s = _TRAILING_COMMA_RE.sub(r"\1", s)
    opens = s.count("{") + s.count("[")
    closes = s.count("}") + s.count("]")
    if opens > closes:
        arr_diff = s.count("[") - s.count("]")
        obj_diff = s.count("{") - s.count("}")
        s += "]" * max(arr_diff, 0) + "}" * max(obj_diff, 0)
    return s


def extract_valid_elements(text: str) -> list:
    """Salvage individually-valid ``{...}`` objects (lines 53-67)."""
    results = []
    for obj_str in _OBJECT_RE.findall(text):
        try:
            results.append(json.loads(fix_corrupted_keys(obj_str)))
        except json.JSONDecodeError:
            continue
    return results


def parse_array(text: str) -> list:
    """Full parse -> repaired -> partial-close -> salvage -> [] (163-194)."""
    match = _FULL_ARRAY_RE.search(text)
    if match:
        try:
            return json.loads(match.group())
        except json.JSONDecodeError:
            try:
                return json.loads(repair_json_array(match.group()))
            except json.JSONDecodeError:
                pass

    partial = _PARTIAL_ARRAY_RE.search(text)
    if partial:
        try:
            return json.loads(repair_json_array(partial.group()))
        except json.JSONDecodeError:
            pass

    salvaged = extract_valid_elements(text)
    if salvaged:
        return salvaged
    return []


def parse_object(text: str) -> dict:
    """Key-fix upfront, then full -> repaired -> partial-close -> {} (197-223)."""
    fixed = fix_corrupted_keys(text)

    match = _FULL_OBJECT_RE.search(fixed)
    if match:
        try:
            return json.loads(match.group())
        except json.JSONDecodeError:
            try:
                return json.loads(repair_json_object(match.group()))
            except json.JSONDecodeError:
                pass

    partial = _PARTIAL_OBJECT_RE.search(fixed)
    if partial:
        try:
            return json.loads(repair_json_object(partial.group()))
        except json.JSONDecodeError:
            pass

    return {}


def extract_json_block(text: str) -> str | None:
    """First ``{...}`` block, greedy (picture_classifier_model.py:146-149,
    code_formula_model.py:195-198); None when absent."""
    match = _FULL_OBJECT_RE.search(text)
    return match.group() if match else None


def parse_json_block(text: str) -> Any | None:
    """Regex-extract then strict parse; None on any failure (no repair —
    matches the classifier/code-formula call sites exactly)."""
    block = extract_json_block(text)
    if block is None:
        return None
    try:
        return json.loads(block)
    except json.JSONDecodeError:
        return None
