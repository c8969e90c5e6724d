"""Pure-Python text-structuring semantics (reference parity).

These functions replicate, behavior-for-behavior, the text operators of the
reference extraction pipeline (mayflower/docling-ocr-qwen3vl).  They are pure
(no Spark, no model) so they serve three roles:

1. the inner kernel of the vectorized pandas UDFs in ``operators/``,
2. the expected-value oracle for unit tests of the Spark column expressions,
3. executable documentation of the exact reference semantics.

Reference citations (into /root/reference):
  - paragraph splitting: qwen_runner.py:295-315 (``_split_paragraphs``)
  - whitespace collapse + tag strip fallback: qwen_runner.py:283-291
  - think-token text form: _model_registry.py:205-216 (token-level in the
    reference; string form here, per SURVEY.md §2.2 M4)
"""

from __future__ import annotations

import re

_BLANK_LINE_RE = re.compile(r"\n\s*\n")
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

THINK_END = "</think>"


def split_paragraphs(text: str) -> list[str]:
    """Split text into paragraphs exactly like the reference.

    Semantics (qwen_runner.py:295-315):
      * empty/None input -> []
      * split on blank lines (``\\n\\s*\\n``), strip each part, drop blanks
      * if that yields <= 1 paragraph and the text is non-blank, fall back to
        splitting on single newlines — but only when that produces > 1 line
      * final fallback: the whole stripped text as one paragraph (or [] if
        blank).

    Note the fallback is *global*: whether single-newline splitting applies
    depends on the size of the blank-line split of the WHOLE text, so any
    columnar re-expression must branch on the full split-array size, not map
    per element (SURVEY.md §7 "hard parts" (a)).
    """
    if not text:
        return []

    parts = _BLANK_LINE_RE.split(text)
    paragraphs = [p.strip() for p in parts if p.strip()]

    if len(paragraphs) <= 1 and text.strip():
        lines = [line.strip() for line in text.splitlines() if line.strip()]
        if len(lines) > 1:
            paragraphs = lines

    if paragraphs:
        return paragraphs
    return [text.strip()] if text.strip() else []


def collapse_whitespace(text: str) -> str:
    """Collapse whitespace runs to single spaces (qwen_runner.py:259)."""
    return _WS_RE.sub(" ", text)


def strip_tags_to_plain_text(html_text: str) -> str:
    """Tag-strip fallback used when HTML parsing yields no elements.

    Semantics (qwen_runner.py:284-291): replace every ``<...>`` run with a
    single space, strip, collapse whitespace.  Returns "" when nothing
    remains.
    """
    plain = _TAG_RE.sub(" ", html_text).strip()
    return _WS_RE.sub(" ", plain)


def strip_think_prefix(text: str) -> str:
    """Drop everything up to and including the LAST ``</think>`` marker.

    String-level analog of the reference's token-level stripper
    (_model_registry.py:205-216: position of the last THINK_END token id,
    keep the suffix; if absent, return unchanged).
    """
    idx = text.rfind(THINK_END)
    if idx < 0:
        return text
    return text[idx + len(THINK_END):]


def elements_to_plain_text(element_texts: list[str]) -> str:
    """Join element texts with blank lines, skipping blank texts.

    Semantics (qwen_runner.py:174): ``"\\n\\n".join(t for t in texts if
    t.strip())``.
    """
    return "\n\n".join(t for t in element_texts if t.strip())
