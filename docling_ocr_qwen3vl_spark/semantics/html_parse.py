"""QwenVL Document-Parser HTML parsing — reference-parity pure Python.

Replicates the reference's HTML-element extraction (qwen_runner.py:193-292)
including its deliberate quirks, which matter for span-sequence equality:

  * Whitelist of 18 tags mapped to element types; any other tag
    (``style``/``script``/``link``/...) never OPENS an element — top-level
    boilerplate contributes nothing (DOM boilerplate strip).
  * The parser tracks only ONE ``current`` tag.  A nested whitelisted start
    tag *replaces* the outer one (text and bbox reset), so
    ``<ul><li>x</li></ul>`` emits only the ``li`` element and the outer
    ``</ul>`` is a no-op (SURVEY.md §7 hard part (b)).
  * A NON-whitelisted start tag does not reset the current element, so
    ``<p>a<style>x</style>b</p>`` yields text ``"a x b"`` — the style text
    leaks into the open paragraph exactly as in the reference.
  * ``data-bbox`` must be exactly 4 whitespace-separated ints, else None.
  * Inner text chunks are joined with single spaces, whitespace-collapsed,
    and empty-text elements are dropped.
  * Self-closing ``<img .../>`` therefore produces NO element in the strict
    reference parse (empty text).  For media interleaving the engine needs
    those figures, so ``parse_qwenvl_html(..., keep_empty_media=True)``
    additionally emits empty-text ``figure``-type elements (img/figure).
    This is an engine extension, clearly flagged, used only by the span
    assembly path; the default matches the reference byte-for-byte.
  * If no element was produced and the input is non-blank: strip all tags,
    collapse whitespace, and emit one ``paragraph`` element (plain-text
    fallback, qwen_runner.py:283-291).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html.parser import HTMLParser

from .text import strip_tags_to_plain_text

# Tag -> element_type map, qwen_runner.py:203-222.
TAG_TO_TYPE: dict[str, str] = {
    "h1": "heading",
    "h2": "heading",
    "h3": "heading",
    "h4": "heading",
    "h5": "heading",
    "h6": "heading",
    "p": "paragraph",
    "table": "table",
    "tr": "table_row",
    "td": "table_cell",
    "th": "table_cell",
    "ul": "list",
    "ol": "list",
    "li": "list_item",
    "img": "figure",
    "figure": "figure",
    "div": "block",
    "span": "text",
}

MEDIA_TAGS = frozenset({"img", "figure"})

_WS_RE = re.compile(r"\s+")


@dataclass(slots=True)
class ParsedElement:
    """One extracted element: mirrors the reference's HtmlElement."""

    tag: str
    text: str
    bbox: tuple[int, int, int, int] | None
    element_type: str


def _parse_bbox(value: str | None) -> tuple[int, int, int, int] | None:
    if not value:
        return None
    parts = value.split()
    if len(parts) != 4:
        return None
    try:
        return (int(parts[0]), int(parts[1]), int(parts[2]), int(parts[3]))
    except ValueError:
        return None


class _QwenHtmlParser(HTMLParser):
    """Single-open-element stream parser (reference quirk set)."""

    def __init__(self, keep_empty_media: bool) -> None:
        super().__init__()
        self.keep_empty_media = keep_empty_media
        self.out: list[ParsedElement] = []
        self._tag: str | None = None
        self._bbox: tuple[int, int, int, int] | None = None
        self._chunks: list[str] = []

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag not in TAG_TO_TYPE:
            return
        self._tag = tag
        self._chunks = []
        self._bbox = None
        for name, value in attrs:
            if name == "data-bbox" and value:
                parsed = _parse_bbox(value)
                if parsed is not None:
                    self._bbox = parsed

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag != self._tag or self._tag not in TAG_TO_TYPE:
            return
        text = _WS_RE.sub(" ", " ".join(self._chunks).strip())
        if text:
            self.out.append(
                ParsedElement(self._tag, text, self._bbox, TAG_TO_TYPE[self._tag])
            )
        elif self.keep_empty_media and self._tag in MEDIA_TAGS:
            # Engine extension: keep empty figures so the assembly stage can
            # emit media_ref spans for <img/>-style elements.
            self.out.append(
                ParsedElement(self._tag, "", self._bbox, TAG_TO_TYPE[self._tag])
            )
        self._tag = None
        self._bbox = None
        self._chunks = []

    def handle_data(self, data):
        if self._tag:
            self._chunks.append(data)


# ---------------------------------------------------------------------------
# Fast path: flat, well-formed VLM output (the overwhelmingly common shape)
# parsed with one compiled regex (~8x cheaper than HTMLParser).  The grammar
# is deliberately narrow — anything outside it (nesting, entities, unquoted
# attrs, stray text between elements, comments, uppercase tags) falls back
# to the quirk-exact stream parser, so semantics are IDENTICAL by
# construction for every accepted input (property-tested).
# generic flat element: whitelisted tags emit; any other lowercase tag in
# the same flat shape (e.g. <style>...</style> boilerplate) is consumed and
# dropped — exactly what the stream parser does when no element is open
_FLAT_ELEMENT_RE = re.compile(
    r"<([a-z][a-z0-9]*)"
    r"((?:\s+[a-z_:][-\w:.]*\s*=\s*\"[^\"<>&]*\")*)\s*"
    r"(?:/>|>([^<>&]*)</\1\s*>)"
)
# Left-anchored on whitespace/start so attribute names that merely END in
# "data-bbox" (e.g. xdata-bbox) never match — the stream parser compares
# the attr name with == and would yield bbox None / the other attr's value.
_ATTR_BBOX_RE = re.compile(r'(?:^|\s)data-bbox\s*=\s*"([^"]*)"', re.IGNORECASE)


def _fast_parse(
    html_text: str, keep_empty_media: bool
) -> list[ParsedElement] | None:
    """Single-pass regex parse; None when the payload leaves the grammar."""
    if "&" in html_text:
        return None  # charrefs need the real parser
    out: list[ParsedElement] = []
    pos = 0
    n = len(html_text)
    while pos < n:
        while pos < n and html_text[pos].isspace():
            pos += 1
        if pos >= n:
            break
        m = _FLAT_ELEMENT_RE.match(html_text, pos)
        if m is None:
            return None
        tag, attrs, inner = m.group(1), m.group(2) or "", m.group(3)
        if tag not in TAG_TO_TYPE:
            pos = m.end()  # flat boilerplate (style/script/...) -> dropped
            continue
        bbox = None
        for value in _ATTR_BBOX_RE.findall(attrs):
            if value:
                parsed = _parse_bbox(value)
                if parsed is not None:
                    bbox = parsed  # last valid wins (reference loop has no break)
        text = _WS_RE.sub(" ", (inner or "").strip())
        if text:
            out.append(ParsedElement(tag, text, bbox, TAG_TO_TYPE[tag]))
        elif keep_empty_media and tag in MEDIA_TAGS:
            out.append(ParsedElement(tag, "", bbox, TAG_TO_TYPE[tag]))
        pos = m.end()
    return out


def parse_qwenvl_html(
    html_text: str, *, keep_empty_media: bool = False
) -> list[ParsedElement]:
    """Parse QwenVL HTML into ordered elements (reference parity by default)."""
    elements = _fast_parse(html_text, keep_empty_media)
    if elements is None:
        parser = _QwenHtmlParser(keep_empty_media)
        try:
            parser.feed(html_text)
        except Exception:
            pass
        elements = parser.out
    has_nonmedia = any(e.text for e in elements) or (
        elements and not keep_empty_media
    )
    if not elements and html_text.strip():
        plain = strip_tags_to_plain_text(html_text)
        if plain:
            elements.append(ParsedElement("p", plain, None, "paragraph"))
    elif keep_empty_media and not has_nonmedia:
        # Reference fallback triggers when its strict parse finds nothing;
        # with only empty-media elements kept, mirror it for the text side.
        plain = strip_tags_to_plain_text(html_text)
        if plain:
            elements.append(ParsedElement("p", plain, None, "paragraph"))
    return elements
