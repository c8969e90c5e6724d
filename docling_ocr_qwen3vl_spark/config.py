"""Engine configuration — the Spark analog of the reference's option classes.

The reference configures six Pydantic option classes keyed by ``kind``
(options.py:75-511: qwen3vl_ocr / qwen3vl / qwen3vl_table / qwen3vl_layout /
qwen3vl_classifier / qwen3vl_code_formula), each carrying model/device/
sampling knobs plus per-stage enables.  On Spark the model knobs collapse
into the decoder backend (broadcast as plain config to executors) and the
per-stage enables become cheap plan predicates (an disabled stage is simply
not added to the plan — Catalyst never sees it).

Prompt resolution (prompts.py:49-55): per-mode default with override-dict
lookup — kept verbatim so a production Qwen decoder receives identical
prompts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# prompts.py:27-46 — default prompt per mode (the QWENVL_HTML user prompt is
# the short trigger string; its system prompt lives with the GPU decoder)
PROMPT_MODES = ("ocr", "markdown", "structured", "qwenvl_html")
DEFAULT_PROMPTS: dict[str, str] = {
    "ocr": (
        "Extract all text from this image. "
        "Return only the text content, preserving the reading order. "
        "Separate paragraphs with blank lines."
    ),
    "markdown": (
        "Convert this document image to markdown format. "
        "Preserve headings, lists, tables, and formatting. "
        "Use appropriate markdown syntax for structure."
    ),
    "structured": (
        "Extract all text from this document with layout awareness. "
        "Identify and label headings, paragraphs, tables, and lists. "
        "Preserve the document structure and reading order. "
        "Separate distinct sections with blank lines."
    ),
    "qwenvl_html": "QwenVL HTML",
}


def resolve_prompt(mode: str, overrides: dict[str, str] | None = None) -> str:
    """Override-dict lookup with per-mode default (prompts.py:49-55)."""
    if overrides:
        candidate = overrides.get(mode)
        if candidate:
            return candidate
    return DEFAULT_PROMPTS[mode]


@dataclass
class ExtractConfig:
    """Everything the extraction plan needs; broadcastable as plain data."""

    # decode backend: 'deterministic' (sandbox/tests) or 'qwen3vl' (GPU)
    decoder_backend: str = "deterministic"
    prompt_mode: str = "qwenvl_html"
    prompt_overrides: dict[str, str] = field(default_factory=dict)
    # page rasterization scale, clamped >= 1.0 (model.py:48)
    page_scale: float = 2.0
    # per-stage enables (plugins' enabled flags / do_*_enrichment options)
    do_ocr: bool = True
    do_layout: bool = True
    do_tables: bool = True
    do_picture_classes: bool = False
    do_code_formula: bool = False
    # scale knobs
    num_partitions: int | None = None  # None -> defaultParallelism * 2
    n_checkpoint_groups: int = 64

    def __post_init__(self) -> None:
        self.page_scale = max(1.0, self.page_scale)
        if self.prompt_mode not in PROMPT_MODES:
            raise ValueError(f"unknown prompt_mode: {self.prompt_mode}")

    def prompt(self) -> str:
        return resolve_prompt(self.prompt_mode, self.prompt_overrides)
