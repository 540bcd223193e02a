"""Pure-Python extraction kernel.

This is the deterministic replacement for the reference's per-image LLM
``annotate`` map (reference: src/openllm_ocr_annotator/annotators/base.py:73-75,
pipeline/curator_processor.py:138-168): instead of prompting a vision model,
we tokenize HTML with a stack-based DOM scanner, score blocks with
text-density/link-density boilerplate heuristics (Boilerpipe/Readability
style), segment PDF layout blocks into regions, and stable-merge everything
back into the document's interleaving order.

The kernel is plain Python over str/bytes — it is invoked once per Arrow
batch from ``operators.extract`` (loop over documents *inside* the batch),
which keeps the Spark boundary vectorized ("no per-row Python" at the plan
level) while the per-document parser remains an ordinary state machine.
The same functions double as the pytest oracle.
"""

from .html import extract_html_items, tokenize_html
from .layout import segment_layout
from .merge import extract_document

__all__ = [
    "tokenize_html",
    "extract_html_items",
    "segment_layout",
    "extract_document",
]
