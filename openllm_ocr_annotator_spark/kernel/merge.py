"""Stable span merge: per-document extraction + interleaving-order rebuild.

The reference's only ordered emission is the per-doc sorted scan + span-ordered
TSV sink (reference: src/openllm_ocr_annotator/utils/file_utils.py:66,
utils/formatter.py:111-114). Our per-row invariant (BASELINE.json) is
span-sequence equality ``(kind, text, media_ref, order)``, so:

- input spans are processed in a pinned total order
  ``(offset, kind, media_ref, text)`` — offset first (the interleaving key),
  the rest as deterministic tie-breaks for duplicate offsets;
- each input span expands to 0..n output items depending on kind;
- output ``offset`` is the item's rank in the final per-document sequence
  (0-based), which makes order explicit and stable under any partitioning.
"""

from __future__ import annotations

from .html import extract_html_items
from .layout import segment_layout

TEXT_KIND = "text"
MEDIA_KINDS = frozenset({"image", "audio", "video", "media"})


def _norm_ws(s: str) -> str:
    return " ".join(s.split())


def extract_span(
    kind: str, text: str, media_ref: str, params: dict | None = None
) -> list[tuple[str, str, str]]:
    """One input span → ordered (kind, text, media_ref) output items.

    ``params``: optional kernel-variant thresholds for ensemble legs
    (keys: strong_words, weak_words, max_link_density). None = defaults.
    ``_test.fault_marker`` (params key): fault-injection hook — raises when
    the marker substring appears in the span text. Exists so the
    poison-pill isolation path (extract_spans(on_error="skip")) is
    TESTABLE: the kernels are deliberately total functions (property-pinned
    never-crash), so a real failure needs to be injected to exercise the
    guard. The ``_test.`` namespace keeps ordinary caller config (e.g. an
    ensemble leg's params dict) from ever triggering it by key collision.
    """
    if params and "_test.fault_marker" in params:
        m = params["_test.fault_marker"]
        if m and text and m in text:
            raise RuntimeError(f"fault injection: marker {m!r} in span text")
        params = {k: v for k, v in params.items() if k != "_test.fault_marker"}
    k = (kind or "").lower()
    if k == "html":
        out = []
        for item in extract_html_items(text or "", **(params or {})):
            if item[0] == "text":
                out.append((TEXT_KIND, item[1], ""))
            else:
                out.append(("image", "", item[1]))
        return out
    if k == "pdf":
        return [(TEXT_KIND, region, "") for region in segment_layout(text or "")]
    if k in MEDIA_KINDS:
        if media_ref:
            return [(k, "", media_ref)]
        return []
    # plain text (and unknown text-like kinds): normalize, keep if non-empty
    t = _norm_ws(text or "")
    return [(TEXT_KIND, t, "")] if t else []


def extract_document(spans: list[dict]) -> list[dict]:
    """Full per-document kernel; also the pytest oracle.

    ``spans``: list of {kind, text, media_ref, offset}. Returns ordered
    output spans with final ``offset`` = sequence rank.
    """
    ordered = sorted(
        spans,
        key=lambda s: (
            s.get("offset") or 0,
            s.get("kind") or "",
            s.get("media_ref") or "",
            s.get("text") or "",
        ),
    )
    out: list[dict] = []
    for s in ordered:
        for kind, text, ref in extract_span(
            s.get("kind") or "", s.get("text") or "", s.get("media_ref") or ""
        ):
            out.append({"kind": kind, "text": text, "media_ref": ref, "offset": len(out)})
    return out
