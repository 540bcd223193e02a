"""Stack-based HTML DOM tokenizer + boilerplate classifier.

Replaces the reference's LLM call (the "extract the main content" task) with
a deterministic kernel:

1. ``tokenize_html`` — single pass, char-level state machine. Maintains an
   open-tag stack; flushes a text block at block-level tag boundaries; tracks
   link characters (inside ``<a>``), skips ``script/style/noscript/template``
   subtrees entirely, and records whether a block sits under a chrome
   ancestor (``nav/header/footer/aside``). ``<img src=...>`` flushes the
   current block and emits a media item so in-content images keep their
   interleaving position.

2. ``classify_blocks`` — Boilerpipe/Readability-style scoring:
   - strong content: >= STRONG_WORDS words, link_density <= MAX_LINK_DENSITY,
     not under chrome;
   - weak blocks (>= WEAK_WORDS words, same density/chrome constraints)
     are promoted iff adjacent (previous or next text block) to strong
     content — the classic "short paragraph between two long ones" rule;
   - everything else (nav lists, footers, high link-density blocks) drops.
   - media items survive iff the nearest surrounding text block is content.

All rules are deterministic; no randomness, no wall clock.
"""

from __future__ import annotations

import re

# Tags whose open/close flushes the current text block.
BLOCK_TAGS = frozenset(
    """p div li h1 h2 h3 h4 h5 h6 td th tr table ul ol dl dt dd section
    article header footer nav aside blockquote pre main figure figcaption
    form fieldset hr br title option select textarea""".split()
)
# Subtrees dropped wholesale.
SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "svg"})
# Ancestors that mark page chrome (boilerplate context).
CHROME_TAGS = frozenset({"nav", "header", "footer", "aside"})
# Void elements — never pushed on the stack.
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

STRONG_WORDS = 10
WEAK_WORDS = 3
MAX_LINK_DENSITY = 0.33

_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}


def _decode_entities(s: str) -> str:
    if "&" not in s:
        return s
    for k, v in _ENTITIES.items():
        s = s.replace(k, v)
    return s


def _norm_ws(s: str) -> str:
    return " ".join(s.split())


_TAG_RE = re.compile(r"<([^>]*)>")
_NAME_RE = re.compile(r"[a-zA-Z0-9_-]*")

# Parsed-tag memo: tag bodies repeat massively in real markup (every </p>,
# </a>, bare <li>, ... is the identical string), and parsing is a pure
# function of the segment — memoizing is semantics-free. False = segment
# yields no tag (comment/doctype/empty name). Long segments (unique
# attribute-carrying tags like <a href="...">) are parsed but not stored,
# so the cache holds the high-frequency short tags and never thrashes.
_TAG_CACHE: dict[str, tuple | bool] = {}
_TAG_CACHE_MAX = 1 << 16
_TAG_CACHE_MAX_SEG = 64


def _tag_cache_put(seg: str, parsed: tuple | bool) -> None:
    if len(seg) <= _TAG_CACHE_MAX_SEG and len(_TAG_CACHE) < _TAG_CACHE_MAX:
        _TAG_CACHE[seg] = parsed

# One dict lookup per tag instead of four frozenset probes.
_F_SKIP, _F_BLOCK, _F_CHROME, _F_VOID = 1, 2, 4, 8
_TAG_FLAGS: dict[str, int] = {}
for _t in SKIP_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_SKIP
for _t in BLOCK_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_BLOCK
for _t in CHROME_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_CHROME
for _t in VOID_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_VOID


def tokenize_html(html: str) -> list[tuple]:
    """Tokenize into an ordered item list.

    Returns items in document order:
      ``("text", text, link_density, chrome: bool)`` — normalized block text
      ``("media", src)``                             — embedded image ref

    One ``re.split`` pass builds the alternating text/tag segment list at
    C speed (no per-tag Match objects); the Python loop touches only the
    segments, with tag-class flags resolved by a single dict lookup. Blocks
    flush lazily (no allocation for the back-to-back block tags that
    dominate real markup).
    """
    # Block state inlined into locals (texts/chars/link_chars/block_chrome):
    # the flush/add_text closures were ~28% of tokenize time as function
    # calls at ~40 calls/doc — semantics identical (pinned by the
    # extraction goldens and wide≡narrow tests).
    items: list[tuple] = []
    skip_depth = 0
    a_depth = 0
    chrome_depth = 0
    texts: list[str] = []
    chars = 0
    link_chars = 0
    block_chrome = False

    # parts[0::2] = text between tags, parts[1::2] = tag bodies (sans <>)
    parts = _TAG_RE.split(html)
    last = len(parts) - 1
    flags_get = _TAG_FLAGS.get
    cache_get = _TAG_CACHE.get
    for i, seg in enumerate(parts):
        if not i & 1:
            if seg and not skip_depth:
                if i == last:
                    # unterminated trailing '<...': text before it handled
                    # normally, the rest (sans '<') appended raw — matches
                    # the char-scanner semantics
                    j = seg.find("<")
                    if j >= 0:
                        head = seg[:j]
                        stripped = head.strip()
                        if stripped:
                            texts.append(head)
                            chars += len(stripped)
                            if a_depth:
                                link_chars += len(stripped)
                        t = seg[j + 1 :]
                        # the dropped '<' still separates head from tail
                        # under the separator-free join
                        texts.append(" ")
                        texts.append(t)
                        chars += len(t)
                        if a_depth:
                            link_chars += len(t)
                        continue
                stripped = seg.strip()
                if stripped:
                    texts.append(seg)
                    chars += len(stripped)
                    if a_depth:
                        link_chars += len(stripped)
                elif texts:
                    # whitespace-only inter-tag gap: keep ONE space marker
                    # so '<b>a</b> <b>b</b>' stays 'a b' under the
                    # separator-free join below (contributes no chars)
                    texts.append(" ")
            continue

        parsed = cache_get(seg)
        if parsed is None:
            raw = seg.strip()
            if not raw or raw[0] == "!":  # comment/doctype
                _tag_cache_put(seg, False)
                continue
            closing = raw[0] == "/"
            body = raw[1:] if closing else raw
            name = _NAME_RE.match(body).group().lower()
            if not name:
                _tag_cache_put(seg, False)
                continue
            flags = flags_get(name, 0)
            self_closing = bool(raw[-1] == "/" or flags & _F_VOID)
            parsed = (closing, name, body, flags, self_closing)
            _tag_cache_put(seg, parsed)
        elif parsed is False:
            continue
        closing, name, body, flags, self_closing = parsed

        if flags & _F_SKIP:
            if closing:
                if skip_depth:
                    skip_depth -= 1
            elif not self_closing:
                skip_depth += 1
            continue
        if skip_depth:
            continue

        is_img = name == "img" and not closing
        if is_img or flags & _F_BLOCK:
            # flush current block (img also flushes, then emits media)
            if texts:
                text = _norm_ws(_decode_entities("".join(texts)))
                # separator-free join: INLINE tag boundaries (<b>, <a>,
                # <span>) must not split words — 'wor</b>ld' is 'world'.
                # Source whitespace rides along in the raw segments (plus
                # the explicit markers for whitespace-only gaps) and
                # _norm_ws collapses it.
                if text:
                    items.append(
                        ("text", text, link_chars / chars if chars else 0.0,
                         block_chrome)
                    )
                texts = []
                chars = 0
                link_chars = 0
                block_chrome = chrome_depth > 0
            if is_img:
                src = _extract_attr(body, "src")
                if src:
                    items.append(("media", src))
                continue
        if name == "a":
            if closing:
                a_depth = max(0, a_depth - 1)
            elif not self_closing:
                a_depth += 1
        if flags & _F_CHROME:
            if closing:
                chrome_depth = max(0, chrome_depth - 1)
                block_chrome = chrome_depth > 0
            elif not self_closing:
                chrome_depth += 1
                block_chrome = True

    if texts:
        text = _norm_ws(_decode_entities("".join(texts)))
        if text:
            items.append(
                ("text", text, link_chars / chars if chars else 0.0, block_chrome)
            )
    return items


def _extract_attr(tag_body: str, attr: str) -> str:
    """Value of ``attr`` in a tag body, by a sequential quote-aware
    attribute scan. A substring search would match 'src=' inside
    ``data-src=`` (lazy-load markup would emit the placeholder instead of
    the real URL) or inside another attribute's quoted value
    (``alt="see src=foo"``) — both reproduce with real crawl markup."""
    n = len(tag_body)
    target = attr.lower()
    i = 0
    while i < n and not tag_body[i].isspace():
        i += 1  # skip the tag name
    while i < n:
        while i < n and tag_body[i].isspace():
            i += 1
        j = i
        while j < n and tag_body[j] != "=" and not tag_body[j].isspace():
            j += 1
        name = tag_body[i:j].lower()
        k = j
        while k < n and tag_body[k].isspace():
            k += 1
        if k >= n or tag_body[k] != "=":
            if name == target:
                return ""  # bare attribute: present, no value
            i = max(k, i + 1)  # always advance
            continue
        k += 1
        while k < n and tag_body[k].isspace():
            k += 1
        if k < n and tag_body[k] in ("'", '"'):
            q = tag_body[k]
            end = tag_body.find(q, k + 1)
            val = tag_body[k + 1 : end] if end > 0 else tag_body[k + 1 :]
            i = end + 1 if end > 0 else n
        else:
            end = k
            while end < n and not tag_body[end].isspace():
                end += 1
            val = tag_body[k:end]
            i = end
        if name == target:
            return val
    return ""


def classify_blocks(
    items: list[tuple],
    strong_words: int = STRONG_WORDS,
    weak_words: int = WEAK_WORDS,
    max_link_density: float = MAX_LINK_DENSITY,
) -> list[tuple]:
    """Keep content blocks + their media; drop boilerplate.

    Returns ordered kept items as ``("text", text)`` / ``("media", src)``.
    Thresholds are parameters so ensemble legs can run kernel VARIANTS
    (stricter/looser boilerplate cuts) over the same tokenization.
    """
    text_idx = [k for k, it in enumerate(items) if it[0] == "text"]
    n_text = len(text_idx)
    strong = [False] * n_text
    eligible = [False] * n_text
    for t, k in enumerate(text_idx):
        _, text, density, chrome = items[k]
        words = len(text.split())
        if chrome or density > max_link_density:
            continue
        eligible[t] = words >= weak_words
        strong[t] = words >= strong_words
    keep_text = list(strong)
    for t in range(n_text):
        if eligible[t] and not strong[t]:
            prev_strong = t > 0 and strong[t - 1]
            next_strong = t + 1 < n_text and strong[t + 1]
            keep_text[t] = prev_strong or next_strong

    kept_by_item = {}
    for t, k in enumerate(text_idx):
        kept_by_item[k] = keep_text[t]

    # one pass each way: nearest kept-text flag on either side of every item
    # (media-dense runs would make a per-media backward scan O(n²))
    n_items = len(items)
    prev_keep = [False] * n_items
    running = False
    for k in range(n_items):
        prev_keep[k] = running
        if items[k][0] == "text":
            running = kept_by_item[k]
    next_keep = [False] * n_items
    running = False
    for k in range(n_items - 1, -1, -1):
        next_keep[k] = running
        if items[k][0] == "text":
            running = kept_by_item[k]

    out: list[tuple] = []
    for k, it in enumerate(items):
        if it[0] == "text":
            if kept_by_item[k]:
                out.append(("text", it[1]))
        elif prev_keep[k] or next_keep[k]:
            # media: keep iff nearest surrounding text block is content
            out.append(("media", it[1]))
    return out


def extract_html_items(
    html: str,
    strong_words: int = STRONG_WORDS,
    weak_words: int = WEAK_WORDS,
    max_link_density: float = MAX_LINK_DENSITY,
) -> list[tuple]:
    """tokenize + classify in one call: ordered kept (kind, payload) items."""
    return classify_blocks(
        tokenize_html(html), strong_words, weak_words, max_link_density
    )
