"""URL canonicalization — the key function under URL-level dedup.

RefinedWeb (Penedo et al. 2023, §3.2) and CCNet-style web pipelines run
URL dedup as the FIRST dedup stage: the same page is fetched many times
across crawls with cosmetic dressing differences (scheme, ``www.``,
default ports, tracking parameters, fragments, trailing slashes), and
collapsing those before content dedup removes the bulk of duplicates at
the cheapest possible point — one string normalization plus one exact
groupBy, no shingling.

``canonical_url`` is a pure JVM expression chain (``regexp_replace`` /
``regexp_extract`` / ``lower``), so it rides whole-stage codegen and
pushes zero work into Python — the property that matters when the column
is canonicalized for 10^12 rows. Normalizations applied, in order:

1. drop the fragment (``#...``),
2. lowercase the scheme and authority (path/query case is preserved —
   paths are case-sensitive on most origins),
3. strip an explicit default port of the URL's OWN scheme (``:80`` on
   http, ``:443`` on https) — scheme-matched and applied BEFORE the
   scheme rewrite, so ``https://host:80`` and ``http://host:443``
   (nonstandard services, i.e. distinct origins) are never merged with
   the default-port form,
4. normalize ``http://`` to ``https://`` (protocol-relative duplicate)
   — but ONLY when the authority carries no explicit port: non-default
   ports name distinct origins per scheme, and rewriting them would
   break idempotence (see below),
5. strip leading ``www.`` labels on either scheme (ALL of them —
   ``www.www.host`` must reach the same fixed point in one pass),
6. remove tracking parameters (``utm_*``, ``fbclid``, ``gclid``) while
   PRESERVING every other query parameter — ``?id=7`` identifies a
   different document, ``?utm_source=rss`` does not,
7. strip the run of trailing slashes at the end of the path (the whole
   run, not one — ``/x//`` must reach ``/x`` in one pass, not via the
   intermediate ``/x/``).

Deliberately NOT applied (they change identity): path ``..``
resolution, percent-decoding, query-parameter reordering — documented
rather than guessed, since each can merge URLs that serve different
content.

``canonical_url`` is IDEMPOTENT — its output is a fixed point
(pytest-pinned, including a fuzz sweep over dressing combinations).
The property matters operationally: incremental ingests re-canonicalize
already-canonical key columns, and a non-fixed-point key would silently
re-split or re-merge dedup groups between passes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING = r"(?:utm_[a-z]+|fbclid|gclid)"


def canonical_url(url: Column) -> Column:
    """Dressed URL → canonical form (see module docstring for the rule
    list). Built-in expressions only — no UDF anywhere."""
    # 1. fragment
    u = F.regexp_replace(url, r"#.*", "")
    # 2. lowercase scheme + authority, preserve the rest
    head = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    u = F.concat(head, F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""))
    # 3. explicit default port OF THE URL'S OWN SCHEME — before the scheme
    #    rewrite, so ``https://host:80`` / ``http://host:443`` (nonstandard
    #    services = distinct origins) are never merged with the defaults
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?#]|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?#]|$)", r"$1$2")
    # 4. scheme normalize — ONLY when no explicit port remains. The
    #    http→https merge is the protocol-relative-duplicate heuristic,
    #    which is safe only on default ports: http://host:8080 and
    #    https://host:8080 are distinct origins, and rewriting
    #    http://host:443 would produce a form the :443-strip rule
    #    re-canonicalizes differently (idempotence break — a key column
    #    canonicalized twice, e.g. across incremental ingests, must be a
    #    fixed point). Authorities containing ':' (port or userinfo) are
    #    conservatively left on their original scheme.
    u = F.regexp_replace(u, r"^http://([^/:?#]*)([/?#]|$)", r"https://$1$2")
    # 5. www strip (either scheme — http survives step 4 with a port).
    #    The FULL run of www. labels: a single strip would make
    #    www.www.host canonicalize differently on a second pass
    u = F.regexp_replace(u, r"^(https?://)(?:www\.)+", r"$1")
    # 6. tracking params, anchored on the [?&] separator so a parameter
    #    merely ENDING in a tracking name (e.g. ``xutm_source``) is never
    #    clipped: first consume runs of tracking params that are followed
    #    by another param (keeping the leading separator), then strip a
    #    trailing tracking param together with its separator
    u = F.regexp_replace(u, r"([?&])(?:" + _TRACKING + r"=[^&#]*&)+", r"$1")
    u = F.regexp_replace(u, r"[?&]" + _TRACKING + r"=[^&#]*$", "")
    # 7. the run of trailing slashes at path end (before query or
    #    end-of-string) — the whole run, for the same fixed-point reason
    u = F.regexp_replace(u, r"/+([?#]|$)", r"$1")
    return u


def host_of(url: Column) -> Column:
    """Lowercased authority host of a URL (userinfo and port stripped —
    neither is part of the host for blocklist purposes). Leaving userinfo
    in place would let ``https://anything@blocked.com/`` slide past a
    suffix blocklist — the classic crawl-data evasion dressing."""
    host = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    host = F.regexp_replace(host, r"^.*@", "")
    return F.regexp_replace(host, r":\d+$", "")


def host_suffixes(host: Column) -> Column:
    """All domain suffixes of a host with >= 2 labels, longest first —
    ``a.b.example.com`` → [a.b.example.com, b.example.com, example.com].
    The standard blocklist semantics (C4 / RefinedWeb badlists): an entry
    blocks the domain AND every subdomain, so membership of ANY suffix
    decides. Single-label hosts yield just themselves.

    Emitting suffixes (a host has at most a handful of labels) turns
    suffix matching into set membership — either a pure `exists`/`isin`
    expression when the blocklist is broadcastable as literals, or an
    equi-join key when it is a table. No prefix-LIKE scans anywhere."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - F.lit(2)),
            lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
        ),
    ).otherwise(F.array(host))
