"""Deterministic synthesis of the north-rule input table.

``BASELINE.json input_hint`` pins the engine's input shape:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

The driver's ``/root/testdata/sf*/documents.parquet`` is a *flat* text table
(doc_id bigint, text, lang, source, n_chars) — so we derive the span table
from it deterministically (pure function of (doc_id, text), no RNG state, no
clock), exactly reproducible in plain Python for the pytest oracle and in
Spark via ``mapInPandas`` for scale.

Per FIXTURES.md §1 the corpus includes:
(a) HTML spans with nav/footer/link-list boilerplate around real content,
(b) interleaved text + media (img refs between paragraphs),
(c) heavy tail: mega-docs with ~100× median span count (skew exercise),
(d) empty-span docs,
(e) duplicate offsets across kinds (merge tie-break exercise).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), True),
    ]
)

MEGA_MOD = 97  # doc_id % 97 == 13 → mega-doc
EMPTY_MOD = 131  # doc_id % 131 == 7 → empty-span doc
DUP_OFFSET_MOD = 7  # doc_id % 7 == 0 → duplicate offset across kinds


def _chunks(words: list[str], size: int) -> list[str]:
    return [" ".join(words[i : i + size]) for i in range(0, len(words), size)] or [""]


def _sentence(words: list[str], seed: int, length: int) -> str:
    n = len(words)
    if n == 0:
        return "lorem ipsum"
    return " ".join(words[(seed * 7 + k * 13) % n] for k in range(length))


def make_spans(doc_id: int, text: str) -> list[dict]:
    """Pure function (doc_id, base text) → north-rule span list."""
    if doc_id % EMPTY_MOD == 7:
        return []

    words = text.split()
    paras = _chunks(words, 24)
    mega = doc_id % MEGA_MOD == 13
    reps = 100 if mega else 1

    spans: list[dict] = []
    off = 0

    def add(kind: str, txt: str, ref: str, offset: int) -> None:
        spans.append({"kind": kind, "text": txt, "media_ref": ref, "offset": offset})

    # --- span 1: HTML page with chrome boilerplate around content ---
    nav = (
        "<nav><ul>"
        + "".join(f'<li><a href="/s{doc_id % 5}/{k}">section {k}</a></li>' for k in range(5))
        + "</ul></nav>"
    )
    footer = (
        '<footer><p><a href="/terms">terms</a> <a href="/privacy">privacy</a> '
        f"copyright {2000 + doc_id % 25}</p></footer>"
    )
    linkfarm = (
        "<div><p>"
        + " ".join(f'<a href="/tag/{k}">tag{(doc_id + k) % 50}</a>' for k in range(8))
        + "</p></div>"
    )
    body_parts = [nav, f"<h1>{_sentence(words, doc_id, 4)}</h1>"]
    for r in range(reps):
        for pi, para in enumerate(paras):
            body_parts.append(f"<p>{para} tail{(doc_id + r + pi) % 9}.</p>")
            if pi % 3 == 1:
                body_parts.append(f'<img src="s3://corpus/{doc_id}/p{r}_{pi}.jpg">')
        if r == 0:
            body_parts.append(linkfarm)
    body_parts.append(footer)
    add("html", "<html><body>" + "".join(body_parts) + "</body></html>", "", off)
    off += 10

    # --- span 2: plain text ---
    add("text", f"  {_sentence(words, doc_id + 1, 12)}  \n {_sentence(words, doc_id + 2, 9)} ", "", off)
    off += 10

    # --- span 3: standalone media (interleaved) ---
    add("image", "", f"s3://corpus/{doc_id}/figure_main.png", off)
    if doc_id % DUP_OFFSET_MOD == 0:
        # duplicate offset across kinds: tie-break exercise
        add("text", _sentence(words, doc_id + 3, 7), "", off)
    off += 10

    # --- span 4: pdf layout payload ---
    lines = []
    y = 10.0
    for li in range(6 if not mega else 60):
        gap = 30.0 if li % 3 == 0 and li else 12.0  # every 3rd line: region break
        y += gap
        lines.append(f"50,{y:.1f},550,{y + 10.0:.1f}\t{_sentence(words, doc_id + li, 6)}")
    add("pdf", "\n".join(lines), "", off)
    off += 10

    # --- span 5: trailing audio media ---
    if doc_id % 3 == 0:
        add("audio", "", f"s3://corpus/{doc_id}/clip.flac", off)
    return spans


def make_documents_pdf(flat: pd.DataFrame, replicate: int = 1) -> pd.DataFrame:
    """Flat (doc_id:int64, text) pandas frame → span-table pandas frame.

    ``replicate`` > 1 scales the corpus: replica r of base doc d becomes
    doc_id ``d*replicate + r`` (string form ``doc_{id:010d}`` keeps sorts
    lexicographic == numeric).
    """
    rows = []
    for base_id, text in zip(flat["doc_id"].astype("int64"), flat["text"].astype(str)):
        for r in range(replicate):
            did = int(base_id) * replicate + r
            rows.append((f"doc_{did:010d}", make_spans(did, text)))
    return pd.DataFrame(rows, columns=["doc_id", "spans"])


def synthesize_documents(
    spark: SparkSession,
    sf_dir: str,
    replicate: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed synthesis: read the flat table, expand via mapInPandas.

    The expansion runs inside executors (Arrow batches), so a 100 TB corpus
    would be synthesized/scanned in parallel — no driver materialization.
    """
    flat = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    if partitions:
        flat = flat.repartition(partitions, "doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield make_documents_pdf(pdf, replicate=replicate)

    return flat.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)


MEDIA_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def media_geometry(doc_id: int) -> tuple[int, int]:
    """THE payload geometry rule — one definition shared by the base
    payload and the re-encoded variants (a drifted copy would silently
    degrade the planted cross-container exact dups to unrelated images and
    break the media_phash_dedup golden confusingly). The oracle SQL at
    queries_catalog._MEDIA geometry restates it; change both together."""
    return 4 + doc_id % 29, 3 + doc_id % 17


def media_payload_row(
    doc_id: int, source: str, lossless_only: bool = False
) -> tuple[str, str, str, bytes]:
    """Pure-Python rule for one synthetic media payload: REAL bytes in a
    real format (BMP / PPM / animated GIF / P6 frame stream / PNG /
    baseline JPEG — encoders in kernel/imagecodec.py + kernel/jpegcodec.py),
    geometry a pure function of doc_id so the driver's DuckDB oracle can
    restate it:

        width    = 4 + doc_id % 29
        height   = 3 + doc_id % 17
        kind     = video if doc_id % 3 == 0 else image
        n_frames = 1 + doc_id % 6 for video, 1 for image

    Format varies (images: real zlib-compressed PNG when doc_id % 5 < 2,
    real entropy-coded baseline JPEG when doc_id % 5 == 4, else BMP for
    even ids / single-frame PPM for odd; videos: GIF when doc_id % 6 == 0,
    concatenated-P6 stream otherwise) so every parser — including the PNG
    chunk+inflate path and the JPEG Huffman+IDCT path — is exercised by
    the driver check, while the geometry formula stays uniform across
    formats.

    ``lossless_only=True`` keeps the pre-JPEG rotation (doc_id % 5 == 4 →
    BMP/PPM by parity): the perceptual-dedup variant corpus
    (``media_variant_rows``) plants cross-container EXACT dups by
    re-encoding the same pixels, which lossy JPEG cannot provide.
    """
    from .kernel import imagecodec as C

    width, height = media_geometry(doc_id)
    if doc_id % 3 == 0:
        n_frames = 1 + doc_id % 6
        if doc_id % 6 == 0:
            ext, payload = "gif", C.encode_gif(width, height, n_frames)
        else:
            ext, payload = "ppms", C.encode_ppm_stream(width, height, n_frames)
        kind = "video"
    else:
        if doc_id % 5 < 2:
            ext, payload = "png", C.encode_png(width, height)
        elif doc_id % 5 == 4 and not lossless_only:
            from .kernel.jpegcodec import encode_jpeg

            ext, payload = "jpg", encode_jpeg(width, height)
        elif doc_id % 2 == 0:
            ext, payload = "bmp", C.encode_bmp(width, height)
        else:
            ext, payload = "ppm", C.encode_ppm(width, height)
        kind = "image"
    ref = f"media://{source}/{doc_id}.{ext}"
    return str(doc_id), ref, kind, payload


def synthesize_media_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → (doc_id, media_ref, kind, payload) with REAL
    encoded bytes (narrow mapInPandas, no shuffle). Feeds the strict
    real-decode driver query ``media_payload_decode``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                media_payload_row(int(d), str(s))
                for d, s in zip(pdf["doc_id"], pdf["source"])
            ]
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_ref", "kind", "payload"]
            )

    flat = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "source")
    return flat.mapInPandas(gen, schema=MEDIA_PAYLOAD_SCHEMA)


def perturbed_pixel(width: int, height: int):
    """Pixel function for a *lightly retouched* re-encode: the shared
    texture (kernel/imagecodec.pattern_rgb) with the top-left sample
    block shifted by +128 per channel. The block covers exactly the
    dHash grid's (0, 0) cell-centre sample, so the perceptual distance
    of the retouch is tiny (Hamming ≤ ~3) — the planted NEAR-duplicate
    for phash dedup, analogous to a thumbnail/recompress copy."""
    from .kernel.imagecodec import pattern_rgb

    bw, bh = max(1, width // 9), max(1, height // 8)

    def px(x: int, y: int) -> tuple[int, int, int]:
        r, g, b = pattern_rgb(x, y)
        if x < bw and y < bh:
            return ((r + 128) % 256, (g + 128) % 256, (b + 128) % 256)
        return (r, g, b)

    return px


def media_variant_rows(doc_id: int, source: str) -> list[tuple[str, str, str, bytes]]:
    """IMAGE payload plus planted perceptual-duplicate variants — the
    corpus shape the reference annotator actually produces (it re-encodes
    every image: base64 + resize loop, reference annotators/base.py:77-163),
    where byte-level dedup is blind:

    - base row: ``media_payload_row`` (images only; caller filters
      doc_id % 3 != 0),
    - ``doc_id % 7 < 3``: cross-container re-encode of the SAME pixels
      (PNG base → BMP, BMP base → PNG, PPM base → PNG; all encoders share
      ``pattern_rgb``, so the images are pixel-identical while the bytes
      are entirely different) → planted EXACT perceptual dup,
    - ``doc_id % 11 < 2``: perturbed PNG re-encode (``perturbed_pixel``)
      → planted NEAR dup (small positive Hamming distance, or 0 when the
      retouch doesn't flip any grid comparison — the golden replay is the
      arbiter, not this comment),
    - ``doc_id % 13 < 2``: quality-90 baseline-JPEG recompress of the SAME
      image (kernel/jpegcodec.py) — the classic recompression copy a byte
      digest can never catch; at these geometries the DCT round-trip
      keeps dHash within Hamming 3 (measured over every geometry in the
      rotation: max 3, most exactly 0), so it lands as an exact-or-near
      perceptual dup. The golden replay arbitrates each row.
    """
    from .kernel import imagecodec as C

    if doc_id % 3 == 0:
        raise ValueError("media variants are defined for image docs only")
    # lossless_only: exact-dup planting re-encodes the SAME pixels in a
    # different container — only the bit-exact encoders can do that
    base_id, ref, kind, payload = media_payload_row(doc_id, source, lossless_only=True)
    width, height = media_geometry(doc_id)
    rows = [(base_id, ref, kind, payload)]
    if doc_id % 7 < 3:
        if doc_id % 5 < 2:  # PNG base → BMP re-encode
            ext2, p2 = "bmp", C.encode_bmp(width, height)
        else:  # BMP/PPM base → PNG re-encode
            ext2, p2 = "png", C.encode_png(width, height)
        rows.append((base_id, f"media://{source}/{doc_id}x.{ext2}", kind, p2))
    if doc_id % 11 < 2:
        p3 = C.encode_png(width, height, perturbed_pixel(width, height))
        rows.append((base_id, f"media://{source}/{doc_id}p.png", kind, p3))
    if doc_id % 13 < 2:
        from .kernel.jpegcodec import encode_jpeg

        p4 = encode_jpeg(width, height, quality=90)
        rows.append((base_id, f"media://{source}/{doc_id}j.jpg", kind, p4))
    return rows


def synthesize_media_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet (image docs only) → (doc_id, media_ref, kind,
    payload) with planted cross-container exact dups and retouched near
    dups (``media_variant_rows``). Narrow mapInPandas, no shuffle; the
    image-only predicate is JVM-side so it reaches the parquet scan."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                row
                for d, s in zip(pdf["doc_id"], pdf["source"])
                for row in media_variant_rows(int(d), str(s))
            ]
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_ref", "kind", "payload"]
            )

    flat = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") % 3 != 0)
        .select("doc_id", "source")
    )
    return flat.mapInPandas(gen, schema=MEDIA_PAYLOAD_SCHEMA)
