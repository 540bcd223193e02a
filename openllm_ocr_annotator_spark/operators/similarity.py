"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: JVM-side expression math (zip_with + aggregate,
  whole-stage codegen) — the exactness baseline and the oracle target.
- LSH-bucketed ANN: random-hyperplane signatures (numpy per Arrow batch,
  deterministic seed) → bucket equi-join → exact rerank within buckets.
  Multi-probe via XOR-1 neighbors of the bucket code raises recall without
  widening the join fan-out quadratically.

Scale: brute force is O(Q×N×d) — fine for Q small (a probe set), never for
N×N. The LSH path shuffles on bucket id only; at 10^12 rows bucket width is
tuned via ``num_planes`` (buckets ≈ 2^planes uniformly filled).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._common import spread_partitions


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_col(a, b):
    """Cosine similarity between two array<double> columns (codegen'd)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def _exact_rerank(
    cand: DataFrame, queries: DataFrame, corpus: DataFrame, k: int,
    id_col: str, vec_col: str,
) -> DataFrame:
    """Shared ANN tail: join raw vectors onto a (query_id, neighbor_id)
    candidate relation, exact-cosine score (JVM left-fold), window top-k.
    The candidate relation bounds the join fan-out — this stage never sees
    more rows than the bucketing/probing stage emitted."""
    q = _as_double(queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")), "qv")
    c = _as_double(corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")), "cv")
    scored = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .withColumn("cosine", cosine_col(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self)."""
    q = _as_double(queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")), "qv")
    c = _as_double(corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")), "cv")
    scored = (
        q.crossJoin(F.broadcast(c))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_col(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def hyperplanes(dim: int, num_planes: int, num_tables: int = 1, seed: int = 42) -> np.ndarray:
    """(num_tables, num_planes, dim) — multiple independent hash tables."""
    return np.random.RandomState(seed).normal(size=(num_tables, num_planes, dim))


def lsh_bucket_ids(
    vectors: DataFrame, planes: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
    multi_probe: bool = False,
) -> DataFrame:
    """(vec_id, bucket) rows over L independent tables.

    bucket = (table_idx << num_planes) | sign-bit code; with multi_probe,
    all XOR-1 neighbor codes are also emitted (query-side probing).
    """
    n_tables, n_planes, _ = planes.shape

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # fully vectorized (same np.repeat/np.tile shape as dedup.band_kernel):
        # codes per table via one matmul; multi-probe = XOR broadcast over the
        # plane-bit axis — no per-row Python loop anywhere in the ANN path
        xor_bits = 1 << np.arange(n_planes, dtype=np.int64)  # (planes,)
        for pdf in batches:
            if not len(pdf):  # np.stack([]) raises on empty Arrow batches
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            ids_arr = pdf[id_col].to_numpy()
            id_parts, bucket_parts = [], []
            for t in range(n_tables):
                bits = (mat @ planes[t].T) > 0  # (n, planes)
                codes = (bits * xor_bits).sum(axis=1).astype(np.int64)  # (n,)
                base = np.int64(t << n_planes)
                if multi_probe:
                    # (n, 1+planes): exact code + all hamming-1 neighbors
                    probes = np.concatenate(
                        [codes[:, None], codes[:, None] ^ xor_bits[None, :]], axis=1
                    )
                    id_parts.append(np.repeat(ids_arr, 1 + n_planes))
                    bucket_parts.append((base | probes).reshape(-1))
                else:
                    id_parts.append(ids_arr)
                    bucket_parts.append(base | codes)
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(id_parts),
                    "bucket": np.concatenate(bucket_parts),
                }
            )

    return spread_partitions(vectors.select(id_col, vec_col), id_col).mapInPandas(
        kernel, schema="vec_id long, bucket long"
    )


def lsh_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    num_planes: int = 6, num_tables: int = 4, dim: int = 64, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: bucket join (queries multi-probed) + exact rerank.

    num_tables × num_planes tunes recall vs candidate fan-out: more tables
    raise recall multiplicatively (1-(1-p)^L); more planes shrink buckets.
    """
    planes = hyperplanes(dim, num_planes, num_tables, seed)
    qb = lsh_bucket_ids(queries, planes, id_col, vec_col, multi_probe=True).withColumnRenamed(
        "vec_id", "query_id"
    )
    cb = lsh_bucket_ids(corpus, planes, id_col, vec_col).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    cand = (
        qb.join(cb, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _exact_rerank(cand, queries, corpus, k, id_col, vec_col)


def ivf_assignments(
    vectors: DataFrame, centroids: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
    nprobe: int = 1, with_sim: bool = False,
) -> DataFrame:
    """(vec_id, cell) rows: nearest-``nprobe`` coarse cells per vector.

    Centroids ship to executors inside the Arrow-batch kernel closure (the
    IVF coarse quantizer is small by design — even 2^18 cells × 64 dims is
    ~128 MB, driver-holdable; it is trained on a sample, never the corpus).

    ``with_sim=True`` (nprobe=1 only) adds ``centroid_sim`` — the cosine
    to the assigned centroid, the ranking signal SemDeDup survivorship
    needs. The value is NOT taken from the ``mat @ cnorm.T`` argmax product
    (BLAS blocks matmul by matrix height, so those floats drift in the last
    ulp across Arrow batch sizes — measured, not hypothetical); instead the
    assigned centroid row is gathered and the dot recomputed as a per-row
    ``(mat * cnorm[cell]).sum(axis=1)``, where each row reduces over its
    own 64-element buffer — bit-identical at any batch height, which is
    the property the pure-Python golden replay relies on.
    """
    if with_sim and nprobe != 1:
        raise ValueError("with_sim requires nprobe=1 (one assigned cell)")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cnorm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        for pdf in batches:
            if not len(pdf):  # np.stack([]) raises on empty Arrow batches
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if with_sim:
                cells, sims = assign_cells(mat, cnorm, 1, with_sim=True)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf[id_col].to_numpy(),
                        "cell": cells[:, 0].astype(np.int64),
                        "centroid_sim": sims,
                    }
                )
                continue
            cells = assign_cells(mat, cnorm, nprobe)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf[id_col].to_numpy(), cells.shape[1]),
                    "cell": cells.reshape(-1).astype(np.int64),
                }
            )

    schema = "vec_id long, cell long" + (", centroid_sim double" if with_sim else "")
    return spread_partitions(vectors.select(id_col, vec_col), id_col).mapInPandas(
        kernel, schema=schema
    )


def assign_cells(
    mat: np.ndarray, cnorm: np.ndarray, nprobe: int, with_sim: bool = False
):
    """Nearest-``nprobe`` cells per row of ``mat`` (cosine over pre-normalized
    centroids). Shared verbatim by the Spark kernel and the pure-Python
    golden replay, so the assignment arithmetic has one source of truth.
    ``with_sim=True`` (nprobe=1) also returns the winning cosine per row."""
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = mat @ cnorm.T  # (n, n_cells)
    if nprobe == 1:
        cells = sims.argmax(axis=1)[:, None]
        if with_sim:
            # recompute the winning dot per row (gather + own-buffer sum):
            # unlike the matmul above, this is bit-identical at any batch
            # height, so the Spark kernel and the full-matrix golden replay
            # produce the same float even though Arrow batches differ
            return cells, (mat * cnorm[cells[:, 0]]).sum(axis=1)
        return cells
    return np.argsort(-sims, axis=1)[:, :nprobe]


def lloyd_centroids(sample: np.ndarray, n_cells: int, iters: int) -> np.ndarray:
    """Deterministic numpy Lloyd over a training sample: init = first
    ``n_cells`` rows, then ``iters`` assign/mean rounds (empty cell keeps
    its centroid). Raises when the sample is smaller than ``n_cells`` —
    slicing would otherwise silently train fewer coarse cells than
    requested (same explicit-validation style as ``_lloyd_l2``'s ksub
    check). Pure function — also the golden-generation twin."""
    if len(sample) < n_cells:
        raise ValueError(
            f"coarse quantizer training sample ({len(sample)}) smaller "
            f"than n_cells ({n_cells})"
        )
    centroids = sample[:n_cells].copy()
    for _ in range(iters):
        cnorm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        cells = assign_cells(sample, cnorm, 1)[:, 0]
        for c in range(n_cells):
            members = sample[cells == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def bounded_sample(
    corpus: DataFrame, sample_rows: int = 4096,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> np.ndarray:
    """The ``sample_rows`` lowest-id vectors as a float64 matrix — the
    quantizer-training sample (seedless determinism, bounded driver memory
    at any corpus size; the FAISS training rule). Shared by the coarse
    (IVF) and product (PQ) quantizer trainers."""
    sample = (
        corpus.orderBy(id_col).limit(sample_rows)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    if not sample:
        raise ValueError(
            "quantizer training sample is empty: the corpus has no rows"
        )
    return np.stack([np.asarray(r.v, dtype=np.float64) for r in sample])


def ivf_train_centroids(
    corpus: DataFrame, n_cells: int = 32, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
    sample_rows: int = 4096,
) -> np.ndarray:
    """Deterministic coarse quantizer trained on a BOUNDED sample.

    IVF quantizers are universally trained on samples (a few hundred
    vectors per cell suffice — the FAISS training rule), so the trainer
    collects the ``sample_rows`` lowest vec_ids (seedless determinism,
    bounded driver memory at any corpus size) and runs numpy Lloyd
    driver-side. This replaces the previous distributed-mean Lloyd, whose
    partition-order-dependent float sums made centroids irreproducible
    outside Spark — sample training is both the standard practice AND what
    lets the driver's golden oracle replay the quantizer bit-for-bit.
    Assignment of the full corpus stays distributed (``ivf_assignments``).
    """
    return lloyd_centroids(
        bounded_sample(corpus, sample_rows, id_col, vec_col), n_cells, iters
    )


def ivf_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    n_cells: int = 32, nprobe: int = 4, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: coarse-quantize the corpus into inverted cells; probe
    the ``nprobe`` nearest cells per query; exact cosine rerank inside.

    The scale path for corpus×corpus-sized N where brute force's O(Q×N×d)
    is out of reach: the join fans out only within probed cells
    (E[candidates] ≈ Q × nprobe × N / n_cells).
    """
    centroids = ivf_train_centroids(corpus, n_cells, iters, id_col, vec_col)
    cb = ivf_assignments(corpus, centroids, id_col, vec_col, nprobe=1).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    qb = ivf_assignments(queries, centroids, id_col, vec_col, nprobe=nprobe).withColumnRenamed(
        "vec_id", "query_id"
    )
    cand = (
        qb.join(cb, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _exact_rerank(cand, queries, corpus, k, id_col, vec_col)


def _lloyd_l2(sample: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Plain squared-L2 Lloyd for PQ sub-quantizer training: init = first
    ``k`` rows, assign by L2 argmin, mean update (empty cell keeps its
    centroid). Cosine normalization (``lloyd_centroids``) would be wrong
    here — coarse residuals are small, direction-less displacement
    vectors whose NORMS carry the information PQ must preserve. Pure
    function — also the golden-generation twin."""
    if len(sample) < k:
        raise ValueError(f"PQ training sample ({len(sample)}) smaller than ksub ({k})")
    cb = sample[:k].astype(np.float64).copy()
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for j in range(k):
            members = sample[a == j]
            if len(members):
                cb[j] = members.mean(axis=0)
    return cb


def pq_train(
    sample: np.ndarray, n_cells: int, iters: int,
    m_sub: int, ksub: int, pq_iters: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Train the IVF-PQ index driver-side on a BOUNDED sample: the coarse
    quantizer (cosine Lloyd, as ``ivf_train_centroids``) plus ``m_sub``
    product sub-quantizers over the coarse RESIDUALS of the normalized
    sample (FAISS IVFPQ residual encoding — residuals are much lower
    variance than raw vectors, so 4-bit/8-bit codes spend their levels
    where the distances actually live).

    Returns ``(centroids (n_cells, d), codebooks (m_sub, ksub, d/m_sub))``.
    Pure numpy — the golden replay calls this same function, making every
    downstream float reproducible outside Spark."""
    d = sample.shape[1]
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible into {m_sub} subspaces")
    dsub = d // m_sub
    centroids = lloyd_centroids(sample, n_cells, iters)
    cnorm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    sn = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cells = assign_cells(sample, cnorm, 1)[:, 0]
    resid = sn - cnorm[cells]
    codebooks = np.stack(
        [_lloyd_l2(resid[:, m * dsub:(m + 1) * dsub], ksub, pq_iters)
         for m in range(m_sub)]
    )
    return centroids, codebooks


def pq_encode(
    mat: np.ndarray, cnorm: np.ndarray, codebooks: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(cells, codes): nearest coarse cell per row + per-subspace codeword
    of the normalized-vector residual. Every reduction is an own-buffer
    sum over ``dsub`` elements per output scalar — bit-identical at any
    Arrow batch height (the property the golden replay relies on; the
    matmul argmax for the cell shares the accepted IVF assumption).
    Shared verbatim by the Spark kernel and the golden twin."""
    m_sub, ksub, dsub = codebooks.shape
    cells = assign_cells(mat, cnorm, 1)[:, 0]
    mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    resid = mn - cnorm[cells]
    codes = np.empty((len(mat), m_sub), dtype=np.int32)
    for m in range(m_sub):
        r = resid[:, m * dsub:(m + 1) * dsub]
        d2 = ((r[:, None, :] - codebooks[m][None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = d2.argmin(axis=1)
    return cells, codes


def pq_query_tables(
    mat: np.ndarray, cnorm: np.ndarray, codebooks: np.ndarray, nprobe: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-query ADC precomputation: probed cells (cosine argsort), the
    query·centroid dot per probe, and the flattened lookup table
    ``lut[m*ksub + j] = q_sub[m] · codeword[m][j]`` — so a candidate's
    approximate inner product is ``cell_dot + Σ_m lut[m*ksub+code_m]``
    (exact given the quantization: q·(c+r̂) = q·c + q·r̂). All reductions
    are own-buffer sums over ``dsub`` (or d) elements — batch-height
    independent. Shared verbatim with the golden twin."""
    m_sub, ksub, dsub = codebooks.shape
    n = len(mat)
    mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    cells = assign_cells(mat, cnorm, nprobe)  # (n, nprobe)
    cell_dots = (mn[:, None, :] * cnorm[cells]).sum(axis=2)  # (n, nprobe)
    luts = (
        (mn.reshape(n, m_sub, 1, dsub) * codebooks[None]).sum(axis=3)
        .reshape(n, m_sub * ksub)
    )
    return cells, cell_dots, luts


def ivf_pq_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    n_cells: int = 32, nprobe: int = 4, iters: int = 2,
    m_sub: int = 8, ksub: int = 16, pq_iters: int = 2,
    rerank: int | None = None, sample_rows: int = 4096,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ (IVFADC, Jégou et al. 2011) ANN top-k — the memory-footprint
    scale path: corpus vectors live in the index as ``m_sub`` sub-quantizer
    codes — ONE packed int64 at the defaults (4 bits × 8 subspaces), a
    24-byte fixed-width index row vs 256+ bytes for raw float32×64 —
    scored against per-query lookup tables, with exact-cosine rerank of
    only the top-``rerank`` ADC candidates.

    Plan shape at 10^12 vectors: train driver-side on a bounded sample
    (``pq_train`` — the FAISS rule, and what makes the whole path replay
    bit-for-bit outside Spark); one narrow Arrow pass encodes the corpus
    to ``(cell, codes)``; queries carry their LUT (m_sub×ksub doubles)
    through a cell equi-join — fan-out E[Q × nprobe × N / n_cells], same
    as IVF-Flat but each candidate row costs an m_sub-term JVM left-fold
    over the LUT instead of a d-term dot over raw floats, and the raw
    corpus vectors are touched ONLY for the ≤ Q×rerank rerank join. The
    ADC sum runs JVM-side (transform + element_at + aggregate left fold:
    fixed addition order, whole-stage codegen, bit-reproducible by the
    pure-Python golden).

    Sizing rule (measured, tests/test_similarity.py): the code budget
    must RESOLVE the cosine gaps the ADC has to rank. On tightly
    clustered corpora the true top-k are same-cluster members whose
    cosine gaps are ~1e-3, far below the quantization error of the
    32-bit default — recall at nprobe=2/20 cells, k=10, rerank=40:
    m_sub×ksub 8×16 (32 bits) 0.26, 8×256 (64 b) 0.32, 16×256 (128 b)
    0.51, 32×256 (256 b) 0.96, IVF-Flat 1.00; deepening rerank is the
    cheaper lever when codes stay small (rerank=100 lifts 32-bit to
    0.54). On spread-out corpora (near-random directions) the default
    32-bit budget already tracks IVF-Flat. Same knobs and trade-offs as
    FAISS IVFPQ — pick bits-per-vector by the discrimination scale of
    the embedding space, not corpus size."""
    centroids, codebooks = pq_train(
        bounded_sample(corpus, sample_rows, id_col, vec_col),
        n_cells, iters, m_sub, ksub, pq_iters,
    )
    index = pq_index(corpus, centroids, codebooks, id_col, vec_col)
    return ivf_pq_search(
        queries, index, corpus, centroids, codebooks,
        k=k, nprobe=nprobe, rerank=rerank, id_col=id_col, vec_col=vec_col,
    )


def _pq_fingerprint(centroids: np.ndarray, codebooks: np.ndarray) -> str:
    """Content fingerprint of a trained quantizer (shape + float64 bytes,
    sha256/16 hex). Stamped onto the index's ``codes`` column metadata by
    ``pq_index`` and verified by ``ivf_pq_search``, so an index searched
    with a quantizer other than the one that encoded it raises instead of
    silently mis-unpacking — including same-transport mismatches (e.g.
    5-bit vs 4-bit strides that are BOTH packed longs), which the
    structural packability check alone cannot see. Deterministic across
    save/load: ``pq_save`` round-trips float64 bit-exactly."""
    import hashlib

    h = hashlib.sha256()
    h.update(np.int64(centroids.shape + codebooks.shape).tobytes())
    h.update(np.ascontiguousarray(centroids, dtype=np.float64).tobytes())
    h.update(np.ascontiguousarray(codebooks, dtype=np.float64).tobytes())
    return h.hexdigest()[:16]


def _code_bits(ksub: int, m_sub: int) -> tuple[int, bool]:
    """(bits_per_code, fits_in_one_long) for a PQ code vector. Codewords
    need ceil(log2(ksub)) bits each; at the defaults (16×8 = 32 bits) all
    codes pack into one LONG and the index row is (id, cell, packed) = 24
    fixed bytes — the 10^12-row shuffle/storage shape PQ exists for. Wide
    configs (e.g. 8-bit × 8 subquantizers = 64 bits, sign-unsafe in an
    int64) take the array<int> transport instead."""
    bpc = max(1, int(ksub - 1).bit_length())
    return bpc, bpc * m_sub <= 63


def pq_index(
    vectors: DataFrame, centroids: np.ndarray, codebooks: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors against a TRAINED quantizer into the persistable PQ
    index relation ``(vec_id, cell, codes)`` — one cheap spread
    repartition (``spread_partitions`` exchanges when the input has fewer
    splits than the session shuffle width) followed by one narrow Arrow
    pass. ``codes`` is a packed long when the bit budget fits
    (``_code_bits``), else ``array<int>``.

    This is the append side of the train-once/add-forever index
    lifecycle: train the quantizer ON THE FIRST increment's bounded
    sample, commit these rows (e.g. ``SnapshotTable.commit``), and each
    later ingest encodes ONLY its new vectors — encoding is batch-split
    invariant (property-pinned), so incremental unions are row-identical
    to a one-shot encode and history is never re-read. Search the
    committed union with ``ivf_pq_search``.

    The index is keyed by ``vec_id`` and must stay UNIQUE per id: gate
    re-ingests with ``SnapshotTable.resume_filter`` (or commit ``keys``)
    so a retried batch is not encoded twice. ``ivf_pq_search`` collapses
    duplicate candidates before the rerank, so a violated precondition
    degrades recall (duplicates crowd the ADC cut) rather than producing
    duplicate ranks."""
    m_sub, ksub, _ = codebooks.shape
    bpc, packed = _code_bits(ksub, m_sub)
    cnorm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def encode_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.int64(1) << (bpc * np.arange(m_sub, dtype=np.int64))
        for pdf in batches:
            if not len(pdf):  # np.stack([]) raises on empty Arrow batches
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cells, codes = pq_encode(mat, cnorm, codebooks)
            out = {
                "vec_id": pdf[id_col].to_numpy(),
                "cell": cells.astype(np.int64),
            }
            if packed:
                out["codes"] = (codes.astype(np.int64) * shifts).sum(axis=1)
            else:
                out["codes"] = list(codes)
            yield pd.DataFrame(out)

    return spread_partitions(vectors.select(id_col, vec_col), id_col).mapInPandas(
        encode_kernel,
        schema=f"vec_id long, cell long, codes {'long' if packed else 'array<int>'}",
    ).withMetadata(
        # quantizer identity rides the schema, not the rows: survives
        # parquet round-trips (SnapshotTable commits), unions of
        # increments, and projections — zero bytes per row
        "codes", {"pq_m_sub": m_sub, "pq_ksub": ksub,
                  "pq_fp": _pq_fingerprint(centroids, codebooks)},
    )


def ivf_pq_search(
    queries: DataFrame, index: DataFrame, corpus: DataFrame,
    centroids: np.ndarray, codebooks: np.ndarray,
    k: int = 5, nprobe: int = 4, rerank: int | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against a PREBUILT ``(vec_id, cell, codes)`` PQ index —
    the search half of ``ivf_pq_topk``, accepting an index that may be
    freshly encoded, read back from a committed snapshot table, or an
    incremental union of both. The codes transport (packed long vs
    array<int>) is detected from the index schema, so a parquet
    round-trip needs no flags — and cross-checked against the quantizer:
    an index whose transport disagrees with what ``pq_index`` would emit
    for these codebooks was built with a DIFFERENT quantizer, and
    unpacking it at the wrong bit stride would silently corrupt every
    ADC score, so that mismatch raises instead. ``corpus`` supplies raw
    vectors for the exact rerank only."""
    from pyspark.sql.types import LongType

    if rerank is None:
        rerank = 4 * k
    m_sub, ksub, _ = codebooks.shape
    bpc, packable = _code_bits(ksub, m_sub)
    packed = isinstance(index.schema["codes"].dataType, LongType)
    if packed != packable:
        raise ValueError(
            f"index codes transport ({'packed long' if packed else 'array<int>'}) "
            f"does not match this quantizer (m_sub={m_sub}, ksub={ksub} -> "
            f"{'packable' if packable else 'not packable'}): the index was "
            "built with a different quantizer"
        )
    meta = index.schema["codes"].metadata or {}
    if "pq_fp" in meta:
        # the strong check: the stamped identity must be THIS quantizer.
        # Catches same-transport mismatches the structural check above
        # cannot (e.g. a 5-bit-stride index searched at a 4-bit stride —
        # both packed longs, every ADC score silently wrong otherwise).
        fp = _pq_fingerprint(centroids, codebooks)
        if (meta.get("pq_m_sub"), meta.get("pq_ksub"), meta["pq_fp"]) != (
            m_sub, ksub, fp
        ):
            raise ValueError(
                f"index was encoded by a different quantizer (index "
                f"m_sub={meta.get('pq_m_sub')}, ksub={meta.get('pq_ksub')}, "
                f"fp={meta['pq_fp']}; search quantizer m_sub={m_sub}, "
                f"ksub={ksub}, fp={fp})"
            )
    cnorm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def query_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cells, cell_dots, luts = pq_query_tables(mat, cnorm, codebooks, nprobe)
            n, np_ = cells.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf[id_col].to_numpy(), np_),
                    "cell": cells.reshape(-1).astype(np.int64),
                    "cell_dot": cell_dots.reshape(-1),
                    "lut": list(np.repeat(luts, np_, axis=0)),
                }
            )

    cb = index.select(F.col("vec_id").alias("neighbor_id"), "cell", "codes")
    qb = queries.select(id_col, vec_col).mapInPandas(
        query_kernel,
        schema="query_id long, cell long, cell_dot double, lut array<double>",
    )
    # ADC score per candidate, JVM-side: left-associated sum over the m_sub
    # code lookups in subspace order — the SAME addition order on both the
    # packed path (explicit expression chain) and the array path
    # (aggregate's left fold starts at lit(0.0) too), so the golden replay
    # covers both transports with one arithmetic
    if packed:
        mask = F.lit((1 << bpc) - 1)
        acc = F.lit(0.0)
        for m in range(m_sub):
            code_m = F.shiftright(F.col("codes"), bpc * m).bitwiseAND(mask)
            acc = acc + F.element_at(F.col("lut"), (code_m + F.lit(m * ksub + 1)).cast("int"))
    else:
        contrib = F.transform(
            F.col("codes"),
            lambda c, i: F.element_at(F.col("lut"), i * F.lit(ksub) + c + F.lit(1)),
        )
        acc = F.aggregate(contrib, F.lit(0.0), lambda a, x: a + x)
    adc = F.col("cell_dot") + acc
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        qb.join(cb, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc"))
        .withColumn("adc_rank", F.row_number().over(w))
        .filter(F.col("adc_rank") <= rerank)
        # collapse duplicate candidates (a violated vec_id-uniqueness
        # precondition — e.g. a batch committed twice) BEFORE the rerank,
        # so a duplicated neighbor can never hold two final ranks; cost is
        # a distinct over ≤ Q×rerank rows, not the candidate fan-out
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _exact_rerank(cand, queries, corpus, k, id_col, vec_col)


def pq_save(
    spark: SparkSession, path: str,
    centroids: np.ndarray, codebooks: np.ndarray,
) -> None:
    """Persist a trained quantizer as one small parquet directory THROUGH
    Spark's Hadoop filesystem — the same storage layer ``SnapshotTable``
    commits the code rows to, so the two halves of a committed index stay
    co-located on cluster storage (S3/HDFS roots work; a driver-local
    pyarrow write would strand the quantizer — which every future
    increment must reuse — on one driver's disk). Row layout:
    kind='centroid' rows carry (idx=cell, sub=-1, values=centroid);
    kind='codebook' rows carry (idx=codeword, sub=subspace,
    values=codeword vector). float64 columns round-trip bit-exactly, so
    a reloaded quantizer reproduces every index code and ADC score."""
    rows = [
        ("centroid", i, -1, [float(x) for x in c])
        for i, c in enumerate(centroids)
    ]
    m_sub, ksub, _ = codebooks.shape
    rows += [
        ("codebook", j, m, [float(x) for x in codebooks[m][j]])
        for m in range(m_sub)
        for j in range(ksub)
    ]
    spark.createDataFrame(
        rows, "kind string, idx int, sub int, values array<double>"
    ).coalesce(1).write.mode("errorifexists").parquet(path)


def pq_load(spark: SparkSession, path: str) -> tuple[np.ndarray, np.ndarray]:
    """Reload a quantizer persisted by ``pq_save`` — exact inverse, with
    the completeness checks a train-once artifact deserves: a truncated
    or foreign file raises a named ValueError instead of leaving
    uninitialized codebook slots that would silently corrupt every
    subsequent encode."""
    t = [r.asDict() for r in spark.read.parquet(path).collect()]
    cents = sorted((r for r in t if r["kind"] == "centroid"), key=lambda r: r["idx"])
    cbs = [r for r in t if r["kind"] == "codebook"]
    if not cents or not cbs:
        raise ValueError(f"corrupt quantizer file {path}: missing centroid/codebook rows")
    if [r["idx"] for r in cents] != list(range(len(cents))):
        raise ValueError(f"corrupt quantizer file {path}: non-contiguous centroid ids")
    centroids = np.array([r["values"] for r in cents], dtype=np.float64)
    m_sub = max(r["sub"] for r in cbs) + 1
    ksub = max(r["idx"] for r in cbs) + 1
    dsub = len(cbs[0]["values"])
    seen = {(r["sub"], r["idx"]) for r in cbs}
    # full-grid equality, not count/distinctness: negative sub/idx values
    # (e.g. sub ∈ {-1, 1}) satisfy count checks yet index the numpy array
    # from the END, leaving a slot as uninitialized np.empty garbage — the
    # exact silent corruption this loader exists to refuse
    grid = {(s, i) for s in range(m_sub) for i in range(ksub)}
    if len(cbs) != m_sub * ksub or seen != grid:
        raise ValueError(
            f"corrupt quantizer file {path}: expected the full codebook grid "
            f"range({m_sub})×range({ksub}) exactly once, found {len(cbs)} rows "
            f"covering {len(seen & grid)} grid cells"
        )
    if any(len(r["values"]) != dsub for r in cbs):
        raise ValueError(f"corrupt quantizer file {path}: ragged codeword widths")
    codebooks = np.empty((m_sub, ksub, dsub), dtype=np.float64)
    for r in cbs:
        codebooks[r["sub"], r["idx"]] = r["values"]
    return centroids, codebooks


def embedding_near_dups(
    vectors: DataFrame, threshold: float = 0.95,
    num_planes: int = 8, num_tables: int = 4, dim: int = 64, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets + exact verify.

    Near-dups (cosine ≥ 0.95) collide on all planes with high probability,
    so narrow buckets + several tables give near-1 recall with tiny fan-out.
    """
    planes = hyperplanes(dim, num_planes, num_tables, seed)
    base = lsh_bucket_ids(vectors, planes, id_col, vec_col)
    # ONE-sided multi-probe: probing both sides of the self-join would
    # multiply candidate fan-out by (1+num_planes)² per table — 81× at the
    # default 8 planes — for marginal hamming-2 recall (the lsh_bucket_ids
    # docstring itself scopes multi-probe as query-side). Probe-vs-base
    # already covers every bucket pair within hamming 1 symmetrically
    # (probes(x)∩base(y) ≠ ∅ ⇔ hamming(code x, code y) ≤ 1). The probe
    # expansion is derived JVM-side from the base relation (XOR of each
    # code bit; table bits sit above the code, so they are preserved) —
    # no second kernel pass over the vectors.
    probed = base.select(
        "vec_id",
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(num_planes)],
            )
        ).alias("bucket"),
    )
    cand = (
        probed.alias("a")
        .join(
            base.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    va = _as_double(vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")), "va")
    vb = _as_double(vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")), "vb")
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def semantic_dedup(
    vectors: DataFrame, eps: float = 0.95,
    n_cells: int = 16, iters: int = 2, sample_rows: int = 4096,
    id_col: str = "vec_id", vec_col: str = "embedding",
    max_iter: int = 30, caches: list | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic-level dedup
    over an embedding column — k-means-partition the embedding space with
    the sample-trained coarse quantizer, find within-cell pairs with cosine
    ≥ ``eps``, resolve them to connected components, and keep per component
    the member FARTHEST from its cell centroid (lowest ``centroid_sim``,
    ties → min id) — the paper's "keep the least prototypical example"
    survivorship, which preserves diversity where exact/near dedup keeps
    arbitrary canonicals.

    Returns a complete keep/drop list:
    ``(vec_id, cell, centroid_sim, cluster_id, keep)`` — singletons keep
    themselves; ``centroid_sim`` is rounded to 6 dp for a stable surface.

    Scale shape: the quantizer trains on a BOUNDED driver sample
    (``ivf_train_centroids`` — the FAISS rule); assignment is one narrow
    Arrow pass; the pair scan is a cell-key equi-join whose fan-out is
    Σ|cell|² — ``n_cells`` is the knob that bounds it (the paper uses 50k
    clusters at LAION scale; at 10^12 docs pick n_cells so E[|cell|] stays
    ~10^4-10^5). Component resolution reuses ``dedup_clusters``
    (min-label propagation + pointer jumping, no driver union-find), and
    survivorship is one mergeable max(struct) groupBy (``survivors``).

    The assignment relation is cached (consumed by the pair scan twice,
    the cluster node list, and survivorship — one narrow Arrow pass
    instead of four); pass ``caches=[]`` to receive it and ``unpersist()``
    after the result is materialized — the caller-owned-release contract
    shared with ``minhash_lsh_pairs``/``ngram_jaccard_pairs``.
    """
    from .dedup import dedup_clusters, survivors

    centroids = ivf_train_centroids(
        vectors, n_cells, iters, id_col, vec_col, sample_rows
    )
    assign = ivf_assignments(
        vectors, centroids, id_col, vec_col, nprobe=1, with_sim=True
    ).cache()
    if caches is not None:
        caches.append(assign)
    # within-cell candidate pairs → exact cosine (JVM left-fold) ≥ eps
    a = assign.select(F.col("vec_id").alias("id_a"), "cell")
    b = assign.select(F.col("vec_id").alias("id_b"), "cell")
    cand = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    va = _as_double(vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")), "va")
    vb = _as_double(vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")), "vb")
    pairs = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= eps)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    )
    clusters = dedup_clusters(
        pairs, docs=assign.select(F.col("vec_id").alias("doc_id")), max_iter=max_iter
    )
    # SemDeDup survivorship: max(-centroid_sim) = farthest-from-centroid.
    # centroid_sim is bit-identical between the Spark kernel and the golden
    # replay (per-row own-buffer sum — see assign_cells), so ties resolve
    # identically (-doc_id struct field → min id) on both sides.
    ranked = assign.select(
        F.col("vec_id").alias("doc_id"), (-F.col("centroid_sim")).alias("neg_sim")
    )
    keepers = survivors(clusters, ranked, keep_by="neg_sim").select(
        F.col("doc_id").alias("vec_id"), F.lit(True).alias("keep")
    )
    return (
        assign.join(clusters.select(F.col("doc_id").alias("vec_id"), "cluster_id"), "vec_id")
        .join(keepers, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.round("centroid_sim", 6).alias("centroid_sim"),
            "cluster_id",
            F.coalesce("keep", F.lit(False)).alias("keep"),
        )
    )
