"""Query catalog: the driver-facing inventory of implemented operators.

Each ``QUERIES[name]`` is a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLES[name]`` is equivalent DuckDB SQL over the same parquet tables
(views: region nation customer supplier part orders lineitem events
documents embeddings). Names map to SURVEY.md §2 operator ids in each
docstring. Every computed column is aliased identically on both sides
(driver hash-compares by sorted column name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import synth
from .functions import matchers as _M
from .operators import extract

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# Extraction (U1 replacement) — non-SQL kernel → rows-only driver check;
# span-sequence equality is pinned by tests/test_extract_e2e.py.
# ---------------------------------------------------------------------------


@_q("extract_spans")
def q_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/S1/K3: synthesize north-rule span docs → vectorized extraction →
    ordered (doc_id, kind, text, media_ref, offset) spans."""
    docs = synth.synthesize_documents(spark, sf_dir)
    return extract.extract_spans(docs)


@_q("extract_spans_wide")
def q_extract_spans_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level parallel extraction (mega-doc straggler fallback):
    posexplode → per-span kernel → window renumber; row-for-row identical
    to extract_spans (pinned by tests/test_extract_e2e.py). Rows-only."""
    docs = synth.synthesize_documents(spark, sf_dir)
    return extract.extract_spans_wide(docs)


@_q("ensemble_extract")
def q_ensemble_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §7.0 ensemble legs: three kernel variants (default ×2 legs,
    strict boilerplate cut at weight 1.5) weighted-vote per document on the
    span-sequence digest; winning sequence emitted with consensus share
    (rows-only; semantics pinned by tests/test_extract_e2e.py)."""
    docs = synth.synthesize_documents(spark, sf_dir)
    legs = [
        ("default", 1.0, None),
        ("default_twin", 1.0, None),
        ("strict", 1.5, {"strong_words": 25, "max_link_density": 0.15}),
    ]
    return extract.ensemble_extract(docs, legs)


@_q("extract_lineage")
def q_extract_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§4.2 lineage: per-partition (doc_count, span_count, checksum) rows."""
    docs = synth.synthesize_documents(spark, sf_dir)
    out = extract.extract_pipeline(docs, num_partitions=8, with_lineage=True)
    return extract.lineage_metrics(out)


# ---------------------------------------------------------------------------
# Scans / limits / filters (S1, S2, P1, O1, W4)
# ---------------------------------------------------------------------------


@_q(
    "scan_limit",
    """
    SELECT doc_id, lang, source, n_chars
    FROM documents ORDER BY doc_id LIMIT 50
    """,
)
def q_scan_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S2/W4: deterministic ordered scan + head-N (reference:
    utils/file_utils.py:66, pipeline/run_annotation.py:36-44)."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
        .limit(50)
    )


@_q(
    "source_filter",
    """
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE lower(source) IN ('src0', 'src1', 'src2')
    GROUP BY source
    """,
)
def q_source_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: extension-set predicate analog (reference: utils/file_utils.py:42-53)."""
    return (
        _docs(spark, sf_dir)
        .filter(F.lower("source").isin("src0", "src1", "src2"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@_q(
    "sample_explode",
    """
    SELECT d.doc_id, s.sample_id
    FROM documents d, (SELECT unnest(generate_series(0, 2)) AS sample_id) s
    WHERE d.doc_id < 100
    """,
)
def q_sample_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/J5: docs × sample_id lateral expansion (reference:
    pipeline/image_dataset.py:40-42)."""
    return (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.lit(2).cast("long"))).alias("sample_id"),
        )
    )


@_q(
    "resume_anti_join",
    """
    SELECT d.doc_id, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 3 = 0)
    """,
)
def q_resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/J3: skip-cached resume as a left anti-join vs the committed set
    (reference: pipeline/image_dataset.py:43-47)."""
    docs = _docs(spark, sf_dir)
    committed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    return docs.join(committed, "doc_id", "left_anti").select("doc_id", "n_chars")


@_q(
    "sample_gate",
    """
    WITH samples AS (
      SELECT d.doc_id, s.sample_id
      FROM documents d, (SELECT unnest(generate_series(0, 2)) AS sample_id) s
      WHERE (d.doc_id + s.sample_id) % 5 <> 0
    )
    SELECT doc_id, count(*) AS n_samples
    FROM samples GROUP BY doc_id HAVING count(*) = 3
    """,
)
def q_sample_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: all-samples-present gate — reuse cache only when every expected
    sample exists (reference: pipeline/annotator_processor.py:204-218)."""
    samples = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.lit(2).cast("long"))).alias("sample_id"),
        )
        .filter((F.col("doc_id") + F.col("sample_id")) % 5 != 0)
    )
    return (
        samples.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_samples"))
        .filter(F.col("n_samples") == 3)
    )


# ---------------------------------------------------------------------------
# Ensemble votes (A1/A2/W1/W3/P4) over annotations derived deterministically
# from lineitem/events — identical derivation in Spark and the oracle SQL.
# ---------------------------------------------------------------------------

_ANN_SQL = """
  SELECT l_orderkey AS doc_id,
         'ann_' || CAST(l_suppkey % 4 AS VARCHAR) AS annotator_id,
         'f' || CAST(l_linenumber % 3 AS VARCHAR) AS field_name,
         l_returnflag AS value,
         0.25 * (l_linenumber % 5) AS confidence
  FROM lineitem
"""

_WEIGHTS = [("ann_0", 1.0), ("ann_1", 2.0), ("ann_2", 0.5), ("ann_3", 1.0)]


def _derived_annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.col("l_orderkey").alias("doc_id"),
        F.concat(F.lit("ann_"), (F.col("l_suppkey") % 4).cast("string")).alias("annotator_id"),
        F.concat(F.lit("f"), (F.col("l_linenumber") % 3).cast("string")).alias("field_name"),
        F.col("l_returnflag").alias("value"),
        (F.lit(0.25) * (F.col("l_linenumber") % 5)).alias("confidence"),
    )


@_q(
    "weighted_vote",
    f"""
    WITH ann AS ({_ANN_SQL}),
    w AS (SELECT * FROM (VALUES {", ".join(f"('{a}', {w})" for a, w in _WEIGHTS)})
          t(annotator_id, weight)),
    scored AS (
      SELECT a.doc_id, a.field_name, a.value,
             SUM(coalesce(w.weight, 1.0) * a.confidence) AS score
      FROM ann a LEFT JOIN w USING (annotator_id)
      WHERE a.field_name IS NOT NULL AND a.field_name <> ''
        AND a.value IS NOT NULL AND a.value <> ''
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT doc_id, field_name, value, score,
             SUM(score) OVER (PARTITION BY doc_id, field_name) AS total,
             ROW_NUMBER() OVER (PARTITION BY doc_id, field_name
                                ORDER BY score DESC, value ASC) AS rn
      FROM scored
    )
    SELECT doc_id, field_name, value,
           CASE WHEN total > 0 THEN round(score / total, 6) ELSE 0.0 END AS confidence
    FROM ranked WHERE rn = 1
    """,
)
def q_weighted_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/W1/P4: flagship weighted-vote aggregation (reference:
    voters/weighted.py:38-134). Confidence rounded to 6dp on both sides —
    float sum order is partition-dependent at the 1e-15 level."""
    from .operators.vote import weighted_vote

    ann = _derived_annotations(spark, sf_dir)
    weights = spark.createDataFrame(_WEIGHTS, "annotator_id string, weight double")
    out = weighted_vote(ann, weights)
    return out.withColumn("confidence", F.round("confidence", 6))


@_q(
    "majority_vote",
    """
    WITH votes AS (
      SELECT user_id % 100 AS doc_id, 'event_type' AS field_name,
             event_type AS value
      FROM events
    )
    SELECT doc_id, field_name, value, n_votes FROM (
      SELECT doc_id, field_name, value, COUNT(*) AS n_votes,
             ROW_NUMBER() OVER (PARTITION BY doc_id, field_name
                                ORDER BY COUNT(*) DESC, value ASC) AS rn
      FROM votes GROUP BY 1, 2, 3
    ) WHERE rn = 1
    """,
)
def q_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/W3: mode per key with pinned tie-break (reference:
    voters/majority.py:10-18)."""
    from .operators.vote import majority_vote

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    votes = ev.select(
        (F.col("user_id") % 100).alias("doc_id"),
        F.lit("event_type").alias("field_name"),
        F.col("event_type").alias("value"),
    )
    return majority_vote(votes)


@_q(
    "annotation_pipeline",
    """
    WITH base AS (
      SELECT o_orderkey AS doc_id, o_orderstatus AS status,
             CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) AS amount
      FROM orders
    ),
    legs AS (
      SELECT doc_id, 'ann_A' AS annotator_id, 1.0 AS w, status AS status_v,
             amount, 0.9 AS c_status, 0.6 AS c_amount,
             CAST(doc_id % 3 AS INT) AS mode FROM base
      UNION ALL
      SELECT doc_id, 'ann_B', 2.0,
             CASE WHEN doc_id % 3 = 0 THEN 'X' ELSE status END,
             amount, 0.8, 0.5, CAST((doc_id + 1) % 3 AS INT) FROM base
    ),
    -- mode 2 = unparseable raw text → the leg contributes nothing (U2 chain
    -- returns NULL); the falsy 'empty_f' field never votes (P4)
    fields AS (
      SELECT doc_id, annotator_id, w, 'status' AS field_name,
             status_v AS value, c_status AS confidence
      FROM legs WHERE mode <> 2
      UNION ALL
      SELECT doc_id, annotator_id, w, 'amount', amount, c_amount
      FROM legs WHERE mode <> 2
    ),
    scored AS (
      SELECT doc_id, field_name, value, SUM(w * confidence) AS score
      FROM fields GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *, SUM(score) OVER (PARTITION BY doc_id, field_name) AS total,
             ROW_NUMBER() OVER (PARTITION BY doc_id, field_name
                                ORDER BY score DESC, value ASC) AS rn
      FROM scored
    )
    SELECT doc_id, field_name, value,
           CASE WHEN total > 0 THEN round(score / total, 6) ELSE 0.0 END AS confidence
    FROM ranked WHERE rn = 1
    """,
)
def q_annotation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.1 lifecycle end-to-end (reference: pipeline/run_annotation.py:157-208):
    raw LLM-style text (fenced/plain/garbage) → JSON extraction chain (U2) →
    typed parse (U4) → fields explode (UDTF shape) → falsy filter (P4) →
    weighted vote (A1). The Spark side REALLY parses the JSON it builds;
    the oracle derives the same votes symbolically — a parser bug shows up
    as a value mismatch."""
    from .functions.json_extract import parse_result
    from .operators.vote import explode_annotation_fields, weighted_vote

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(32, "o_orderkey")
    k = F.col("o_orderkey")
    amount = F.floor("o_totalprice").cast("bigint").cast("string")

    def leg(name: str, status_col, c_status: str, c_amount: str, mode_col):
        falsy = F.when(
            k % 4 == 0,
            F.lit(', {"field_name": "empty_f", "value": "", "confidence": 0.5}'),
        ).otherwise(F.lit(""))
        payload = F.concat(
            F.lit('{"result": {"fields": ['),
            F.lit('{"field_name": "status", "value": "'), status_col,
            F.lit(f'", "confidence": {c_status}}}, '),
            F.lit('{"field_name": "amount", "value": "'), amount,
            F.lit(f'", "confidence": {c_amount}}}'),
            falsy,
            F.lit("]}}"),
        )
        raw = (
            F.when(mode_col == 0, F.concat(F.lit("<think>…</think>\n```json\n"), payload, F.lit("\n```")))
            .when(mode_col == 1, payload)
            .otherwise(F.lit("the model refused to answer in json"))
        )
        return o.select(
            k.alias("doc_id"),
            F.lit(name).alias("annotator_id"),
            F.lit(0).alias("sample_id"),
            raw.alias("raw_text"),
        )

    legs = leg("ann_A", F.col("o_orderstatus"), "0.9", "0.6", k % 3).unionByName(
        leg(
            "ann_B",
            F.when(k % 3 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")),
            "0.8",
            "0.5",
            (k + 1) % 3,
        )
    )
    schema = (
        "struct<result struct<fields array<struct<"
        "field_name string, value string, confidence double>>>>"
    )
    nested = legs.select(
        "doc_id",
        "annotator_id",
        "sample_id",
        parse_result(F.col("raw_text"), schema)["result"].alias("result"),
    ).filter(F.col("result").isNotNull())
    exploded = explode_annotation_fields(nested)
    weights = spark.createDataFrame(
        [("ann_A", 1.0), ("ann_B", 2.0)], "annotator_id string, weight double"
    )
    out = weighted_vote(exploded, weights)
    return out.withColumn("confidence", F.round("confidence", 6))


@_q(
    "highest_confidence_vote",
    f"""
    WITH ann AS ({_ANN_SQL}),
    ranked AS (
      SELECT doc_id, field_name, value, confidence,
             ROW_NUMBER() OVER (PARTITION BY doc_id, field_name
                                ORDER BY confidence DESC, value ASC,
                                         annotator_id ASC) AS rn
      FROM ann
      WHERE field_name IS NOT NULL AND field_name <> ''
        AND value IS NOT NULL AND value <> ''
    )
    SELECT doc_id, field_name, value, CAST(confidence AS DOUBLE) AS confidence
    FROM ranked WHERE rn = 1
    """,
)
def q_highest_confidence_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's declared-but-unimplemented 'highest_confidence' voter
    (config_manager.py:24-26 accepts it; run_annotation.py:88-89 raises) —
    completed: top-1 per (doc, field) by confidence, pinned tie-break."""
    from .operators.vote import highest_confidence_vote

    return highest_confidence_vote(_derived_annotations(spark, sf_dir))


# ---------------------------------------------------------------------------
# Evaluation (J2, F1-F6, A3-A7) over gt/pred derived from orders.
# ---------------------------------------------------------------------------

_GT_SQL = """
  SELECT o_orderkey AS doc_id, 'status' AS field_name,
         o_orderstatus AS value FROM orders
  UNION ALL
  SELECT o_orderkey, 'contract_date', strftime(o_orderdate, '%Y-%m-%d') FROM orders
  UNION ALL
  SELECT o_orderkey, 'transaction_amount',
         CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) || '.00 USD' FROM orders
"""

_PRED_SQL = """
  SELECT o_orderkey AS doc_id, 'status' AS field_name,
         CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END AS value
  FROM orders WHERE o_orderkey % 11 <> 0
  UNION ALL
  SELECT o_orderkey, 'contract_date',
         CASE WHEN o_orderkey % 5 = 0 THEN strftime(o_orderdate, '%Y/%m/%d')
              ELSE strftime(o_orderdate, '%Y-%m-%d') END
  FROM orders WHERE o_orderkey % 11 <> 0
  UNION ALL
  SELECT o_orderkey, 'transaction_amount',
         CASE WHEN o_orderkey % 7 = 0
              THEN 'USD ' || CAST(CAST(floor(o_totalprice) AS BIGINT) + 1 AS VARCHAR)
              ELSE 'USD ' || CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) END
  FROM orders WHERE o_orderkey % 11 <> 0
"""


def _explode_fields(o: DataFrame, triples: list[tuple[str, object]]) -> DataFrame:
    """One scan → (doc_id, field_name, value) rows via explode-of-structs —
    the UNION ALL of N per-field scans collapsed into a single pass (the
    oracle SQL keeps the UNION ALL form; row sets are identical)."""
    entries = [
        F.struct(F.lit(name).alias("field_name"), value.alias("value"))
        for name, value in triples
    ]
    return o.select(
        F.col("o_orderkey").alias("doc_id"), F.explode(F.array(*entries)).alias("_f")
    ).select("doc_id", "_f.field_name", "_f.value")


def _derived_gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # regex-heavy matcher evaluation downstream: spread the single-file scan
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(32, "o_orderkey")
    amount = F.concat(
        F.floor("o_totalprice").cast("bigint").cast("string"), F.lit(".00 USD")
    )
    return _explode_fields(
        o,
        [
            ("status", F.col("o_orderstatus")),
            ("contract_date", F.date_format("o_orderdate", "yyyy-MM-dd")),
            ("transaction_amount", amount),
        ],
    )


def _derived_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .repartition(32, "o_orderkey")
        .filter(F.col("o_orderkey") % 11 != 0)
    )
    status = F.when(F.col("o_orderkey") % 3 == 0, F.lit("X")).otherwise(F.col("o_orderstatus"))
    cdate = F.when(
        F.col("o_orderkey") % 5 == 0, F.date_format("o_orderdate", "yyyy/MM/dd")
    ).otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
    base_amt = F.floor("o_totalprice").cast("bigint")
    amount = F.when(
        F.col("o_orderkey") % 7 == 0,
        F.concat(F.lit("USD "), (base_amt + 1).cast("string")),
    ).otherwise(F.concat(F.lit("USD "), base_amt.cast("string")))
    return _explode_fields(
        o,
        [
            ("status", status),
            ("contract_date", cdate),
            ("transaction_amount", amount),
        ],
    )


def _oracle_correct_sql() -> str:
    """The matcher dispatch (F6) as DuckDB SQL, from the shared templates."""
    from .functions import matchers as M

    date_sql = M.date_match_duckdb_sql("g.value", "p.value")
    cur_sql = M.render(M.CURRENCY_SQL, "g.value", "p.value", 0.01)
    return f"""
      CASE WHEN p.value IS NULL THEN false
           WHEN g.field_name = 'contract_date' THEN coalesce({date_sql}, false)
           WHEN g.field_name = 'transaction_amount' THEN coalesce({cur_sql}, false)
           ELSE coalesce(g.value = p.value, false) END
    """


_EVAL_BASE_SQL = f"""
  WITH gt AS ({_GT_SQL}), pred AS ({_PRED_SQL}),
  evaluated AS (
    SELECT g.doc_id, g.field_name, ({_oracle_correct_sql()}) AS correct
    FROM gt g LEFT JOIN pred p
      ON g.doc_id = p.doc_id AND g.field_name = p.field_name
  )
"""


@_q(
    "eval_field_accuracy",
    _EVAL_BASE_SQL
    + """
    SELECT field_name,
           CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           COUNT(*) AS n_total,
           round(AVG(CASE WHEN correct THEN 1.0 ELSE 0.0 END), 6) AS accuracy
    FROM evaluated GROUP BY field_name
    """,
)
def q_eval_field_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+F6+A4: gt↔pred left join, matcher dispatch, per-field accuracy
    (reference: evaluators/field_evaluator.py:68-142)."""
    from .operators.evaluate import evaluate_fields, field_accuracy

    ev = evaluate_fields(_derived_gt(spark, sf_dir), _derived_pred(spark, sf_dir))
    return field_accuracy(ev).withColumn("accuracy", F.round("accuracy", 6))


@_q(
    "eval_doc_accuracy",
    _EVAL_BASE_SQL
    + """
    SELECT doc_id,
           round(AVG(CASE WHEN correct THEN 1.0 ELSE 0.0 END), 6) AS accuracy,
           (MIN(CASE WHEN correct THEN 1 ELSE 0 END) = 1) AS exact_match,
           COUNT(*) AS n_fields
    FROM evaluated GROUP BY doc_id
    """,
)
def q_eval_doc_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-document accuracy + exact-match flag
    (reference: evaluators/field_evaluator.py:15-66)."""
    from .operators.evaluate import doc_accuracy, evaluate_fields

    ev = evaluate_fields(_derived_gt(spark, sf_dir), _derived_pred(spark, sf_dir))
    return doc_accuracy(ev).withColumn("accuracy", F.round("accuracy", 6))


@_q(
    "eval_overall",
    _EVAL_BASE_SQL
    + """
    , per_doc AS (
      SELECT doc_id, AVG(CASE WHEN correct THEN 1.0 ELSE 0.0 END) AS accuracy,
             (MIN(CASE WHEN correct THEN 1 ELSE 0 END) = 1) AS exact_match
      FROM evaluated GROUP BY doc_id
    )
    SELECT round(AVG(accuracy), 6) AS mean_accuracy,
           round(AVG(CASE WHEN exact_match THEN 1.0 ELSE 0.0 END), 6) AS exact_match_rate,
           COUNT(*) AS n_docs
    FROM per_doc
    """,
)
def q_eval_overall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 global: mean accuracy + perfect-match rate."""
    from .operators.evaluate import doc_accuracy, evaluate_fields, overall_stats

    ev = evaluate_fields(_derived_gt(spark, sf_dir), _derived_pred(spark, sf_dir))
    out = overall_stats(doc_accuracy(ev))
    return out.select(
        F.round("mean_accuracy", 6).alias("mean_accuracy"),
        F.round("exact_match_rate", 6).alias("exact_match_rate"),
        "n_docs",
    )


# ---------------------------------------------------------------------------
# Sampling evaluation (A5/A6/W2) over per-sample correctness from lineitem.
# ---------------------------------------------------------------------------

_SAMPLES_SQL = """
  SELECT l_orderkey AS doc_id, l_linenumber AS sample_id,
         'f' || CAST(l_partkey % 3 AS VARCHAR) AS field_name,
         ((l_partkey + l_linenumber) % 3 = 0) AS correct
  FROM lineitem
"""


def _derived_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.col("l_orderkey").alias("doc_id"),
        F.col("l_linenumber").alias("sample_id"),
        F.concat(F.lit("f"), (F.col("l_partkey") % 3).cast("string")).alias("field_name"),
        ((F.col("l_partkey") + F.col("l_linenumber")) % 3 == 0).alias("correct"),
    )


@_q(
    "sampling_stats",
    f"""
    WITH samples AS ({_SAMPLES_SQL}),
    per_sample AS (
      SELECT doc_id, sample_id,
             AVG(CASE WHEN correct THEN 1.0 ELSE 0.0 END) AS accuracy,
             (MIN(CASE WHEN correct THEN 1 ELSE 0 END) = 1) AS exact_match
      FROM samples GROUP BY doc_id, sample_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY accuracy DESC, sample_id ASC) AS rn
      FROM per_sample
    )
    SELECT doc_id,
           round(AVG(accuracy), 6) AS mean_accuracy,
           round(MAX(accuracy), 6) AS max_accuracy,
           round(MIN(accuracy), 6) AS min_accuracy,
           (MAX(CASE WHEN exact_match THEN 1 ELSE 0 END) = 1) AS any_exact_match,
           COUNT(*) AS n_samples,
           MAX(CASE WHEN rn = 1 THEN sample_id END) AS best_sample_id
    FROM ranked GROUP BY doc_id
    """,
)
def q_sampling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/W2: per-doc over-samples stats, best-of-n by argmax accuracy
    (reference: evaluators/sampling_evaluator.py:67-114)."""
    from .operators.evaluate import sampling_stats

    out = sampling_stats(_derived_samples(spark, sf_dir))
    return out.select(
        "doc_id",
        F.round("mean_accuracy", 6).alias("mean_accuracy"),
        F.round("max_accuracy", 6).alias("max_accuracy"),
        F.round("min_accuracy", 6).alias("min_accuracy"),
        "any_exact_match",
        "n_samples",
        "best_sample_id",
    )


@_q(
    "sampling_effectiveness",
    f"""
    WITH samples AS ({_SAMPLES_SQL}),
    per_sample AS (
      SELECT doc_id, sample_id,
             AVG(CASE WHEN correct THEN 1.0 ELSE 0.0 END) AS accuracy
      FROM samples GROUP BY doc_id, sample_id
    ),
    per_doc AS (
      SELECT doc_id, MAX(accuracy) - AVG(accuracy) AS gap
      FROM per_sample GROUP BY doc_id
    )
    SELECT round(AVG(gap), 6) AS mean_improvement,
           round(MAX(gap), 6) AS max_improvement,
           round(MIN(gap), 6) AS min_improvement
    FROM per_doc
    """,
)
def q_sampling_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: global best-vs-mean improvement stats
    (reference: evaluators/sampling_evaluator.py:157-172)."""
    from .operators.evaluate import sampling_effectiveness, sampling_stats

    out = sampling_effectiveness(sampling_stats(_derived_samples(spark, sf_dir)))
    return out.select(
        F.round("mean_improvement", 6).alias("mean_improvement"),
        F.round("max_improvement", 6).alias("max_improvement"),
        F.round("min_improvement", 6).alias("min_improvement"),
    )


@_q(
    "confidence_bands",
    """
    SELECT band, COUNT(*) AS n FROM (
      SELECT CASE WHEN value - floor(value) < 0.65 THEN 'low'
                  WHEN value - floor(value) < 0.85 THEN 'medium'
                  ELSE 'high' END AS band
      FROM events
    ) GROUP BY band
    """,
)
def q_confidence_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: low/medium/high confidence banding
    (reference: apps/streamlit_viewer.py:106-111)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    frac = F.col("value") - F.floor("value")
    band = (
        F.when(frac < 0.65, "low").when(frac < 0.85, "medium").otherwise("high")
    )
    return ev.select(band.alias("band")).groupBy("band").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Matcher semantics (F1-F5) exposed directly: per-matcher match rates over
# value pairs derived deterministically from orders. One derivation, both
# engines; matcher expressions come from the shared templates.
# ---------------------------------------------------------------------------

_MATCHER_PAIRS_SQL = """
  SELECT o_orderkey AS pair_id, m.matcher,
    CASE m.matcher
      WHEN 'exact'    THEN o_orderstatus
      WHEN 'ci'       THEN 'Status-' || o_orderstatus
      WHEN 'numeric'  THEN CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) || ',000'
      WHEN 'date'     THEN strftime(o_orderdate, '%Y-%m-%d')
      ELSE CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) || '.00 USD'
    END AS gt,
    CASE m.matcher
      WHEN 'exact'    THEN CASE WHEN o_orderkey % 2 = 0 THEN o_orderstatus ELSE 'X' END
      WHEN 'ci'       THEN CASE WHEN o_orderkey % 2 = 0
                                THEN 'status-' || lower(o_orderstatus) ELSE 'zzz' END
      WHEN 'numeric'  THEN CAST(CAST(floor(o_totalprice) AS BIGINT) + o_orderkey % 3 AS VARCHAR)
                           || '000'
      WHEN 'date'     THEN CASE CAST(o_orderkey % 3 AS INT)
                             WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
                             WHEN 1 THEN strftime(o_orderdate, '%Y/%m/%d')
                             ELSE strftime(o_orderdate + INTERVAL 1 DAY, '%Y-%m-%d') END
      ELSE CASE CAST(o_orderkey % 3 AS INT)
             WHEN 0 THEN 'USD ' || CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR)
             WHEN 1 THEN CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) || '.00 EUR'
             ELSE 'N/A' END
    END AS pred
  FROM orders, (SELECT unnest(['exact','ci','numeric','date','currency']) AS matcher) m
"""


@_q(
    "matcher_semantics",
    f"""
    WITH pairs AS ({_MATCHER_PAIRS_SQL})
    SELECT matcher,
           CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
           COUNT(*) AS n_total
    FROM (
      SELECT matcher, coalesce(CASE matcher
        WHEN 'exact'    THEN {_M.render(_M.EXACT_SQL, "gt", "pred")}
        WHEN 'ci'       THEN {_M.render(_M.CI_SQL, "gt", "pred")}
        WHEN 'numeric'  THEN {_M.render(_M.NUMERIC_SQL, "gt", "pred", 1.0)}
        WHEN 'date'     THEN {_M.date_match_duckdb_sql("gt", "pred")}
        ELSE {_M.render(_M.CURRENCY_SQL, "gt", "pred", 0.01)} END, false) AS correct
      FROM pairs
    ) GROUP BY matcher
    """,
)
def q_matcher_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F5 (reference: utils/field_matcher.py:18-147): every matcher's
    verdict over derived (gt, pred) pairs — exact, case-insensitive,
    numeric (comma-strip + tolerance), date (same-format rule), currency
    (separator disambiguation + code check + N/A→0)."""
    from .functions import matchers as M

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(32, "o_orderkey")
    amt = F.floor("o_totalprice").cast("bigint").cast("string")
    date_iso = F.date_format("o_orderdate", "yyyy-MM-dd")
    k = F.col("o_orderkey")
    pair = lambda m, gt, pred: F.struct(  # noqa: E731
        F.lit(m).alias("matcher"), gt.alias("gt"), pred.alias("pred")
    )
    pairs = o.select(
        k.alias("pair_id"),
        F.explode(
            F.array(
                pair(
                    "exact",
                    F.col("o_orderstatus"),
                    F.when(k % 2 == 0, F.col("o_orderstatus")).otherwise(F.lit("X")),
                ),
                pair(
                    "ci",
                    F.concat(F.lit("Status-"), F.col("o_orderstatus")),
                    F.when(
                        k % 2 == 0,
                        F.concat(F.lit("status-"), F.lower("o_orderstatus")),
                    ).otherwise(F.lit("zzz")),
                ),
                pair(
                    "numeric",
                    F.concat(amt, F.lit(",000")),
                    F.concat(
                        (F.floor("o_totalprice").cast("bigint") + k % 3).cast("string"),
                        F.lit("000"),
                    ),
                ),
                pair(
                    "date",
                    date_iso,
                    F.when(k % 3 == 0, date_iso)
                    .when(k % 3 == 1, F.date_format("o_orderdate", "yyyy/MM/dd"))
                    .otherwise(
                        F.date_format(F.date_add("o_orderdate", 1), "yyyy-MM-dd")
                    ),
                ),
                pair(
                    "currency",
                    F.concat(amt, F.lit(".00 USD")),
                    F.when(k % 3 == 0, F.concat(F.lit("USD "), amt))
                    .when(k % 3 == 1, F.concat(amt, F.lit(".00 EUR")))
                    .otherwise(F.lit("N/A")),
                ),
            )
        ).alias("p"),
    ).select("pair_id", "p.matcher", "p.gt", "p.pred")
    registry = {m: m for m in ("ci", "date", "numeric", "currency")}
    correct = F.coalesce(
        M.dispatch_match(
            F.col("matcher"), F.col("gt"), F.col("pred"),
            registry=registry, numeric_tolerance=1.0,
        ),
        F.lit(False),
    )
    return (
        pairs.withColumn("correct", correct)
        .groupBy("matcher")
        .agg(
            F.sum(F.when(F.col("correct"), 1).otherwise(0)).alias("n_match"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


@_q(
    "annotator_union",
    """
    WITH legs AS (
      SELECT o_orderkey AS doc_id, 'leg_0' AS annotator_id, o_orderstatus AS value
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, 'leg_1', o_orderstatus FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, 'leg_2', o_orderstatus FROM orders WHERE o_orderkey % 5 = 0
    )
    SELECT doc_id, count(*) AS n_legs,
           min(annotator_id) AS first_leg, max(annotator_id) AS last_leg,
           count(DISTINCT value) AS n_distinct_values
    FROM legs GROUP BY doc_id
    """,
)
def q_annotator_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/J1 (reference: voters/manager.py:35-97): N-way annotator-leg
    fan-in as unionByName + groupBy(doc_id) — the collect_annotations
    directory walk re-expressed as a union of tagged DataFrames."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    legs = [
        o.filter(F.col("o_orderkey") % m == 0).select(
            F.col("o_orderkey").alias("doc_id"),
            F.lit(f"leg_{i}").alias("annotator_id"),
            F.col("o_orderstatus").alias("value"),
        )
        for i, m in enumerate((2, 3, 5))
    ]
    union = legs[0].unionByName(legs[1]).unionByName(legs[2])
    return union.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_legs"),
        F.min("annotator_id").alias("first_leg"),
        F.max("annotator_id").alias("last_leg"),
        F.countDistinct("value").alias("n_distinct_values"),
    )


# ---------------------------------------------------------------------------
# Training-data pipeline ops: dedup / similarity / text analysis.
# ---------------------------------------------------------------------------


@_q(
    "dedup_exact",
    """
    SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-digest groupBy, canonical row = min doc_id."""
    from .operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir))


@_q(
    "dedup_ngram_jaccard",
    """
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(w[i.g : i.g + 2], ' ') AS g
      FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(w) - 2, 0))) AS g) i
    ),
    grams_all AS (SELECT doc_id, g FROM grams WHERE g <> ''),
    rare AS (SELECT g FROM grams_all GROUP BY g HAVING count(*) <= 50),
    grams_ne AS (SELECT doc_id, grams_all.g FROM grams_all JOIN rare USING (g)),
    sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams_ne GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM grams_ne a JOIN grams_ne b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_common * 1.0 / (sa.n_grams + sb.n_grams - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common * 1.0 / (sa.n_grams + sb.n_grams - n_common) >= 0.8
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard near-dup pairs via inverted-index join with a
    document-frequency cap (df<=50) on shingles — boilerplate grams would
    otherwise contribute df^2 join rows each (hot-key blowup). Same cap in
    the oracle SQL; exact all-gram semantics covered by tests."""
    from .operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8, max_df=50)


@_q("dedup_minhash_lsh")
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (banded signatures; non-SQL kernel →
    rows-only check; recall vs exact jaccard pinned in tests/test_dedup.py)."""
    from .operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.5)


@_q("dedup_simhash")
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole chunk banding (rows-only)."""
    from .operators.dedup import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


@_q(
    "dedup_clusters",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(w[i.g : i.g + 2], ' ') AS g
      FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(w) - 2, 0))) AS g) i
    ),
    grams_all AS (SELECT doc_id, g FROM grams WHERE g <> ''),
    rare AS (SELECT g FROM grams_all GROUP BY g HAVING count(*) <= 50),
    grams_ne AS (SELECT doc_id, grams_all.g FROM grams_all JOIN rare USING (g)),
    sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams_ne GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM grams_ne a JOIN grams_ne b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common * 1.0 / (sa.n_grams + sb.n_grams - n_common) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    walk(node, lab) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.b, walk.lab FROM walk JOIN edges e ON e.a = walk.node
    ),
    comp AS (SELECT node, min(lab) AS cluster_id FROM walk GROUP BY node)
    SELECT d.doc_id,
           coalesce(c.cluster_id, d.doc_id) AS cluster_id,
           d.doc_id = coalesce(c.cluster_id, d.doc_id) AS keep
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair→cluster resolution: 3-gram Jaccard near-dup pairs (same df<=50
    cap as dedup_ngram_jaccard) → connected components via DataFrame
    min-label propagation with pointer jumping → complete keep/drop list
    (cluster_id = min doc_id of component, singletons keep themselves).
    Oracle: DuckDB recursive CTE reachability, min label per node. The
    sf0.01 corpus yields 23 natural components incl. a transitive size-3
    chain, so the closure semantics are load-bearing, not vacuous."""
    from .operators.dedup import dedup_clusters, ngram_jaccard_pairs

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, max_df=50)
    return dedup_clusters(pairs, docs=docs)


@_q(
    "similarity_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < 20),
    s AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, c.v) AS cos
      FROM q, e c WHERE q.vec_id <> c.vec_id
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id ASC) AS rn
      FROM s
    )
    SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, round(cos, 6) AS cosine
    FROM r WHERE rn <= 5
    """,
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 (JVM-side zip_with/aggregate math; the
    exactness baseline for the LSH ANN path)."""
    from .operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return brute_force_topk(emb.filter(F.col("vec_id") < 20), emb, k=5)


@_q("similarity_lsh_topk")
def q_similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via random-hyperplane LSH buckets + exact rerank
    (rows-only; recall vs brute force pinned in tests/test_similarity.py)."""
    from .operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_topk(emb.filter(F.col("vec_id") < 20), emb, k=5)


@_q("similarity_ivf_topk")
def q_similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5: coarse quantizer (deterministic Lloyd) + nprobe cell
    probing + exact rerank (rows-only; recall vs brute force pinned in
    tests/test_similarity.py)."""
    from .operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(emb.filter(F.col("vec_id") < 20), emb, k=5, n_cells=16, nprobe=4)


@_q(
    "embedding_near_dups",
    """
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 500
    ),
    planted AS (
      SELECT vec_id, v FROM base
      UNION ALL
      SELECT vec_id + 1000000, list_transform(v, x -> x * 1.001)
      FROM base WHERE vec_id < 50
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM planted a JOIN planted b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.9
    """,
)
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (LSH buckets + exact verify).
    The raw sf corpus has no pairs above 0.9, which would make this check
    vacuous — so the query plants scaled copies (cosine exactly 1, so a
    scaled copy collides with its original in EVERY hyperplane bucket:
    recall on planted pairs is structurally 1.0, making the exact-pairs
    DuckDB oracle a legitimate equality, not a lucky one). The oracle is
    the O(N²) all-pairs ground truth; the Spark plan stays the bucketed
    LSH + verify scale path."""
    from .operators.similarity import embedding_near_dups

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 500)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    copies = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    return embedding_near_dups(emb.unionByName(copies), threshold=0.9)


_LANG_CASE_SQL = """CASE WHEN greatest(h_en, h_code, h_data) = 0 THEN 'unknown'
                     WHEN h_code = greatest(h_en, h_code, h_data) THEN 'code'
                     WHEN h_data = greatest(h_en, h_code, h_data) THEN 'data'
                     ELSE 'en' END"""

_LANG_HITS_SQL = {
    "en": "len(list_filter(string_split(lower(text), ' '), x -> x IN ('the','a','of','and')))",
    "code": "len(list_filter(string_split(lower(text), ' '), x -> x IN ('spark','batch','stream','query')))",
    "data": "len(list_filter(string_split(lower(text), ' '), x -> x IN ('join','merge','sort','table')))",
}


@_q(
    "text_lang_id",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_LANG_HITS_SQL["en"]} AS h_en,
             {_LANG_HITS_SQL["code"]} AS h_code,
             {_LANG_HITS_SQL["data"]} AS h_data
      FROM documents
    ),
    labeled AS (
      SELECT doc_id, lang,
             {_LANG_CASE_SQL} AS lang_hat
      FROM scored
    )
    SELECT lang_hat, count(*) AS n_docs FROM labeled GROUP BY lang_hat
    """,
)
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic → label distribution."""
    from .functions.text import lang_id

    return (
        _docs(spark, sf_dir)
        .select(lang_id(F.col("text")).alias("lang_hat"))
        .groupBy("lang_hat")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_QUALITY_SQL = """
        (CASE WHEN len(list_filter(string_split(lower(text),' '), x -> x <> '')) BETWEEN 16 AND 512 THEN 0.25 ELSE 0.0 END)
      + (CASE WHEN (list_sum(list_transform(list_filter(string_split(lower(text),' '), x -> x <> ''), x -> length(x))) * 1.0
                    / len(list_filter(string_split(lower(text),' '), x -> x <> ''))) BETWEEN 3.0 AND 10.0 THEN 0.25 ELSE 0.0 END)
      + (CASE WHEN (len(list_filter(string_split(lower(text),' '), x -> x IN ('the','a','of','and','to','in'))) * 1.0
                    / len(list_filter(string_split(lower(text),' '), x -> x <> ''))) >= 0.01 THEN 0.25 ELSE 0.0 END)
      + (CASE WHEN len(regexp_extract_all(lower(text), '[a-z]')) > 0 THEN 0.25 ELSE 0.0 END)
"""


@_q(
    "text_quality",
    f"""
    WITH q AS (
      SELECT doc_id, {_QUALITY_SQL} AS quality
      FROM documents WHERE n_chars > 0
    )
    SELECT CAST(quality AS DOUBLE) AS quality, count(*) AS n_docs FROM q GROUP BY 1
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style quality-score distribution."""
    from .functions.text import quality_score

    return (
        _docs(spark, sf_dir)
        .filter(F.col("n_chars") > 0)
        .select(quality_score(F.col("text")).alias("quality"))
        .groupBy("quality")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@_q(
    "text_token_stats",
    """
    SELECT source,
           CAST(sum(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))) AS BIGINT) AS ws_tokens,
           CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS bpe_tokens,
           count(*) AS n_docs
    FROM documents GROUP BY source
    """,
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counting per source."""
    from .functions.text import token_count_bpe, token_count_ws

    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.sum(token_count_ws(F.col("text")).cast("long")).alias("ws_tokens"),
            F.sum(token_count_bpe(F.col("text")).cast("long")).alias("bpe_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


@_q(
    "text_fingerprint",
    """
    SELECT md5(array_to_string(list_sort(list_distinct(
             list_filter(string_split(lower(text), ' '), x -> x <> ''))), ' ')) AS fp,
           min(doc_id) AS keep_id, count(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary fingerprint dedup (order-insensitive content digest)."""
    from .functions.text import vocab_fingerprint

    return (
        _docs(spark, sf_dir)
        .select("doc_id", vocab_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


@_q(
    "text_repetition",
    """
    WITH toks AS (
      SELECT source, string_split(lower(text), ' ') AS w FROM documents
    ),
    rep AS (
      SELECT source,
             CASE WHEN len(w) >= 3
                  THEN 1.0 - CAST(len(list_distinct(
                         [array_to_string(w[g : g + 2], ' ')
                          for g in generate_series(1, len(w) - 2)])) AS DOUBLE)
                       / CAST(len(w) - 2 AS DOUBLE)
                  ELSE 0.0 END AS r
      FROM toks
    )
    SELECT source, count(*) AS n_docs,
           round(avg(r), 6) AS avg_repetition,
           CAST(SUM(CASE WHEN r > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repetitive
    FROM rep GROUP BY source
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate: 1 − distinct/total 3-grams per doc
    (functions/text.repetition_score), rolled up per source with a
    repetitive-doc count — the duplicated-ngram-fraction quality filter."""
    from .functions.text import repetition_score

    r = repetition_score(F.col("text"), n=3)
    return (
        _docs(spark, sf_dir)
        .select("source", r.alias("r"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("r"), 6).alias("avg_repetition"),
            F.sum(F.when(F.col("r") > 0.05, 1).otherwise(0)).cast("long").alias("n_repetitive"),
        )
    )


@_q(
    "decontaminate",
    """
    WITH bw AS (
      SELECT string_split(lower(text), ' ') AS w
      FROM documents WHERE doc_id % 97 = 0
    ),
    bench AS (
      SELECT DISTINCT array_to_string(b.w[i.g : i.g + 4], ' ') AS g
      FROM bw b, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(b.w) - 4, 0))) AS g
      ) i
      WHERE array_to_string(b.w[i.g : i.g + 4], ' ') <> ''
    ),
    train AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS w
      FROM documents WHERE doc_id % 97 <> 0
    ),
    tgrams AS (
      SELECT DISTINCT t.doc_id, array_to_string(t.w[i.g : i.g + 4], ' ') AS g
      FROM train t, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(t.w) - 4, 0))) AS g
      ) i
    ),
    contaminated AS (
      SELECT DISTINCT doc_id FROM tgrams JOIN bench USING (g)
    )
    SELECT source, count(*) AS n_clean
    FROM train WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    GROUP BY source
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.decontaminate): training
    docs sharing ANY 5-gram with the benchmark slice (doc_id % 97 == 0) are
    dropped — the standard n-gram-overlap rule for keeping eval sets out of
    pretraining corpora. Output = per-source clean counts."""
    from .operators.dedup import decontaminate

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    clean = decontaminate(train, bench, n=5)
    return clean.groupBy("source").agg(F.count(F.lit(1)).alias("n_clean"))


@_q(
    "corpus_curation",
    f"""
    WITH scored AS (
      SELECT doc_id, source, text,
             {_LANG_HITS_SQL["en"]} AS h_en,
             {_LANG_HITS_SQL["code"]} AS h_code,
             {_LANG_HITS_SQL["data"]} AS h_data,
             {_QUALITY_SQL} AS quality
      FROM documents WHERE n_chars > 0
    ),
    labeled AS (
      SELECT *, {_LANG_CASE_SQL} AS lang_hat
      FROM scored
    ),
    kept AS (
      SELECT doc_id, source, text FROM labeled
      WHERE lang_hat IN ('en', 'data') AND quality >= 0.75
    ),
    deduped AS (
      SELECT md5(text) AS digest, min(doc_id) AS doc_id, min(source) AS source,
             min(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))) AS n_tokens
      FROM kept GROUP BY md5(text)
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM deduped GROUP BY source
    """,
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data curation pipeline (C4/Gopher-style):
    language-ID filter → quality filter → exact dedup (keep min doc_id) →
    per-source token accounting. One declarative plan: Catalyst fuses the
    filters into the scan; the only shuffles are the dedup groupBy and the
    final per-source agg."""
    from .functions.text import lang_id, quality_score, token_count_ws

    docs = _docs(spark, sf_dir).filter(F.col("n_chars") > 0)
    kept = docs.filter(
        lang_id(F.col("text")).isin("en", "data")
        & (quality_score(F.col("text")) >= 0.75)
    )
    deduped = (
        kept.select(
            "doc_id", "source", F.md5("text").alias("digest"),
            token_count_ws(F.col("text")).cast("long").alias("n_tokens"),
        )
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("source").alias("source"),
            F.min("n_tokens").alias("n_tokens"),
        )
    )
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens")
    )


@_q(
    "pack_sequences",
    """
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                  AS BIGINT) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT source, doc_id, n_tokens,
             CAST(floor((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING) - n_tokens)
                        / 256.0) AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT source, pack_id, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed GROUP BY source, pack_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard assembly: contiguous greedy packing of documents into
    256-token packs per source stream (small budget so sf0.01 exercises multiple boundary crossings per stream) (operators/pack.py — one window
    cumsum, single exchange on the stream key; whole docs, crossing doc
    overflows its pack)."""
    from .functions.text import token_count_ws
    from .operators.pack import pack_sequences, pack_summary

    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", token_count_ws(F.col("text")).cast("long").alias("n_tokens")
    )
    return pack_summary(pack_sequences(docs, budget=256))


@_q(
    "training_pipeline",
    f"""
    WITH scored AS (
      SELECT doc_id, source, text,
             {_LANG_HITS_SQL["en"]} AS h_en,
             {_LANG_HITS_SQL["code"]} AS h_code,
             {_LANG_HITS_SQL["data"]} AS h_data,
             {_QUALITY_SQL} AS quality
      FROM documents WHERE n_chars > 0
    ),
    labeled AS (
      SELECT *, {_LANG_CASE_SQL} AS lang_hat
      FROM scored
    ),
    kept AS (
      SELECT doc_id, source, text FROM labeled
      WHERE lang_hat IN ('en', 'data') AND quality >= 0.75
    ),
    deduped AS (
      SELECT min(doc_id) AS doc_id, min(source) AS source,
             min(CAST(len(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS BIGINT)) AS n_tokens
      FROM kept GROUP BY md5(text)
    ),
    packed AS (
      SELECT source, doc_id, n_tokens,
             CAST(floor((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING) - n_tokens)
                        / 256.0) AS BIGINT) AS pack_id
      FROM deduped
    )
    SELECT source,
           count(DISTINCT pack_id) AS n_packs,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM packed GROUP BY source
    """,
)
def q_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data assembly as ONE declarative plan:
    language-ID + quality gate → exact dedup (keep min doc_id) → token
    accounting → greedy shard packing → per-source shard stats. Catalyst
    fuses the two filters into the scan; shuffles are the dedup groupBy,
    the per-stream pack window, and the final rollup — the same plan shape
    at 100 TB, keyed throughout by (source, digest/doc_id)."""
    from .functions.text import lang_id, quality_score, token_count_ws
    from .operators.pack import pack_sequences

    docs = _docs(spark, sf_dir).filter(F.col("n_chars") > 0)
    kept = docs.filter(
        lang_id(F.col("text")).isin("en", "data")
        & (quality_score(F.col("text")) >= 0.75)
    )
    deduped = (
        kept.select(
            "doc_id", "source", F.md5("text").alias("digest"),
            token_count_ws(F.col("text")).cast("long").alias("n_tokens"),
        )
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("source").alias("source"),
            F.min("n_tokens").alias("n_tokens"),
        )
        .drop("digest")
    )
    packed = pack_sequences(deduped, budget=256)
    return packed.groupBy("source").agg(
        F.countDistinct("pack_id").alias("n_packs"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@_q(
    "source_mixing",
    """
    WITH sampled AS (
      SELECT doc_id, source,
             (ascii(substr(md5(CAST(doc_id AS VARCHAR) || '#42'), 1, 1)) * 256
            + ascii(substr(md5(CAST(doc_id AS VARCHAR) || '#42'), 2, 1))) % 100
               AS bucket,
             CASE source WHEN 'src0' THEN 25 WHEN 'src1' THEN 50
                         WHEN 'src2' THEN 10 ELSE 100 END AS keep_pct
      FROM documents
    )
    SELECT source, count(*) AS n_docs
    FROM sampled WHERE bucket < keep_pct GROUP BY source
    """,
)
def q_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining source-mixing: deterministic per-source down-sampling
    (src0→25%, src1→50%, src2→10%, rest kept) via a pure-function-of-key
    bucket — membership survives re-partitioning and resume, unlike
    sampleBy's iteration-order-dependent Bernoulli draw (operators/pack.py:
    stratified_sample)."""
    from .operators.pack import stratified_sample

    out = stratified_sample(
        _docs(spark, sf_dir),
        rates={"src0": 0.25, "src1": 0.5, "src2": 0.10},
        default_rate=1.0,
    )
    return out.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))


@_q(
    "pii_scrub",
    """
    WITH raw AS (
      SELECT c_custkey, c_mktsegment,
             c_mktsegment || ' customer contact user' || CAST(c_custkey AS VARCHAR)
               || '@corp' || CAST(c_custkey % 7 AS VARCHAR) || '.example'
               || ' phone 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               || ' on file'
               AS text
      FROM customer
    ),
    no_email AS (
      SELECT c_mktsegment,
             len(regexp_extract_all(text,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS n_emails,
             regexp_replace(text,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}',
                 '[EMAIL]', 'g') AS t1
      FROM raw
    ),
    -- phones counted on the email-redacted intermediate: accounting must
    -- match the sequential replacement passes, not the raw text
    scrubbed AS (
      SELECT c_mktsegment, n_emails,
             len(regexp_extract_all(t1, '\\b\\d{3}-\\d{4}\\b')) AS n_phones,
             regexp_replace(t1, '\\b\\d{3}-\\d{4}\\b', '[PHONE]', 'g') AS clean
      FROM no_email
    )
    SELECT c_mktsegment AS segment,
           count(*) AS n_docs,
           CAST(sum(n_emails) AS BIGINT) AS emails_redacted,
           CAST(sum(n_phones) AS BIGINT) AS phones_redacted,
           min(md5(clean)) AS min_content_hash,
           max(md5(clean)) AS max_content_hash
    FROM scrubbed GROUP BY c_mktsegment
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction stage of a training-data pipeline:
    deterministic contact strings derived from the customer table, e-mail +
    phone patterns redacted JVM-side (regexp_replace, no UDF), per-segment
    redaction accounting. min/max md5 of the scrubbed text pins the ACTUAL
    redacted content cross-engine, not just the counts."""
    from .functions.text import pii_counts, scrub_pii

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    text = F.concat(
        F.col("c_mktsegment"), F.lit(" customer contact user"), k.cast("string"),
        F.lit("@corp"), (k % 7).cast("string"), F.lit(".example"),
        F.lit(" phone 555-"), F.lpad((k % 10000).cast("string"), 4, "0"),
        F.lit(" on file"),
    )
    n_emails, n_phones = pii_counts(text)
    rows = c.select(
        F.col("c_mktsegment").alias("segment"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(scrub_pii(text)).alias("clean_hash"),
    )
    return rows.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").cast("long").alias("emails_redacted"),
        F.sum("n_phones").cast("long").alias("phones_redacted"),
        F.min("clean_hash").alias("min_content_hash"),
        F.max("clean_hash").alias("max_content_hash"),
    )


@_q(
    "corpus_profile",
    """
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(CAST(n_chars AS DOUBLE)), 6) AS mean_chars,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           round(median(CAST(n_chars AS DOUBLE)), 6) AS median_chars
    FROM documents GROUP BY source
    """,
)
def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus statistics (count/sum/mean/min/max/exact median) —
    the profiling pass every curation run starts with (operators/pack.py)."""
    from .operators.pack import corpus_profile

    return corpus_profile(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Sinks / splits / media plumbing (K1-K4, O4, §multimodal).
# ---------------------------------------------------------------------------


@_q(
    "split_assignment",
    """
    SELECT split, count(*) AS n_docs FROM (
      SELECT CASE
        WHEN (ascii(substr(md5(CAST(doc_id AS VARCHAR) || '#42'), 1, 1)) * 256
            + ascii(substr(md5(CAST(doc_id AS VARCHAR) || '#42'), 2, 1))) % 100 < 80 THEN 'train'
        WHEN (ascii(substr(md5(CAST(doc_id AS VARCHAR) || '#42'), 1, 1)) * 256
            + ascii(substr(md5(CAST(doc_id AS VARCHAR) || '#42'), 2, 1))) % 100 < 90 THEN 'test'
        ELSE 'validation' END AS split
      FROM documents
    ) GROUP BY split
    """,
)
def q_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/K4: deterministic hash-bucket train/test/validation split
    (reference: utils/dataset_converter.py:112-145; contract = determinism
    + ratio, not HF bit-parity — SURVEY §7.3)."""
    from .sinks.export import split_column

    return (
        _docs(spark, sf_dir)
        .select(split_column(F.col("doc_id")).alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@_q(
    "split_sized",
    """
    WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 13),
    p AS (SELECT count(*) AS total FROM d),
    c AS (
      SELECT total,
             greatest(1, least(total - 1,
               CAST(round(total * 0.2::DOUBLE) AS BIGINT))) AS holdout
      FROM p
    ),
    c2 AS (
      SELECT total, holdout,
             CASE WHEN holdout > 1
                  THEN least(holdout - 1, greatest(1,
                    CAST(floor(holdout * (0.1::DOUBLE / 0.2::DOUBLE) + 0.5) AS BIGINT)))
                  ELSE 0 END AS val_n
      FROM c
    ),
    ranked AS (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '#42'), doc_id) AS rn
      FROM d
    )
    SELECT split, count(*) AS n_docs FROM (
      SELECT CASE WHEN rn <= val_n THEN 'validation'
                  WHEN rn <= holdout THEN 'test'
                  ELSE 'train' END AS split
      FROM ranked, c2
    ) GROUP BY split
    """,
)
def q_split_sized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/K4 exact-count split with the reference's tiny-corpus degeneracy
    contract (utils/dataset_converter.py:112-145): holdout =
    max(1, min(total-1, round(total·ratio))), train never empty, validation
    only when the holdout can hold it. Exercised on a 13-doc head of the
    corpus (the degenerate regime the hash-bucket split can't honor);
    1/2/3-doc edge cases pinned in tests/test_resume_sinks.py."""
    from .sinks.export import sized_split

    head = _docs(spark, sf_dir).select("doc_id").orderBy("doc_id").limit(13)
    return (
        sized_split(head, key_col="doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# The two sink formats are value-checked against committed GOLDEN parquet
# (repo ./golden/), generated by the PURE-PYTHON oracle chain — NOT by the
# engine — via scripts/make_goldens.py (synth.make_spans →
# kernel.merge.extract_document → literal formatting). The goldens pin the
# driver's comparison scale (sf0.01, the spec'd correctness gate);
# scripts/verify_contract.py skips these two value compares at other SFs.
_GOLDEN_DIR = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.dirname(__file__)), "golden"
)
GOLDEN_ORACLE_SF = "/root/testdata/sf0.01"
GOLDEN_ORACLE_QUERIES = {"tsv_span_sink", "doc_json_payloads"}


@_q(
    "tsv_span_sink",
    f"SELECT value FROM read_parquet('{_GOLDEN_DIR}/tsv_span_sink.parquet')",
)
def q_tsv_span_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: ordered TSV span lines. Value-checked against the pure-Python
    golden (see scripts/make_goldens.py); ordering additionally pinned by
    tests/test_resume_sinks.py (the driver canon is order-insensitive)."""
    from .operators.extract import extract_spans
    from .sinks.export import tsv_span_lines

    docs = synth.synthesize_documents(spark, sf_dir)
    return tsv_span_lines(extract_spans(docs))


@_q(
    "doc_json_payloads",
    f"SELECT doc_id, payload FROM read_parquet('{_GOLDEN_DIR}/doc_json_payloads.parquet')",
)
def q_doc_json_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: per-document JSON payload rows, value-checked against the
    pure-Python golden (Jackson-compact JSON == json.dumps with ':'/','
    separators — byte-equality verified at generation time)."""
    from .operators.extract import extract_spans, renest_spans
    from .sinks.export import doc_json_payload

    docs = synth.synthesize_documents(spark, sf_dir)
    nested = renest_spans(extract_spans(docs))
    return doc_json_payload(nested, ["spans"])


# Media rows derived from the documents table by a rule both engines can
# state; the (stubbed) decode is md5-arithmetic, so the ENTIRE media pipeline
# — derivation → mapInPandas decode → geometry math — is value-checked by
# DuckDB, not merely row-counted. The extraction-derived media path (spans →
# media refs) is pinned by tests/test_media_streaming.py.
_MEDIA_SQL = """
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         'media://' || source || '/' || CAST(doc_id AS VARCHAR) ||
           CASE WHEN doc_id % 3 = 0 THEN '.mp4' ELSE '.png' END AS media_ref,
         CASE WHEN doc_id % 3 = 0 THEN 'video' ELSE 'image' END AS kind
  FROM documents
"""

# DuckDB restatement of operators/media._fake_decode (md5-hex byte arithmetic)
_MEDIA_GEOM_SQL = """
  SELECT doc_id, media_ref, kind,
    CAST((64 + (ascii(substr(md5(media_ref),1,1))*256
              + ascii(substr(md5(media_ref),2,1))) % 1920)
         * CASE WHEN (ascii(substr(md5(media_ref),1,1))
                    + ascii(substr(md5(media_ref),2,1))) % 10 = 0
                THEN 64 ELSE 1 END AS INT) AS width,
    CAST((64 + (ascii(substr(md5(media_ref),3,1))*256
              + ascii(substr(md5(media_ref),4,1))) % 1080)
         * CASE WHEN (ascii(substr(md5(media_ref),1,1))
                    + ascii(substr(md5(media_ref),2,1))) % 10 = 0
                THEN 64 ELSE 1 END AS INT) AS height,
    CAST(CASE WHEN kind = 'image' THEN 1
              ELSE 1 + (ascii(substr(md5(media_ref),5,1))*256
                      + ascii(substr(md5(media_ref),6,1))) % 300 END AS INT) AS n_frames
  FROM media
"""


def _derived_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    k = F.col("doc_id")
    return d.select(
        k.cast("string").alias("doc_id"),
        F.concat(
            F.lit("media://"), F.col("source"), F.lit("/"), k.cast("string"),
            F.when(k % 3 == 0, F.lit(".mp4")).otherwise(F.lit(".png")),
        ).alias("media_ref"),
        F.when(k % 3 == 0, F.lit("video")).otherwise(F.lit("image")).alias("kind"),
    )


@_q(
    "media_features",
    f"""
    WITH media AS ({_MEDIA_SQL}), geom AS ({_MEDIA_GEOM_SQL})
    SELECT doc_id, media_ref, kind, width, height, n_frames,
           CAST(8 AS INT) AS feature_dim
    FROM geom
    """,
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: media rows → mapInPandas decode → typed metadata.
    Decode is the disclosed deterministic stub (no PIL in container) chosen
    to be md5-expressible so the oracle value-checks the geometry; the
    feature vector stays in the library API (arrays are unhashable for the
    driver canon) — here its shape is pinned via feature_dim."""
    from .operators.media import extract_media_features

    feats = extract_media_features(_derived_media(spark, sf_dir))
    return feats.select(
        "doc_id", "media_ref", "kind", "width", "height", "n_frames",
        F.size("feature").alias("feature_dim"),
    )


@_q(
    "media_payload_decode",
    """
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'video' ELSE 'image' END AS kind,
           CAST(4 + doc_id % 29 AS INT) AS width,
           CAST(3 + doc_id % 17 AS INT) AS height,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 + doc_id % 6 ELSE 1 END AS INT)
             AS n_frames
    FROM documents
    """,
)
def q_media_payload_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U7 REAL decode leg, strict (no fake geometry possible): synthesize
    actual BMP / PPM / animated-GIF / P6-stream bytes per document
    (synth.media_payload_row — real pixel data, real headers), decode them
    with the dependency-free parsers in kernel/imagecodec.py inside the
    mapInPandas kernel, and value-check the parsed geometry against the
    synthesis rule restated in SQL. Every format branch is exercised
    (ids mod 2/3/6 select BMP, PPM, GIF, and PPM-stream)."""
    from .operators.media import extract_media_features

    payloads = synth.synthesize_media_payloads(spark, sf_dir)
    feats = extract_media_features(payloads, strict=True)
    return feats.select("doc_id", "kind", "width", "height", "n_frames")


@_q(
    "windowed_rollup",
    """
    WITH b AS (
      SELECT make_timestamp(CAST(floor(epoch(ts) / 600) AS BIGINT) * 600 * 1000000)
               AS ws,
             event_type, value
      FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(ws + INTERVAL 10 MINUTE, '%Y-%m-%d %H:%M:%S') AS window_end,
           event_type,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM b GROUP BY ws, event_type
    """,
)
def q_windowed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time rollup — the BATCH twin of the watermarked
    streaming aggregation (streaming/windowed.py shares this exact
    definition, so the streamed result is oracle-checked transitively:
    tests pin streamed ≡ batch, this query pins batch ≡ SQL)."""
    from .streaming.windowed import windowed_event_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_event_counts(ev, window="10 minutes", watermark="30 minutes")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return out.select(
        F.date_format("window_start", fmt).alias("window_start"),
        F.date_format("window_end", fmt).alias("window_end"),
        "event_type", "n_events", "total_value",
    )


@_q(
    "sessionize",
    """
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    s AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM s GROUP BY user_id, sid
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user via the built-in
    ``session_window`` — merging/variable-length event-time windows, the
    stateful-aggregation shape a monitoring pipeline needs beyond tumbling
    windows. The oracle restates it as gaps-and-islands SQL (lag → island
    cumsum), pinning Spark's merge semantics (an event at EXACTLY
    last+gap still merges — the boundary is inclusive, pinned by
    tests/test_media_streaming.py::test_session_window_exact_gap_boundary;
    session end = last event + gap)."""
    from .streaming.windowed import session_event_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = session_event_counts(ev, gap="30 minutes", watermark="30 minutes")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id",
        F.date_format("session_start", fmt).alias("session_start"),
        F.date_format("session_end", fmt).alias("session_end"),
        "n_events", "total_value",
    )


@_q("streaming_increment")
def q_streaming_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: Structured Streaming incremental extraction — readStream over
    the docs location, per-micro-batch anti-join vs the committed snapshot,
    extract, snapshot commit (availableNow; shares the batch resume path).
    Returns a LAZY scan of the committed span table: the work dir is
    session-scoped (cleaned at process exit), never collected to the driver
    — at scale the committed table is the product, not a driver list."""
    import atexit
    import shutil
    import tempfile

    from .sources.tables import SnapshotTable
    from .streaming.incremental import start_incremental_extraction

    work = tempfile.mkdtemp(prefix="stream_inc_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    docs_path = f"{work}/docs"
    synth.synthesize_documents(spark, sf_dir).write.parquet(docs_path)
    q = start_incremental_extraction(
        spark, docs_path, f"{work}/table", f"{work}/ckpt", num_partitions=8
    )
    q.awaitTermination()
    out = SnapshotTable(spark, f"{work}/table").read_committed()
    return out.select("doc_id", "kind", "text", "media_ref", "offset")


@_q(
    "media_frame_sample",
    f"""
    WITH media AS ({_MEDIA_SQL}), geom AS ({_MEDIA_GEOM_SQL})
    SELECT g.doc_id, g.media_ref, CAST(f.fi AS INT) AS frame_idx
    FROM geom g, LATERAL (
      SELECT unnest(generate_series(0, g.n_frames - 1, 30)) AS fi
    ) f
    WHERE g.n_frames > 1
    """,
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: video frame-sampling plan (every-Nth-frame explode,
    JVM-side sequence — the per-frame decode would be a further kernel)."""
    from .operators.media import extract_media_features, frame_sample_plan

    feats = extract_media_features(_derived_media(spark, sf_dir))
    return frame_sample_plan(feats, every_n=30)


@_q(
    "media_resize_plan",
    f"""
    WITH media AS ({_MEDIA_SQL}), geom AS ({_MEDIA_GEOM_SQL}),
    r AS (
      SELECT *, CAST(width AS DOUBLE) * CAST(height AS DOUBLE) AS pixels,
             least(178956970.0, 20971520.0 / 3.0) AS cap
      FROM geom
    ),
    h AS (
      SELECT *, CAST(list_filter(generate_series(0, 30),
                       x -> pixels <= cap * power(4.0, CAST(x AS DOUBLE)))[1]
                AS INT) AS halvings
      FROM r
    )
    SELECT doc_id, media_ref, width, height, halvings,
           CAST(greatest(floor(width * power(2.0, -CAST(halvings AS DOUBLE))), 1) AS INT)
             AS target_width,
           CAST(greatest(floor(height * power(2.0, -CAST(halvings AS DOUBLE))), 1) AS INT)
             AS target_height,
           halvings > 0 AS needs_resize
    FROM h
    """,
)
def q_media_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: U7 resize-guard geometry (reference annotators/base.py:
    77-163 iterative halving as closed-form columnar math). The smallest-h
    search is comparison-only (no transcendental log), so the oracle is
    value-exact — see operators/media.resize_plan."""
    from .operators.media import extract_media_features, resize_plan

    feats = extract_media_features(_derived_media(spark, sf_dir))
    return resize_plan(feats).select(
        "doc_id", "media_ref", "width", "height",
        "halvings", "target_width", "target_height", "needs_resize",
    )


# ---------------------------------------------------------------------------
# JSON extraction chain (U2/U3/U5) over derived raw LLM-style outputs.
# ---------------------------------------------------------------------------


@_q(
    "json_parse_chain",
    """
    WITH raw AS (
      SELECT doc_id,
        CASE CAST(doc_id % 3 AS INT)
          WHEN 0 THEN 'reasoning prefix' || chr(10) || '```json' || chr(10)
                      || '{"v": "' || source || '"}' || chr(10) || '```'
          WHEN 1 THEN '{"v": "' || source || '"}'
          ELSE 'no json payload here at all'
        END AS raw_text
      FROM documents
    ),
    fenced AS (
      SELECT doc_id, raw_text,
             regexp_extract(raw_text, '(?s)```(?:json)?\n(.*?)\n```', 1) AS f
      FROM raw
    )
    SELECT doc_id,
           json_extract_string(
             CASE WHEN f <> '' AND json_valid(f) THEN f
                  WHEN json_valid(raw_text) THEN raw_text END, '$.v') AS v
    FROM fenced
    """,
)
def q_json_parse_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2/U3/U5 (reference: utils/formatter.py:28-68): fenced-block →
    whole-text → brace-scan JSON extraction chain, typed via from_json."""
    from .functions.json_extract import parse_result

    raw = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 3) == 0,
            F.concat(
                F.lit("reasoning prefix\n```json\n"),
                F.lit('{"v": "'), F.col("source"), F.lit('"}'),
                F.lit("\n```"),
            ),
        )
        .when(
            (F.col("doc_id") % 3) == 1,
            F.concat(F.lit('{"v": "'), F.col("source"), F.lit('"}')),
        )
        .otherwise(F.lit("no json payload here at all"))
        .alias("raw_text"),
    )
    return raw.select(
        "doc_id", parse_result(F.col("raw_text"), "struct<v string>")["v"].alias("v")
    )
