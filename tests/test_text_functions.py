"""Text-analysis functions vs hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from openllm_ocr_annotator_spark.functions import text as TX


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).first().v


def test_lang_id_markers(spark):
    assert _one(spark, "the cat and the dog of a house", TX.lang_id(F.col("text"))) == "en"
    assert _one(spark, "spark batch stream query spark", TX.lang_id(F.col("text"))) == "code"
    assert _one(spark, "join merge sort table join", TX.lang_id(F.col("text"))) == "data"
    assert _one(spark, "xyzzy plugh quux", TX.lang_id(F.col("text"))) == "unknown"
    # tie → alphabetically smallest label
    assert _one(spark, "the spark", TX.lang_id(F.col("text"))) == "code"


def test_token_counts(spark):
    assert _one(spark, "a b  c", TX.token_count_ws(F.col("text"))) == 3
    # 'hello,' → 'hello' + ',' ; 'world42' → 'world' + '42'
    assert _one(spark, "hello, world42", TX.token_count_bpe(F.col("text"))) == 4
    assert _one(spark, "", TX.token_count_ws(F.col("text"))) == 0


def test_stopword_ratio_and_mean_len(spark):
    assert _one(spark, "the cat", TX.stopword_ratio(F.col("text"))) == 0.5
    assert _one(spark, "ab abcd", TX.mean_word_len(F.col("text"))) == 3.0
    assert _one(spark, "", TX.stopword_ratio(F.col("text"))) == 0.0


def test_quality_score_components(spark):
    good = "the " + " ".join(f"word{i}" for i in range(20))  # 21 tokens, has stopword
    assert _one(spark, good, TX.quality_score(F.col("text"))) == 1.0
    assert _one(spark, "1 2 3", TX.quality_score(F.col("text"))) == 0.0  # no alpha, short
    assert _one(spark, "xx yy", TX.quality_score(F.col("text"))) == 0.25  # alpha only


def test_vocab_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame([("b a c",), ("c b a",), ("a b d",)], "text string")
    fps = [r.fp for r in df.select(TX.vocab_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_pack_sequences_greedy_contract(spark):
    """Contiguous greedy packing: docs in order fill a pack until the
    cumulative crosses the budget; the crossing doc overflows (whole docs,
    never split); packs are per-stream."""
    from openllm_ocr_annotator_spark.operators.pack import (
        pack_sequences,
        pack_summary,
    )

    rows = [
        ("a", "d1", 600), ("a", "d2", 600), ("a", "d3", 600),  # 600,1200,1800
        ("a", "d4", 600),                                       # 2400 → crosses
        ("a", "d5", 600),
        ("b", "d1", 3000),                                      # oversized doc
        ("b", "d2", 10),
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id string, n_tokens long")
    got = {(r.source, r.doc_id): r.pack_id
           for r in pack_sequences(docs, budget=2048).collect()}
    # pack_id = floor(cumsum_exclusive / budget)
    assert got[("a", "d1")] == 0 and got[("a", "d2")] == 0 and got[("a", "d3")] == 0
    assert got[("a", "d4")] == 0      # starts at 1800 < 2048 → overflows pack 0
    assert got[("a", "d5")] == 1      # starts at 2400
    assert got[("b", "d1")] == 0      # oversized doc gets its own pack start
    assert got[("b", "d2")] == 1
    summary = {(r.source, r.pack_id): (r.n_docs, r.pack_tokens)
               for r in pack_summary(pack_sequences(docs, budget=2048)).collect()}
    assert summary[("a", 0)] == (4, 2400)
    assert summary[("b", 0)] == (1, 3000)


def test_fixed_windows_hand_computed(spark):
    """GPT-style chunking: concatenate the stream, cut every 128 tokens,
    docs span boundaries. Hand-computed overlaps for one stream."""
    from openllm_ocr_annotator_spark.operators.pack import (
        fixed_windows,
        window_summary,
    )

    rows = [
        ("a", "d0", 100), ("a", "d1", 200), ("a", "d2", 60),
        ("a", "d3", 0),   # zero-token doc → no rows
        ("a", "d4", 50),
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id string, n_tokens long")
    got = {(r.doc_id, r.window_id): r.window_tokens
           for r in fixed_windows(docs, window=128).collect()}
    assert got == {
        ("d0", 0): 100,
        ("d1", 0): 28, ("d1", 1): 128, ("d1", 2): 44,
        ("d2", 2): 60,
        ("d4", 2): 24, ("d4", 3): 26,
    }
    fills = {r.window_id: (r.n_docs, r.window_tokens)
             for r in window_summary(fixed_windows(docs, window=128)).collect()}
    # every window full except the stream's last
    assert fills == {0: (2, 128), 1: (1, 128), 2: (3, 128), 3: (1, 26)}


def test_fixed_windows_invariants(spark):
    """Per-doc overlap sums equal token counts; boundary-aligned docs emit
    no empty rows; non-positive window rejected."""
    import pytest

    from openllm_ocr_annotator_spark.operators.pack import fixed_windows

    rows = [("a", f"d{i}", (7 * i) % 130) for i in range(40)] + [("b", "x", 128)]
    docs = spark.createDataFrame(rows, "source string, doc_id string, n_tokens long")
    per_doc = (
        fixed_windows(docs, window=128)
        .groupBy("source", "doc_id")
        .agg(F.sum("window_tokens").alias("t"))
    )
    orig = {(r.source, r.doc_id): r.n_tokens
            for r in docs.filter("n_tokens > 0").collect()}
    got = {(r.source, r.doc_id): r.t for r in per_doc.collect()}
    assert got == orig
    # a doc ending exactly on a boundary stays within its window
    b_rows = fixed_windows(docs, window=128).filter("source = 'b'").collect()
    assert [(r.window_id, r.window_tokens) for r in b_rows] == [(0, 128)]
    with pytest.raises(ValueError):
        fixed_windows(docs, window=0)


def test_pack_sequences_dense_reset_contract(spark):
    """DENSE reset-on-overflow packing (VERDICT r3 #7): a doc joins the
    current pack iff it FITS; otherwise it OPENS the next pack (contrast
    with the boundary packer, where the crossing doc overflows its pack).
    Ids are consecutive 0,1,2,… per stream."""
    from openllm_ocr_annotator_spark.operators.pack import (
        greedy_pack_ids,
        pack_sequences_dense,
    )

    # Pure kernel first: the recurrence the Spark path must reproduce.
    assert greedy_pack_ids([600, 600, 600, 600, 600], 2048) == [0, 0, 0, 1, 1]
    assert greedy_pack_ids([3000, 10], 2048) == [0, 1]  # oversized → own pack
    assert greedy_pack_ids([], 2048) == []

    rows = [
        ("a", "d1", 600), ("a", "d2", 600), ("a", "d3", 600),
        ("a", "d4", 600),   # 1800+600 > 2048 → RESET: d4 opens pack 1
        ("a", "d5", 600),   # 600+600 fits → stays in pack 1
        ("b", "d1", 3000),  # oversized doc: own pack 0
        ("b", "d2", 10),    # 3000+10 > 2048 → pack 1
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id string, n_tokens long")
    got = {(r.source, r.doc_id): r.pack_id
           for r in pack_sequences_dense(docs, budget=2048).collect()}
    assert got[("a", "d1")] == 0 and got[("a", "d2")] == 0 and got[("a", "d3")] == 0
    assert got[("a", "d4")] == 1  # the boundary packer keeps d4 in pack 0
    assert got[("a", "d5")] == 1
    assert got[("b", "d1")] == 0 and got[("b", "d2")] == 1
    # Dense invariant: every pack except possibly a stream's last holds
    # <= budget tokens (oversized single docs aside) and ids are dense.
    ids_a = sorted(pid for (s, _), pid in got.items() if s == "a")
    assert ids_a == [0, 0, 0, 1, 1]


def test_corpus_profile_exact_stats(spark):
    from openllm_ocr_annotator_spark.operators.pack import corpus_profile

    rows = [("a", 10), ("a", 20), ("a", 40), ("a", 50), ("b", 7)]
    docs = spark.createDataFrame(rows, "source string, n_chars int")
    got = {r.source: r for r in corpus_profile(docs).collect()}
    assert got["a"].n_docs == 4 and got["a"].total_chars == 120
    assert got["a"].mean_chars == 30.0
    assert got["a"].median_chars == 30.0  # interpolated even-count median
    assert (got["a"].min_chars, got["a"].max_chars) == (10, 50)
    assert got["b"].median_chars == 7.0
    # The 100 TB knob (VERDICT r3 #9): percentile_approx swap-in keeps the
    # schema and the non-median columns bit-identical; the sketch returns
    # an actual group element rather than the even-count interpolation.
    approx = {r.source: r for r in corpus_profile(docs, exact=False).collect()}
    assert corpus_profile(docs, exact=False).schema == corpus_profile(docs).schema
    assert approx["b"].median_chars == 7.0
    assert approx["a"].median_chars in (20.0, 30.0, 40.0)
    for s in ("a", "b"):
        assert (approx[s].n_docs, approx[s].total_chars, approx[s].mean_chars) == (
            got[s].n_docs, got[s].total_chars, got[s].mean_chars)


def test_stratified_sample_deterministic_and_rate_accurate(spark):
    from openllm_ocr_annotator_spark.operators.pack import stratified_sample

    docs = spark.range(4000).selectExpr(
        "id AS doc_id", "concat('s', CAST(id % 4 AS STRING)) AS source"
    )
    rates = {"s0": 0.25, "s1": 0.5, "s2": 0.0}
    a = stratified_sample(docs, rates, default_rate=1.0)
    counts = {r.source: r.n for r in
              a.groupBy("source").agg(__import__('pyspark').sql.functions.count("*").alias("n")).collect()}
    # hash buckets are percent-granular: expect ~rate*1000 per stratum
    assert 0.18 < counts["s0"] / 1000 < 0.32
    assert 0.42 < counts["s1"] / 1000 < 0.58
    assert "s2" not in counts            # rate 0 → everything dropped
    assert counts["s3"] == 1000          # default rate keeps all
    # pure function of key: identical membership on re-run and re-partition
    b = stratified_sample(docs.repartition(13), rates, default_rate=1.0)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_scrub_pii_redacts_and_counts(spark):
    from pyspark.sql import functions as F

    from openllm_ocr_annotator_spark.functions.text import pii_counts, scrub_pii

    rows = [
        ("a", "reach me at jane.doe+x@sub.example.org or 555-0199 thanks"),
        ("b", "two mails a@b.co c%d@e-f.io and numbers 123-4567 12-3456"),
        ("c", "nothing sensitive here 1234567"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    ne, np_ = pii_counts(F.col("text"))
    got = {
        r.id: (r.clean, r.ne, r.np)
        for r in df.select(
            "id", scrub_pii(F.col("text")).alias("clean"),
            ne.alias("ne"), np_.alias("np"),
        ).collect()
    }
    assert got["a"] == ("reach me at [EMAIL] or [PHONE] thanks", 1, 1)
    assert got["b"][0] == "two mails [EMAIL] [EMAIL] and numbers [PHONE] 12-3456"
    assert got["b"][1:] == (2, 1)          # 12-3456 fails the \d{3}- shape
    assert got["c"] == ("nothing sensitive here 1234567", 0, 0)


def test_pii_counts_match_sequential_replacement(spark):
    """Accounting must mirror the sequential scrub passes: a phone-shaped
    string swallowed by the e-mail redaction is ONE e-mail, zero phones."""
    from pyspark.sql import functions as F

    from openllm_ocr_annotator_spark.functions.text import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [("x", "call 555-1234@mail.com now")], "id string, text string"
    )
    ne, np_ = pii_counts(F.col("text"))
    r = df.select(
        scrub_pii(F.col("text")).alias("clean"), ne.alias("ne"), np_.alias("np")
    ).collect()[0]
    assert r.clean == "call [EMAIL] now"
    assert (r.ne, r.np) == (1, 0)


def test_bigram_lm_semantics():
    """Stupid-backoff scoring: in-domain text scores lower perplexity than
    out-of-domain; seen bigrams beat backoff; OOV hits the floor."""
    import math

    from openllm_ocr_annotator_spark.kernel import lm as L

    model = L.train_bigram_lm(
        ["the quick brown fox jumps", "the quick brown dog runs"] * 5
    )
    in_dom = L.perplexity("the quick brown fox", model)
    out_dom = L.perplexity("zebra xylophone quantum flux", model)
    assert in_dom < out_dom
    # deterministic
    assert in_dom == L.perplexity("the quick brown fox", model)
    # empty doc: no tokens → inf
    assert L.perplexity("", model) == float("inf")
    # seen start bigram: P(the|BOS) = 10/10 = 1 → contributes log(1)=0
    lp, n = L.doc_logprob("the", model)
    assert n == 1 and lp == 0.0
    # OOV word: alpha * 1/total
    lp, n = L.doc_logprob("zzz", model)
    assert math.isclose(lp, math.log(0.4 / model.total))


def test_lm_spark_scoring_matches_kernel(spark):
    from pyspark.sql import functions as F

    from openllm_ocr_annotator_spark.kernel import lm as L
    from openllm_ocr_annotator_spark.operators.perplexity import (
        perplexity_filter,
        score_perplexity,
        train_lm_from_sources,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "text"
    )
    lm = train_lm_from_sources(docs, ["src0", "src1"], sample_docs=50)
    got = {r.doc_id: r.perplexity for r in score_perplexity(docs, lm).collect()}
    pdf = docs.orderBy("doc_id").toPandas()
    for d, t in zip(pdf["doc_id"], pdf["text"]):
        assert got[d] == L.perplexity(str(t), lm), f"doc {d}"
    # the filter keeps exactly the at-or-below-budget docs
    thr = sorted(got.values())[len(got) // 2]
    kept = {r.doc_id for r in perplexity_filter(docs, lm, thr).collect()}
    assert kept == {d for d, p in got.items() if p <= thr}


def test_mixture_rates_temperature_contract(spark):
    """τ=0.5 rates: smallest source keeps rate 1; expected kept counts are
    proportional to sqrt(c_i); feeding the rates into stratified_sample
    composes (rates are percent-granular there — documented)."""
    import math

    from openllm_ocr_annotator_spark.operators.pack import mixture_rates

    rows = [(i, "big") for i in range(400)] + [(i + 1000, "small") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r.stratum: (r.n_docs, r.rate) for r in mixture_rates(docs).collect()}
    assert got["small"] == (100, 1.0)
    assert math.isclose(got["big"][1], math.sqrt(100 / 400), rel_tol=1e-6)
    # expected kept ∝ sqrt(c): 400*0.5 = 200, 100*1.0 = 100 → ratio 2 = sqrt(400/100)
    assert math.isclose(400 * got["big"][1] / (100 * got["small"][1]), 2.0, rel_tol=1e-6)


def test_mixture_rates_dyadic_taus(spark):
    """τ=0.25 / 0.75 via sqrt compositions (VERDICT r3 #5): rates equal
    (min_c / c)^(1-τ) and use NO pow() in the plan — pure-math cross-check
    for both dyadic temperatures, plus flattening ordering (smaller τ
    flattens harder → lower rate for the big source)."""
    import math

    from openllm_ocr_annotator_spark.operators.pack import mixture_rates

    rows = [(i, "big") for i in range(400)] + [(i + 1000, "small") for i in range(25)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    r25 = {r.stratum: r.rate for r in mixture_rates(docs, temperature=0.25).collect()}
    r75 = {r.stratum: r.rate for r in mixture_rates(docs, temperature=0.75).collect()}
    assert r25["small"] == 1.0 and r75["small"] == 1.0
    assert math.isclose(r25["big"], (25 / 400) ** 0.75, rel_tol=1e-6)
    assert math.isclose(r75["big"], (25 / 400) ** 0.25, rel_tol=1e-6)
    assert r25["big"] < 0.5 ** (2 * 1.5) + 1e-9  # harder flattening at τ=0.25
    assert r25["big"] < r75["big"]
    # the dyadic paths must not contain a pow() call (libm-portability pin)
    for tau in (0.25, 0.5, 0.75):
        plan = mixture_rates(docs, temperature=tau)._jdf.queryExecution().toString()
        assert "POWER" not in plan.upper(), f"tau={tau} uses pow()"


def test_ngram_lm_stupid_backoff_semantics():
    """5-gram stupid backoff (VERDICT r3 #6): longest matching order wins,
    each backoff step multiplies by alpha, OOV bottoms out at
    alpha^(order-1) / total; a literal '<s>' token cannot collide with the
    start pad (escaped-token keyspace)."""
    import math

    import pytest

    from openllm_ocr_annotator_spark.kernel import lm as L

    m = L.train_ngram_lm(
        ["the quick brown fox jumps", "the quick brown fox sleeps"], order=5
    )
    # full 5-gram match: P(jumps | <s> the quick brown fox ... ) — context
    # 'the quick brown fox' seen twice, continuation 'jumps' once → 1/2
    lp, n = L.ngram_doc_logprob("the quick brown fox jumps", m)
    assert n == 5
    # first four words are deterministic continuations (prob 1 each)
    assert math.isclose(lp, math.log(0.5), rel_tol=1e-12)
    # OOV word: alpha^(order-1) * 1/total
    lp1, _ = L.ngram_doc_logprob("zzz", m)
    assert math.isclose(lp1, math.log(L.ALPHA ** 4 / m.total), rel_tol=1e-12)
    # in-domain scores lower perplexity than shuffled text
    assert L.ngram_perplexity("the quick brown fox jumps", m) < L.ngram_perplexity(
        "fox the jumps quick brown", m
    )
    # literal '<s>' tokens in text are ordinary tokens, not the pad
    m2 = L.train_ngram_lm(["<s> hello"], order=3)
    assert L.ngram_perplexity("<s> hello", m2) < L.ngram_perplexity("pad hello", m2)
    with pytest.raises(ValueError, match="order"):
        L.train_ngram_lm(["x"], order=1)


def test_ngram_spark_scoring_matches_kernel(spark):
    """Distributed 5-gram scoring == the sequential kernel replay (the
    golden contract), through the same operator surface as the bigram."""
    from openllm_ocr_annotator_spark.kernel import lm as L
    from openllm_ocr_annotator_spark.operators.perplexity import (
        score_perplexity,
        train_lm_from_sources,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "text"
    )
    lm = train_lm_from_sources(docs, ["src0", "src1"], sample_docs=50, order=5)
    assert isinstance(lm, L.NgramLM) and lm.order == 5
    got = {r.doc_id: r.perplexity for r in score_perplexity(docs, lm).collect()}
    pdf = docs.orderBy("doc_id").toPandas()
    for d, t in zip(pdf["doc_id"], pdf["text"]):
        assert got[d] == L.ngram_perplexity(str(t), lm), f"doc {d}"


def test_gopher_gates_per_rule(spark):
    """Each Gopher rule (Rae et al. 2021, A.1.1) trips independently on a
    doc built to violate exactly that rule, and a clean doc passes all."""
    filler = " ".join(f"word{i}" for i in range(55))
    docs = {
        "clean": "the be to of and " + filler,
        "too_short": "that have cats",
        "symbols": "the be to of and " + filler + " # # # # # # #",
        "no_stopwords": " ".join(f"word{i}" for i in range(60)),
        "repetitive": "the be " + "spam ham " * 30,
    }
    df = spark.createDataFrame(list(docs.items()), "name string, text string")
    gates = TX.gopher_gates(F.col("text"))
    rows = {
        r.name: r.asDict()
        for r in df.select("name", *[c.alias(k) for k, c in gates.items()]).collect()
    }
    assert rows["clean"]["keep"] is True
    assert all(v for k, v in rows["clean"].items() if k.startswith("g_"))
    expect_broken = {
        "too_short": "g_word_count",
        "symbols": "g_symbol_ratio",
        "no_stopwords": "g_stopwords",
        "repetitive": "g_repetition",
    }
    for name, broken in expect_broken.items():
        r = rows[name]
        assert r["keep"] is False, name
        assert r[broken] is False, (name, broken)
        others = [k for k in r if k.startswith("g_") and k != broken]
        assert all(r[k] for k in others), (name, [k for k in others if not r[k]])


def test_budget_select_greedy_prefix_contract(spark):
    from openllm_ocr_annotator_spark.operators.pack import budget_select

    docs = spark.createDataFrame(
        [
            # source a, budget 100: ranked by (score desc, id asc):
            # id2(60) cum60 keep, id1(40) cum100 keep (== budget),
            # id3(0) cum100 keep (zero-token doc at EXHAUSTED budget),
            # id4(20) cum120 DROP, id5(10) cum130 drop (prefix rule: once
            # over budget nothing later re-enters)
            (1, "a", 0.9, 40), (2, "a", 1.0, 60), (3, "a", 0.9, 0),
            (4, "a", 0.9, 20), (5, "a", 0.5, 10),
            # source b, budget 1000: everything fits
            (6, "b", 0.1, 400), (7, "b", 0.2, 500),
        ],
        "doc_id long, source string, score double, n_tokens long",
    )
    budgets = spark.createDataFrame(
        [("a", 100), ("b", 1000)], "source string, token_budget long"
    )
    for method in ("window", "threshold"):
        kept = sorted(
            r.doc_id
            for r in budget_select(docs, budgets, method=method).collect()
        )
        assert kept == [1, 2, 3, 6, 7], method
    # tie-break inside one score: id ASC wins the remaining budget
    tie = spark.createDataFrame(
        [(10, "a", 0.5, 50), (11, "a", 0.5, 50), (12, "a", 0.5, 50)],
        "doc_id long, source string, score double, n_tokens long",
    )
    b2 = spark.createDataFrame([("a", 100)], "source string, token_budget long")
    for method in ("window", "threshold"):
        kept = sorted(r.doc_id for r in budget_select(tie, b2, method=method).collect())
        assert kept == [10, 11], method
    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        budget_select(docs, budgets, method="nope")


def test_budget_select_methods_agree_on_corpus(spark):
    """window ≡ threshold on the real corpus with coarse bins (n_bins=4
    forces nearly every source through the partial-bin path) and with fine
    bins (boundary bin nearly empty)."""
    from openllm_ocr_annotator_spark.functions.text import quality_score, token_count_ws
    from openllm_ocr_annotator_spark.operators.pack import budget_select

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            "doc_id",
            "source",
            quality_score(F.col("text")).alias("score"),
            token_count_ws(F.col("text")).cast("long").alias("n_tokens"),
        )
    )
    budgets = docs.groupBy("source").agg(
        F.floor(F.sum("n_tokens") * 0.4).cast("long").alias("token_budget")
    )
    want = sorted(
        r.doc_id for r in budget_select(docs, budgets, method="window").collect()
    )
    assert 0 < len(want) < docs.count()
    for bins in (4, 1024):
        got = sorted(
            r.doc_id
            for r in budget_select(docs, budgets, method="threshold", n_bins=bins).collect()
        )
        assert got == want, f"n_bins={bins}"


def test_pack_sequences_composite_stream_key_scale_path(spark):
    """The 10^12-doc scale path: a derived (source # doc_id%k) stream
    column bounds every packing window to 1/k of a source while each
    stream's pack ids still replay the exclusive-cumsum formula exactly."""
    from pyspark.sql import functions as F

    from openllm_ocr_annotator_spark.operators.pack import pack_sequences

    rows = [(i, f"src{i % 2}", 10 + (i * 7) % 90) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    fine = docs.withColumn(
        "stream",
        F.concat("source", F.lit("#"), (F.col("doc_id") % 5).cast("string")),
    )
    packed = pack_sequences(fine, budget=100, stream_col="stream")
    got = sorted(
        (r.stream, r.doc_id, r.n_tokens, r.pack_id) for r in packed.collect()
    )

    # sequential replay of the boundary-packing formula per stream
    by_stream: dict = {}
    for stream, doc_id, n_tokens, pack_id in got:
        by_stream.setdefault(stream, []).append((doc_id, n_tokens, pack_id))
    assert len(by_stream) == 10  # 2 sources x 5 coprime buckets
    for stream, items in by_stream.items():
        acc = 0
        for doc_id, n_tokens, pack_id in sorted(items):
            assert pack_id == acc // 100, (stream, doc_id)
            acc += n_tokens

    # the window exchange partitions on the COMPOSITE key
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(stream" in plan


def test_mixture_epochs_upsamples_low_resource_sources(spark):
    """Skewed strata: epochs must exceed 1 for the small source (true
    upsampling — the step mixture_rates deliberately does not take),
    shares must sum to ~1, and the budget must be conserved:
    sum(epochs_i * c_i) == budget."""
    from openllm_ocr_annotator_spark.operators.pack import mixture_epochs

    rows = [(i, "big" if i < 900 else ("mid" if i < 990 else "small"))
            for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r.stratum: r for r in mixture_epochs(docs, budget=1000.0).collect()}
    assert got["big"].n_docs == 900 and got["small"].n_docs == 10
    # tau=0.5 flattening: small source repeated, big source subsampled
    assert got["small"].epochs > 1.0 > got["big"].epochs
    assert got["small"].epochs > got["mid"].epochs > got["big"].epochs
    assert abs(sum(r.share for r in got.values()) - 1.0) < 1e-6
    assert abs(sum(r.epochs * r.n_docs for r in got.values()) - 1000.0) < 1e-2
