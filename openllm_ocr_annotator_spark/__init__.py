"""openllm_ocr_annotator_spark — a PySpark-native extraction engine.

A from-scratch re-expression of the query/data-processing capabilities of
``diqiuzhuanzhuan/openllm-ocr-annotator`` (reference read-only at
``/root/reference/``) as idiomatic Spark: DataFrame/SQL plans optimized by
Catalyst, with a single vectorized pandas/Arrow kernel (``mapInPandas``)
replacing the reference's per-image LLM annotation loop
(reference: src/openllm_ocr_annotator/pipeline/run_annotation.py:157-208).

Layout
------
- ``kernel/``     pure-Python/NumPy extraction kernel (DOM tokenizer,
                  boilerplate scorer, layout segmenter, span merge) — shared
                  between the Spark operator and the pytest oracle.
- ``operators/``  Spark operators: extract, vote, evaluate, dedup,
                  similarity, resume.
- ``functions/``  column-expression libraries: field matchers, JSON
                  extraction chain, text-analysis functions.
- ``sources/``    table registry + snapshot/manifest layer (Iceberg-style
                  resume semantics on plain parquet).
- ``sinks/``      JSONL / TSV-span / split-parquet exports.
- ``streaming/``  incremental (readStream + foreachBatch) variant of the
                  resume anti-join.
"""

__version__ = "0.1.0"
