#!/usr/bin/env python
"""Generate golden parquet for the two engine-specific sink formats.

The goldens are produced by the PURE-PYTHON oracle chain (synth.make_spans →
kernel.merge.extract_document → literal string formatting) — NOT by the
Spark engine — so the driver's DuckDB oracle for ``tsv_span_sink`` and
``doc_json_payloads`` becomes a real value check instead of rows-only: the
oracle SQL just scans the committed golden files.

Regenerate (only needed if the synthesis rules or sink formats change):

    python scripts/make_goldens.py [sf_dir] [out_dir]

defaults: /root/testdata/sf0.01 → /root/repo/golden (the driver's
correctness gate runs at sf0.01; scripts/verify_contract.py skips the two
golden-backed value compares at other scales).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from openllm_ocr_annotator_spark.kernel.merge import extract_document
from openllm_ocr_annotator_spark.synth import make_documents_pdf

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden"
)

flat = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
docs = make_documents_pdf(flat)

tsv_lines: list[str] = []
json_rows: list[tuple[str, str]] = []
for doc_id, spans in zip(docs["doc_id"], docs["spans"]):
    out_spans = extract_document(list(spans))
    if not out_spans:
        continue  # empty docs produce no extracted rows → absent from sinks
    for s in out_spans:
        # sinks/export.tsv_span_lines: concat_ws("\t", doc_id, offset, kind,
        # text, media_ref) — all fields non-null strings/ints
        tsv_lines.append(
            f"{doc_id}\t{s['offset']}\t{s['kind']}\t{s['text']}\t{s['media_ref']}"
        )
    # sinks/export.doc_json_payload over renest_spans: to_json of
    # {"spans": [struct(kind, text, media_ref, offset), ...]} (the field
    # order renest_spans re-projects) — Jackson compact form == json.dumps
    # with ':'/',' separators, non-ASCII kept
    payload = json.dumps(
        {
            "spans": [
                {
                    "kind": s["kind"],
                    "text": s["text"],
                    "media_ref": s["media_ref"],
                    "offset": s["offset"],
                }
                for s in out_spans
            ]
        },
        separators=(",", ":"),
        ensure_ascii=False,
    )
    json_rows.append((doc_id, payload))

os.makedirs(OUT_DIR, exist_ok=True)
pq.write_table(
    pa.table({"value": pa.array(tsv_lines, pa.string())}),
    os.path.join(OUT_DIR, "tsv_span_sink.parquet"),
)
pq.write_table(
    pa.table(
        {
            "doc_id": pa.array([r[0] for r in json_rows], pa.string()),
            "payload": pa.array([r[1] for r in json_rows], pa.string()),
        }
    ),
    os.path.join(OUT_DIR, "doc_json_payloads.parquet"),
)
# --- real-BPE token counts (kernel/bpe.py, pure Python — no Spark) ---------
# trained with the SAME deterministic rule as operators/tokenize.
# train_bpe_from_corpus: first 200 docs by doc_id, 200 merges.
from openllm_ocr_annotator_spark.kernel import bpe as B  # noqa: E402

flat_all = pq.read_table(
    f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
).to_pandas().sort_values("doc_id")
sample = [str(t) for t in flat_all.head(200)["text"]]
ranks = B.merge_ranks(B.train_bpe(B.word_vocab(sample), 200))
cache: dict[str, int] = {}
counts = [
    (int(d), B.count_tokens(str(t), ranks, cache))
    for d, t in zip(flat_all["doc_id"], flat_all["text"])
]
pq.write_table(
    pa.table(
        {
            "doc_id": pa.array([c[0] for c in counts], pa.int64()),
            "n_tokens": pa.array([c[1] for c in counts], pa.int64()),
        }
    ),
    os.path.join(OUT_DIR, "bpe_token_counts.parquet"),
)
print(
    f"golden: {len(tsv_lines)} tsv lines, {len(json_rows)} json payloads, "
    f"{len(counts)} bpe counts → {OUT_DIR}"
)
