"""scripts/run_extraction_job.py: the spark-submit production surface.

Drives main() twice over the same input: first run extracts + commits,
second run is a no-op resume (north rule: resumable from checkpoint).
"""

from __future__ import annotations

import sys
from pathlib import Path

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"
sys.path.insert(0, str(SCRIPTS))


def test_extraction_job_resumes(spark, tmp_path):
    from run_extraction_job import main

    from openllm_ocr_annotator_spark.synth import synthesize_documents

    docs_path = str(tmp_path / "docs")
    table_root = str(tmp_path / "table")
    synthesize_documents(spark, "/root/testdata/sf0.001").write.parquet(docs_path)

    # main() creates its own session via get_spark; reuse the test master
    argv = ["--input", docs_path, "--table", table_root,
            "--partitions", "8", "--master", "local[4]"]
    first = main(argv)
    assert first["committed_spans"] > 0
    assert first["snapshot_id"] is not None

    second = main(argv)
    assert second["committed_spans"] == 0, "second run must resume, not rework"
