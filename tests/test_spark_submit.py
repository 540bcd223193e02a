"""Real ``spark-submit --py-files`` shipping test.

The north rule says the job ships via ``spark-submit --py-files`` to the
cluster. The in-process test (test_extraction_job.py) proves resume
semantics but not the shipping path: when main() runs from the repo, the
package is importable from the source tree, so a packaging bug (missing
module in the zip, repo-relative import, cwd dependence) would never
surface. This test builds the zip exactly as the script's docstring
documents, copies the entry script OUTSIDE the repo, strips PYTHONPATH,
and runs the real ``bin/spark-submit`` from a non-repo cwd — the package
can only arrive through ``--py-files``. Run twice: extract+commit, then
no-op resume.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pyspark

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = Path(pyspark.__file__).parent / "bin" / "spark-submit"


def _run_job(spark_submit_args: list[str], cwd: Path) -> dict:
    env = dict(os.environ)
    # the package must come from --py-files, not the repo checkout
    env.pop("PYTHONPATH", None)
    env.pop("SPARK_GRAFT_MASTER", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        spark_submit_args, cwd=str(cwd), env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"
    # the job prints ONE JSON line on stdout (Spark banners go to stderr)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line on stdout:\n{proc.stdout[-2000:]}"
    return json.loads(lines[-1])


def test_spark_submit_py_files_ships_package(tmp_path, spark):
    from openllm_ocr_annotator_spark.synth import synthesize_documents

    docs_path = str(tmp_path / "docs")
    synthesize_documents(spark, "/root/testdata/sf0.001").write.parquet(docs_path)

    # build the shipping zip exactly as scripts/run_extraction_job.py documents
    pkg_zip = tmp_path / "openllm_pkg.zip"
    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", str(pkg_zip),
         "openllm_ocr_annotator_spark/"],
        cwd=str(REPO), check=True,
    )

    # entry script copied outside the repo: its sys.path.insert points at
    # tmp, so only the shipped zip can satisfy the package import
    script = tmp_path / "run_extraction_job.py"
    shutil.copy(REPO / "scripts" / "run_extraction_job.py", script)

    table_root = str(tmp_path / "table")
    cmd = [
        str(SPARK_SUBMIT), "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(pkg_zip), str(script),
        "--input", docs_path, "--table", table_root,
        "--partitions", "8", "--master", "local[4]",
    ]
    first = _run_job(cmd, cwd=tmp_path)
    assert first["committed_spans"] > 0
    assert first["snapshot_id"] is not None

    second = _run_job(cmd, cwd=tmp_path)
    assert second["committed_spans"] == 0, "second run must resume, not rework"
    assert second["snapshot_rows"] == first["snapshot_rows"]
