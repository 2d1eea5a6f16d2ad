"""North-rule invocation: ``spark-submit --py-files pipeline.zip job.py``.

Runs the real spark-submit binary with the package supplied ONLY via the
zip (job.py copied outside the repo so sys.path cannot leak the package) —
the exact cluster deployment shape.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files(tmp_path):
    zip_path = str(tmp_path / "pipeline.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(REPO, "pdf_extraction_tests_spark")
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    job_copy = str(tmp_path / "job_copy.py")
    shutil.copy(os.path.join(REPO, "job.py"), job_copy)
    out_dir = str(tmp_path / "out")
    res = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
            job_copy, "--synthesize-from", "/root/testdata/sf0.001",
            "--output", out_dir, "--run-id", "submit_test",
            "--publish-snapshot", str(tmp_path / "lake_tbl"),
        ],
        capture_output=True, text=True, timeout=360, cwd=str(tmp_path),
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
    metrics = json.loads(line)
    assert metrics["docs"] == 500
    assert metrics["run_id"] == "submit_test"
    assert os.path.exists(os.path.join(out_dir, "extracted"))
    assert os.path.exists(os.path.join(out_dir, "checkpoint"))
    # the run published its committed view as one run-tagged snapshot
    from pdf_extraction_tests_spark import snapshots as S

    tbl = str(tmp_path / "lake_tbl")
    assert metrics["snapshot_version"] == 1
    assert S.committed_tags(tbl) == {"run-submit_test"}
