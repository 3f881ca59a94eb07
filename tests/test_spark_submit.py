"""The north rule's literal shipping mode: `spark-submit --py-files
dist/kmers_spark.zip jobs/<job>.py`.

test_job_clis.py drives the job CLIs as plain subprocesses from the
repo root, where `sys.path.insert(repo)` in each job file makes the
package importable from SOURCE — the zip is never exercised. Here the
thin job files are copied OUT of the repo and submitted from a tmp dir
with PYTHONPATH scrubbed, so `import kmers_spark` can only resolve
inside the --py-files zip: the actual cluster deployment shape (ship
job file + zip; executors get the zip via SparkContext file
distribution, the same mechanism a 1000-executor cluster uses).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _submit(zip_path: Path, job: Path, *args: str, cwd: Path) -> tuple[int, str]:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_MASTER"] = "local[4]"
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    p = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", str(zip_path), str(job), *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=420,
    )
    out_lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    return p.returncode, out_lines[-1] if out_lines else p.stderr[-800:]


@pytest.mark.skipif(not Path(SPARK_SUBMIT).exists(), reason="no spark-submit")
def test_py_files_zip_encode_decode_roundtrip(spark, tmp_path):
    # build the dist zip exactly as README instructs
    subprocess.run([sys.executable, "scripts/make_dist.py"], cwd=REPO,
                   check=True, capture_output=True)
    zip_path = REPO / "dist" / "kmers_spark.zip"
    names = zipfile.ZipFile(zip_path).namelist()
    assert "kmers_spark/operators/encode.py" in names
    assert not any(n.startswith("tests/") for n in names)

    # thin job files shipped NEXT TO the zip, outside the repo
    for job in ("encode.py", "decode.py"):
        shutil.copy(REPO / "jobs" / job, tmp_path / job)

    src = tmp_path / "pages_parquet"
    from kmers_spark import pages

    pages.pages_df(spark, 800, seed=17, partitions=2).write.mode(
        "overwrite"
    ).parquet(str(src))

    snap, out = tmp_path / "snap", tmp_path / "decoded"
    code, last = _submit(
        zip_path, tmp_path / "encode.py",
        "--input", str(src), "--output", str(snap),
        "--num-buckets", "4", "--no-skew-detect", cwd=tmp_path,
    )
    assert code == 0, last
    summary = json.loads(last)
    assert summary["committed_buckets"] == 4

    code, last = _submit(
        zip_path, tmp_path / "decode.py",
        "--snapshot", str(snap), "--output", str(out),
        "--verify", str(src), cwd=tmp_path,
    )
    assert code == 0, last
    result = json.loads(last)
    assert result["rows"] == 800
    assert result["mismatched_rows"] == 0
