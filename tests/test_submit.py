"""The cluster entry point (scripts/submit_pipeline.py) through a REAL
``spark-submit --py-files`` invocation: zip built by package_pyfiles, fresh
JVM, flat-table input adapted, triple table committed, resume on
re-submit."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from package_pyfiles import build
    zip_path = str(tmp_path / "nobletools_spark.zip")
    assert build(zip_path) > 50

    # flat (doc_id, text) input — the adapter path
    import duckdb
    src = str(tmp_path / "docs.parquet")
    duckdb.sql(
        "COPY (SELECT * FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet') LIMIT 40) "
        f"TO '{src}' (FORMAT PARQUET)")

    def submit():
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)   # the zip must be the ONLY source
        return subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]",
             "--conf", "spark.sql.shuffle.partitions=8",
             "--conf", "spark.ui.enabled=false",
             "--py-files", zip_path,
             os.path.join(REPO, "scripts", "submit_pipeline.py"),
             "--input", src,
             "--checkpoint-root", str(tmp_path / "ckpt"),
             "--table-root", str(tmp_path / "triples"),
             "--method", "best-match"],
            capture_output=True, text=True, timeout=420, env=env,
            cwd=str(tmp_path))   # NOT the repo dir — the zip does the work

    r1 = submit()
    assert r1.returncode == 0, r1.stderr[-3000:]
    out1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert out1["stages"]["triples"]["rows"] > 0
    sk = out1["stages"]["mentions"]["skew"]
    assert sk["partitions"] >= 1 and sk["max_rows"] >= 1
    assert sk["skew_ratio"] is None or sk["skew_ratio"] >= 1
    assert out1["snapshot_id"] == 1
    assert not out1["stages"]["triples"]["resumed"]

    # re-submit: stages resume, no second snapshot
    r2 = submit()
    assert r2.returncode == 0, r2.stderr[-3000:]
    out2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["stages"]["triples"]["resumed"]
    assert out2["snapshot_id"] == 1
    assert out2["stages"]["triples"]["rows"] == \
        out1["stages"]["triples"]["rows"]


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_spark_submit_jsonl_input(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from package_pyfiles import build
    zip_path = str(tmp_path / "nobletools_spark.zip")
    build(zip_path)

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    lines = [json.dumps({"doc_id": i,
                         "text": "data pipeline rows were ingested",
                         "lang": "en", "source": "t"}) for i in range(6)]
    lines.append('{"doc_id": 9, "text": "broken')   # 1 quarantined line
    (src_dir / "d.jsonl").write_text("\n".join(lines) + "\n")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_pipeline.py"),
         "--input", str(src_dir), "--format", "jsonl",
         "--quarantine", str(tmp_path / "bad"),
         "--checkpoint-root", str(tmp_path / "ckpt"),
         "--table-root", str(tmp_path / "triples")],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["quarantined"] == 1
    # 6 docs; the interleave adapter splits each text at its midpoint so
    # each parsed doc yields 2 sentence rows
    assert out["stages"]["sentences"]["rows"] == 12
    assert out["snapshot_id"] == 1
