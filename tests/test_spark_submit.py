"""Packaging proof (north_rule: "run via spark-submit --py-files"):
the build job must work in a process whose only access to the engine is
the --py-files zip — no repo on the driver's import path, cwd outside
the repo. Mirrors the cluster submission path end-to-end:
tools/make_pyfiles.sh → spark-submit jobs/build_index_job.py → segment
on disk, read back and queried by an independent session.
"""

import os
import shutil
import subprocess

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    home = os.environ.get("SPARK_HOME", "/opt/spark")
    path = os.path.join(home, "bin", "spark-submit")
    return path if os.path.isfile(path) else None


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit binary")
def test_spark_submit_build_job_end_to_end(tmp_path, spark):
    subprocess.run(
        ["sh", os.path.join(REPO, "tools", "make_pyfiles.sh")],
        check=True, capture_output=True, cwd=REPO,
    )
    zip_path = os.path.join(REPO, "dist", "search_suite_spark.zip")
    assert os.path.isfile(zip_path)

    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.table(
            {
                "url": [f"http://sub{i}" for i in range(8)],
                "text": [f"submit proof shared tok{i % 3}" for i in range(8)],
            }
        ),
        pages_path,
    )
    seg_dir = str(tmp_path / "seg")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--py-files", zip_path,
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.driver.memory=2g",
            "--conf", "spark.ui.enabled=false",
            os.path.join(REPO, "jobs", "build_index_job.py"),
            "--pages-parquet", pages_path,
            "--seg-dir", seg_dir,
            "--n-shards", "2",
            "--shards-per-batch", "2",
            # tools/submit_ladder.py's contract: an untimed warmup build
            # then one parseable BENCH_JSON line for the timed build
            "--bench-json",
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]

    bench_lines = [
        l for l in out.stdout.splitlines() if l.startswith("BENCH_JSON ")
    ]
    assert len(bench_lines) == 1, out.stdout[-2000:]
    import json

    bench = json.loads(bench_lines[0][len("BENCH_JSON "):])
    assert bench["n_docs"] == 8 and bench["num_docs"] == 8
    assert bench["secs"] > 0 and bench["docs_per_sec"] > 0

    # the submitted job's segment is a valid, queryable segment
    from search_suite_spark.operators.wand import wand_scored
    from search_suite_spark.sources.segments import read_segment

    seg = read_segment(spark, seg_dir)
    assert seg.num_docs == 8
    assert seg.n_shards == 2
    urls = {r["url"] for r in wand_scored(seg, "submit proof").collect()}
    assert urls == {f"http://sub{i}" for i in range(8)}
