"""North-rule letter check: the SAME scaling evidence as
tools/scaling_bench.py, but each rung runs the shipped deployment shape
verbatim —

    taskset -c 0-(N-1) spark-submit --master local[N] \
        --py-files dist/search_suite_spark.zip \
        jobs/build_index_job.py --pages-parquet ... --bench-json

i.e. the packaged zip + the spark-submit entry point, not an in-process
import. No real cluster exists in this sandbox, so the two "cluster
sizes" are two taskset-pinned parallelism levels (N and 4N cores) of
the identical job on the identical staged input; efficiency =
(docs_per_sec_4N / docs_per_sec_N) / 4. Protocol mirrors the frozen
ladder (scaling_bench.py): corpus staged once to /dev/shm parquet,
untimed miniature warmup build inside the job (--bench-json), fresh
segment dir per run, configs interleaved, best-of-K per rung.

Usage:
    python tools/submit_ladder.py [--cores 4 16] [--runs 2]
                                  [--sf-dir /root/testdata/sf0.1]
                                  [--replication 10]

Prints one JSON line: SUBMIT_LADDER {...}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "search_suite_spark.zip")
JOB = os.path.join(REPO, "jobs", "build_index_job.py")


def stage_pages(sf_dir: str, replication: int) -> str:
    """Synthesize the replicated pages corpus once, to /dev/shm parquet
    (the build must read real on-storage input; see scaling_bench)."""
    staged = tempfile.mkdtemp(prefix="submit_pages_", dir="/dev/shm")
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from search_suite_spark.session import get_spark\n"
        "from search_suite_spark.sources.corpus import pages_from_documents\n"
        "spark = get_spark(app='stage', cores=16, shuffle_partitions=32)\n"
        "pages_from_documents(spark, %r, replication=%d)"
        ".repartition(64).write.mode('overwrite').parquet(%r)\n"
        "spark.stop()\n"
    ) % (REPO, sf_dir, replication, staged + "/pages")
    subprocess.run([sys.executable, "-c", code], check=True,
                   capture_output=True, text=True, timeout=1800)
    return staged + "/pages"


def run_rung(cores: int, pages: str) -> dict:
    seg_dir = tempfile.mkdtemp(prefix=f"submit_seg_{cores}_",
                               dir="/dev/shm")
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        spark_submit,
        "--master", f"local[{cores}]",
        # match the in-process ladder's launcher-level settings
        # (scaling_bench.py RUN_SNIPPET) — runtime SQL confs come from
        # the job's apply_engine_conf call; these four are launcher-only.
        # 4g heap on purpose: this sandbox host backs only ~8-10 GB of
        # hot guest pages (BASELINE.md hot-set calibration); a bigger
        # heap's allocation churn thrashes at high core counts.
        "--conf", f"spark.sql.shuffle.partitions={max(2 * cores, 16)}",
        "--conf", "spark.driver.memory=4g",
        "--conf", "spark.local.dir=/dev/shm/spark-local",
        "--conf", "spark.ui.enabled=false",
        "--py-files", ZIP,
        JOB,
        "--pages-parquet", pages,
        "--seg-dir", seg_dir,
        "--n-shards", "32", "--shards-per-batch", "32",
        "--bench-json",
    ]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=3600)
        for line in out.stdout.splitlines():
            if line.startswith("BENCH_JSON "):
                d = json.loads(line[len("BENCH_JSON "):])
                d["cores"] = cores
                return d
        raise RuntimeError(
            f"no BENCH_JSON from local[{cores}]:\n{out.stderr[-2000:]}")
    finally:
        shutil.rmtree(seg_dir, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, nargs=2, default=[4, 16])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replication", type=int, default=10)
    args = ap.parse_args()

    if not os.path.exists(ZIP):
        subprocess.run(["sh", os.path.join(REPO, "tools",
                                           "make_pyfiles.sh")],
                       check=True, capture_output=True)

    pages = stage_pages(args.sf_dir, args.replication)
    best: dict[int, dict] = {}
    try:
        for k in range(args.runs):  # interleave configs across rounds
            for cores in args.cores:
                r = run_rung(cores, pages)
                print(f"  run {k}: local[{cores}] {r['secs']}s "
                      f"{r['docs_per_sec']} docs/s", file=sys.stderr)
                if (cores not in best
                        or r["docs_per_sec"] > best[cores]["docs_per_sec"]):
                    best[cores] = r
    finally:
        shutil.rmtree(os.path.dirname(pages), ignore_errors=True)

    lo, hi = args.cores
    eff = (best[hi]["docs_per_sec"] / best[lo]["docs_per_sec"]) / (hi / lo)
    print("SUBMIT_LADDER " + json.dumps({
        "mode": "spark-submit --py-files (packaged zip, pinned cores)",
        "n_docs": best[lo]["n_docs"],
        "rungs": {str(c): best[c] for c in args.cores},
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
