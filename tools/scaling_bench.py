"""Scaling-efficiency evidence for the north_rule (N vs 4N executors).

No real cluster exists in this sandbox, so the two "cluster sizes" are
two parallelism levels of the same job on the same input: local[8] vs
local[32] (4x the cores). Each run is a fresh JVM (subprocess) building
the packed segment over the identical replicated corpus; throughput =
docs / build-wall-seconds; scaling efficiency =
(throughput_4N / throughput_N) / 4.

Usage:
    python tools/scaling_bench.py [--sf-dir D] [--replication R]
                                  [--runs K] [--update-baseline]

Prints one JSON line; --update-baseline rewrites the '## BENCH' section
of BASELINE.md with the numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = r"""
import json, os, sys, time, tempfile, shutil
sys.path.insert(0, {repo!r})
from search_suite_spark.session import get_spark
from search_suite_spark.sources.corpus import pages_from_documents
from search_suite_spark.sources.segments import build_segment

cores = {cores}
spark = get_spark(app=f"scaling_{{cores}}", cores=cores,
                  shuffle_partitions=max(cores, 8))
# stage the synthesized corpus as a parquet input ONCE (untimed): the
# build must read a real on-storage input, not a driver-managed cache —
# a cached frame gets evicted under build memory pressure and silently
# re-runs the (expensive) synthesis inside the timed region
staged = os.environ.get("SCALING_STAGED_PAGES")
if not staged:
    staged = tempfile.mkdtemp(prefix="scale_pages_", dir="/dev/shm")
    pages_from_documents(spark, {sf_dir!r}, replication={replication}) \
        .repartition(64).write.mode("overwrite").parquet(staged + "/pages")
pages = spark.read.parquet(staged + "/pages")
n_docs = pages.count()
seg_dir = tempfile.mkdtemp(prefix=f"scale_seg_{{cores}}_", dir="/dev/shm")
t0 = time.monotonic()
build_segment(pages, seg_dir, n_shards=32, shards_per_batch=32, resume=False)
secs = time.monotonic() - t0
shutil.rmtree(seg_dir, ignore_errors=True)
print("SCALING_RESULT " + json.dumps({{"cores": cores, "secs": secs,
                                       "n_docs": n_docs, "staged": staged}}))
spark.stop()
"""


def run_once(cores: int, sf_dir: str, replication: int) -> dict:
    code = RUN_SNIPPET.format(
        repo=REPO, cores=cores, sf_dir=sf_dir, replication=replication
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(f"no result from cores={cores}:\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replication", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cores", type=int, nargs=2, default=[8, 32])
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    # stage the corpus once, shared by every run
    os.environ.pop("SCALING_STAGED_PAGES", None)
    first = run_once(args.cores[0], args.sf_dir, args.replication)
    os.environ["SCALING_STAGED_PAGES"] = first["staged"]
    print(f"staged pages at {first['staged']}", file=sys.stderr, flush=True)

    # interleave configs (a,b,a,b,...) so slow host phases on this noisy
    # shared box hit both configurations equally; take best-of-K each
    results: dict[int, dict] = {}
    for i in range(args.runs):
        for cores in args.cores:
            r = run_once(cores, args.sf_dir, args.replication)
            thr = r["n_docs"] / r["secs"]
            print(f"cores={cores} run={i} {r['secs']:.1f}s "
                  f"{thr:.0f} docs/s", file=sys.stderr, flush=True)
            best = results.get(cores)
            if best is None or thr > best["docs_per_sec"]:
                results[cores] = {"cores": cores, "secs": round(r["secs"], 2),
                                  "n_docs": r["n_docs"],
                                  "docs_per_sec": round(thr, 1)}

    n, n4 = args.cores
    eff = (results[n4]["docs_per_sec"] / results[n]["docs_per_sec"]) / (n4 / n)
    summary = {
        "metric": "index-build scaling efficiency (N vs 4N cores)",
        "n_cores": results[n],
        "4n_cores": results[n4],
        "core_ratio": n4 / n,
        "throughput_ratio": round(
            results[n4]["docs_per_sec"] / results[n]["docs_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "sf_dir": args.sf_dir,
        "replication": args.replication,
        "runs_per_config": args.runs,
        "selection": "best-of-K throughput per config (noisy shared box)",
    }
    print(json.dumps(summary))

    if args.update_baseline:
        section = (
            "## BENCH — measured scaling evidence (north_rule N vs 4N)\n\n"
            "Same index-build job, same input "
            f"({summary['n_cores']['n_docs']} docs synthesized from "
            f"`{args.sf_dir}` at replication {args.replication}), two "
            "parallelism levels, fresh JVM each (best of "
            f"{args.runs} runs):\n\n"
            "| config | wall (s) | throughput (docs/s) |\n|---|---|---|\n"
            f"| local[{n}] | {results[n]['secs']} | "
            f"{results[n]['docs_per_sec']} |\n"
            f"| local[{n4}] | {results[n4]['secs']} | "
            f"{results[n4]['docs_per_sec']} |\n\n"
            f"Throughput ratio {summary['throughput_ratio']}x over a "
            f"{int(n4 / n)}x core ratio → **scaling efficiency "
            f"{summary['scaling_efficiency']}** "
            f"({'meets' if eff >= 0.8 else 'below'} the >=0.8 target).\n"
            "Regenerate: `python tools/scaling_bench.py --update-baseline`.\n"
        )
        path = os.path.join(REPO, "BASELINE.md")
        with open(path) as f:
            text = f.read()
        pat = re.compile(
            r"## BENCH — measured scaling evidence.*?(?=\n## (?!BENCH)|\Z)",
            re.DOTALL,
        )
        text = (pat.sub(section, text) if pat.search(text)
                else text.rstrip() + "\n\n" + section)
        with open(path, "w") as f:
            f.write(text)
        print(f"updated {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
