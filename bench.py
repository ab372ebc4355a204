"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Two sections in one run:
  unprefixed keys  the FULL suite at the standard bench size
                   (replication=10 → 50k docs at sf0.1; identical to
                   every prior round) — key-for-key comparable round
                   over round
  x10_* keys       the heavy paths (build, merge, packed queries,
                   cold+warm latency) at 10x that (500k docs) — the
                   scale-evidence section; shows fixed submit/commit
                   tails amortizing (docs/sec RISES with corpus size)
                   and exercises scan/kernel costs at sizes the
                   standard corpus can't reach

Headline set (1x):
  index_build    packed-segment build (tokenize -> pack -> write)
  merge_compact  sort-merge of two half-corpus segments
  bm25_*         scored conjunctive queries over the packed segment via
                 the block-max shard kernel (operators/wand.py)
  unscored_*     boolean retrieval + structured set algebra
  skew_*         adversarial stop-word corpus: build + top-k with
                 decode-stats (blocks decoded << total = block-max
                 pruning firing end-to-end)
  dedup_minhash  MinHash/LSH candidate pairs over documents
  ann_cosine     brute-force cosine top-k over embeddings
  text_scan      lang-id + quality scoring full scan

Host calibration (calib_* keys): three fixed probes — driver Python
ALU, JVM whole-stage-codegen ALU, Arrow/pandas-UDF roundtrip — timed
after warmup in every run. Cross-round comparisons of the query keys
should be normalized against the SAME round's probes: the sandbox VM
backing each round differs (r4→r5 measured python-worker-heavy keys
2-3x slower on identical code while JVM-codegen keys stayed flat).

Scaling-efficiency evidence (north_rule: N vs 4N): run
`python tools/scaling_bench.py` which executes the *same* index_build at
local[1]/local[4]/local[16] in separate processes and appends to
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# 4g heap unless the caller overrides: this sandbox host only keeps
# ~8-10 GB of guest pages resident (BASELINE.md hardware context); a
# 16g heap's allocation churn crosses that budget and measured the SAME
# 32-core index build 2.4x slower. On real hardware this is irrelevant.
os.environ.setdefault("SPARK_DRIVER_MEM", "4g")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replication = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATION", "10"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    from pyspark.sql import functions as F

    from search_suite_spark.session import get_spark
    from search_suite_spark.sources.corpus import pages_from_documents
    from search_suite_spark.sources.segments import build_segment
    from search_suite_spark.operators.wand import wand_scored
    from search_suite_spark.operators.query import bm25_scored, unscored
    from search_suite_spark.operators.build import build_index
    from search_suite_spark.operators.merge import merge_segments
    from search_suite_spark.plans.structured import structured_query
    from search_suite_spark.operators import dedup as D
    from search_suite_spark.operators import similarity as S
    from search_suite_spark.operators import text_analysis as TA

    spark = get_spark(app="search_suite_bench", cores=cpus,
                      shuffle_partitions=max(2 * cpus, 16))

    timings: dict[str, float] = {}
    extras: dict[str, object] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    def settle():
        # steady state before latency measurements: the first job after a
        # heavy build otherwise absorbs the build's deferred JVM GC +
        # shuffle-cleanup cost (measured ~30s spikes on local[32])
        import gc as _gc

        spark.range(10_000_000).selectExpr("sum(id)").collect()
        _gc.collect()
        spark._jvm.System.gc()
        time.sleep(2)

    lat_queries = ["merge join", "spark", "window shuffle sort",
                   "the fast", "partition", "executor memory"]

    def lat_pass(seg):
        lats = []
        for q in lat_queries * 3:
            t0 = time.monotonic()
            wand_scored(seg, q, max_results=10).collect()
            lats.append(time.monotonic() - t0)
        lats.sort()
        return (round(lats[len(lats) // 2], 3),
                round(lats[int(len(lats) * 0.95)], 3))

    def build_merge_query(pages, n_docs, prefix=""):
        """The heavy-path subsuite: build, sort-merge, packed queries,
        cold+warm latency. Shared by the 1x and the 10x sections; key
        names get `prefix` so both scales land in one JSON artifact."""
        seg_dir = tempfile.mkdtemp(prefix=f"bench_seg_{prefix}")
        try:
            seg = timed(f"{prefix}index_build", lambda: build_segment(
                pages, seg_dir, n_shards=max(cpus, 16),
                shards_per_batch=max(cpus, 16), resume=False, dedupe=True))
            extras[f"{prefix}index_docs_per_sec"] = round(
                n_docs / timings[f"{prefix}index_build"], 1)
            settle()

            # merge/compaction throughput: split the corpus in two halves,
            # build each, then sort-merge (unpack -> union -> repack).
            # Timed part = merge_segments only; the half builds are staging.
            d_a = tempfile.mkdtemp(prefix="bench_mrg_a_")
            d_b = tempfile.mkdtemp(prefix="bench_mrg_b_")
            d_m = tempfile.mkdtemp(prefix="bench_mrg_m_")
            try:
                half_a = build_segment(
                    pages.filter(F.xxhash64("url") % 2 == 0), d_a,
                    n_shards=max(cpus, 16), shards_per_batch=max(cpus, 16),
                    resume=False, dedupe=False)
                half_b = build_segment(
                    pages.filter(F.xxhash64("url") % 2 != 0), d_b,
                    n_shards=max(cpus, 16), shards_per_batch=max(cpus, 16),
                    resume=False, dedupe=False)
                timed(f"{prefix}merge_compact", lambda: merge_segments(
                    spark, half_a, half_b, d_m, n_shards=max(cpus, 16)))
                extras[f"{prefix}merge_docs_per_sec"] = round(
                    n_docs / timings[f"{prefix}merge_compact"], 1)
                if not prefix:
                    # partial match over a 2-segment collection (one
                    # batched dictionary job + one result job)
                    from search_suite_spark.sources.registry import (
                        query_collection_partial,
                    )

                    timed("collection_partial",
                          lambda: query_collection_partial(
                              [half_a, half_b], "spark merge window",
                              min_should_match=2, max_results=10,
                          ).collect())
            finally:
                shutil.rmtree(d_a, ignore_errors=True)
                shutil.rmtree(d_b, ignore_errors=True)
                shutil.rmtree(d_m, ignore_errors=True)

            timed(f"{prefix}bm25_topk_packed", lambda: wand_scored(
                seg, "merge join", max_results=10).collect())
            timed(f"{prefix}bm25_single_packed", lambda: wand_scored(
                seg, "spark", max_results=10).collect())
            timed(f"{prefix}bm25_rare_and_packed", lambda: wand_scored(
                seg, "window shuffle sort", max_results=10).collect())

            # packed-path query latency distribution (BASELINE.md protocol
            # step 4): repeated query set, p50/p95 over per-query walls
            (extras[f"{prefix}query_p50_sec"],
             extras[f"{prefix}query_p95_sec"]) = lat_pass(seg)

            # WARM path: the reference is an always-on API whose segments
            # stay mmapped (searchapi3/src/Controller.hs:73) — the honest
            # comparison point caches the segment tables in executor
            # memory (materialized once, untimed) and re-runs the same
            # query set; the residual is pure plan+submit+kernel cost.
            cached = [seg.postings, seg.docs] + (
                [seg.terms] if seg.terms is not None else [])
            for df in cached:
                df.persist()
                df.count()
            (extras[f"{prefix}warm_query_p50_sec"],
             extras[f"{prefix}warm_query_p95_sec"]) = lat_pass(seg)
            for df in cached:
                df.unpersist()

            # BATCHED scoring: the whole latency query set in ONE Spark
            # action (wand.bm25_batch — one scan, one shuffle, shared
            # block decodes). The amortized per-query cost is the
            # engine's real serving shape: per-query submit overhead
            # divides away with batch size.
            from search_suite_spark.operators.wand import bm25_batch

            t0 = time.monotonic()
            bm25_batch(
                seg, {f"q{i}": q for i, q in enumerate(lat_queries)},
                max_results=10,
            ).collect()
            bsec = time.monotonic() - t0
            extras[f"{prefix}batch{len(lat_queries)}_sec"] = round(bsec, 3)
            extras[f"{prefix}batch_per_query_sec"] = round(
                bsec / len(lat_queries), 3)

            # serving throughput at the amortized limit: 1000 distinct
            # conjunctive queries over the 400 highest-df terms, one
            # action — the relevance-sweep / hard-negative-mining shape.
            # The per-query cost here is the engine's real ms-level
            # serving number (the reference's always-on API answers one
            # query in ~ms; this is the batch equivalent).
            if seg.terms is not None:
                top_terms = [
                    r["term"]
                    for r in seg.terms.orderBy(F.col("df").desc())
                    .limit(400).collect()
                ]

                def mk_queries(n, salt=0):
                    qs = {}
                    for i in range(n):
                        j = i + salt
                        a = top_terms[j % len(top_terms)]
                        b = top_terms[(j * 7 + 3) % len(top_terms)]
                        qs[f"q{salt}_{i:05d}"] = f"{a} {b}" if a != b else a
                    return qs

                t0 = time.monotonic()
                bm25_batch(seg, mk_queries(1000), max_results=10).count()
                bsec = time.monotonic() - t0
                extras[f"{prefix}batch1000_sec"] = round(bsec, 3)
                # (sec/1000 queries) * 1000 ms/sec — numerically bsec
                extras[f"{prefix}batch1000_per_query_ms"] = round(bsec, 2)

                # 10k-query sweep (1x only): the hard-negative-mining
                # scale — query metadata rides ONE sc.broadcast, never
                # the per-task closure, so the task pickles stay
                # bytes-sized however large the sweep grows
                if not prefix:
                    t0 = time.monotonic()
                    bm25_batch(seg, mk_queries(10_000), max_results=10).count()
                    bsec = time.monotonic() - t0
                    extras["batch10k_sec"] = round(bsec, 3)
                    extras["batch10k_per_query_ms"] = round(bsec / 10.0, 2)

                # SUSTAINED serving: one long-lived session answering a
                # continuous stream of batch-500 chunks back-to-back —
                # the steady state the reference's always-on API runs.
                # Reports sustained QPS + per-chunk p95 (each chunk's
                # queries are distinct; nothing warms artificially).
                n_chunks = 20 if not prefix else 8
                walls = []
                for c in range(n_chunks):
                    qs = mk_queries(500, salt=(c + 1) * 100_000)
                    t0 = time.monotonic()
                    chunk = bm25_batch(seg, qs, max_results=10)
                    chunk.count()
                    # deterministic broadcast release: executor storage
                    # stays flat across the stream instead of growing
                    # until ContextCleaner notices
                    chunk.ss_release()
                    walls.append(time.monotonic() - t0)
                total_q = 500 * n_chunks
                extras[f"{prefix}serving_chunks"] = n_chunks
                extras[f"{prefix}serving_qps"] = round(
                    total_q / sum(walls), 1
                )
                import math

                extras[f"{prefix}serving_chunk_p95_sec"] = round(
                    sorted(walls)[
                        max(0, math.ceil(0.95 * len(walls)) - 1)
                    ], 3
                )

            if not prefix:
                # round-5 operators over the packed path (1x keys)
                from search_suite_spark.plans.structured_packed import (
                    structured_query_packed,
                )
                from search_suite_spark.operators.wand import wand_partial

                # same per-shape warmup policy as the analytics section:
                # each NEW plan shape (leaf-kernel applyInPandas +
                # membership agg; theta-pruned partial kernel) runs once
                # untimed on a 2k-doc mini segment so one-off codegen/JIT
                # compile stays out of the timed region
                warm_seg_dir = tempfile.mkdtemp(prefix="bench_warm_sp_")
                try:
                    wseg = build_segment(
                        pages.limit(2000), warm_seg_dir, n_shards=4,
                        shards_per_batch=4, resume=False, dedupe=False)
                    structured_query_packed(
                        wseg, "/\\ spark\n/\\ \\/ merge\n   \\/ ~ ^jo"
                    ).count()
                    wand_partial(
                        wseg, "spark merge window", min_should_match=2,
                        max_results=10).collect()
                finally:
                    shutil.rmtree(warm_seg_dir, ignore_errors=True)

                timed("structured_packed", lambda: structured_query_packed(
                    seg, "/\\ spark\n/\\ \\/ merge\n   \\/ ~ ^jo"
                ).count())
                timed("bm25_partial_packed", lambda: wand_partial(
                    seg, "spark merge window", min_should_match=2,
                    max_results=10,
                ).collect())

                # index-size / compression (north_rule: delta + vbyte
                # postings): read from the segment's own per-shard
                # lineage metrics — zero data-scan cost. The
                # uncompressed baseline is 16 B/posting (8 B docid +
                # 4 B tf + 4 B doc_len).
                from search_suite_spark.sources.segment_io import current_io

                lrow = current_io().read_lineage(spark, seg_dir).agg(
                    F.sum("n_postings").alias("p"),
                    F.sum("packed_bytes").alias("b"),
                ).collect()[0]
                extras["postings_total"] = int(lrow["p"])
                extras["postings_packed_bytes"] = int(lrow["b"])
                extras["bytes_per_posting"] = round(
                    lrow["b"] / lrow["p"], 3)
                extras["postings_compression_x"] = round(
                    16.0 * lrow["p"] / lrow["b"], 2)

            # RESUME (north_rule: an interrupted build resumes from
            # per-shard lineage without recomputation): simulate a
            # crash that lost half the shards — truncate lineage to
            # the surviving half, drop the lost shards' partitions —
            # then time the resumed build over the SAME pages input.
            # Expected cost ≈ the lost half's share of the variable
            # work (dedupe + tokenize + pack all run post-shard-filter,
            # only for missing shards) + a terms-table rebuild (term+n
            # columnar scan, measured ~1s at 500k docs) + fixed job
            # overhead. The DENOMINATOR is a same-window full rebuild
            # into a scratch dir, not the run-opening index_build:
            # single builds on this host swing 3x between windows
            # (12-36s at 500k docs, BASELINE.md hardware context), so a
            # cross-window ratio measures the host, not the resume.
            # File-level crash surgery needs the parquet layout.
            from search_suite_spark.sources.segment_io import (
                ParquetSegmentIO,
                current_io as _cur_io,
            )

            if type(_cur_io()) is ParquetSegmentIO:
                n_sh = max(cpus, 16)
                keep = n_sh // 2
                lin_pd = spark.read.parquet(
                    f"{seg_dir}/lineage"
                ).filter(F.col("shard") < keep).toPandas()
                shutil.rmtree(f"{seg_dir}/lineage")
                spark.createDataFrame(lin_pd).write.parquet(
                    f"{seg_dir}/lineage")
                for s in range(keep, n_sh):
                    shutil.rmtree(f"{seg_dir}/postings/shard={s}",
                                  ignore_errors=True)
                    shutil.rmtree(f"{seg_dir}/docs/shard={s}",
                                  ignore_errors=True)
                settle()
                scratch = tempfile.mkdtemp(prefix="bench_rebuild_")
                try:
                    timed(f"{prefix}rebuild_full", lambda: build_segment(
                        pages, scratch, n_shards=n_sh,
                        shards_per_batch=n_sh, resume=False, dedupe=True))
                finally:
                    shutil.rmtree(scratch, ignore_errors=True)
                timed(f"{prefix}resume_build", lambda: build_segment(
                    pages, seg_dir, n_shards=n_sh,
                    shards_per_batch=n_sh, dedupe=True))
                extras[f"{prefix}resume_lost_shard_frac"] = round(
                    (n_sh - keep) / n_sh, 2)
                extras[f"{prefix}resume_frac_of_build"] = round(
                    timings[f"{prefix}resume_build"]
                    / timings[f"{prefix}rebuild_full"], 2)
        finally:
            shutil.rmtree(seg_dir, ignore_errors=True)

    # ---- 1x section: full suite at the standard bench size ----
    pages = pages_from_documents(spark, sf_dir, replication=replication).cache()
    n_docs = pages.count()  # materialize input outside the timed build
    extras["n_docs"] = n_docs

    # untimed warmup: a miniature build JIT-compiles the codegen
    # tokenizer, spins up the Arrow python workers and touches the
    # shuffle dirs, so the FIRST timed build doesn't carry one-off JVM
    # warmup (measured multi-second swings on this host otherwise)
    warm_dir = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        build_segment(
            pages.limit(2000), warm_dir, n_shards=4, shards_per_batch=4,
            resume=False, dedupe=True)
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)
    settle()

    # host calibration probes (fixed workloads, timed AFTER warmup):
    # every BENCH artifact carries its own host-speed context, so a
    # round-over-round drift in the query keys can be read against the
    # same round's probes. Three axes, matching the three execution
    # paths the suite exercises:
    #   calib_py_loop_sec    driver-side pure-Python ALU (the sandbox
    #                        hosts differ most here — r4→r5 measured a
    #                        2-3x swing on python-worker-heavy keys
    #                        while JVM-codegen keys stayed flat)
    #   calib_jvm_alu_sec    zero-shuffle whole-stage-codegen job
    #   calib_arrow_udf_sec  Arrow batch transfer + pandas work in
    #                        executor python workers (the applyInPandas
    #                        kernels' substrate)
    def _calib():
        t0 = time.monotonic()
        s = 0
        for i in range(20_000_000):
            s += i
        extras["calib_py_loop_sec"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        # pmod keeps the running sum far from long overflow (ANSI mode)
        spark.range(500_000_000).select(
            F.sum(F.pmod(F.xxhash64("id"), F.lit(1024)))).collect()
        extras["calib_jvm_alu_sec"] = round(time.monotonic() - t0, 3)

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _pm(x):
            return (x * 1.0000001 + 3.0) ** 0.5

        t0 = time.monotonic()
        spark.range(20_000_000).select(
            F.sum(_pm(F.col("id").cast("double")))).collect()
        extras["calib_arrow_udf_sec"] = round(time.monotonic() - t0, 3)

    _calib()
    settle()

    build_merge_query(pages, n_docs)

    # flat (relational) path on the same corpus, for comparison.
    # build_flat times the cache materialization (tokenize + postings
    # agg) separately so the flat query timings measure the QUERY, not
    # the lazy first-touch build.
    idx = build_index(pages, dedupe=True)
    timed("build_flat", lambda: (idx.postings.count(), idx.terms.count()))
    timed("bm25_topk_flat", lambda: bm25_scored(
        idx, "merge join", max_results=10).collect())
    timed("unscored_and", lambda: unscored(idx, "merge join sort").count())
    timed("structured_and_or", lambda: structured_query(
        idx, "/\\ spark\n/\\ \\/ merge\n   \\/ join").count())

    # spelling access paths over the same dictionary: the levenshtein
    # scan (tlen-pruned) vs the SymSpell deletion-neighborhood probe.
    # The index is a build-once artifact (spell_index_build, amortized
    # across every later suggestion), after which a probe touches only
    # the query's variant neighborhood — never the dictionary.
    from search_suite_spark.operators.spelling import (
        spelling_suggestions,
        spelling_suggestions_indexed,
        term_deletion_index,
    )

    extras["spelling_dict_terms"] = idx.terms.count()
    timed("spelling_scan", lambda: spelling_suggestions(
        idx.terms, "spark merg shufle").count())
    spell_di = term_deletion_index(idx.terms, max_dist=1).persist()
    timed("spell_index_build", lambda: spell_di.count())
    extras["spell_index_rows"] = spell_di.count()
    timed("spelling_probe", lambda: spelling_suggestions_indexed(
        spell_di, "spark merg shufle").count())
    spell_di.unpersist()

    # transfer-proportionality evidence (north_rule): an adversarial
    # skew corpus — one term in EVERY doc, per-shard posting lists
    # far above codec.MAX_ROW_POSTINGS so the giant-list split fires
    # at ≥3 rows per (term, shard) (multi-row block addressing crosses
    # a row boundary mid-chunk at natural size) — then a top-k
    # stop-word query with executor-side accumulators counting tf/dl
    # blocks decoded vs held. decoded << total = block-max pruning
    # firing end-to-end.
    # (The replicated sf corpus can't show this: its vocabulary is so
    # dense that every query term has negative idf AND blocks/shard ≈
    # the scoring chunk size, so near-all blocks decode regardless.)
    skew_dir = tempfile.mkdtemp(prefix="bench_skew_")
    try:
        def letters(c):
            return F.translate(
                c.cast("string"), "0123456789", "abcdefghij")

        # 600k docs / 2 shards → 300k postings of 'the' per shard
        # → ceil(300k / 131072) = 3 packed rows per (term, shard)
        skew = spark.range(600_000).select(
            F.concat(F.lit("d://"), F.col("id")).alias("url"),
            F.concat(
                F.lit("the w"), letters(F.col("id") % 50_000),
                F.lit(" u"), letters(F.col("id")),
                F.when(F.col("id") % 2000 == 0, F.lit(" p" * 25))
                .otherwise(F.lit("")),
            ).alias("text"),
        )
        sseg = timed("skew_build_600k", lambda: build_segment(
            skew, skew_dir, n_shards=2, shards_per_batch=2,
            resume=False, dedupe=False))
        wstats: dict = {}
        timed("skew_stopword_topk", lambda: wand_scored(
            sseg, "the", max_results=10, stats=wstats).collect())
        extras["skew_blocks_decoded"] = int(wstats["blocks_decoded"].value)
        extras["skew_blocks_total"] = int(wstats["blocks_total"].value)
        extras["skew_split_max_rows"] = int(
            sseg.postings.filter(F.col("term") == "the")
            .groupBy("shard").count()
            .agg(F.max("count")).collect()[0][0]
        )
    finally:
        shutil.rmtree(skew_dir, ignore_errors=True)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
    )
    # same warmup policy as the index build above: each analytics shape
    # runs once untimed on a tiny slice so whole-stage-codegen compile +
    # JIT (a one-off per query shape, measured ~3s for the tokenizer
    # expression vs ~0.3s steady-state at sf0.1) stays out of the timed
    # region — these are minutes-long scans at production size, where
    # the compile cost is noise, not a per-run tax.
    mini = docs.limit(200).cache()
    mini.count()
    D.minhash_candidates(mini, n=3, bands=8, max_bucket=200).count()
    TA.quality_score(mini).join(TA.lang_id(mini), "url").count()
    mini.unpersist()

    timed("dedup_minhash", lambda: D.minhash_candidates(
        docs, n=3, bands=8, max_bucket=200).count())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0)
          .select("embedding").collect()[0]["embedding"]]
    S.cosine_topk(emb.limit(200), qv, k=10).collect()  # untimed JIT warmup
    timed("ann_cosine", lambda: S.cosine_topk(emb, qv, k=10).collect())

    timed("text_scan", lambda: TA.quality_score(
        docs).join(TA.lang_id(docs), "url").count())

    # ---- 10x scale section: heavy paths at 10x the standard corpus ----
    if os.environ.get("SPARK_GRAFT_BENCH_SKIP_SCALE") != "1":
        pages.unpersist()
        pages_big = pages_from_documents(
            spark, sf_dir, replication=replication * 10).cache()
        n_big = pages_big.count()
        extras["x10_n_docs"] = n_big
        settle()
        build_merge_query(pages_big, n_big, prefix="x10_")
        pages_big.unpersist()

    # headline value = the 1x suite only, key-for-key comparable with
    # every prior round's BENCH artifact; the 10x section reports its
    # own total under x10_total_sec. rebuild_full is EXCLUDED from both:
    # it is the resume ratio's same-window denominator (a duplicate
    # build into a scratch dir), pure measurement scaffolding — counting
    # it would inflate the suite wall by a second full build.
    total = round(
        sum(v for k, v in timings.items()
            if not k.startswith("x10_") and not k.endswith("rebuild_full")),
        3,
    )
    x10 = round(
        sum(v for k, v in timings.items()
            if k.startswith("x10_") and not k.endswith("rebuild_full")),
        3,
    )
    if x10:
        extras["x10_total_sec"] = x10
    print(json.dumps({
        "metric": "index-build + BM25 top-k + training-data ops wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
