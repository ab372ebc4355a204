"""Deduplication operators for large-scale training-data pipelines.

These go beyond the reference (whose only dedupe is newest-wins by url at
segment merge, /root/reference/indexer-qp2/src/merge/common_urls.rs) and
cover the standard near-dup toolbox over a ``(url, text)`` corpus:

  - exact dedup           hash-groupBy on the text fingerprint
  - n-gram Jaccard        shingle → pair-join on shared shingles
  - MinHash + LSH         salted-md5 min-signatures, banded bucket join
  - SimHash               weighted bit-vote fingerprint + hamming pairs
  - embedding cosine      near-dup pairs over an embedding column

Everything except simhash64 is pure Column expressions (JVM-side,
whole-stage codegen); md5 is used as the portable hash so the DuckDB
oracle can replicate results bit-for-bit.

Scale notes: the shingle pair-join explodes to (doc, shingle) rows —
at 10^12 docs this join must be banded (MinHash LSH) rather than
all-pairs; `jaccard_pairs` therefore takes the candidate-pair frame from
`minhash_candidates` when running at scale, and the all-pairs variant is
for small verification corpora only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_suite_spark.operators.build import term_freqs_udf


def tokens_col(text_col="text"):
    """Ordered token array via the engine tokenizer — the JVM/Catalyst
    expression (functions.normalise.tokens_column), parity-tested
    against the Arrow-UDF twin (tests/test_normalise.py golden +
    hypothesis suites). Codegen keeps every analysis scan that calls
    this (lang_id, quality_score, token_counts, fingerprints, shingle
    dedup) out of Python workers: one core per task instead of the
    Arrow path's task-thread + worker-process pair, and immune to the
    sandbox hosts' round-to-round Python-throughput swings (BENCH
    calib_* keys)."""
    from search_suite_spark.functions.normalise import tokens_column

    # null text → empty array (the Arrow twin's tokenize_series
    # semantics; the raw Catalyst expr would propagate NULL)
    return tokens_column(F.coalesce(F.col(text_col), F.lit("")))


def exact_duplicates(df: DataFrame, key: str = "url", text: str = "text") -> DataFrame:
    """Exact dedup via hash-groupBy: (fingerprint, n_docs, first_key).

    first_key = lexicographic min key of the group (the canonical doc a
    dedup pass would keep).
    """
    return (
        df.select(F.md5(F.col(text)).alias("fingerprint"), F.col(key))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min(key).alias("first_key"))
    )


def ngrams_col(toks, n: int):
    """Array of space-joined token n-grams over an ordered token array;
    docs shorter than n tokens get an EMPTY array (sequence(0, -1) would
    otherwise descend to [0, -1] and slice(toks, 0, n) throws)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(df: DataFrame, key: str = "url", text: str = "text", n: int = 3) -> DataFrame:
    """(key, shingle) distinct n-token shingles per doc."""
    toks = df.select(F.col(key), tokens_col(text).alias("toks"))
    sh = toks.select(
        F.col(key),
        F.explode(ngrams_col(F.col("toks"), n)).alias("shingle"),
    )
    return sh.distinct()


def jaccard_pairs(
    df: DataFrame,
    key: str = "url",
    text: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """n-gram Jaccard ≥ threshold → (a, b, jaccard).

    With ``candidates`` (an (a, b) frame, e.g. from `minhash_candidates`)
    the exact Jaccard is computed ONLY for those pairs — the scale path:
    LSH proposes, this verifies, and the shingle join is semi-joined down
    to candidate members before any pairing. Without it, the full
    all-pairs self-join runs — small verification corpora only.
    """
    sh = shingles(df, key, text, n)
    if candidates is not None:
        members = (
            candidates.select(F.col("a").alias(key))
            .unionByName(candidates.select(F.col("b").alias(key)))
            .distinct()
        )
        sh = sh.join(members, key, "left_semi")
    sh = sh.cache()
    sizes = sh.groupBy(key).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(key).alias("a"), "shingle")
    b = sh.select(F.col(key).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates.select("a", "b").distinct(), ["a", "b"], "left_semi")
    out = (
        inter.join(sizes.select(F.col(key).alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col(key).alias("b"), F.col("n_sh").alias("nb")), "b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def minhash_signatures(
    df: DataFrame, key: str = "url", text: str = "text", n: int = 3, bands: int = 4
) -> DataFrame:
    """(key, band, sig): per band, sig = min(md5(band || '|' || shingle)).

    Simulates `bands` independent hash functions by salting md5 — portable
    across engines (the DuckDB oracle reproduces it exactly). One-row-per-
    band signatures are the LSH bucketing keys.
    """
    sh = shingles(df, key, text, n)
    bands_df = df.sparkSession.range(bands).select(F.col("id").cast("int").alias("band"))
    return (
        sh.crossJoin(F.broadcast(bands_df))
        .select(
            F.col(key),
            "band",
            F.md5(F.concat(F.col("band").cast("string"), F.lit("|"), F.col("shingle"))).alias("h"),
        )
        .groupBy(key, "band")
        .agg(F.min("h").alias("sig"))
    )


def minhash_candidates(
    df: DataFrame,
    key: str = "url",
    text: str = "text",
    n: int = 3,
    bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any (band, sig) bucket → (a, b).

    The scale path for near-dup: shuffle is keyed on (band, sig) buckets,
    never all-pairs. Skewed mega-buckets (boilerplate / degenerate-vocab
    corpora) are the known hazard: a bucket of m docs emits m² pairs, so
    one boilerplate bucket at web scale is a job-killer. ``max_bucket``
    drops buckets larger than the cap before the self-join (the standard
    mitigation — a bucket that big is boilerplate, not near-duplication;
    AQE skew-join only rebalances the pain, the cap removes it).
    """
    sig = minhash_signatures(df, key, text, n, bands)
    if max_bucket is not None:
        from pyspark.sql import Window as W

        sig = (
            sig.withColumn(
                "_bn", F.count("*").over(W.partitionBy("band", "sig"))
            )
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    a = sig.select(F.col(key).alias("a"), "band", "sig")
    b = sig.select(F.col(key).alias("b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def simhash16(df: DataFrame, key: str = "url", text: str = "text") -> DataFrame:
    """16-bit SimHash as pure Column expressions → (key, simhash string).

    Bit j (1-based hex position of md5(term)) votes +tf when the top bit
    of nibble j is set, −tf otherwise; fingerprint bit = vote > 0. This
    variant exists to be oracle-checkable in SQL; `simhash64` below is the
    production-strength numpy version.
    """
    tf_udf = term_freqs_udf()
    tf = (
        df.select(F.col(key), tf_udf(F.col(key), F.col(text)).alias("tfs"))
        .select(F.col(key), F.explode("tfs").alias("p"))
        .select(F.col(key), F.col("p.term").alias("term"), F.col("p.tf").alias("tf"))
        .withColumn("h", F.md5("term"))
    )
    votes = [
        F.sum(
            F.when(
                F.substring("h", j, 1).isin(*"89abcdef"), F.col("tf")
            ).otherwise(-F.col("tf"))
        ).alias(f"v{j}")
        for j in range(1, 17)
    ]
    agg = tf.groupBy(key).agg(*votes)
    bits = [F.when(F.col(f"v{j}") > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(1, 17)]
    return agg.select(F.col(key), F.concat(*bits).alias("simhash"))


def simhash64(df: DataFrame, key: str = "url", text: str = "text") -> DataFrame:
    """64-bit SimHash via a vectorized Arrow UDF (numpy bit votes).

    (key, simhash:long). Near-dup pairs = hamming distance ≤ k, found by
    banding the 64 bits into 4×16-bit keys (pigeonhole: hamming ≤ 3 pairs
    share at least one exact 16-bit band).
    """
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from search_suite_spark.functions.normalise import normalise

    @pandas_udf("long")
    def _simhash(urls: pd.Series, texts: pd.Series) -> pd.Series:
        out = []
        for url, text_ in zip(urls, texts):
            counts: dict[str, int] = {}
            for t in normalise(url if isinstance(url, str) else ""):
                counts[t] = counts.get(t, 0) + 1
            for t in normalise(text_ if isinstance(text_, str) else ""):
                counts[t] = counts.get(t, 0) + 1
            votes = np.zeros(64, dtype=np.int64)
            for t, c in counts.items():
                h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                bits = (h >> np.arange(64)) & 1
                votes += np.where(bits == 1, c, -c)
            fp = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            out.append(fp - (1 << 64) if fp >= (1 << 63) else fp)
        return pd.Series(out, dtype="int64")

    return df.select(F.col(key), _simhash(F.col(key), F.col(text)).alias("simhash"))


def simhash_candidates(sim: DataFrame, key_a: str = "a", max_hamming: int = 3) -> DataFrame:
    """Band the 64-bit simhash into 4×16-bit keys and bucket-join; verify
    hamming ≤ max_hamming via bit_count(xor). Never all-pairs."""
    banded = sim.select(
        F.col(sim.columns[0]).alias("k"),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("bkey"),
                )
                for i in range(4)
            ])
        ).alias("bk"),
    ).select("k", "simhash", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    a = banded.select(F.col("k").alias("a"), F.col("simhash").alias("sa"), "band", "bkey")
    b = banded.select(F.col("k").alias("b"), F.col("simhash").alias("sb"), "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    emb: DataFrame, key: str = "vec_id", vec: str = "embedding", threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ threshold → (a, b, cos).

    All-pairs verification path (small corpora); the scale path buckets by
    hyperplane-LSH first (similarity.lsh_buckets) so the join is banded.
    """
    withnorm = emb.select(
        F.col(key),
        F.col(vec),
        F.sqrt(
            F.aggregate(
                F.col(vec), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            )
        ).alias("norm"),
    )
    a = withnorm.select(
        F.col(key).alias("a"), F.col(vec).alias("va"), F.col("norm").alias("na")
    )
    b = withnorm.select(
        F.col(key).alias("b"), F.col(vec).alias("vb"), F.col("norm").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 6).alias("cos"))
    )


def _sym(edges: DataFrame) -> DataFrame:
    return edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge set in canonical form: u < v, no self-loops,
    distinct."""
    return (
        edges.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )


def _star_contraction(edges0: DataFrame, max_rounds: int = 60) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", Algorithm 2) → (url, cluster = component min).

    Each round rewires edges toward local minima:
      large-star: per node u with m = min(Γ(u) ∪ {u}), every strictly
        LARGER neighbor v > u re-attaches as (v, m);
      small-star: per node u over its smaller neighbors N = {v < u},
        with m = min(N), every v ∈ N re-attaches as (v, m) and u keeps
        (u, m).
    The edge set converges in O(log² n) rounds INDEPENDENT of graph
    diameter — the scale path for adversarial chain-shaped dup graphs
    where diameter-round label propagation would need thousands of
    shuffles. At the fixed point every component is a star on its min
    node; labels read off as each node's min neighbor. Convergence is
    detected by an (edge count, xxhash64 sum) signature — one 1-row agg
    job per round; localCheckpoint truncates lineage per round.
    """
    E = _canon(edges0).localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_rounds):
        # large-star
        sym = _sym(E)
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", F.col("u")).alias("m"))
        )
        large = _canon(
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star over edges oriented big→small (E is already u < v)
        directed = large.select(
            F.col("v").alias("u"), F.col("u").alias("v")
        )
        smins = (
            directed.groupBy("u")
            .agg(F.min("v").alias("m"))
        )
        small = _canon(
            directed.join(smins, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionAll(smins.select(F.col("u").alias("a"), "m"))
            .select(F.col("a").alias("u"), F.col("b").alias("v"))
        )
        E = small.localCheckpoint(eager=True)
        # per-edge hash folded to < 10^6 so the ANSI-mode sum cannot
        # overflow a long even at 10^12 edges; a false match needs a
        # different edge set with identical count AND folded-hash sum
        # in consecutive rounds of a converging contraction
        sig = E.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(999983))), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"star contraction did not stabilize in {max_rounds} rounds"
        )
    # at the fixed point each node's min neighbor IS its component min;
    # label every ORIGINAL node (roots have no smaller neighbor → self)
    nodes = _sym(_canon(edges0)).select(F.col("u").alias("url")).distinct()
    starmap = (
        _sym(E)
        .groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(F.col("u").alias("url"), F.least("mn", F.col("u")).alias("c"))
    )
    return nodes.join(starmap, "url", "left").select(
        "url", F.coalesce(F.col("c"), F.col("url")).alias("cluster")
    )


def connected_components(
    pairs: DataFrame, max_iter: int = 20, method: str = "auto"
) -> DataFrame:
    """Connected components over an undirected (a, b) pair frame →
    (url, cluster), cluster = MIN key reachable from url (lexicographic,
    so the representative is deterministic and DuckDB-reproducible).

    Min-label propagation: each round every node adopts the smallest
    label in its closed neighborhood; one distributed join + aggregate
    per round, converging in graph-diameter rounds with an exact
    convergence check (count of changed labels — one small driver action
    per round). Near-dup graphs are LSH-bucket near-cliques with
    diameter 2-4, so the loop is short; when an adversarial long-chain
    graph fails to converge in ``max_iter`` rounds, ``method="auto"``
    falls back to the diameter-independent star contraction
    (_star_contraction) instead of raising. ``method`` forces a path:
    "label" (raise on non-convergence, the pre-round-4 contract) or
    "star" (skip label propagation entirely). localCheckpoint truncates
    the plan each round so the lineage does not grow with iterations.

    The reference has no component stage at all (its only dedupe is
    pairwise newest-wins by url, indexer-qp2/src/merge/common_urls.rs);
    this is the step a training-data pipeline needs between pairwise
    near-dup output and "keep one doc per cluster".
    """
    if method not in ("auto", "label", "star"):
        raise ValueError(f"unknown method {method!r}")
    edges = (
        pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(pairs.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if method == "star":
        return _star_contraction(edges)
    labels = (
        edges.select(F.col("u").alias("url"))
        .distinct()
        .withColumn("label", F.col("url"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh_min = (
            edges.join(labels, edges.v == labels.url)
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh_min, labels.url == neigh_min.u, "left")
            .select(
                "url",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "url")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("url", F.col("label").alias("cluster"))
    if method == "auto":
        return _star_contraction(edges)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the pair graph has pathological diameter — use method='auto' "
        "or 'star' for the diameter-independent star contraction"
    )


def dedup_keep_canonical(
    df: DataFrame, pairs: DataFrame, key: str = "url"
) -> DataFrame:
    """(key, cluster, keep): cluster = min key of the doc's near-dup
    component (the doc itself when it has no dup pair), keep = 1 for the
    one canonical doc per cluster, 0 for the rest.

    The end-to-end LSM-pipeline dedup verdict: LSH proposes pairs,
    Jaccard verifies, components group, and this selects — filtering
    `keep = 1` yields the deduplicated corpus."""
    cc = connected_components(pairs)
    return df.select(F.col(key)).join(cc, df[key] == cc.url, "left").select(
        df[key],
        F.coalesce(F.col("cluster"), df[key]).alias("cluster"),
        (df[key] == F.coalesce(F.col("cluster"), df[key]))
        .cast("long")
        .alias("keep"),
    )
