"""Similarity search over an embedding column (array<float>).

- `cosine_topk` — brute-force exact top-k (the correctness baseline;
  compiles to a single scan + TakeOrderedAndProject, no shuffle of the
  full corpus).
- `lsh_buckets` / `lsh_ann_topk` — random-hyperplane LSH bucketing as the
  scale path: the query probes only its own bucket(s), so a 10^12-row
  corpus is pruned to a bucket-sized candidate set before exact rescoring.

Hyperplanes are pseudo-random but *portable*: component (p, i) is derived
from md5(f"{p}_{i}") so any engine (incl. the DuckDB oracle) regenerates
the identical planes — no RNG state to ship.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(v):
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, key: str = "vec_id", vec: str = "embedding"
) -> DataFrame:
    """Exact brute-force cosine top-k → (key, cos) desc."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(key),
        (_dot(F.col(vec), q) / (_norm(F.col(vec)) * F.lit(_py_norm(query_vec)))).alias("cos"),
    )
    return (
        scored.select(key, F.round("cos", 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(key))
        .limit(k)
    )


def _py_norm(v: list[float]) -> float:
    return sum(float(x) * float(x) for x in v) ** 0.5


def hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane: sign p_i = top bit of md5(f"{p}_{i}")."""
    out = []
    for i in range(dim):
        b = hashlib.md5(f"{plane}_{i}".encode()).digest()[0]
        out.append(1.0 if b >= 128 else -1.0)
    return out


def lsh_bucket_expr(vec: str, planes: list[list[float]]):
    """Bit-string bucket id: one bit per plane = sign(dot(v, plane))."""
    bits = []
    for p in planes:
        pv = F.array(*[F.lit(x) for x in p])
        bits.append(F.when(_dot(F.col(vec), pv) > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_buckets(
    emb: DataFrame, n_planes: int = 8, dim: int = 64, key: str = "vec_id", vec: str = "embedding"
) -> DataFrame:
    planes = [hyperplane(p, dim) for p in range(n_planes)]
    return emb.select(F.col(key), F.col(vec), lsh_bucket_expr(vec, planes).alias("bucket"))


def lsh_ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    key: str = "vec_id",
    vec: str = "embedding",
    multiprobe: int = 0,
) -> DataFrame:
    """ANN: restrict to the query's LSH bucket(s), then exact top-k inside.

    Approximate — recall depends on n_planes. ``multiprobe`` > 0 also
    probes every bucket within hamming distance `multiprobe` of the
    query's bucket (the standard multi-probe LSH recall lever: a vector
    one wrong-side-of-one-hyperplane away lands in a hamming-1 bucket).
    The probe set is tiny and driver-computed (Σ C(n_planes, d) ids), so
    the scan prune stays a simple isin filter.
    """
    from itertools import combinations

    dim = len(query_vec)
    planes = [hyperplane(p, dim) for p in range(n_planes)]
    qbucket = "".join(
        "1" if sum(q * h for q, h in zip(query_vec, p)) > 0 else "0" for p in planes
    )
    probes = {qbucket}
    for d in range(1, multiprobe + 1):
        for flips in combinations(range(n_planes), d):
            b = list(qbucket)
            for i in flips:
                b[i] = "0" if b[i] == "1" else "1"
            probes.add("".join(b))
    bucketed = lsh_buckets(emb, n_planes, dim, key, vec)
    cands = bucketed.filter(F.col("bucket").isin(sorted(probes)))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cands.select(
        F.col(key),
        (_dot(F.col(vec), q) / (_norm(F.col(vec)) * F.lit(_py_norm(query_vec)))).alias("cos"),
    )
    return (
        scored.select(key, F.round("cos", 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(key))
        .limit(k)
    )
