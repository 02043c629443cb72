"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set
against the corpus, rank per query. Scale path: random-hyperplane LSH
bucketing so candidate generation is a bucket-equi-join instead of a
cross join; at 100 TB the corpus side stays partitioned, only the
bucket table shuffles.

All arithmetic is sequential-order double math via `aggregate`/
`zip_with` higher-order functions (JVM-side, codegen) so an external
engine reproduces identical doubles — no Python in the row path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_knn(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for the given query ids.

    Plan: broadcast the query vectors (tiny) against the corpus —
    no shuffle of the corpus; one per-query top-k via window rank on
    (similarity desc, id) for deterministic tie-breaks.
    """
    queries = corpus.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cand = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        cand.crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("qvec"), F.col("nvec")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1 pseudo-random hyperplanes from md5 — reproducible
    in any engine (used to make the LSH oracle exact)."""
    planes = []
    for b in range(n_bits):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"{seed}|{b}|{j}".encode()).hexdigest()
            row.append(1.0 if int(h[:2], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id (int): bit b = sign(dot(v, p_b))."""
    bits = []
    for b, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in plane]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_knn(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list,
    k: int = 5,
    n_bits: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, ranked by exact cosine. Recall trades off with n_bits."""
    planes = hyperplanes(dim, n_bits, seed)
    bucketed = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    queries = bucketed.filter(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"),
        F.col("nvec").alias("qvec"),
        "bucket",
    )
    scored = (
        bucketed.join(F.broadcast(queries), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("qvec"), F.col("nvec")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_bits: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucketed self-join + exact
    cosine threshold (bucket join keeps this off the n² path)."""
    planes = hyperplanes(dim, n_bits, seed)
    b = corpus.select(
        F.col(id_col).alias("doc"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, on="bucket")
        .filter(F.col("l.doc") < F.col("r.doc"))
        .withColumn("sim", cosine(F.col("l.vec"), F.col("r.vec")))
        .filter(F.col("sim") > threshold)
        .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"), "sim")
    )
