"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set
against the corpus, rank per query. Scale path: random-hyperplane LSH
bucketing so candidate generation is a bucket-equi-join instead of a
cross join; at 100 TB the corpus side stays partitioned, only the
bucket table shuffles.

Scale levers (a fixed small bucket count is a disguised cartesian at
100 TB — each bucket holds n/2^bits rows and the self-join is
O(n^2/2^bits)):

- ``auto_n_bits``: size the bucket count from the corpus row count so
  the EXPECTED bucket holds ~``target_bucket_rows`` rows; callers that
  pass ``n_bits=None`` get this automatically (one count() job).
- multi-band probing (``n_bands > 1``): B independent hyperplane
  tables, candidates = pairs sharing a bucket in ANY band — recovers
  the recall lost to more bits per band, exactly like the minhash
  band/bucket scheme (operators/dedup.py).
- salted split (``max_bucket_rows``): buckets over the cap are split by
  a deterministic id-hash salt so no single join group exceeds the cap;
  cross-split pairs inside a pathological bucket are sacrificed
  (documented recall trade — LSH is already approximate, and a bucket
  that large means the hash is not discriminating there anyway).

All bucket/cosine arithmetic is sequential-order double math via
`aggregate`/`zip_with` higher-order functions (JVM-side, codegen) so an
external engine reproduces identical doubles — no Python in the row
path.
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
    # norms are precomputed per VECTOR, not per pair — the cosine fold
    # is the dominant cost and each vector's norm is reused across every
    # pairing (bit-identical result: same folds, same op order)
    queries = corpus.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnorm"),
    )
    cand = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        norm(F.col(vec_col)).alias("nnorm"),
    )
    scored = (
        cand.crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim", dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm"))
        )
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


def ivf_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_cells: int
) -> DataFrame:
    """Training-free IVF coarse quantizer: the ``n_cells`` corpus
    vectors with the smallest md5(id) — a deterministic pseudo-random
    sample every engine reproduces (no k-means iterations to disagree
    on). Selection is a global top-k (TakeOrderedAndProject — no full
    sort), then cell ids 0..n_cells-1 in hash order over the tiny
    result."""
    ranked = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        F.md5(F.col(id_col).cast("string")).alias("h"),
    )
    top = ranked.orderBy("h", "cid").limit(n_cells)
    w = W.orderBy("h", "cid")
    return top.withColumn("cell", F.row_number().over(w) - 1).select(
        "cell", "cvec", norm(F.col("cvec")).alias("cnorm")
    )


def ivf_knn(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k via IVF partitioning: assign every vector to
    its nearest centroid cell, search queries exactly within their
    ``n_probe`` nearest cells only.

    Plan shape (the 100 TB story): centroid table is tiny and
    broadcast; assignment is a broadcast nested-loop + map-side-combined
    `max_by` groupBy — ONE corpus shuffle, emitting one (vector, cell)
    row per input. Candidate generation joins the assigned corpus to
    the broadcast probe table on `cell`, so each query scans ~n_probe/
    n_cells of the corpus instead of all of it. In production the
    assignment is written once as a cell-partitioned table and repeated
    query batches prune to probed cells at the parquet level; this
    function composes both steps for a single batch.

    All cosine math is the sequential-fold form (`dot`/`norm`) so an
    external SQL engine reproduces cell assignment and ranking
    bit-exactly. Ties break to the lowest cell / neighbor id."""
    cents = ivf_centroids(corpus, id_col, vec_col, n_cells)
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        norm(F.col(vec_col)).alias("nnorm"),
    )
    scored_cells = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "csim", dot(F.col("nvec"), F.col("cvec")) / (F.col("nnorm") * F.col("cnorm"))
    )
    assigned = scored_cells.groupBy("neighbor_id").agg(
        F.max_by(
            F.struct("cell", "nvec", "nnorm"),
            F.struct(F.col("csim").alias("s"), (-F.col("cell")).alias("nc")),
        ).alias("b")
    ).select("neighbor_id", F.col("b.cell").alias("cell"),
             F.col("b.nvec").alias("nvec"), F.col("b.nnorm").alias("nnorm"))

    qvecs = corpus.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnorm"),
    )
    qscored = qvecs.crossJoin(F.broadcast(cents)).withColumn(
        "csim", dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))
    )
    wprobe = W.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("cell"))
    probes = (
        qscored.withColumn("rn", F.row_number().over(wprobe))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qvec", "qnorm", "cell")
    )

    cand = assigned.join(F.broadcast(probes), on="cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cand = cand.withColumn(
        "sim", dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


BAND_SEED_STRIDE = 1000003  # band b uses seed + b * stride (co-prime, stable)


def auto_n_bits(
    n_rows: int, target_bucket_rows: int = 256, lo: int = 4, hi: int = 24
) -> int:
    """Bucket-count sizing: 2^bits ≈ n_rows / target_bucket_rows, so the
    expected bucket stays small enough that the bucket self-join is
    O(n * target) instead of O(n^2 / 2^small_bits)."""
    import math

    if n_rows <= target_bucket_rows:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n_rows / target_bucket_rows))))


def _banded(
    df: DataFrame, vec_col: str, n_bits: int, n_bands: int, dim: int, seed: int
) -> DataFrame:
    """Attach (band, bucket) — one row per band per input row."""
    entries = []
    for band in range(n_bands):
        planes = hyperplanes(dim, n_bits, seed + band * BAND_SEED_STRIDE)
        entries.append(
            F.struct(
                F.lit(band).alias("band"),
                lsh_bucket(F.col(vec_col), planes).alias("bucket"),
            )
        )
    return df.withColumn("__bb", F.explode(F.array(*entries))).select(
        *df.columns, F.col("__bb.band").alias("band"), F.col("__bb.bucket").alias("bucket")
    )


def lsh_knn(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list,
    k: int = 5,
    n_bits: int | None = None,
    dim: int = 64,
    seed: int = 42,
    n_bands: int = 1,
    target_bucket_rows: int = 256,
    n_rows: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to buckets the query
    shares in ANY band, ranked by exact cosine. ``n_bits=None`` sizes
    the bucket count from the corpus (auto_n_bits; pass ``n_rows`` when
    cardinality is known from table stats); more bands recover recall
    lost to more bits."""
    if n_bits is None:
        n_bits = auto_n_bits(
            n_rows if n_rows is not None else corpus.count(), target_bucket_rows
        )
    bucketed = _banded(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("nvec"),
            norm(F.col(vec_col)).alias("nnorm"),
        ),
        "nvec", n_bits, n_bands, dim, seed,
    )
    queries = bucketed.filter(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"),
        F.col("nvec").alias("qvec"),
        F.col("nnorm").alias("qnorm"),
        "band",
        "bucket",
    )
    cand = bucketed.join(F.broadcast(queries), on=["band", "bucket"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    if n_bands > 1:
        cand = cand.dropDuplicates(["query_id", "neighbor_id"])  # union across bands
    cand = cand.withColumn(
        "sim", dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_bits: int | None = None,
    dim: int = 64,
    seed: int = 42,
    n_bands: int = 1,
    max_bucket_rows: int | None = None,
    target_bucket_rows: int = 256,
    n_rows: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: banded LSH self-join + exact
    cosine threshold. ``n_bits=None`` sizes buckets from the corpus
    cardinality — pass ``n_rows`` when it's already known (table
    statistics / catalog row counts at warehouse scale) to avoid the
    count job; otherwise one column-pruned count() runs. The same
    ``n_rows`` shortcut applies to ``lsh_knn``. ``max_bucket_rows``
    salts oversized (band, bucket) groups into sub-buckets so no join
    group exceeds the cap (cross-salt pairs in a pathological bucket
    are dropped — documented recall trade).

    ``cache_registry``: explicit cache lifecycle — the persisted
    bucketed frame is appended so long-lived callers (foreachBatch
    loops) can ``.unpersist()`` after materializing; default None
    leaves cleanup to the ContextCleaner."""
    if n_bits is None:
        n_bits = auto_n_bits(
            n_rows if n_rows is not None else corpus.count(), target_bucket_rows
        )
    b = _banded(
        corpus.select(
            F.col(id_col).alias("doc"),
            F.col(vec_col).alias("vec"),
            norm(F.col(vec_col)).alias("nrm"),
        ),
        "vec", n_bits, n_bands, dim, seed,
    )
    join_keys = ["band", "bucket"]
    if max_bucket_rows is not None:
        counts = b.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("__bn"))
        n_salt = F.greatest(
            F.ceil(F.col("__bn") / F.lit(max_bucket_rows)).cast("int"), F.lit(1)
        )
        b = (
            b.join(F.broadcast(counts), on=["band", "bucket"])
            .withColumn("salt", F.pmod(F.xxhash64(F.col("doc")), n_salt).cast("int"))
            .drop("__bn")
        )
        join_keys = ["band", "bucket", "salt"]
    # the bucketed frame feeds BOTH self-join sides (and the count agg
    # when salting) — persist it so the hyperplane dot products run once
    # per row, not once per plan branch (Spark ML's MinHashLSH persists
    # its hash table for the same reason; the ContextCleaner unpersists
    # the blocks once the result plan is garbage-collected)
    from pyspark.storagelevel import StorageLevel

    b = b.persist(StorageLevel.MEMORY_AND_DISK)
    if cache_registry is not None:
        cache_registry.append(b)
    l, r = b.alias("l"), b.alias("r")
    cand = (
        l.join(r, on=join_keys)
        .filter(F.col("l.doc") < F.col("r.doc"))
        .select(
            F.col("l.doc").alias("id_a"),
            F.col("r.doc").alias("id_b"),
            F.col("l.vec").alias("__va"),
            F.col("r.vec").alias("__vb"),
            F.col("l.nrm").alias("__na"),
            F.col("r.nrm").alias("__nb"),
        )
    )
    if n_bands > 1:
        cand = cand.dropDuplicates(["id_a", "id_b"])  # union across bands
    return (
        cand.withColumn(
            "sim", dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
        )
        .filter(F.col("sim") > threshold)
        .select("id_a", "id_b", "sim")
    )
