"""Distributed connected components — the pairs→clusters step of
near-duplicate deduplication.

LSH (operators/dedup.py) and cosine banding (operators/similarity.py)
emit candidate PAIRS; a training-data pipeline needs CLUSTERS (one
canonical doc per duplicate group, everything else dropped). Duplicate
relations are transitive only through the graph, so this is connected
components over the pair graph.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", SoCC 2014). Converges in O(log n) rounds independent of
graph diameter — the property that matters at 100 TB, where min-label
propagation's O(diameter) rounds is unbounded on chain-shaped boilerplate
clusters. Each round is two keyed aggregations + two co-partitioned
joins (the join key equals the groupBy key, so Catalyst reuses the
exchange — one shuffle per star op, not two).

The result (node -> min node id in its component) is algorithm
independent, so a SQL engine can reproduce it with a recursive
transitive-closure query — the driver oracle does exactly that.

Driver-side iteration note: the loop lives on the driver but every
round is a distributed job; per-round `localCheckpoint` truncates the
logical plan (iterative self-joins otherwise stack exponentially deep
lineage). On a production cluster prefer `spark.sparkContext.
setCheckpointDir` + reliable `checkpoint()` for fault tolerance across
long jobs; localCheckpoint keeps blocks executor-local which is the
right latency trade inside one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Both directions of every edge, self-loops dropped: (u, v)."""
    return (
        edges.filter(F.col("u") != F.col("v"))
        .unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: for every node u with neighborhood G(u), connect each
    strictly larger neighbor v > u to m = min(G(u) + {u}).

    Input and output are symmetric-closed edge lists (u, v); the output
    re-adds both directions for the next star op.
    """
    both = _symmetrize(edges)
    mins = both.groupBy("u").agg(F.min("v").alias("min_v"))
    mins = mins.select("u", F.least("min_v", F.col("u")).alias("m"))
    # join key u == groupBy key u -> exchange reuse, single shuffle
    out = (
        both.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: key every edge by its larger endpoint u; with small
    neighborhood S(u) = {v : (u,v), v < u}, connect each v in S(u) and u
    itself to m = min(S(u))."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    relinked = (
        directed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    centers = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        relinked.unionByName(centers)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _checksum(edges: DataFrame):
    """(count, xor-ish hash) fingerprint for convergence detection —
    one tiny aggregate job per round."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.xxhash64("u", "v") % F.lit(1 << 40)), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def _finish_single_task(edges: DataFrame) -> DataFrame:
    """Label a SMALL edge set (everything in one task) with vectorized
    min-label propagation + pointer jumping — O(E) numpy work per pass,
    O(log n) passes, ONE Spark job.

    This is the standard two-phase trick for iterative graph algorithms
    (GraphFrames/Pregel do the same): the distributed star rounds shrink
    the graph, and once the remainder fits a task the tail rounds —
    each a multi-job round trip — collapse into one executor-side
    kernel. No driver collect; the data never leaves the executors.
    """
    import pandas as pd  # noqa: F401 — mapInPandas contract

    def kernel(batches):
        import numpy as np
        import pandas as pd

        us, vs = [], []
        for pdf in batches:
            us.append(pdf["u"].to_numpy(dtype="int64"))
            vs.append(pdf["v"].to_numpy(dtype="int64"))
        if not us:
            return
        u = np.concatenate(us)
        v = np.concatenate(vs)
        nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        iu, iv = inv[: len(u)], inv[len(u):]
        label = np.arange(len(nodes), dtype="int64")
        while True:
            before = label.copy()
            m = np.minimum(label[iu], label[iv])
            np.minimum.at(label, iu, m)
            np.minimum.at(label, iv, m)
            label = np.minimum(label, label[label])  # pointer jumping
            if np.array_equal(label, before):
                break
        yield pd.DataFrame({"node": nodes, "cluster_id": nodes[label]})

    return edges.coalesce(1).mapInPandas(kernel, "node long, cluster_id long")


#: Below this many edges the remaining graph goes through the one-job
#: single-task kernel instead of more star rounds. 2M edges ≈ 32 MB of
#: int64 pairs — comfortably one task; LSH candidate graphs are sparse,
#: so even web-scale corpora usually drop under this after 1-2 rounds.
LOCAL_FINISH_EDGES = 2_000_000


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
    local_finish_edges: int = LOCAL_FINISH_EDGES,
) -> DataFrame:
    """Connected components of an undirected pair graph.

    Returns (node: long, cluster_id: long) for every node that appears
    in at least one pair, where cluster_id is the MINIMUM node id in the
    component (the conventional canonical representative). Nodes absent
    from `pairs` are their own singleton cluster — join the result back
    to the corpus with `coalesce(cluster_id, id)` (see
    `dedup.near_dup_clusters`).

    `max_rounds` is a safety rail: large-star/small-star provably
    converges in O(log n) rounds, so 25 covers any realistic corpus
    (2^25 node components); hitting the rail raises rather than
    returning a partial clustering.
    """
    edges = pairs.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    # checkpoint FIRST: the upstream pair plan (LSH band join etc.) is
    # expensive, and a separate head(1)/count probe would evaluate it a
    # second time — the checksum on the checkpointed blocks answers the
    # emptiness question for free
    edges = edges.localCheckpoint(eager=True)
    prev = _checksum(edges)
    if prev[0] == 0:
        spark = pairs.sparkSession
        return spark.createDataFrame([], "node long, cluster_id long")
    if prev[0] <= local_finish_edges:
        return _finish_single_task(edges)
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _checksum(nxt)
        edges = nxt
        if cur[0] <= local_finish_edges:
            # graph shrank under the single-task bar: the remaining
            # rounds (multi-job each) collapse into one kernel job
            return _finish_single_task(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    # At the fixed point edges form stars (child -> root). Label = min
    # over the symmetric neighborhood and self, which is the component
    # min for stars (children see the root; the root sees children but
    # least() keeps itself).
    both = _symmetrize(edges)
    return (
        both.groupBy("u")
        .agg(F.min("v").alias("min_nbr"))
        .select(
            F.col("u").alias("node"),
            F.least("min_nbr", F.col("u")).alias("cluster_id"),
        )
    )
