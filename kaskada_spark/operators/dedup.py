"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's operator set (driver mandate): exact dedup,
MinHash+LSH near-dup, SimHash, and n-gram Jaccard — all expressed as
DataFrame plans with md5-derived hashing so an external SQL engine can
reproduce results bit-for-bit (correctness oracles), and all built to
scale: hash-groupBy for exact, band-bucket self-joins for LSH (no n²
cross join), explode+hash-agg for simhash.

Scale notes (100 TB): the LSH self-join shuffles on (band, bucket) —
bucket sizes are bounded by near-duplicate cluster sizes, and AQE's
skew-join splitting handles pathological buckets (e.g. boilerplate
docs). Signatures are fixed-width (k longs/doc), so the signature table
is tiny relative to the corpus and the join side is prunable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

WORD_PATTERN = "[a-z0-9]+"


def words(text: Column) -> Column:
    """Lowercased word array (SQL-reproducible tokenization)."""
    return F.regexp_extract_all(F.lower(text), F.lit(WORD_PATTERN), 0)


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct).

    Built as zip_with over n shifted slices of the word array. The
    naive form — transform(sequence(...), i -> concat(element_at(w, i),
    element_at(w, i+1), ...)) — re-evaluates the whole words() regexp
    pipeline PER ELEMENT (higher-order-function lambdas are not
    common-subexpression-eliminated), i.e. O(words^2) regexp work per
    document; measured 5-10x slower on real documents. Here each
    shifted slice evaluates words() once (constant factor n+1)."""
    w = words(text)
    size = F.size(w)
    shifted = [
        F.slice(w, j + 1, F.greatest(size - j, F.lit(0))) for j in range(n)
    ]
    grams = shifted[0]
    for nxt in shifted[1:]:
        grams = F.zip_with(grams, nxt, lambda a, b: F.concat_ws(" ", a, b))
    # zip_with pads the shorter side with null -> the trailing n-1
    # entries are partial grams; keep only the full n-grams
    full = F.slice(grams, 1, F.greatest(size - (n - 1), F.lit(0)))
    return F.array_distinct(full)


def _md5_hash28(c: Column) -> Column:
    """28-bit deterministic hash: first 7 hex digits of md5 (the
    SQL-reproducible analogue of the reference's hash kernel)."""
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate clusters by content hash: one row per distinct
    content with the representative (min id) and copy count. One
    hash-groupBy — map-side partial agg, scales linearly."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


#: affine MinHash family over the largest prime < 2^28: family i maps a
#: 28-bit base hash b to (A_i * b + C_i) mod P. ONE md5 per shingle
#: (the base) instead of num_hashes md5s — measured dominant cost of the
#: signature stage — and still exactly SQL-reproducible (the oracle
#: applies the same affine map). Constants: A_i/C_i derived from fixed
#: odd multipliers so every engine agrees.
MINHASH_P = 268435399  # largest prime < 2^28
MINHASH_SENTINEL = 1 << 28  # > any h mod P; empty shingle sets keep it


def _family(i: int) -> tuple[int, int]:
    # deterministic, engine-independent constants (odd, non-zero)
    return (2 * i + 1) * 40503 + 1, (i + 1) * 1299721


def minhash_signature(text: Column, num_hashes: int = 8, shingle_n: int = 3) -> Column:
    """MinHash signature (array<long>, length num_hashes) over word
    shingles. base = md5(shingle)[:7 hex] (28 bits); family i =
    (A_i * base + C_i) mod P. Empty shingle sets get sentinel 2^28 (no
    family value can reach it: values are < P < 2^28)."""
    sh = shingles(text, shingle_n)
    base = F.transform(sh, _md5_hash28)
    mins = []
    for i in range(num_hashes):
        a_i, c_i = _family(i)
        mins.append(
            F.coalesce(
                F.array_min(F.transform(base, lambda b: (b * a_i + c_i) % MINHASH_P)),
                F.lit(MINHASH_SENTINEL),
            )
        )
    return F.array(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    cache_registry: list | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    Signature is split into ``bands`` bands of ``num_hashes/bands`` rows;
    docs sharing any band bucket become a candidate pair (id_a < id_b,
    distinct). The expensive part is a self-join per bucket — shuffled
    on the bucket key, never a global cross join.

    ``cache_registry``: explicit cache lifecycle for long-lived sessions
    (e.g. a foreachBatch loop) — the persisted intermediate frame is
    appended to the list so the caller can ``.unpersist()`` it once the
    result is materialized. Default (None) leaves the blocks to Spark's
    ContextCleaner, which frees them when the plan is GC'd.
    """
    rows_per_band = num_hashes // bands
    # Signature via explode + groupBy-min, NOT num_hashes parallel
    # array_min(transform(shingles...)) projections: higher-order-function
    # lambdas are not common-subexpression-eliminated, so the array form
    # re-evaluates the whole shingle pipeline once per hash family
    # (measured 10x slower). Exploding materializes each shingle exactly
    # once; the min-agg combines map-side, so the shuffle carries ~1 row
    # per (doc, partition) — the scalable shape at corpus scale.
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode_outer(shingles(F.col(text_col), shingle_n)).alias("s"),
    )
    base = _md5_hash28(F.col("s"))
    hashed = sh.select(
        "doc",
        *[
            ((base * _family(i)[0] + _family(i)[1]) % MINHASH_P).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )
    # empty-shingle docs (explode_outer null row) keep the sentinel sig,
    # matching minhash_signature()
    sig = hashed.groupBy("doc").agg(
        *[
            F.coalesce(F.min(f"h{i}"), F.lit(MINHASH_SENTINEL)).alias(f"m{i}")
            for i in range(num_hashes)
        ]
    )
    banded = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"m{b * rows_per_band + r}").cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # the banded frame feeds both self-join sides: persist it so the
    # signature stage (shingle explode + min-agg shuffle, the dominant
    # cost) runs once, not once per join branch (ContextCleaner frees
    # the blocks when the result plan is garbage-collected)
    from pyspark.storagelevel import StorageLevel

    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    if cache_registry is not None:
        cache_registry.append(banded)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )


def near_dup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    cache_registry: list | None = None,
) -> DataFrame:
    """Near-duplicate CLUSTERS: MinHash-LSH candidate pairs → connected
    components → one (doc, cluster_id) row per document, cluster_id =
    min doc id in the duplicate group (singletons label themselves).

    This is the complete dedup decision: keep `doc == cluster_id`, drop
    the rest. The component step is large-star/small-star
    (operators/graph.py) — O(log n) rounds at any corpus size. The
    label table only contains docs that appear in some pair (duplicate
    graphs are sparse: at web scale ~30-40% of docs, often far less),
    so the final enrichment join is corpus ⟕ labels on the corpus's own
    id — AQE broadcasts the label side when small."""
    from .graph import connected_components

    pairs = minhash_lsh_pairs(
        df, id_col, text_col, num_hashes=num_hashes, bands=bands,
        shingle_n=shingle_n, cache_registry=cache_registry,
    )
    labels = connected_components(pairs)
    ids = df.select(F.col(id_col).cast("long").alias("doc"))
    return ids.join(labels, ids["doc"] == labels["node"], "left").select(
        "doc", F.coalesce("cluster_id", "doc").alias("cluster_id")
    )


def word_hashes(text: Column) -> Column:
    """16-bit word hashes (md5 prefix — cross-engine reproducible, the
    DuckDB oracle computes the identical value) as an array column, for
    staging ahead of :func:`simhash16`."""
    return F.transform(
        words(text),
        lambda x: F.conv(F.substring(F.md5(x), 1, 4), 16, 10).cast("long"),
    )


def simhash16(text: Column | None = None, *, hv: Column | None = None) -> Column:
    """16-bit SimHash over (non-distinct) words: bit j of the output is
    the sign of sum over words of ±1 by word-hash bit j. Pure
    `aggregate` over an in-row array — no shuffle at all.

    Two forms, bit-identical output:

    - ``simhash16(text)``: self-contained single expression — the
      per-bit counts fold as ONE pass that rebuilds a 16-element array
      per word (HOF lambdas are not CSE'd, so the word-hash transform
      must be referenced exactly once here).
    - ``simhash16(hv=F.col("__hv"))`` with :func:`word_hashes` staged
      into a projected column: 16 independent scalar folds — no
      per-word array allocation, ~30% faster at sf0.1 (the hv column is
      a plain reference, so reading it 16 times costs nothing).

    Sign identity: sum of ±1 over words = 2·ones − n, so "> 0" is
    "2·ones > n" in the staged form.
    """
    if hv is None:
        hv_once = word_hashes(text)
        # per-bit counts via aggregate into a 16-element vector
        zero = F.array(*[F.lit(0).cast("long") for _ in range(16)])
        counts = F.aggregate(
            hv_once,
            zero,
            lambda acc, h: F.array(
                *[
                    F.element_at(acc, j + 1)
                    + F.when(h.bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1)
                    for j in range(16)
                ]
            ),
        )
        bits = [
            F.when(F.element_at(counts, j + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(16)
        ]
    else:
        n = F.size(hv)

        def _fold_bit(j):
            # closure factory: pyspark inspects the lambda's arity (an
            # extra default arg would make it look like a 3-arg merge fn)
            return F.aggregate(
                hv,
                F.lit(0).cast("long"),
                lambda a, h: a + F.shiftright(h, j).bitwiseAND(F.lit(1)),
            )

        ones = [_fold_bit(j) for j in range(16)]
        bits = [
            F.when(ones[j] * 2 > n, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(16)
        ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, pair_col: str, n: int = 3
) -> DataFrame:
    """Jaccard similarity over word n-gram shingle sets for adjacent
    document pairs within ``pair_col`` groups (rank-neighbor pairing —
    a deterministic, O(n) pair generator useful for sampled dup audits).
    """
    # adjacent pairing via lag() over the group order: the previous
    # doc's shingle array arrives on the SAME row — no self-join, no
    # second shingle computation, one shuffle on the group key total
    w = W.partitionBy("grp").orderBy("doc")
    sh = df.select(
        F.col(pair_col).alias("grp"),
        F.col(id_col).alias("doc"),
        shingles(F.col(text_col), n).alias("sh"),
    )
    paired = (
        sh.withColumn("prev_doc", F.lag("doc").over(w))
        .withColumn("prev_sh", F.lag("sh").over(w))
        .filter(F.col("prev_doc").isNotNull())
    )
    inter = F.size(F.array_intersect(F.col("prev_sh"), F.col("sh")))
    union = F.size(F.col("prev_sh")) + F.size(F.col("sh")) - inter
    return paired.select(
        "grp",
        F.col("prev_doc").alias("id_a"),
        F.col("doc").alias("id_b"),
        (inter.cast("double") / F.when(union > 0, union)).alias("jaccard"),
    )
