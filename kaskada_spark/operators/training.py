"""Training-data assembly operators over the pre-tokenized sequence table.

These cover the two pipeline steps between "clean corpus" and "batches
on the trainer": benchmark decontamination and fixed-budget sequence
packing. Both are pure Catalyst (no Python in the row path) and are
shaped for the 100 TB corpus:

- ``decontaminate``: the probe side (benchmark/eval sets) is orders of
  magnitude smaller than the corpus — its distinct shingle-hash set is
  broadcast, so the corpus side is a map-only explode + broadcast hash
  semi-join; the only corpus-keyed shuffle is the final per-doc count.
- ``pack_sequences``: the classic concatenate-and-split-every-B-tokens
  layout (GPT-style stream packing). The per-source running token count
  is a single keyed window at small scale, or the segmented parallel
  prefix-sum (operators/skew.py pattern) when one source exceeds a
  task's worth of rows — at 10^12 sequences over ~20 sources every
  source does, so the segmented form is the default scale shape.

Reference parity note: the reference engine stops at feature
computation (its outputs feed a feature store, docs/docs-src); these
operators extend the same timeline frame into the LLM-training domain
per the driver's north rule, they do not mirror a reference operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kaskada_spark.operators.dedup import _md5_hash28, shingles


def decontaminate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    probes: DataFrame,
    probe_text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Flag corpus documents sharing word ``shingle_n``-gram shingles
    with a probe (benchmark / eval) corpus.

    Returns one row per corpus document: ``(doc, n_hits,
    contaminated)`` where ``n_hits`` counts the document's DISTINCT
    shingles that appear anywhere in the probe corpus.

    Scale shape: ``probes`` is collected to a distinct 28-bit
    shingle-hash relation and broadcast — eval sets are ~10^5 rows vs
    ~10^9+ corpus docs, so the big side never shuffles for the join;
    the per-doc hit count is one map-side-combinable groupBy on the
    (already exploded) doc id, and zero-hit docs are restored with a
    broadcast-friendly left join against the (small) hit counts.
    """
    probe_hashes = (
        probes.select(F.explode(shingles(F.col(probe_text_col), shingle_n)).alias("s"))
        .select(_md5_hash28(F.col("s")).alias("h"))
        .distinct()
    )
    doc_shingles = docs.select(
        F.col(id_col).alias("__doc"),
        F.explode_outer(shingles(F.col(text_col), shingle_n)).alias("s"),
    ).withColumn("h", _md5_hash28(F.col("s")))
    hits = (
        doc_shingles.join(F.broadcast(probe_hashes), "h", "left_semi")
        .groupBy("__doc")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("__doc"))
        .join(hits, "__doc", "left")
        .select(
            F.col("__doc").cast("long").alias("doc"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def _seg_key_value(v) -> int:
    """Driver-side bound -> the long key space ``_value_segment`` buckets
    in (microseconds for timestamps, the value itself for integers)."""
    from datetime import datetime, timedelta

    if isinstance(v, datetime):
        epoch = datetime(1970, 1, 1, tzinfo=v.tzinfo)
        return (v - epoch) // timedelta(microseconds=1)
    return int(v)


def _value_segment(
    df: DataFrame, order_col: str, n_segments: int, bounds: tuple | None
) -> Column:
    """Monotone fixed-width bucket of ``order_col`` into
    ``[0, n_segments)`` — the segment id for distributed prefix sums.

    Monotonicity in the order column is the only property the prefix
    recombination needs; equal-width buckets over [lo, hi] provide it
    with a map-only expression (no range-partitioner sampling pass).
    ``bounds`` short-circuits the min/max job with a table-stats lookup
    (Iceberg snapshot stats / parquet footers) — a SUPERSET range is
    fine, values are clamped into the bucket domain. Nulls order first
    in ascending sorts, so they land in bucket 0.
    """
    dtype = dict(df.dtypes).get(order_col, "")
    c = F.col(order_col)
    if dtype.startswith("timestamp"):
        key = F.unix_micros(c)
    elif dtype in ("tinyint", "smallint", "int", "bigint"):
        key = c.cast("long")
    else:
        raise ValueError(
            f"segmented packing needs a timestamp/integer leading order "
            f"column, got {order_col}:{dtype}; use segmented=False"
        )
    if bounds is not None:
        lo, hi = (_seg_key_value(b) for b in bounds)
    else:
        lo, hi = df.agg(F.min(key), F.max(key)).first()
    if lo is None or hi is None:  # empty input
        return F.lit(0).cast("long")
    width = max(1, (int(hi) - int(lo)) // n_segments + 1)
    seg = F.floor((key - F.lit(int(lo))) / F.lit(width)).cast("long")
    return F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(n_segments - 1).cast("long"), F.coalesce(seg, F.lit(0))),
    )


def pack_sequences(
    toks: DataFrame,
    budget: int = 2048,
    group_col: str = "source",
    order_cols: tuple[str, ...] = ("_time", "_subsort"),
    n_tok_col: str = "n_tok",
    segmented: bool = True,
    n_segments: int | None = None,
    seg_bounds: tuple | None = None,
) -> DataFrame:
    """Assign every pre-tokenized sequence its slot in the packed
    training stream: sequences are concatenated per ``group_col`` in
    event order and the stream is cut every ``budget`` tokens.

    Output adds ``tokens_before`` (tokens ahead of this sequence in its
    group's stream), ``pack_id = tokens_before // budget`` and
    ``pack_offset = tokens_before % budget``.

    ``segmented=False`` computes the running count with one window per
    group — fine while a group fits a task. With ``segmented=True``
    (default) the prefix sum is a true distributed two-pass scan with
    NO per-group global stage anywhere:

    1. ``__seg`` = a fixed-width VALUE bucket of the leading order
       column (``(v - lo) // width`` over ``n_segments`` equal-width
       buckets of the column's [lo, hi] range). The bucket is monotone
       in the order columns, so for rows of one group, segment order ==
       event order — the property the prefix recombination needs.
    2. Each (segment, group) computes its local running sum in
       parallel — ONE hash exchange on (segment, group); the window is
       bounded by the bucket's row count, never by group size.
    3. Per-(segment, group) totals (``<= n_segments × n_groups`` rows —
       tiny; the same exchange is reused for the hash agg) get
       exclusive prefix offsets, broadcast-joined back.

    ``seg_bounds=(lo, hi)`` supplies the leading order column's min/max
    (a table-stats lookup — Iceberg snapshot stats or parquet footer
    min/max, see ``sources.readers.parquet_column_bounds``); when
    omitted, one column-pruned ``agg(min, max)`` job derives it. A
    value-derived bucket beats ``repartitionByRange`` here twice over:
    no sampling pass (the range partitioner re-executes the upstream
    plan to sample boundaries), and no second exchange (range
    partitioning on (group, order) does not satisfy the window's hash
    requirement on (segment, group)). Time-skewed data degrades only
    the balance of segment sizes, never correctness.

    A group with 10^11 rows packs without any single task seeing more
    than one bucket of it. Results are identical to the plain window
    (integer math, no reordering). ``n_segments`` defaults to
    ``spark.sql.shuffle.partitions``.
    """
    order = [F.col(c) for c in order_cols]
    n_tok = F.col(n_tok_col).cast("long")
    if not segmented:
        w = (
            W.partitionBy(group_col)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        before = F.sum(n_tok).over(w) - n_tok
        df = toks.withColumn("tokens_before", before)
    else:
        if n_segments is None:
            n_segments = int(
                toks.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
            )
        df = toks.withColumn(
            "__seg",
            _value_segment(toks, order_cols[0], n_segments, seg_bounds),
        )
        inner = (
            W.partitionBy("__seg", group_col)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        df = df.withColumn("__run_in_seg", F.sum(n_tok).over(inner))
        seg_totals = df.groupBy("__seg", group_col).agg(
            F.sum(n_tok).alias("__seg_total")
        )
        prior = (
            W.partitionBy(group_col)
            .orderBy("__seg")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        seg_offsets = seg_totals.withColumn(
            "__seg_offset", F.coalesce(F.sum("__seg_total").over(prior), F.lit(0))
        ).drop("__seg_total")
        df = df.join(F.broadcast(seg_offsets), ["__seg", group_col]).withColumn(
            "tokens_before", F.col("__seg_offset") + F.col("__run_in_seg") - n_tok
        )
        df = df.drop("__seg", "__run_in_seg", "__seg_offset")
    return df.withColumn(
        "pack_id", F.floor(F.col("tokens_before") / budget).cast("long")
    ).withColumn("pack_offset", F.col("tokens_before") % budget)


def pack_sequences_stream(
    stream: DataFrame,
    budget: int = 2048,
    group_col: str = "source",
    n_tok_col: str = "n_tok",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Streaming pack assignment: each arriving sequence gets its
    ``tokens_before`` / ``pack_id`` / ``pack_offset`` the moment it is
    settled, via the per-key running-sum state machine re-keyed to
    ``group_col`` (the packed stream is per-source, so the source IS
    the entity here). One long per group in state — resumable from
    checkpoint like every other machine. Identical assignments to the
    batch ``pack_sequences`` on the same ordered input.
    """
    from kaskada_spark.streaming.state_machines import AggSpec, running_agg_stream

    tdf = stream.withColumn("_key", F.col(group_col))
    out = running_agg_stream(
        tdf, [AggSpec("sum", n_tok_col, "__cum_tok")], watermark=watermark
    )
    before = (
        F.col("__cum_tok").cast("long") - F.col(n_tok_col).cast("long")
    ).alias("tokens_before")
    return (
        out.withColumn("tokens_before", before)
        .withColumn("pack_id", F.floor(F.col("tokens_before") / budget).cast("long"))
        .withColumn("pack_offset", F.col("tokens_before") % budget)
        .drop("__cum_tok", "_key")
    )


def mixture_sample(
    df: DataFrame,
    rates: dict,
    id_col: str = "doc_id",
    group_col: str = "source",
    default_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-source mixture resampling — the step that turns
    :func:`source_mixture_weights` into an actual training stream.

    ``rates`` maps source -> sampling rate. rate <= 1 downsamples
    (keep-probability); rate > 1 upsamples by replication: every row
    yields ``floor(rate)`` copies plus one more where the row's hash
    falls under the fractional part. Output adds ``copy`` (0-based
    replica index), so downstream packing can interleave epochs.

    Scale/determinism shape: the keep decision is a pure function of
    ``md5(salt | doc_id)`` — no RNG state, no seed-per-partition
    coupling, identical on any cluster size, any engine, and across
    resumed runs (the property a 10^12-row resumable pipeline actually
    needs; ``df.sample`` is seed+partition-layout dependent). Map-only:
    a filter + generator explode, zero shuffles, fully pushdown-friendly.
    """
    h = _md5_hash28(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    u = h.cast("double") / F.lit(float(1 << 28))
    rate = F.lit(float(default_rate))
    for src, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == src, F.lit(float(r))).otherwise(rate)
    n_copies = F.floor(rate).cast("long") + F.when(
        u < rate - F.floor(rate), F.lit(1)
    ).otherwise(F.lit(0)).cast("long")
    out = df.withColumn("__n_copies", n_copies).filter(F.col("__n_copies") > 0)
    return out.withColumn(
        "copy", F.explode(F.sequence(F.lit(0), F.col("__n_copies") - 1))
    ).drop("__n_copies")


def train_valid_split(
    df: DataFrame,
    valid_frac: float = 0.01,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Stable train/valid assignment: ``split = 'valid'`` where
    ``md5(salt | id)`` lands in the bottom ``valid_frac`` of hash space.

    Hash-based (not random) so the assignment is a property of the ROW:
    re-runs, backfills, and late-arriving shards of a 100 TB corpus all
    agree on membership without coordination, and a document can never
    leak between splits across pipeline versions. Map-only, no shuffle.
    """
    h = _md5_hash28(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    u = h.cast("double") / F.lit(float(1 << 28))
    return df.withColumn(
        "split",
        F.when(u < F.lit(float(valid_frac)), F.lit("valid")).otherwise(
            F.lit("train")
        ),
    )


def token_histogram(
    df: DataFrame,
    tokens_col: str = "tokens",
    k: int = 50,
) -> DataFrame:
    """Top-k most frequent token ids across the corpus.

    explode → hash-agg count → TakeOrderedAndProject. The explode is a
    generator (no materialized blow-up) and the count's partial
    aggregation runs map-side, so the shuffle carries at most
    |vocab| rows per partition regardless of corpus size; the top-k is
    Spark's per-partition heap + driver merge of k rows, never a full
    sort. Deterministic tie-break: count desc, token asc.
    """
    return (
        df.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(k)
    )


def seq_length_stats(
    df: DataFrame,
    group_col: str = "source",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Per-source sequence-length distribution: count, token total,
    min/max/mean, and the EXACT median — computed from grouped length
    counts, not a per-group value buffer.

    Spark's exact `percentile` aggregate buffers every value of a group
    in memory — a non-starter at 10^12 sequences. Lengths, however,
    live in a tiny integer domain, so the median comes from the
    (source, n_tok) count table: cumulative counts locate the two
    middle ranks, decomposable end to end. Two keyed shuffles total,
    both on small per-(source, length) frames.
    """
    cnts = df.groupBy(group_col, n_tok_col).agg(
        F.count(F.lit(1)).alias("__c"),
        F.sum(F.col(n_tok_col).cast("long")).alias("__tok"),
    )
    w_cum = W.partitionBy(group_col).orderBy(n_tok_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.partitionBy(group_col).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = (
        cnts.withColumn("__cum", F.sum("__c").over(w_cum))
        .withColumn("__n", F.sum("__c").over(w_all))
    )
    # middle ranks: x_{(n+1)/2} for odd n, avg of x_{n/2}, x_{n/2+1} for even
    lo_rank = F.floor((F.col("__n") + 1) / 2)
    hi_rank = F.ceil((F.col("__n") + 1) / 2)
    val = F.col(n_tok_col).cast("double")
    return cum.groupBy(group_col).agg(
        F.max("__n").alias("n_seq"),
        F.sum("__tok").alias("total_tokens"),
        F.min(n_tok_col).alias("min_len"),
        F.max(n_tok_col).alias("max_len"),
        (F.sum("__tok").cast("double") / F.max("__n").cast("double")).alias(
            "mean_len"
        ),
        (
            (
                F.min(F.when(F.col("__cum") >= lo_rank, val))
                + F.min(F.when(F.col("__cum") >= hi_rank, val))
            )
            / F.lit(2.0)
        ).alias("median_len"),
    )


def source_mixture_weights(
    df: DataFrame,
    group_col: str = "source",
    n_tok_col: str = "n_tok",
    alpha: float = 0.7,
) -> DataFrame:
    """Exponential-smoothing sampling weights for the training mix.

    Natural share = source tokens / corpus tokens; the sampling weight
    re-normalizes share^alpha with alpha in (0, 1] — the standard
    multi-source LM mixing rule (alpha < 1 upsamples small sources;
    alpha = 1 is natural sampling). One per-source aggregate plus a
    broadcast single-row join for the corpus totals — no full-data
    second pass. The final normalizing window runs over the per-source
    frame (at most a few thousand rows at any corpus size), so its
    single partition is fine.
    """
    per = df.groupBy(group_col).agg(
        F.sum(F.col(n_tok_col).cast("long")).alias("src_tokens")
    )
    # corpus total + pow normalizer as windows over the per-source frame
    # (a separate .agg() would re-evaluate `per` and scan the corpus
    # twice); the single-partition exchange carries only one row per
    # source, and both windows share one Window node
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    share = F.col("src_tokens").cast("double") / F.sum(
        F.col("src_tokens")
    ).over(w_all).cast("double")
    powed = F.pow(share, F.lit(alpha))
    return per.select(
        group_col,
        "src_tokens",
        F.round(share, 6).alias("natural_share"),
        F.round(powed / F.sum(powed).over(w_all), 6).alias("sample_weight"),
    )


def seq_length_quantiles(
    df: DataFrame,
    group_col: str = "source",
    n_tok_col: str = "n_tok",
    qs: tuple = (0.25, 0.5, 0.75, 0.99),
) -> DataFrame:
    """EXACT per-source quantiles of an integer-domain column with
    linear interpolation (type-7, the quantile_cont convention), from
    grouped value counts — same machinery as the median in
    :func:`seq_length_stats`, generalized to any q list.

    Spark's exact `percentile` buffers every group value; this computes
    rank lookups over the (source, length) count table instead —
    decomposable at any corpus size because the integer length domain
    is tiny. For q, the value at fractional position (n-1)*q is
    v_lo + frac * (v_hi - v_lo) where v_r = min length with cumulative
    count > r. round(6) guards the one float multiply against
    cross-engine last-ulp divergence.
    """
    cnts = df.groupBy(group_col, n_tok_col).agg(F.count(F.lit(1)).alias("__c"))
    w_cum = W.partitionBy(group_col).orderBy(n_tok_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.partitionBy(group_col).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = (
        cnts.withColumn("__cum", F.sum("__c").over(w_cum))
        .withColumn("__n", F.sum("__c").over(w_all))
    )
    val = F.col(n_tok_col).cast("double")
    aggs = [F.max("__n").alias("n_seq")]
    for q in qs:
        pos = (F.col("__n") - 1).cast("double") * F.lit(float(q))
        lo_rank = F.floor(pos) + 1          # 1-based rank of v_lo
        hi_rank = F.least(lo_rank + 1, F.col("__n"))
        frac = pos - F.floor(pos).cast("double")
        v_lo = F.min(F.when(F.col("__cum") >= lo_rank, val))
        v_hi = F.min(F.when(F.col("__cum") >= hi_rank, val))
        name = f"q{round(q * 100)}"
        aggs.append(
            F.round(v_lo + F.max(frac) * (v_hi - v_lo), 6).alias(name)
        )
    return cum.groupBy(group_col).agg(*aggs)


def vocabulary_drift(
    toks: DataFrame,
    bucket: str = "minute",
    time_col: str = "_time",
    tokens_col: str = "tokens",
) -> DataFrame:
    """L1 distance between adjacent time-buckets' token distributions —
    the vocabulary-drift telemetry a streaming ingest wants per window.

    drift(w) = sum_t |p_w(t) - p_{w-1}(t)| over the union of tokens.
    Computed EXACTLY: the sum runs over integer cross products
    |cnt_w * tot_prev - cnt_prev * tot_w| (one BIGINT per token — no
    float accumulation, so the result is engine-order-independent) and
    divides by tot_w * tot_prev once at the end. Shuffles: one count
    agg on (bucket, token), one bucket-total window, one self-join on
    (token, prev bucket), one final bucket agg — all decomposable.
    """
    cnts = (
        toks.select(
            F.date_trunc(bucket, F.col(time_col)).alias("w"),
            F.explode(tokens_col).alias("token"),
        )
        .groupBy("w", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot_w = W.partitionBy("w").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cur = cnts.withColumn("tot", F.sum("cnt").over(tot_w))
    step = F.expr(f"INTERVAL 1 {bucket.upper()}")
    prev = cur.select(
        (F.col("w") + step).alias("w"),
        F.col("token"),
        F.col("cnt").alias("cnt_prev"),
        F.col("tot").alias("tot_prev"),
    )
    joined = cur.join(prev, ["w", "token"], "full_outer")
    # a bucket with no counterpart rows on one side has no tot on that
    # side for ABSENT tokens; rebroadcast per-bucket totals over the
    # joined frame so every row knows both denominators
    fixed = joined.withColumn(
        "tot", F.max("tot").over(tot_w)
    ).withColumn("tot_prev", F.max("tot_prev").over(tot_w))
    num = F.abs(
        F.coalesce(F.col("cnt"), F.lit(0)) * F.coalesce(F.col("tot_prev"), F.lit(0))
        - F.coalesce(F.col("cnt_prev"), F.lit(0)) * F.coalesce(F.col("tot"), F.lit(0))
    )
    out = fixed.groupBy("w").agg(
        # decimal(38,0): the per-token cross products can reach
        # tot^2 ~ 10^18+ at real window sizes — an int64 sum would
        # overflow (and ANSI mode raises); decimal stays exact
        F.sum(num.cast("decimal(38,0)")).alias("__num"),
        F.max("tot").alias("__tot"),
        F.max("tot_prev").alias("__tot_prev"),
    )
    return out.filter(F.col("__tot").isNotNull() & F.col("__tot_prev").isNotNull()).select(
        F.col("w").alias("window_start"),
        F.round(
            F.col("__num").cast("double")
            / (F.col("__tot").cast("double") * F.col("__tot_prev").cast("double")),
            6,
        ).alias("l1_drift"),
    )


def chunk_sequences(
    toks: DataFrame,
    max_len: int,
    overlap: int = 0,
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Split long token sequences into fixed-length training windows
    with optional overlap — the complement of :func:`pack_sequences`
    (that packs SHORT sequences into a budget; this strides LONG ones
    into model-context-sized chunks, the standard causal-LM
    preprocessing step).

    Chunk ``i`` starts at offset ``i * (max_len - overlap)``; offsets
    run while they land inside the sequence, so the final chunk may be
    short (it still carries >= 1 previously-uncovered token because the
    stride is positive). Rows with zero tokens produce no chunks.

    Output adds ``chunk_id`` (0-based), ``chunk_off``, ``chunk_len``
    and replaces ``tokens``/``n_tok`` with the chunk's slice.

    Scale shape: pure map-side — the offset list is a generator
    (``posexplode_outer`` over ``sequence``; _outer_ because the array
    is provably non-empty once ``n_tok > 0`` rows are selected, and
    plain ``explode`` would let InferFiltersFromGenerate inline staged
    upstream projections into a per-row filter), the slice is a
    whole-stage-codegen array op, and nothing shuffles. A 10^12-row
    table chunks at scan speed with zero exchanges.
    """
    if not 0 <= overlap < max_len:
        raise ValueError(f"overlap must be in [0, {max_len}), got {overlap}")
    step = max_len - overlap
    n_tok = F.col(n_tok_col)
    nz = toks.filter(n_tok > 0)
    exploded = nz.select(
        "*",
        F.posexplode_outer(
            F.sequence(F.lit(0), n_tok - 1, F.lit(step))
        ).alias("chunk_id", "chunk_off"),
    )
    out = (
        exploded.withColumn(
            "chunk_len",
            F.least(F.lit(max_len), n_tok - F.col("chunk_off")).cast("int"),
        )
        .withColumn(
            tokens_col, F.slice(tokens_col, F.col("chunk_off") + 1, max_len)
        )
        .withColumn(n_tok_col, F.col("chunk_len"))
    )
    return out


def epoch_shuffle(
    df: DataFrame,
    n_shards: int,
    seed: str = "0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order permutation: every row gets
    a ``(shard, pos)`` slot in a seeded epoch shuffle, without a global
    sort.

    ``shard = md5-hash(seed | id) % n_shards`` spreads rows uniformly;
    ``pos`` ranks the row inside its shard by the full md5 hex (ties by
    id). A trainer reads shards in any fixed order and rows by ``pos``
    within each — equivalent to one draw of a uniform permutation, and
    a new ``seed`` is a fresh epoch order.

    Scale shape: the shard assignment is map-only; the only exchange is
    ONE hash partition on ``shard`` whose per-shard sort is bounded by
    ``rows / n_shards`` (pick ``n_shards`` so a shard is ~10^7 rows: a
    10^12-row corpus shuffles as 10^5 independent task-sized sorts, no
    range-sampling pass, no driver involvement). Determinism shape:
    a pure function of (seed, id) — identical on any cluster size,
    any engine, and across resumed runs, the property `orderBy(rand())`
    fundamentally lacks.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string")))
    out = df.withColumn("__h", h).withColumn(
        "shard",
        (F.conv(F.substring("__h", 1, 7), 16, 10).cast("long") % n_shards),
    )
    w = W.partitionBy("shard").orderBy("__h", id_col)
    return out.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("long")
    ).drop("__h")


def token_pair_counts(
    toks: DataFrame,
    k: int = 100,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Top-k adjacent token-pair frequencies across the corpus — the
    counting kernel of BPE vocabulary induction (each merge round picks
    the most frequent adjacent pair) and of tokenizer drift analysis.

    ``zip_with`` pairs each token with its successor in-row (no
    self-join, no positional explode of two copies), the pair explode
    is a generator, and the count's partial aggregation runs map-side —
    the shuffle carries at most |observed pair vocab| rows per
    partition regardless of corpus size. Top-k is Spark's
    per-partition heap + driver merge of k rows
    (TakeOrderedAndProject), never a full sort. Deterministic
    tie-break: count desc, then (t1, t2) asc.
    """
    arr = F.col(tokens_col)
    n = F.size(arr)
    pairs = (
        toks.filter(n >= 2)
        .select(
            F.explode_outer(
                F.zip_with(
                    F.slice(arr, 1, n - 1),
                    F.slice(arr, 2, n - 1),
                    lambda a, b: F.struct(a.alias("t1"), b.alias("t2")),
                )
            ).alias("p")
        )
        .select("p.t1", "p.t2")
    )
    return (
        pairs.groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("t1").asc(), F.col("t2").asc())
        .limit(k)
    )
