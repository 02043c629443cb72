"""Driver contract: entry(), queries(), oracle_sql().

Every query is expressed through the kaskada_spark engine (Timeline /
operators / functions) and paired with an ANSI-SQL oracle DuckDB runs on
the same parquet tables. Numeric conventions for exact (hashable)
equality across engines:
- money-like doubles are summed as DECIMAL(18,2) (exact, order-free)
  and cast back to double for output;
- mean/variance are derived from exact decimal component sums;
- all aggregate/computed columns are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaskada_spark import Since, Sliding, Timeline
from kaskada_spark.prepare import KEY, SUBSORT, TIME
from kaskada_spark.sources.readers import read_table
from kaskada_spark.sources.tokens import TOKENS_ORACLE_CTE, tokenize_documents
from kaskada_spark.windows import daily


# ----------------------------------------------------------------------
# shared timeline constructors
# ----------------------------------------------------------------------
def _events(spark: SparkSession, sf_dir: str) -> Timeline:
    return Timeline.from_events(
        read_table(spark, sf_dir, "events"), time_col="ts", key_col="user_id", subsort_col="event_id"
    )


def _orders(spark: SparkSession, sf_dir: str) -> Timeline:
    return Timeline.from_events(
        read_table(spark, sf_dir, "orders"),
        time_col="o_orderdate",
        key_col="o_custkey",
        subsort_col="o_orderkey",
    )


def _dec():
    # Column construction needs an active SparkContext, so keep it lazy.
    return F.col("value").cast("decimal(18,2)")


_EVENTS_ORDER = "PARTITION BY user_id ORDER BY ts, event_id"
_RUN = f"OVER ({_EVENTS_ORDER} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"


# ----------------------------------------------------------------------
# core running aggregations (reference InstOp aggregations, §2.2)
# ----------------------------------------------------------------------
def q_running_sum(spark, sf_dir):
    tl = _events(spark, sf_dir).sum(_dec(), alias="__s")
    return tl.df.select(
        "event_id", "user_id", F.col("__s").cast("double").alias("sum_value")
    )


def q_running_stats(spark, sf_dir):
    """count/min/max plus first/last with a record-pushdown-style null
    filter (the former running_first_last query, folded in so every
    InstOp family keeps a row inside the driver's 50-query window)."""
    pval = F.when(F.col("event_type") == "purchase", F.col("value"))
    tl = (
        _events(spark, sf_dir)
        .extend(__p=pval)
        .count("value", alias="cnt_value")
        .min("value", alias="min_value")
        .max("value", alias="max_value")
        .first("__p", alias="first_purchase")
        .last("__p", alias="last_purchase")
    )
    return tl.df.select(
        "event_id", "user_id", "cnt_value", "min_value", "max_value",
        "first_purchase", "last_purchase",
    )


def q_running_mean_var(spark, sf_dir):
    # mean/variance from exact decimal component sums (sum, sum of squares)
    tl = (
        _events(spark, sf_dir)
        .sum(_dec(), alias="__s")
        .sum((_dec() * _dec()), alias="__q")
        .count("value", alias="__c")
    )
    mean = F.col("__s").cast("double") / F.col("__c")
    var = F.col("__q").cast("double") / F.col("__c") - mean * mean
    return tl.df.select(
        "event_id", "user_id", mean.alias("mean_value"), var.alias("var_value")
    )


def q_running_countif_stddev(spark, sf_dir):
    """count_if + stddev (the remaining InstOp aggregations): running
    click count per entity, and stddev derived from exact decimal
    component sums (sqrt is IEEE-correctly-rounded, so the double is
    bit-identical across engines), null until 2 inputs (variance.toml)."""
    tl = (
        _events(spark, sf_dir)
        .count_if(F.col("event_type") == "click", alias="n_clicks")
        .sum(_dec(), alias="__s")
        .sum((_dec() * _dec()), alias="__q")
        .count("value", alias="__c")
    )
    mean = F.col("__s").cast("double") / F.col("__c")
    var = F.col("__q").cast("double") / F.col("__c") - mean * mean
    sd = F.when(F.col("__c") >= 2, F.sqrt(var))
    return tl.df.select("event_id", "user_id", "n_clicks", sd.alias("sd_value"))


def q_cep_funnel(spark, sf_dir):
    """CEP sequence matching (north-rule "CEP engine"): per-user
    first-occurrence funnel signup -> click -> purchase within 48h of
    the first signup — one shuffle, chained running-min structs over a
    single entity window (operators/cep.py; streaming twin in
    streaming/cep.py, equivalence-tested)."""
    tl = _events(spark, sf_dir)
    return tl.funnel(
        [
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        within="48 hours",
        step_names=["signup", "click", "purchase"],
    ).select(
        F.col(KEY).alias("user_id"),
        "step_reached", "t_signup", "t_click", "t_purchase", "completed",
    )


def q_cep_pattern(spark, sf_dir):
    """Quantified CEP pattern (MATCH_RECOGNIZE-style ``A B+ C? D``):
    signup (click+ with consumed-event count / exact decimal value sum /
    max) error-observer purchase within 14 days — same single-exchange
    chained running-min lowering as the funnel, consumption windows as
    full-partition-frame finals (operators/cep.py::match_pattern;
    streaming twin pattern_stream, equivalence-tested)."""
    from kaskada_spark.operators.cep import PatternStep, match_pattern

    tl = _events(spark, sf_dir).extend(__dv=_dec())
    out = match_pattern(
        tl,
        [
            PatternStep("signup", F.col("event_type") == "signup"),
            PatternStep(
                "click",
                F.col("event_type") == "click",
                "+",
                aggs=[("__sumdec", "sum", "__dv"), ("max_click", "max", "value")],
            ),
            PatternStep(
                "view",
                F.col("event_type") == "view",
                "*",
                aggs=[("__vsumdec", "sum", "__dv")],
            ),
            PatternStep("error", F.col("event_type") == "error", "?"),
            PatternStep("purchase", F.col("event_type") == "purchase"),
        ],
        within="14 days",
    )
    return out.select(
        F.col(KEY).alias("user_id"),
        "step_reached",
        "t_signup", "t_click", "t_view", "t_error", "t_purchase",
        "n_click",
        F.col("__sumdec").cast("double").alias("click_value"),
        "max_click",
        "n_view",
        F.col("__vsumdec").cast("double").alias("view_value"),
        "completed",
    )


def q_lag(spark, sf_dir):
    pval = F.when(F.col("event_type") == "purchase", F.col("value"))
    tl = _events(spark, sf_dir).extend(__p=pval).lag("__p", 1, alias="prev_purchase")
    return tl.df.select("event_id", "user_id", "prev_purchase")


# ----------------------------------------------------------------------
# row operators: when / with_key / shift (§2.1)
# ----------------------------------------------------------------------
def q_select_when(spark, sf_dir):
    tl = _events(spark, sf_dir).when(
        (F.col("value") > 150) & (F.col("event_type") == "click")
    )
    return tl.df.select("event_id", "user_id", "value")


def q_with_key(spark, sf_dir):
    tl = _events(spark, sf_dir).with_key("event_type").count("value", alias="cnt")
    return tl.df.select("event_id", F.col(KEY).alias("event_type"), "cnt")


def q_shift_by(spark, sf_dir):
    tl = _events(spark, sf_dir).shift_by(F.expr("interval 1 hour"))
    return tl.df.select("event_id", F.col(TIME).alias("shifted_ts"))


def q_shift_until(spark, sf_dir):
    tl = _events(spark, sf_dir).shift_until(F.col("event_type") == "error")
    return tl.df.select("event_id", "user_id", F.col(TIME).alias("emitted_ts"))


# ----------------------------------------------------------------------
# windowed aggregations: since / sliding (§2.2 windows)
# ----------------------------------------------------------------------
def q_since_daily_sum(spark, sf_dir):
    tl = _events(spark, sf_dir).sum(_dec(), window=Since(daily()), alias="__s")
    return tl.df.select(
        "event_id", "user_id", F.col("__s").cast("double").alias("sum_today")
    )


def q_sliding_rows(spark, sf_dir):
    # sliding(3, <every row>) == last-3-rows window; condition=None
    # takes the rolling-frame fast path (one window pass — the generic
    # per-window-id lowering degenerates to a group per row here)
    tl = _events(spark, sf_dir).sum(
        _dec(), window=Sliding(3, None), alias="__s"
    )
    return tl.df.select(
        "event_id", "user_id", F.col("__s").cast("double").alias("sum_last3")
    )


def q_sliding_cond(spark, sf_dir):
    # last 2 windows demarcated by purchase events
    tl = _events(spark, sf_dir).sum(
        _dec(), window=Sliding(2, F.col("event_type") == "purchase"), alias="__s"
    )
    return tl.df.select(
        "event_id", "user_id", F.col("__s").cast("double").alias("sum_win2")
    )


def q_sliding_minmax(spark, sf_dir):
    tl = _events(spark, sf_dir)
    # fused lowering: both aggregates share one window-id pass, closed
    # groupBy, combine, and join — two shuffles total, not per-agg
    tl = tl.sliding_aggs(
        [("min", "value", "min_win2"), ("max", "value", "max_win2")],
        Sliding(2, F.col("event_type") == "purchase"),
    )
    return tl.df.select("event_id", "user_id", "min_win2", "max_win2")


# ----------------------------------------------------------------------
# ticks & per-entity behaviors (§2.1 Tick/FinalTick, §3 decorations)
# ----------------------------------------------------------------------
def q_tick_daily(spark, sf_dir):
    from kaskada_spark.operators.tick import TICK_COL

    tl = _events(spark, sf_dir).with_ticks(daily())
    tl = tl.count("value", window=Since(F.col(TICK_COL)), alias="cnt")
    tl = tl.sum(_dec(), window=Since(F.col(TICK_COL)), alias="__s")
    out = tl.df.filter(F.col(TICK_COL)).select(
        F.col(KEY).alias("user_id"),
        F.col(TIME).alias("tick_time"),
        "cnt",
        F.col("__s").cast("double").alias("sum_value"),
    )
    return out


def q_sliding_daily_tick(spark, sf_dir):
    """sliding(2, daily()) sampled at tick rows: each daily boundary
    carries aggregates over the last TWO daily windows (reference
    sliding.toml 'Sliding Over 2 Days'; windowed_aggregation_tests.rs).
    Integer-floored sum keeps the oracle bit-exact in any fold order."""
    from kaskada_spark.operators.tick import TICK_COL

    # project to the one value column BEFORE ticking: persist()
    # materializes every column of the ticked frame, so an unprojected
    # timeline would pin the unused props JSON blob + event_type in
    # memory across all three window passes
    tl = _events(spark, sf_dir).select_fields("value").with_ticks(daily())
    # the ticked frame feeds the sliding lowering's three window passes
    # (each would otherwise re-derive the tick-grid union subtree — 14
    # exchanges observed); at warehouse scale the prepared+ticked table
    # is materialized once, persist() is the local stand-in
    tl = Timeline(tl.df.persist())
    # fused: count + sum share the two-shuffle sliding lowering
    tl = tl.sliding_aggs(
        [
            ("count", "value", "cnt2"),
            ("sum", F.floor(F.col("value")).cast("long"), "__s2"),
        ],
        Sliding(2, F.col(TICK_COL)),
    )
    return tl.df.filter(F.col(TICK_COL)).select(
        F.col(KEY).alias("user_id"),
        F.col(TIME).alias("tick_time"),
        "cnt2",
        F.col("__s2").cast("long").alias("sum2_f"),
    )


def q_fenl_with_key(spark, sf_dir):
    """Fenl with_key re-keying pipe (reference with_key.toml 'Changing
    Keys'): the universe re-roots on a computed key, aggregations group
    by it (one shuffle on the new key, operation/with_key.rs:20-28)."""
    from kaskada_spark.fenl import fenl

    q = """
    Input | with_key($input.event_type)
          | { c: count($input.value), total_f: sum(floor($input.value) as i64) }
    """
    out = fenl(q, {"Input": _events(spark, sf_dir)})
    return out.select(
        F.col(SUBSORT).alias("event_id"),
        F.col(KEY).alias("grp"),
        "c",
        "total_f",
    )


def q_final_last(spark, sf_dir):
    # project BEFORE final(): max_by carries a struct of every Timeline
    # column, and an unprojected timeline would drag the unused props
    # JSON blob + event_type through the aggregation buffers (verified:
    # ReadSchema shrinks from all 6 columns to the 3 used)
    fin = _events(spark, sf_dir).select_fields("event_id", "user_id", "value").final()
    return fin.select("event_id", "user_id", "value")


def q_final_at(spark, sf_dir):
    fin = (
        _events(spark, sf_dir)
        .select_fields("event_id", "user_id", "value")
        .final_at("2024-06-01 00:00:00")
    )
    return fin.select("event_id", "user_id", "value")


def q_session_windows(spark, sf_dir):
    """Session windows (30-min inactivity gap) per user: one row per
    session with bounds and aggregates."""
    tl = _events(spark, sf_dir).sessionize("30 minutes")
    df = tl.df
    return (
        df.groupBy(F.col(KEY).alias("user_id"), F.col("session.start").alias("session_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(TIME).alias("last_ts"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("__s"),
        )
        .select(
            "user_id", "session_start", "n_events", "last_ts",
            F.col("__s").cast("double").alias("sum_value"),
        )
    )


def q_scalar_showcase(spark, sf_dir):
    """Scalar instruction layer over one query (reference InstOps §2.2):
    arithmetic, clamp, comparison, Kleene logic, string ops, time
    extraction, hash/validity, record build + field ref."""
    from kaskada_spark.functions import scalar as S

    ev = read_table(spark, sf_dir, "events")
    rec = S.record(a=F.col("value"), b=F.col("event_type"))
    return ev.select(
        "event_id",
        S.clamp(F.col("value"), F.lit(50.0), F.lit(150.0)).alias("clamped"),
        S.round_(S.powf(F.col("value"), F.lit(0.5)), 6).alias("sqrt_v"),
        S.if_(F.col("event_type") == "click", F.col("value")).alias("click_v"),
        S.else_(F.lit(-1.0), S.null_if(F.col("value") > 100, F.col("value"))).alias("small_or_neg1"),
        S.upper(S.substring(F.col("event_type"), F.lit(0), F.lit(3))).alias("ety3"),
        S.len_(F.col("event_type")).alias("ety_len"),
        S.day_of_year(F.col("ts")).alias("doy"),
        S.months_between(F.col("ts"), F.lit("2024-12-31").cast("timestamp")).alias("mb"),
        S.is_valid(F.col("value")).alias("valid"),
        S.field_ref(rec, "a").alias("rec_a"),
    )


# ----------------------------------------------------------------------
# catalog sweep: EVERY scalar InstOp oracle-checked (reference catalog,
# crates/sparrow-catalog/catalog/*.toml — 49 scalar ops across 4 grouped
# queries + a hash-property query; §2.2 scalars)
# ----------------------------------------------------------------------
def q_scalar_sweep_arith(spark, sf_dir):
    """add sub mul div neg ceil floor round clamp powf sqrt exp
    zip_min zip_max (catalog add.toml ... zip_max.toml). Transcendentals
    (powf/exp) round to 6 decimals for cross-engine bit stability;
    sqrt is IEEE-correctly-rounded so it compares raw."""
    from kaskada_spark.functions import scalar as S

    ev = read_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        S.add(v, F.lit(1.5)).alias("v_add"),
        S.sub(v, F.lit(0.25)).alias("v_sub"),
        S.mul(v, F.lit(2.0)).alias("v_mul"),
        S.div(v, F.lit(2.0)).alias("v_div"),
        S.neg(v).alias("v_neg"),
        S.ceil(v).cast("long").alias("v_ceil"),
        S.floor(v).cast("long").alias("v_floor"),
        S.round_(v).alias("v_round"),
        S.clamp(v, F.lit(50.0), F.lit(150.0)).alias("v_clamp"),
        S.round_(S.powf(v, F.lit(2.0)), 6).alias("v_pow2"),
        S.sqrt(v).alias("v_sqrt"),
        S.round_(S.exp(S.div(v, F.lit(200.0))), 6).alias("v_exp"),
        S.zip_min(v, F.lit(100.0)).alias("v_zmin"),
        S.zip_max(v, F.lit(100.0)).alias("v_zmax"),
    )


def q_scalar_sweep_logic(spark, sf_dir):
    """eq neq lt lte gt gte not logical_and logical_or if null_if
    coalesce else — Kleene 3-valued over generated nulls (catalog
    eq.toml ... else.toml; reference LogicalAndKleeneEvaluator)."""
    from kaskada_spark.functions import scalar as S

    ev = read_table(spark, sf_dir, "events")
    v, ety = F.col("value"), F.col("event_type")
    b1 = S.gt(v, F.lit(100.0))
    b2 = S.eq(ety, F.lit("click"))
    nb = S.if_(S.gt(v, F.lit(120.0)), b1)  # null when v <= 120
    return ev.select(
        "event_id",
        S.eq(v, F.lit(100.0)).alias("c_eq"),
        S.neq(ety, F.lit("view")).alias("c_neq"),
        S.lt(v, F.lit(50.0)).alias("c_lt"),
        S.lte(v, F.lit(50.0)).alias("c_lte"),
        S.gt(v, F.lit(150.0)).alias("c_gt"),
        S.gte(v, F.lit(150.0)).alias("c_gte"),
        S.not_(b1).alias("l_not"),
        S.logical_and(b2, nb).alias("l_and"),
        S.logical_or(b2, nb).alias("l_or"),
        S.if_(b2, v).alias("l_if"),
        S.null_if(b2, v).alias("l_nullif"),
        S.coalesce(S.if_(b2, v), F.lit(-1.0)).alias("l_coalesce"),
        S.else_(F.lit(-1.0), S.if_(b1, v)).alias("l_else"),
    )


def q_scalar_sweep_string_time(spark, sf_dir):
    """len upper lower substring (null/negative index rules,
    evaluators/string.rs:101) + day_of_month(0) day_of_year(0)
    month_of_year(0) year time_of + seconds days months add_time
    seconds_between days_between months_between (catalog
    len.toml ... months_between.toml)."""
    from kaskada_spark.functions import scalar as S

    tl = _events(spark, sf_dir)
    ety, ts = F.col("event_type"), F.col("ts")
    ref = F.lit("2024-12-31 12:00:00").cast("timestamp")
    return tl.df.select(
        "event_id",
        S.len_(ety).alias("s_len"),
        S.upper(ety).alias("s_upper"),
        S.lower(S.upper(ety)).alias("s_lower"),
        S.substring(ety, F.lit(1), F.lit(-1)).alias("s_sub_neg"),
        S.substring(ety, None, F.lit(3)).alias("s_sub_head"),
        S.day_of_month(ts).alias("t_dom"),
        S.day_of_month0(ts).alias("t_dom0"),
        S.day_of_year(ts).alias("t_doy"),
        S.day_of_year0(ts).alias("t_doy0"),
        S.month_of_year(ts).alias("t_moy"),
        S.month_of_year0(ts).alias("t_moy0"),
        S.year(ts).alias("t_year"),
        S.time_of(tl).alias("t_of"),
        S.add_time(S.seconds(F.round(F.col("value")).cast("long")), ts).alias("t_add_sec"),
        S.add_time(S.days((F.col("event_id") % 30).cast("int")), ts).alias("t_add_day"),
        S.add_time(S.months(F.lit(2).cast("int")), ts).alias("t_add_mon"),
        S.seconds_between(ts, ref).alias("t_sb"),
        S.days_between(ts, ref).alias("t_db"),
        S.months_between(ts, ref).alias("t_mb"),
    )


def q_scalar_sweep_record_json(spark, sf_dir):
    """record field_ref extend select_fields remove_fields cast
    is_valid json/json_field (catalog record.toml, extend.toml,
    select_fields.toml, remove_fields.toml, json.toml; inst.rs
    FieldRef/Record/Cast)."""
    from kaskada_spark.functions import scalar as S

    ev = read_table(spark, sf_dir, "events")
    v, ety, props = F.col("value"), F.col("event_type"), F.col("props")
    rec = S.record(a=v, b=ety)
    ext = S.extend_record(rec, c=S.mul(v, F.lit(2.0)))
    sel = S.select_fields(ext, "a", "c")
    rem = S.remove_fields(ext, "b")
    return ev.select(
        "event_id",
        S.field_ref(rec, "b").alias("r_b"),
        S.field_ref(ext, "c").alias("r_ext_c"),
        S.field_ref(sel, "a").alias("r_sel_a"),
        S.field_ref(rem, "c").alias("r_rem_c"),
        S.cast_(v, "long").alias("r_cast_i"),
        S.cast_(F.col("event_id"), "double").alias("r_cast_f"),
        S.is_valid(v).alias("r_valid"),
        S.is_valid(S.if_(F.lit(False), v)).alias("r_invalid"),
        S.json_field(props, "k").alias("j_k"),
        S.cast_(S.json_field(props, "k"), "long").alias("j_k_int"),
    )


def q_scalar_sweep_hash(spark, sf_dir):
    """hash (sparrow-kernels/src/hash.rs): the 64-bit kernel itself is
    engine-specific (xxhash64 here), so the oracle checks its semantic
    contract instead of bit values — deterministic (same input -> same
    hash) and collision-free on this domain (distinct hash count ==
    distinct value count, for strings and for bigints)."""
    from kaskada_spark.functions import scalar as S

    ev = read_table(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("event_type").alias("n_type"),
        F.countDistinct(S.hash_(F.col("event_type"))).alias("n_type_hash"),
        F.countDistinct("user_id").alias("n_user"),
        F.countDistinct(S.hash_(F.col("user_id"))).alias("n_user_hash"),
        F.count_if(
            S.hash_(F.col("event_type")) != S.hash_(F.col("event_type"))
        ).alias("n_nondet"),
    )


# ----------------------------------------------------------------------
# temporal joins: lookup (as-of) & merge-align (§2.1)
# ----------------------------------------------------------------------
def q_lookup_asof(spark, sf_dir):
    ev = _events(spark, sf_dir)
    od = _orders(spark, sf_dir)
    tl = ev.lookup(od, key=F.col("user_id").cast("long"), values=["o_orderkey", "o_totalprice"])
    return tl.df.select("event_id", "user_id", "o_orderkey", "o_totalprice")


def q_merge_align(spark, sf_dir):
    ev = _events(spark, sf_dir).select_fields("value")
    od = _orders(spark, sf_dir).select_fields("o_totalprice")
    ev = Timeline(ev.df.withColumn(KEY, F.col(KEY).cast("long")))
    merged = ev.merge(od, as_of=["o_totalprice"])
    return merged.df.select(
        F.col(KEY).alias("k"),
        F.col(TIME).alias("t"),
        F.col(SUBSORT).alias("s"),
        "value",
        "o_totalprice",
    )


def q_entity_slice(spark, sf_dir):
    """Entity slicing (reference slice_analysis.rs:18-53): run a
    per-entity running count on a 10%-of-entities hash sample; every
    row of a sampled entity is retained, so temporal semantics are
    exact on the sample."""
    from kaskada_spark.operators.slice import entity_slice_md5

    ev = read_table(spark, sf_dir, "events")
    sliced = entity_slice_md5(ev, "user_id", 10.0)
    tl = Timeline.from_events(
        sliced, time_col="ts", key_col="user_id", subsort_col="event_id"
    ).count("value", alias="cnt")
    return tl.df.select("event_id", "user_id", "cnt")


# ----------------------------------------------------------------------
# Fenl frontend: the reference's query language running on Spark
# (parser/compiler in kaskada_spark/fenl; grammar parity with
# crates/sparrow-syntax/src/parser/grammar.lalrpop)
# ----------------------------------------------------------------------
def q_fenl_running(spark, sf_dir):
    from kaskada_spark.fenl import fenl

    q = """
    {
      n_vals: count(Events.value),
      lo: min(Events.value),
      hi: max(Events.value),
      total_f: sum(floor(Events.value) as i64)
    }
    """
    out = fenl(q, {"Events": _events(spark, sf_dir)})
    return out.select(
        F.col(SUBSORT).alias("event_id"),
        F.col(KEY).alias("user_id"),
        "n_vals", "lo", "hi", "total_f",
    )


def q_fenl_nested(spark, sf_dir):
    """Chained aggregation (reference aggregation_tests.rs
    test_nested_sum_i64): the outer sum re-consumes the inner's LATCHED
    running value at every domain row — integer inputs keep both
    engines exact."""
    from kaskada_spark.fenl import fenl

    q = "{ nested: sum(sum(floor(Events.value) as i64)) }"
    out = fenl(q, {"Events": _events(spark, sf_dir)})
    return out.select(
        F.col(SUBSORT).alias("event_id"),
        F.col(KEY).alias("user_id"),
        "nested",
    )


def q_fenl_nested_windowed(spark, sf_dir):
    """Chained aggregation with BOTH levels daily-tick-windowed
    (reference windowed aggregations compose with any outer window,
    windowed_aggregation_tests.rs): the inner daily sum latches, the
    outer daily mean re-consumes the latched value at every domain row
    INCLUDING injected boundary rows, and resets after each boundary.
    Integer-floored inner sums keep the outer mean's division bit-exact
    across engines. The streaming twin runs through the staged pipeline
    (test_materialize_pipeline_tick_inner_windowed_outer)."""
    from kaskada_spark.fenl import fenl

    q = (
        "{ m: mean(sum(floor(Events.value) as i64,"
        " window = since(daily())), window = since(daily())) }"
    )
    out = fenl(q, {"Events": _events(spark, sf_dir)})
    return out.select(
        F.col(KEY).alias("user_id"),
        F.col(TIME).alias("t"),
        F.col(SUBSORT).alias("subsort"),
        "m",
    )


def q_fenl_when(spark, sf_dir):
    from kaskada_spark.fenl import fenl

    q = "Events | when(Events.value > 150 and Events.event_type == 'click')"
    out = fenl(q, {"Events": _events(spark, sf_dir)})
    return out.select("event_id", "user_id", "value")


def q_fenl_merge(spark, sf_dir):
    """Implicit join: two same-grouping tables merge-align on
    (key, time, subsort) just by being referenced together."""
    from kaskada_spark.fenl import fenl

    ev = Timeline(_events(spark, sf_dir).df.withColumn(KEY, F.col(KEY).cast("long")))
    od = _orders(spark, sf_dir)
    out = fenl("{ v: Events.value, tp: Orders.o_totalprice }", {"Events": ev, "Orders": od})
    return out.select(
        F.col(KEY).alias("k"),
        F.col(TIME).alias("t"),
        F.col(SUBSORT).alias("s"),
        "v", "tp",
    )


def q_fenl_since(spark, sf_dir):
    from kaskada_spark.fenl import fenl

    q = "count(Events, window = since(Events.event_type == 'purchase'))"
    out = fenl(q, {"Events": _events(spark, sf_dir)})
    return out.select(
        F.col(SUBSORT).alias("event_id"),
        F.col(KEY).alias("user_id"),
        F.col("result").alias("cnt_since"),
    )


def q_fenl_lookup_rekey(spark, sf_dir):
    """Self-grouping lookup: the value re-keys a per-user running sum by
    event_type, then lookup() latches it back as-of each primary row
    (reference with_key+lookup composition,
    with_key_tests.rs::test_with_key_lookup_select,
    entity_key_output_tests.rs::test_lookup_with_key_entity_keys).
    Because every primary row also appears on the re-keyed foreign side,
    the as-of latch resolves to the row's own running sum — which is
    exactly what the oracle computes directly; any ordering/tie bug in
    the union-window lowering breaks the hash."""
    from kaskada_spark.fenl import fenl

    q = ("{ s: lookup(Events.event_type, "
         "with_key(Events.event_type, sum(floor(Events.value) as i64))) }")
    out = fenl(q, {"Events": _events(spark, sf_dir)})
    return out.select(
        F.col(SUBSORT).alias("event_id"),
        F.col(KEY).alias("user_id"),
        F.col("s").alias("s"),
    )


def q_fenl_lookup_spread(spark, sf_dir):
    """Lookup request/response SPREAD semantics (lookup_tests.rs
    test_lookup_self_i64_with_merge_interpolation): requests fire only
    where the key is NEW (the B table's rows in the merged A∪B
    universe); between requests the latched response survives even
    after the foreign value moves on. A = click events (running sum of
    cents), B = view events carrying a foreign-user ref; cents are
    floor(value*100) so the sum is integer-exact cross-engine."""
    from kaskada_spark.fenl import fenl

    ev = read_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    b = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id",
        ((F.col("user_id") % 50) + 1).alias("ref"),
    )
    tables = {
        "A": Timeline.from_events(a, "ts", "user_id", "event_id"),
        "B": Timeline.from_events(b, "ts", "user_id", "event_id"),
    }
    out = fenl(
        "let s = sum(A.cents) let k = last(B.ref) "
        "let looked = lookup(k, s) in { s, k, looked }",
        tables,
    )
    return out.select(
        F.col(KEY).alias("user_id"),
        F.col(TIME).alias("t"),
        F.col(SUBSORT).alias("sub"),
        F.col("s").alias("s_cents"),
        F.col("k").alias("k_ref"),
        F.col("looked").alias("looked"),
    )


def q_fenl_finished(spark, sf_dir):
    """`... | last() | when(finished())` — the reference's FinalTick
    final-value idiom (tick_tests.rs test_tick_when_finished,
    operation/final_tick.rs): one row per entity at global max event
    time + 1µs (reference stamps +1ns; Spark timestamps are µs),
    latching each entity's most recent NEW record — the discrete
    event_type field comes from the entity's last event row even though
    it is undefined at the final tick itself."""
    from kaskada_spark.fenl import fenl

    q = ("{ et: Events.event_type, n: count(Events) } "
         "| last() | when(finished())")
    out = fenl(q, {"Events": _events(spark, sf_dir)})
    return out.select(
        F.col(KEY).alias("user_id"),
        F.col(TIME).alias("t"),
        F.col("et").alias("et"),
        F.col("n").alias("n"),
    )


# ----------------------------------------------------------------------
# training-data pipeline: dedup / similarity / text analysis
# (driver mandate — first-class alongside the reference operators)
# ----------------------------------------------------------------------
def q_exact_dedup(spark, sf_dir):
    from kaskada_spark.operators.dedup import exact_dedup

    docs = read_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", "text")


def q_minhash_lsh(spark, sf_dir):
    from kaskada_spark.operators.dedup import minhash_lsh_pairs

    docs = read_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=8, bands=4, shingle_n=3)


def q_dup_spans(spark, sf_dir):
    """Token-span exact-substring dedup (ExactSubstr, Lee et al. 2021)
    via winnowing fingerprints (Schleimer et al. 2003) over the
    pre-tokenized sequence table: every cross-document repeated run of
    >= window + w - 1 = 32 tokens is guaranteed to surface as a shared
    fingerprint group. Pure Catalyst map + ONE hash-agg exchange."""
    from kaskada_spark.operators.spans import dup_span_groups

    toks = tokenize_documents(spark, sf_dir)
    return dup_span_groups(toks, w=8, window=25)


def q_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals (operators/text.py).
    Word/bigram repetition is the live signal on this corpus (word-soup
    docs); the line-duplication columns are exercised by unit fixtures
    with planted newline docs (test_pipeline_ops.py)."""
    from kaskada_spark.operators.text import repetition_signals

    docs = read_table(spark, sf_dir, "documents")
    return repetition_signals(docs, "doc_id", "text")


def q_dedup_clusters(spark, sf_dir):
    """Near-duplicate clusters: LSH pairs -> connected components
    (large-star/small-star, operators/graph.py) -> (doc, cluster_id)
    for EVERY document (singletons label themselves). Oracle: recursive
    transitive closure in DuckDB — algorithm-independent because the
    component minimum is."""
    from kaskada_spark.operators.dedup import near_dup_clusters

    docs = read_table(spark, sf_dir, "documents")
    return near_dup_clusters(docs, "doc_id", "text", num_hashes=8, bands=4, shingle_n=3)


def q_simhash(spark, sf_dir):
    """Staged form: the word-hash array is projected ONCE, then 16
    scalar folds read the plain column (HOF lambdas are not CSE'd —
    the single-expression form must rebuild a 16-wide array per word
    instead, ~30% slower at sf0.1)."""
    from kaskada_spark.operators.dedup import simhash16, word_hashes

    docs = read_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", word_hashes(F.col("text")).alias("__hv"))
    return staged.select(
        "doc_id", simhash16(hv=F.col("__hv")).alias("simhash")
    )


def q_ngram_jaccard(spark, sf_dir):
    from kaskada_spark.operators.dedup import ngram_jaccard_pairs

    docs = read_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", "source", n=3)


def q_embed_knn(spark, sf_dir):
    from kaskada_spark.operators.similarity import brute_force_knn

    emb = read_table(spark, sf_dir, "embeddings")
    return brute_force_knn(emb, "vec_id", "embedding", list(range(10)), k=5)


def q_embed_knn_lsh(spark, sf_dir):
    from kaskada_spark.operators.similarity import lsh_knn

    emb = read_table(spark, sf_dir, "embeddings")
    return lsh_knn(emb, "vec_id", "embedding", list(range(10)), k=5, n_bits=6, dim=64)


def q_embed_knn_ivf(spark, sf_dir):
    """IVF-partitioned ANN: md5-sampled centroids, nearest-cell
    assignment (one map-side-combined shuffle), exact search within the
    n_probe nearest cells per query (operators/similarity.py ivf_knn)."""
    from kaskada_spark.operators.similarity import ivf_knn

    emb = read_table(spark, sf_dir, "embeddings")
    return ivf_knn(emb, "vec_id", "embedding", list(range(10)), k=5, n_cells=16, n_probe=4)


def _near_dup_corpus(emb):
    """Embeddings plus 20 planted near-duplicates so the near-dup checks
    are NON-vacuous (round-2 verdict: both engines returned 0 rows, a
    green check that never validated pair discovery). Each vec_id < 20
    gets a copy at vec_id + 100000 with elements scaled by 1 ± 0.005
    (alternating by index) — cosine ≈ 0.99997, far above threshold. All
    arithmetic is double-then-cast-to-float so DuckDB reproduces the
    perturbed vectors bit-exactly."""
    pert = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x.cast("double")
            * (F.lit(1.0) + F.when(i % 2 == 0, F.lit(0.005)).otherwise(F.lit(-0.005)))
        ).cast("float"),
    )
    base = emb.select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + F.lit(100000)).cast("long").alias("vec_id"),
        pert.alias("embedding"),
    )
    return base.unionByName(planted)


def q_cosine_near_dup(spark, sf_dir):
    """Scale-shape contract: auto-sized bucket count (n_bits=None →
    auto_n_bits from the corpus cardinality) + salted bucket cap
    (max_bucket_rows) so no join group can explode. At testdata scale
    auto resolves to 4 bits and no bucket exceeds the cap (salt ≡ 0),
    which keeps the DuckDB oracle exact without replicating xxhash64."""
    from kaskada_spark.operators.similarity import cosine_near_dup_pairs

    from kaskada_spark.sources.readers import parquet_row_count

    emb = read_table(spark, sf_dir, "embeddings")
    # cardinality for auto-sizing is a parquet-footer metadata read
    # (the Iceberg total-records stand-in) + the 20 planted rows — no
    # count job over the union plan, no scan at all
    n_rows = parquet_row_count(f"{sf_dir}/embeddings.parquet") + 20
    return cosine_near_dup_pairs(
        _near_dup_corpus(emb), "vec_id", "embedding",
        threshold=0.8, n_bits=None, dim=64, max_bucket_rows=512,
        n_rows=n_rows,
    )


def q_cosine_near_dup_banded(spark, sf_dir):
    """Multi-band LSH near-dup (the 100 TB-shape path): 2 independent
    hyperplane tables at 6 bits each — candidates share a bucket in ANY
    band, deduped before the exact cosine filter. Higher recall than one
    4-bit table with far smaller buckets (64 vs 16 per band)."""
    from kaskada_spark.operators.similarity import cosine_near_dup_pairs

    emb = read_table(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(
        _near_dup_corpus(emb), "vec_id", "embedding",
        threshold=0.8, n_bits=6, dim=64, n_bands=2,
    )


def q_lang_id(spark, sf_dir):
    from kaskada_spark.operators.text import detect_language

    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", detect_language(F.col("text")).alias("detected_lang"))


def q_quality(spark, sf_dir):
    """Quality features + composite score in a staged plan: the words()
    regexp extraction is projected ONCE, every feature derives from that
    shared array, and the score is arithmetic over the projected feature
    columns (HOF lambdas are not CSE'd, so without the staging the
    regexp would run ~6x per row)."""
    from kaskada_spark.operators.text import (
        quality_features,
        quality_score,
        words,
    )

    docs = read_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", "text", words(F.col("text")).alias("__w"))
    feats = quality_features(F.col("text"), w=F.col("__w"))
    proj = staged.select(
        "doc_id",
        feats["word_cnt"].alias("word_cnt"),
        feats["mean_word_len"].alias("mean_word_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["digit_ratio"].alias("digit_ratio"),
    )
    shared = {
        k: F.col(k)
        for k in ("stopword_ratio", "mean_word_len", "punct_ratio", "digit_ratio")
    }
    return proj.select(
        "doc_id",
        "word_cnt",
        "mean_word_len",
        "punct_ratio",
        "stopword_ratio",
        quality_score(F.col("doc_id"), feats=shared).alias("quality"),
    )


def q_token_counts(spark, sf_dir):
    from kaskada_spark.operators.text import bpe_token_count, word_count

    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        word_count(F.col("text")).alias("ws_tokens"),
        bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


def q_fingerprint(spark, sf_dir):
    from kaskada_spark.operators.text import fingerprint

    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


def q_media_features(spark, sf_dir):
    """Multimodal plumbing, fully oracle-checked: binary payloads ->
    mapInPandas feature extraction (md5-hex-seeded LCG decode stub,
    kaskada_spark/operators/multimodal.py) -> row-level features. The
    DuckDB oracle reproduces the decode exactly via HUGEINT arithmetic,
    so this is a value-hash-checked query, not a rows-only one."""
    from kaskada_spark.operators.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, 200)
    feats = extract_features(media)
    typed = feats.join(media.select("media_id", F.col("meta.media_type").alias("mt")), "media_id")
    return typed.select(
        "media_id",
        "mt",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.element_at("features", 1).cast("double").alias("f0"),
        F.element_at("features", 8).cast("double").alias("f7"),
        F.element_at("features", 16).cast("double").alias("f15"),
    )


def q_decontam(spark, sf_dir):
    """Benchmark decontamination (operators/training.py): every 20th
    document plays the eval set; the rest are the corpus. The probe
    shingle-hash set is broadcast, so the corpus side is map-only +
    one per-doc count shuffle — the 100 TB shape."""
    from kaskada_spark.operators.training import decontaminate

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    probes = docs.filter(F.col("doc_id") % 20 == 0)
    return decontaminate(corpus, "doc_id", "text", probes)


def q_scrub_pii(spark, sf_dir):
    """PII scrub (operators/text.py scrub_pii): emails / NANP phones /
    IPv4 detected and redacted, counts over the original text. PII is
    planted deterministically on every 7th doc (the synthetic corpus
    has none) so the check is non-vacuous; patterns stay in the
    Java-regex/RE2 common subset so DuckDB matches byte-for-byte."""
    from kaskada_spark.operators.text import scrub_pii

    docs = read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    enriched = F.when(
        d % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"), d.cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((d % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((d % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."), (d % 256).cast("string"), F.lit(".1"),
        ),
    ).otherwise(F.col("text"))
    cols = scrub_pii(enriched)
    return docs.select(
        d.alias("doc"),
        cols["n_emails"].alias("n_emails"),
        cols["n_phones"].alias("n_phones"),
        cols["n_ips"].alias("n_ips"),
        cols["clean_text"].alias("clean_text"),
    )


def _doc_time_bounds(sf_dir):
    """Synthetic-event-time bounds for the tokenized documents table
    from parquet FOOTER stats (no job): ``_time = epoch + doc_id
    seconds`` (sources/tokens.py), so doc_id's min/max bound it. The
    production analogue is an Iceberg per-column snapshot-stats lookup."""
    from datetime import datetime, timedelta

    from kaskada_spark.sources.readers import parquet_column_bounds

    b = parquet_column_bounds(f"{sf_dir}/documents.parquet", "doc_id")
    if b is None:
        return None  # no stats -> pack_sequences runs its min/max job
    epoch = datetime(1970, 1, 1)
    return (epoch + timedelta(seconds=int(b[0])),
            epoch + timedelta(seconds=int(b[1])))


def q_pack_sequences(spark, sf_dir):
    """Fixed-budget sequence packing over the pre-tokenized table
    (north-rule input shape): concatenate per source in event order,
    cut every 512 tokens (operators/training.py pack_sequences,
    value-bucket segmented prefix sum — no per-group global stage, ONE
    wide exchange; n_segments above the shuffle default so every source
    group straddles many segments at sf). seg_bounds comes from the
    parquet footer stats (the Iceberg table-stats stand-in), so no
    min/max job runs over the tokenize plan."""
    from kaskada_spark.operators.training import pack_sequences

    toks = tokenize_documents(spark, sf_dir)
    packed = pack_sequences(
        toks, budget=512, segmented=True, n_segments=64,
        seg_bounds=_doc_time_bounds(sf_dir),
    )
    return packed.select(
        "doc_id",
        "source",
        F.col("n_tok").cast("long").alias("n_tok"),
        "tokens_before",
        "pack_id",
        "pack_offset",
    )


def q_mixture_split(spark, sf_dir):
    """Deterministic data-mixing + split assignment
    (operators/training.py mixture_sample / train_valid_split):
    src0 dropped, src1 downsampled to 0.35, src2 upsampled 1.5x,
    src3 replicated exactly 2x, everything else natural, then a stable
    5% valid split. Both decisions are pure md5 functions of doc_id —
    identical on any cluster size / engine / resumed run — and the
    whole query is map-only (filter + generator explode, no shuffle)."""
    from kaskada_spark.operators.training import mixture_sample, train_valid_split

    docs = read_table(spark, sf_dir, "documents")
    rates = {"src0": 0.0, "src1": 0.35, "src2": 1.5, "src3": 2.0}
    sampled = mixture_sample(
        docs.select("doc_id", "source"), rates, id_col="doc_id"
    )
    return train_valid_split(sampled, valid_frac=0.05).select(
        "doc_id", "source", F.col("copy").cast("long").alias("copy"), "split"
    )


def q_chunk_sequences(spark, sf_dir):
    """Fixed-length context chunking with overlap over the pre-tokenized
    table (operators/training.py chunk_sequences): stride-24 windows of
    max 32 tokens (overlap 8) — the causal-LM preprocessing complement
    of pack_sequences. Pure map-side: generator offsets + array slice,
    ZERO shuffles; scalar digests (first/last/sum) instead of raw
    arrays keep the driver hash engine-portable."""
    from kaskada_spark.operators.training import chunk_sequences

    toks = tokenize_documents(spark, sf_dir)
    ch = chunk_sequences(toks, max_len=32, overlap=8)
    return ch.select(
        "doc_id",
        "source",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_off").cast("long").alias("chunk_off"),
        F.col("chunk_len").cast("long").alias("chunk_len"),
        F.element_at("tokens", 1).alias("tok_first"),
        F.element_at("tokens", -1).alias("tok_last"),
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
        ).alias("tok_sum"),
    )


def q_bpe_pairs(spark, sf_dir):
    """Top-100 adjacent token pairs (operators/training.py
    token_pair_counts) — the BPE merge-counting kernel. In-row
    zip_with pairing (no self-join), generator explode, map-side
    partial counts, per-partition top-k heap — shuffle bounded by
    |pair vocab|, never corpus size."""
    from kaskada_spark.operators.training import token_pair_counts

    toks = tokenize_documents(spark, sf_dir)
    return token_pair_counts(toks, k=100)


def q_epoch_shuffle(spark, sf_dir):
    """Seeded deterministic epoch shuffle (operators/training.py
    epoch_shuffle): every document gets a (shard, pos) slot in a global
    training-order permutation — shard via md5(seed|id) % 16, pos via a
    per-shard rank on the full hash. ONE shard-keyed exchange whose
    per-shard sort is rows/n_shards-bounded; pure function of (seed,
    id) so any engine / cluster size / resumed run agrees."""
    from kaskada_spark.operators.training import epoch_shuffle

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = epoch_shuffle(docs, n_shards=16, seed="ep1")
    return out.select(
        "doc_id",
        "source",
        F.col("shard").cast("long").alias("shard"),
        F.col("pos").cast("long").alias("pos"),
    )


# ----------------------------------------------------------------------
# oracle SQL builders (shared DuckDB fragments)
# ----------------------------------------------------------------------
_WORDS_CTE = """
w AS (
  SELECT doc_id, source, text,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents
)
"""

_SHINGLES_CTE = _WORDS_CTE + """, sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
           generate_series(1, greatest(len(ws) - 2, 0)),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
         )) AS sh
  FROM w
)
"""


def _sql_hash28(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 7)) AS BIGINT)"


def _sql_minhash_sig() -> str:
    """DuckDB list literal mirroring minhash_signature(num_hashes=8):
    ONE md5 base hash per shingle + affine family maps
    (operators/dedup.py MINHASH_P/_family)."""
    from kaskada_spark.operators.dedup import MINHASH_P, MINHASH_SENTINEL, _family

    mins = []
    for i in range(8):
        a, c = _family(i)
        mins.append(
            f"coalesce(list_min(list_transform(sh, s -> "
            f"({_sql_hash28('s')} * {a} + {c}) % {MINHASH_P})), {MINHASH_SENTINEL})"
        )
    return "[" + ", ".join(mins) + "]"


def _sql_minhash_pairs_ctes() -> str:
    """CTE chain ending in `pairs(id_a, id_b)` — the DuckDB mirror of
    minhash_lsh_pairs(num_hashes=8, bands=4, shingle_n=3). Shared by the
    minhash_lsh and dedup_clusters oracles."""
    return f"""{_SHINGLES_CTE.strip()}, sig AS (
              SELECT doc_id AS doc, {_sql_minhash_sig()} AS sig FROM sh
            ), banded AS (
              SELECT doc, band,
                     CAST(sig[band * 2 + 1] AS VARCHAR) || ',' || CAST(sig[band * 2 + 2] AS VARCHAR) AS bucket
              FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band)
            ), pairs AS (
              SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
              FROM banded a JOIN banded b USING (band, bucket)
              WHERE a.doc < b.doc
            )"""


def _sql_dot(a: str, b: str, dim: int = 64) -> str:
    """Sequential left-fold dot product — same op order as Spark's
    F.aggregate, so doubles are bit-identical."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def _sql_cosine(a: str, b: str, dim: int = 64) -> str:
    return f"({_sql_dot(a, b, dim)} / (sqrt({_sql_dot(a, a, dim)}) * sqrt({_sql_dot(b, b, dim)})))"


def _sql_lsh_bucket(vec: str, n_bits: int = 6, dim: int = 64, seed: int = 42) -> str:
    """Mirror of similarity.lsh_bucket: bit b = sign(fold of v[j]*plane)."""
    bits = []
    for b in range(n_bits):
        plane = (
            f"CASE WHEN CAST(('0x' || substr(md5('{seed}|{b}|' || (j-1)), 1, 2)) AS INT) % 2 = 0 "
            f"THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END"
        )
        d = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, {dim}), j -> CAST({vec}[j] AS DOUBLE) * ({plane}))), "
            f"(acc, x) -> acc + x)"
        )
        bits.append(f"CASE WHEN ({d}) > 0 THEN {1 << b} ELSE 0 END")
    return "CAST((" + " + ".join(bits) + ") AS INT)"


# ----------------------------------------------------------------------
# driver contract
# ----------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: windowed temporal aggregation over the pre-tokenized
    sequence stream (north-rule input shape) at sf0.001."""
    return q_tokens_windowed(spark, "/root/testdata/sf0.001")


def q_tokens_table(spark, sf_dir):
    toks = tokenize_documents(spark, sf_dir)
    return toks.select(
        "doc_id",
        "source",
        "n_tok",
        F.element_at("tokens", 1).alias("tok_first"),
        F.element_at("tokens", -1).alias("tok_last"),
        F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x.cast("long")).alias("tok_sum"),
    )


def q_tokens_windowed(spark, sf_dir):
    toks = tokenize_documents(spark, sf_dir)
    out = (
        toks.groupBy("source", F.date_trunc("minute", F.col("_time")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_seq"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum(
                F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x.cast("long"))
            ).alias("tok_checksum"),
        )
    )
    return out


def q_pipeline_e2e(spark, sf_dir):
    """The assembled training-data pipeline, one plan end to end:
    exact-dedup (keep content representatives) -> quality gate
    (staged words projection, score >= 0.3) -> tokenize survivors ->
    fixed-budget sequence packing. Each stage is the library operator;
    the composite proves they CHAIN — filters stay pushed, the words
    array is projected once, and the only wide exchanges are the dedup
    groupBy and the per-source packing window."""
    from kaskada_spark.operators.dedup import exact_dedup
    from kaskada_spark.operators.text import quality_features, quality_score, words
    from kaskada_spark.operators.training import pack_sequences
    from kaskada_spark.sources.tokens import tokenize_df

    docs = read_table(spark, sf_dir, "documents")
    reps = exact_dedup(docs, "doc_id", "text").select(
        F.col("rep_id").alias("doc_id")
    )
    deduped = docs.join(reps, "doc_id", "left_semi")
    staged = deduped.select(
        "doc_id", "text", "source", words(F.col("text")).alias("__w")
    )
    feats = quality_features(F.col("text"), w=F.col("__w"))
    kept = (
        staged.withColumn("__q", quality_score(F.col("text"), feats=feats))
        .filter(F.col("__q") >= 0.3)
        .select("doc_id", "text", "source")
    )
    packed = pack_sequences(
        tokenize_df(kept), budget=2048, seg_bounds=_doc_time_bounds(sf_dir)
    )
    return packed.select(
        "doc_id",
        "source",
        F.col("n_tok").cast("long").alias("n_tok"),
        "tokens_before",
        "pack_id",
        "pack_offset",
    )


def q_token_histogram(spark, sf_dir):
    """Top-50 token ids by corpus frequency: explode -> map-side partial
    count -> per-partition top-k heap merge (TakeOrderedAndProject) —
    shuffle volume bounded by |vocab| x partitions at any corpus size."""
    from kaskada_spark.operators.training import token_histogram

    return token_histogram(tokenize_documents(spark, sf_dir), k=50)


def q_seq_len_stats(spark, sf_dir):
    """Per-source sequence-length distribution with an EXACT median
    derived from grouped length counts (no per-group value buffer —
    Spark's exact percentile agg would OOM at 10^12 sequences)."""
    from kaskada_spark.operators.training import seq_length_stats

    return seq_length_stats(tokenize_documents(spark, sf_dir))


def q_vocab_stats(spark, sf_dir):
    """Per-source vocabulary: exact distinct token count + total
    occurrences + type-token ratio. count(DISTINCT) lowers to a
    two-stage hash agg (partial distinct per partition, then merge) —
    the exact form is fine because the token domain is vocabulary-
    bounded; at larger unique domains swap in approx_count_distinct
    (HLL) at the cost of the oracle."""
    toks = tokenize_documents(spark, sf_dir)
    ex = toks.select("source", F.explode("tokens").alias("token"))
    return ex.groupBy("source").agg(
        F.countDistinct("token").alias("vocab"),
        F.count(F.lit(1)).alias("occurrences"),
        F.round(
            F.countDistinct("token").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("type_token_ratio"),
    )


def q_vocab_drift(spark, sf_dir):
    """Adjacent-window L1 vocabulary drift — exact integer cross-product
    sum (engine-order-independent), one float division at the end."""
    from kaskada_spark.operators.training import vocabulary_drift

    return vocabulary_drift(tokenize_documents(spark, sf_dir))


def q_len_quantiles(spark, sf_dir):
    """Exact per-source length quantiles (type-7 interpolation) from
    grouped counts — no per-group value buffer, unlike Spark's exact
    percentile aggregate (which would hold every value of a group in
    memory at 10^12 rows)."""
    from kaskada_spark.operators.training import seq_length_quantiles

    return seq_length_quantiles(tokenize_documents(spark, sf_dir))


def q_source_mix(spark, sf_dir):
    """Alpha-0.7 training-mix sampling weights per source (share^alpha
    renormalized — upsamples small sources): one per-source aggregate +
    broadcast corpus total; round(6) keeps the transcendental pow
    cross-engine stable."""
    from kaskada_spark.operators.training import source_mixture_weights

    return source_mixture_weights(tokenize_documents(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE on ordering: the driver's correctness gate samples the FIRST 50
    # entries. Round-5 rotation: positions 1-21 are the 21 entries that
    # rode the r04 tail (each driver-green in r03 or earlier + local-mirror
    # verified) so every queries() entry is driver-hard within rounds 4+5;
    # then cep_pattern (new) and dup_spans (winnow kernel rewritten this
    # round), then one r04-green representative of every operator family
    # (CLAUDE.md invariant). Positions 51+ are redundant family variants,
    # each driver-green in round 4 (CORRECTNESS_r04.json). Every entry
    # keeps its oracle regardless of position.
    return {
        # -- rotated r04 tail: fresh driver evidence --
        "scalar_sweep_string_time": q_scalar_sweep_string_time,
        "scalar_sweep_record_json": q_scalar_sweep_record_json,
        "scalar_sweep_hash": q_scalar_sweep_hash,
        "cosine_near_dup_banded": q_cosine_near_dup_banded,
        "sliding_minmax": q_sliding_minmax,
        "select_when": q_select_when,
        "since_daily_sum": q_since_daily_sum,
        "sliding_cond": q_sliding_cond,
        "sliding_daily_tick": q_sliding_daily_tick,
        "fenl_with_key": q_fenl_with_key,
        "fenl_running": q_fenl_running,
        "fenl_nested": q_fenl_nested,
        "scalar_showcase": q_scalar_showcase,
        "lookup_asof": q_lookup_asof,
        "merge_align": q_merge_align,
        "tokens_table": q_tokens_table,
        "token_histogram": q_token_histogram,
        "seq_len_stats": q_seq_len_stats,
        "source_mix": q_source_mix,
        "vocab_stats": q_vocab_stats,
        "pipeline_e2e": q_pipeline_e2e,
        # -- new / changed this round --
        "cep_pattern": q_cep_pattern,
        "dup_spans": q_dup_spans,
        # -- family representatives (r04 driver-green) --
        "exact_dedup": q_exact_dedup,
        "minhash_lsh": q_minhash_lsh,
        "dedup_clusters": q_dedup_clusters,
        "simhash": q_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "embed_knn": q_embed_knn,
        "embed_knn_ivf": q_embed_knn_ivf,
        "cosine_near_dup": q_cosine_near_dup,
        "lang_id": q_lang_id,
        "token_counts": q_token_counts,
        "scrub_pii": q_scrub_pii,
        "media_features": q_media_features,
        "decontam": q_decontam,
        "pack_sequences": q_pack_sequences,
        "chunk_sequences": q_chunk_sequences,
        "epoch_shuffle": q_epoch_shuffle,
        "bpe_pairs": q_bpe_pairs,
        "mixture_split": q_mixture_split,
        "running_sum": q_running_sum,
        "running_mean_var": q_running_mean_var,
        "cep_funnel": q_cep_funnel,
        "lag": q_lag,
        "shift_until": q_shift_until,
        "tick_daily": q_tick_daily,
        "final_last": q_final_last,
        "session_windows": q_session_windows,
        "entity_slice": q_entity_slice,
        # ---- position 51+: redundant family variants, all driver-green
        # in round 4 (CORRECTNESS_r04.json) ----
        "repetition": q_repetition,
        "embed_knn_lsh": q_embed_knn_lsh,
        "quality": q_quality,
        "fingerprint": q_fingerprint,
        "tokens_windowed": q_tokens_windowed,
        "len_quantiles": q_len_quantiles,
        "vocab_drift": q_vocab_drift,
        "running_stats": q_running_stats,
        "running_countif_stddev": q_running_countif_stddev,
        "with_key": q_with_key,
        "shift_by": q_shift_by,
        "sliding_rows": q_sliding_rows,
        "final_at": q_final_at,
        "fenl_when": q_fenl_when,
        "fenl_since": q_fenl_since,
        "fenl_nested_windowed": q_fenl_nested_windowed,
        "fenl_lookup_rekey": q_fenl_lookup_rekey,
        "fenl_lookup_spread": q_fenl_lookup_spread,
        "fenl_finished": q_fenl_finished,
        "fenl_merge": q_fenl_merge,
        "scalar_sweep_arith": q_scalar_sweep_arith,
        "scalar_sweep_logic": q_scalar_sweep_logic,
    }

def oracle_sql() -> dict[str, str]:
    dec = "CAST(value AS DECIMAL(18,2))"
    return {
        "running_sum": f"""
            SELECT event_id, user_id,
                   CAST(SUM({dec}) {_RUN} AS DOUBLE) AS sum_value
            FROM events
        """,
        "running_stats": f"""
            WITH b AS (
              SELECT event_id, user_id, ts, value,
                     CASE WHEN event_type = 'purchase' THEN value END AS p
              FROM events
            )
            SELECT event_id, user_id,
                   COUNT(value) {_RUN} AS cnt_value,
                   MIN(value) {_RUN} AS min_value,
                   MAX(value) {_RUN} AS max_value,
                   FIRST_VALUE(p IGNORE NULLS) {_RUN} AS first_purchase,
                   LAST_VALUE(p IGNORE NULLS) {_RUN} AS last_purchase
            FROM b
        """,
        "running_mean_var": f"""
            WITH c AS (
              SELECT event_id, user_id,
                     CAST(SUM({dec}) {_RUN} AS DOUBLE) AS s,
                     CAST(SUM({dec} * {dec}) {_RUN} AS DOUBLE) AS q,
                     COUNT(value) {_RUN} AS n
              FROM events
            )
            SELECT event_id, user_id,
                   s / n AS mean_value,
                   q / n - (s / n) * (s / n) AS var_value
            FROM c
        """,
        "running_countif_stddev": f"""
            WITH c AS (
              SELECT event_id, user_id,
                     COUNT(CASE WHEN event_type = 'click' THEN 1 END) {_RUN} AS n_clicks,
                     CAST(SUM({dec}) {_RUN} AS DOUBLE) AS s,
                     CAST(SUM({dec} * {dec}) {_RUN} AS DOUBLE) AS q,
                     COUNT(value) {_RUN} AS n
              FROM events
            )
            SELECT event_id, user_id, n_clicks,
                   CASE WHEN n >= 2
                        THEN sqrt(q / n - (s / n) * (s / n)) END AS sd_value
            FROM c
        """,
        "cep_funnel": """
            WITH e AS (
              SELECT user_id, ts, event_id, event_type FROM events
              WHERE event_type IN ('signup','click','purchase')
            ),
            s1 AS (
              SELECT user_id, min(struct_pack(t := ts, s := event_id)) AS m1
              FROM e WHERE event_type = 'signup' GROUP BY user_id
            ),
            s2 AS (
              SELECT e.user_id, min(struct_pack(t := e.ts, s := e.event_id)) AS m2
              FROM e JOIN s1 USING (user_id)
              WHERE e.event_type = 'click'
                AND struct_pack(t := e.ts, s := e.event_id) > s1.m1
                AND e.ts <= (s1.m1).t + INTERVAL 48 HOUR
              GROUP BY e.user_id
            ),
            s3 AS (
              SELECT e.user_id, min(struct_pack(t := e.ts, s := e.event_id)) AS m3
              FROM e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
              WHERE e.event_type = 'purchase'
                AND struct_pack(t := e.ts, s := e.event_id) > s2.m2
                AND e.ts <= (s1.m1).t + INTERVAL 48 HOUR
              GROUP BY e.user_id
            ),
            base AS (SELECT DISTINCT user_id FROM e)
            SELECT b.user_id,
                   CAST(CASE WHEN m3 IS NOT NULL THEN 3
                             WHEN m2 IS NOT NULL THEN 2
                             WHEN m1 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
                     AS step_reached,
                   (s1.m1).t AS t_signup,
                   (s2.m2).t AS t_click,
                   (s3.m3).t AS t_purchase,
                   m3 IS NOT NULL AS completed
            FROM base b
            LEFT JOIN s1 ON b.user_id = s1.user_id
            LEFT JOIN s2 ON b.user_id = s2.user_id
            LEFT JOIN s3 ON b.user_id = s3.user_id
        """,
        "cep_pattern": """
            WITH e AS (
              SELECT user_id, ts, event_id, event_type, value,
                     CAST(value AS DECIMAL(18,2)) AS dv
              FROM events
              WHERE event_type IN ('signup','click','view','error','purchase')
            ),
            s1 AS (
              SELECT user_id, min(struct_pack(t := ts, s := event_id)) AS m1
              FROM e WHERE event_type = 'signup' GROUP BY user_id
            ),
            s2 AS (
              SELECT e.user_id, min(struct_pack(t := e.ts, s := e.event_id)) AS m2
              FROM e JOIN s1 USING (user_id)
              WHERE e.event_type = 'click'
                AND struct_pack(t := e.ts, s := e.event_id) > s1.m1
                AND e.ts <= (s1.m1).t + INTERVAL 14 DAY
              GROUP BY e.user_id
            ),
            s3 AS (
              SELECT e.user_id, min(struct_pack(t := e.ts, s := e.event_id)) AS m3
              FROM e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
              WHERE e.event_type = 'purchase'
                AND struct_pack(t := e.ts, s := e.event_id) > s2.m2
                AND e.ts <= (s1.m1).t + INTERVAL 14 DAY
              GROUP BY e.user_id
            ),
            plus AS (
              -- click+ consumption: from the click instant (inclusive)
              -- to the purchase instant (exclusive), or the horizon
              -- when purchase is unmatched
              SELECT e.user_id, COUNT(*) AS n_click,
                     SUM(e.dv) AS sum_dv, MAX(e.value) AS max_click
              FROM e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
              LEFT JOIN s3 USING (user_id)
              WHERE e.event_type = 'click'
                AND struct_pack(t := e.ts, s := e.event_id) >= s2.m2
                AND CASE WHEN s3.m3 IS NOT NULL
                         THEN struct_pack(t := e.ts, s := e.event_id) < s3.m3
                         ELSE e.ts <= (s1.m1).t + INTERVAL 14 DAY END
              GROUP BY e.user_id
            ),
            star AS (
              -- view* zero-or-more consumer: strictly between click and
              -- purchase (the window a '?' observes), count may be 0
              SELECT e.user_id,
                     min(struct_pack(t := e.ts, s := e.event_id)) AS mv,
                     COUNT(*) AS n_view, SUM(e.dv) AS vsum
              FROM e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
              LEFT JOIN s3 USING (user_id)
              WHERE e.event_type = 'view'
                AND struct_pack(t := e.ts, s := e.event_id) > s2.m2
                AND CASE WHEN s3.m3 IS NOT NULL
                         THEN struct_pack(t := e.ts, s := e.event_id) < s3.m3
                         ELSE e.ts <= (s1.m1).t + INTERVAL 14 DAY END
              GROUP BY e.user_id
            ),
            obs AS (
              -- error? observer: strictly between click and purchase
              SELECT e.user_id, min(struct_pack(t := e.ts, s := e.event_id)) AS mo
              FROM e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
              LEFT JOIN s3 USING (user_id)
              WHERE e.event_type = 'error'
                AND struct_pack(t := e.ts, s := e.event_id) > s2.m2
                AND CASE WHEN s3.m3 IS NOT NULL
                         THEN struct_pack(t := e.ts, s := e.event_id) < s3.m3
                         ELSE e.ts <= (s1.m1).t + INTERVAL 14 DAY END
              GROUP BY e.user_id
            ),
            base AS (SELECT DISTINCT user_id FROM e)
            SELECT b.user_id,
                   CAST(CASE WHEN m3 IS NOT NULL THEN 3
                             WHEN m2 IS NOT NULL THEN 2
                             WHEN m1 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
                     AS step_reached,
                   (s1.m1).t AS t_signup,
                   (s2.m2).t AS t_click,
                   (star.mv).t AS t_view,
                   (obs.mo).t AS t_error,
                   (s3.m3).t AS t_purchase,
                   CAST(COALESCE(plus.n_click, 0) AS BIGINT) AS n_click,
                   CAST(plus.sum_dv AS DOUBLE) AS click_value,
                   plus.max_click AS max_click,
                   CAST(COALESCE(star.n_view, 0) AS BIGINT) AS n_view,
                   CAST(star.vsum AS DOUBLE) AS view_value,
                   m3 IS NOT NULL AS completed
            FROM base b
            LEFT JOIN s1 ON b.user_id = s1.user_id
            LEFT JOIN s2 ON b.user_id = s2.user_id
            LEFT JOIN s3 ON b.user_id = s3.user_id
            LEFT JOIN plus ON b.user_id = plus.user_id
            LEFT JOIN star ON b.user_id = star.user_id
            LEFT JOIN obs ON b.user_id = obs.user_id
        """,
        "lag": """
            WITH nn AS (
              SELECT event_id, user_id, ts, value,
                     LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_purchase
              FROM events WHERE event_type = 'purchase'
            )
            SELECT e.event_id, e.user_id, nn.prev_purchase
            FROM events e LEFT JOIN nn ON e.event_id = nn.event_id
        """,
        "select_when": """
            SELECT event_id, user_id, value FROM events
            WHERE value > 150 AND event_type = 'click'
        """,
        "with_key": """
            SELECT event_id, event_type,
                   COUNT(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
            FROM events
        """,
        "shift_by": """
            SELECT event_id, ts + INTERVAL 1 HOUR AS shifted_ts FROM events
        """,
        "shift_until": f"""
            WITH b AS (
              SELECT event_id, user_id,
                     FIRST_VALUE(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
                       OVER ({_EVENTS_ORDER} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS emitted_ts
              FROM events
            )
            SELECT event_id, user_id, emitted_ts FROM b WHERE emitted_ts IS NOT NULL
        """,
        "since_daily_sum": f"""
            SELECT event_id, user_id,
                   CAST(SUM({dec}) OVER (PARTITION BY user_id, date_trunc('day', ts)
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_today
            FROM events
        """,
        "sliding_rows": f"""
            SELECT event_id, user_id,
                   CAST(SUM({dec}) OVER ({_EVENTS_ORDER}
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_last3
            FROM events
        """,
        "sliding_cond": f"""
            WITH b AS (
              SELECT *, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS f FROM events
            ), w AS (
              SELECT *,
                     COALESCE(SUM(f) OVER ({_EVENTS_ORDER}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS wid,
                     SUM({dec}) {_RUN} AS cumall
              FROM b
            ), fires AS (
              SELECT user_id, wid, cumall FROM w WHERE f = 1
            )
            SELECT w.event_id, w.user_id,
                   CAST(w.cumall - COALESCE(fx.cumall, 0) AS DOUBLE) AS sum_win2
            FROM w LEFT JOIN fires fx ON fx.user_id = w.user_id AND fx.wid = w.wid - 2
        """,
        "sliding_minmax": f"""
            WITH b AS (
              SELECT *, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS f FROM events
            ), w AS (
              SELECT *,
                     COALESCE(SUM(f) OVER ({_EVENTS_ORDER}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS wid
              FROM b
            ), cur AS (
              SELECT *,
                     MIN(value) OVER (PARTITION BY user_id, wid ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur_min,
                     MAX(value) OVER (PARTITION BY user_id, wid ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur_max
              FROM w
            ), closed AS (
              SELECT user_id, wid, MIN(value) AS win_min, MAX(value) AS win_max
              FROM w GROUP BY user_id, wid
            ), prevw AS (
              SELECT user_id, wid,
                     MIN(win_min) OVER (PARTITION BY user_id ORDER BY wid
                        RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS prev_min,
                     MAX(win_max) OVER (PARTITION BY user_id ORDER BY wid
                        RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS prev_max
              FROM closed
            )
            SELECT cur.event_id, cur.user_id,
                   LEAST(prevw.prev_min, cur.cur_min) AS min_win2,
                   GREATEST(prevw.prev_max, cur.cur_max) AS max_win2
            FROM cur JOIN prevw ON cur.user_id = prevw.user_id AND cur.wid = prevw.wid
        """,
        "tick_daily": """
            WITH bnds AS (
              SELECT user_id,
                     CASE WHEN date_trunc('day', MIN(ts)) = MIN(ts)
                          THEN MIN(ts)
                          ELSE date_trunc('day', MIN(ts)) + INTERVAL 1 DAY
                     END AS start
              FROM events GROUP BY user_id
            ), g AS (
              SELECT date_trunc('day', MAX(ts)) AS fin FROM events
            ), ticks AS (
              SELECT user_id, UNNEST(generate_series(start, (SELECT fin FROM g), INTERVAL 1 DAY)) AS tick_time
              FROM bnds
            ), ev AS (
              -- an event exactly on a boundary belongs to the tick AT that
              -- time (ticks order after coincident events)
              SELECT user_id,
                     CASE WHEN date_trunc('day', ts) = ts THEN ts
                          ELSE date_trunc('day', ts) + INTERVAL 1 DAY END AS tick_time,
                     COUNT(value) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS s
              FROM events GROUP BY 1, 2
            )
            SELECT t.user_id, t.tick_time,
                   COALESCE(ev.n, 0) AS cnt, CAST(ev.s AS DOUBLE) AS sum_value
            FROM ticks t LEFT JOIN ev ON t.user_id = ev.user_id AND t.tick_time = ev.tick_time
        """,
        "sliding_daily_tick": """
            WITH bnds AS (
              SELECT user_id,
                     CASE WHEN date_trunc('day', MIN(ts)) = MIN(ts)
                          THEN MIN(ts)
                          ELSE date_trunc('day', MIN(ts)) + INTERVAL 1 DAY
                     END AS start
              FROM events GROUP BY user_id
            ), g AS (
              SELECT date_trunc('day', MAX(ts)) AS fin FROM events
            ), ticks AS (
              SELECT user_id, UNNEST(generate_series(start, (SELECT fin FROM g), INTERVAL 1 DAY)) AS tick_time
              FROM bnds
            ), ev AS (
              SELECT user_id,
                     CASE WHEN date_trunc('day', ts) = ts THEN ts
                          ELSE date_trunc('day', ts) + INTERVAL 1 DAY END AS tick_time,
                     COUNT(value) AS n, SUM(CAST(FLOOR(value) AS BIGINT)) AS s
              FROM events GROUP BY 1, 2
            )
            SELECT t.user_id, t.tick_time,
                   CAST(COALESCE(e0.n, 0) + COALESCE(e1.n, 0) AS BIGINT) AS cnt2,
                   CASE WHEN e0.s IS NULL AND e1.s IS NULL THEN NULL
                        ELSE CAST(COALESCE(e0.s, 0) + COALESCE(e1.s, 0) AS BIGINT)
                   END AS sum2_f
            FROM ticks t
            LEFT JOIN ev e0 ON t.user_id = e0.user_id AND t.tick_time = e0.tick_time
            LEFT JOIN ev e1 ON t.user_id = e1.user_id AND t.tick_time - INTERVAL 1 DAY = e1.tick_time
        """,
        "fenl_with_key": """
            SELECT event_id, event_type AS grp,
                   COUNT(value) OVER w AS c,
                   CAST(SUM(CAST(FLOOR(value) AS BIGINT)) OVER w AS BIGINT) AS total_f
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        """,
        "final_last": """
            SELECT event_id, user_id, value FROM events
            QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "final_at": """
            SELECT event_id, user_id, value FROM events
            WHERE ts <= TIMESTAMP '2024-06-01 00:00:00'
            QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "session_windows": f"""
            WITH b AS (
              SELECT user_id, ts, event_id, value,
                     CASE WHEN lag(ts) OVER ({_EVENTS_ORDER}) IS NULL
                          OR ts > lag(ts) OVER ({_EVENTS_ORDER}) + INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS ns
              FROM events
            ), s AS (
              SELECT *, SUM(ns) OVER ({_EVENTS_ORDER} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM b
            )
            SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events, MAX(ts) AS last_ts,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        "scalar_showcase": """
            SELECT event_id,
                   least(greatest(value, 50.0), 150.0) AS clamped,
                   round(pow(value, 0.5), 6) AS sqrt_v,
                   CASE WHEN event_type = 'click' THEN value END AS click_v,
                   COALESCE(CASE WHEN NOT (value > 100) THEN value END, -1.0) AS small_or_neg1,
                   upper(substr(event_type, 1, 3)) AS ety3,
                   length(event_type) AS ety_len,
                   dayofyear(ts) AS doy,
                   CAST((2024 - year(ts)) * 12 + (12 - month(ts)) AS INT) AS mb,
                   value IS NOT NULL AS valid,
                   value AS rec_a
            FROM events
        """,
        "scalar_sweep_arith": """
            SELECT event_id,
                   value + 1.5 AS v_add,
                   value - 0.25 AS v_sub,
                   value * 2.0 AS v_mul,
                   value / 2.0 AS v_div,
                   -value AS v_neg,
                   CAST(ceil(value) AS BIGINT) AS v_ceil,
                   CAST(floor(value) AS BIGINT) AS v_floor,
                   round(value) AS v_round,
                   CASE WHEN value < 50.0 THEN 50.0
                        WHEN value > 150.0 THEN 150.0 ELSE value END AS v_clamp,
                   round(pow(value, 2.0), 6) AS v_pow2,
                   sqrt(value) AS v_sqrt,
                   round(exp(value / 200.0), 6) AS v_exp,
                   least(value, 100.0) AS v_zmin,
                   greatest(value, 100.0) AS v_zmax
            FROM events
        """,
        "scalar_sweep_logic": """
            SELECT event_id,
                   value = 100.0 AS c_eq,
                   event_type != 'view' AS c_neq,
                   value < 50.0 AS c_lt,
                   value <= 50.0 AS c_lte,
                   value > 150.0 AS c_gt,
                   value >= 150.0 AS c_gte,
                   NOT (value > 100.0) AS l_not,
                   (event_type = 'click') AND
                     (CASE WHEN value > 120.0 THEN value > 100.0 END) AS l_and,
                   (event_type = 'click') OR
                     (CASE WHEN value > 120.0 THEN value > 100.0 END) AS l_or,
                   CASE WHEN event_type = 'click' THEN value END AS l_if,
                   CASE WHEN NOT COALESCE(event_type = 'click', FALSE)
                        THEN value END AS l_nullif,
                   COALESCE(CASE WHEN event_type = 'click' THEN value END, -1.0) AS l_coalesce,
                   COALESCE(CASE WHEN value > 100.0 THEN value END, -1.0) AS l_else
            FROM events
        """,
        "scalar_sweep_string_time": """
            SELECT event_id,
                   CAST(length(event_type) AS INT) AS s_len,
                   upper(event_type) AS s_upper,
                   lower(upper(event_type)) AS s_lower,
                   substr(event_type, 2,
                          greatest(length(event_type) - 2, 0)) AS s_sub_neg,
                   substr(event_type, 1, 3) AS s_sub_head,
                   CAST(dayofmonth(ts) AS INT) AS t_dom,
                   CAST(dayofmonth(ts) - 1 AS INT) AS t_dom0,
                   CAST(dayofyear(ts) AS INT) AS t_doy,
                   CAST(dayofyear(ts) - 1 AS INT) AS t_doy0,
                   CAST(month(ts) AS INT) AS t_moy,
                   CAST(month(ts) - 1 AS INT) AS t_moy0,
                   CAST(year(ts) AS INT) AS t_year,
                   ts AS t_of,
                   ts + to_seconds(CAST(round(value) AS BIGINT)) AS t_add_sec,
                   ts + to_days(CAST(event_id % 30 AS INT)) AS t_add_day,
                   ts + INTERVAL 2 MONTH AS t_add_mon,
                   CAST(floor(epoch(TIMESTAMP '2024-12-31 12:00:00'))
                        - floor(epoch(ts)) AS BIGINT) AS t_sb,
                   CAST(trunc((floor(epoch(TIMESTAMP '2024-12-31 12:00:00'))
                        - floor(epoch(ts))) / 86400.0) AS INT) AS t_db,
                   CAST((2024 - year(ts)) * 12 + (12 - month(ts)) AS INT) AS t_mb
            FROM events
        """,
        "scalar_sweep_record_json": """
            SELECT event_id,
                   event_type AS r_b,
                   value * 2.0 AS r_ext_c,
                   value AS r_sel_a,
                   value * 2.0 AS r_rem_c,
                   CAST(trunc(value) AS BIGINT) AS r_cast_i,
                   CAST(event_id AS DOUBLE) AS r_cast_f,
                   value IS NOT NULL AS r_valid,
                   FALSE AS r_invalid,
                   json_extract_string(props, '$.k') AS j_k,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS j_k_int
            FROM events
        """,
        "scalar_sweep_hash": """
            SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_type,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_type_hash,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_user,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_user_hash,
                   CAST(0 AS BIGINT) AS n_nondet
            FROM events
        """,
        "entity_slice": f"""
            WITH sliced AS (
              SELECT * FROM events
              WHERE ({_sql_hash28("CAST(user_id AS VARCHAR)")}) % 10000 < 1000
            )
            SELECT event_id, user_id,
                   COUNT(value) {_RUN} AS cnt
            FROM sliced
        """,
        "fenl_running": f"""
            SELECT event_id, user_id,
                   COUNT(value) {_RUN} AS n_vals,
                   MIN(value) {_RUN} AS lo,
                   MAX(value) {_RUN} AS hi,
                   CAST(SUM(CAST(FLOOR(value) AS BIGINT)) {_RUN} AS BIGINT) AS total_f
            FROM events
        """,
        "fenl_nested": f"""
            SELECT event_id, user_id,
                   CAST(SUM(s) {_RUN} AS BIGINT) AS nested
            FROM (
              SELECT event_id, user_id, ts,
                     SUM(CAST(FLOOR(value) AS BIGINT)) {_RUN} AS s
              FROM events
            )
        """,
        "fenl_when": """
            SELECT event_id, user_id, value FROM events
            WHERE value > 150 AND event_type = 'click'
        """,
        "fenl_nested_windowed": """
            WITH bnds AS (
              SELECT user_id,
                     CASE WHEN date_trunc('day', MIN(ts)) = MIN(ts)
                          THEN MIN(ts)
                          ELSE date_trunc('day', MIN(ts)) + INTERVAL 1 DAY
                     END AS start
              FROM events GROUP BY user_id
            ), g AS (
              SELECT date_trunc('day', MAX(ts)) AS fin FROM events
            ), ticks AS (
              SELECT user_id, UNNEST(generate_series(start, (SELECT fin FROM g), INTERVAL 1 DAY)) AS t
              FROM bnds
            ), rows_u AS (
              SELECT user_id, ts AS t, event_id AS subsort,
                     CAST(FLOOR(value) AS BIGINT) AS f, FALSE AS is_tick
              FROM events
              UNION ALL
              SELECT user_id, t, 9223372036854775807 AS subsort,
                     NULL AS f, TRUE AS is_tick
              FROM ticks
            ), w AS (
              -- inner window id: a boundary row carries the sum of the
              -- day it CLOSES (resets after the tick, never at it)
              SELECT *,
                     CASE WHEN is_tick THEN t - INTERVAL 1 DAY
                          ELSE date_trunc('day', t) END AS wid
              FROM rows_u
            ), i AS (
              SELECT *,
                     SUM(f) OVER (PARTITION BY user_id, wid ORDER BY t, subsort
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
                     COALESCE(SUM(CASE WHEN is_tick THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY t, subsort
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS owid
              FROM w
            )
            SELECT user_id, t, subsort,
                   CAST(SUM(s) OVER (PARTITION BY user_id, owid ORDER BY t, subsort
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   / NULLIF(COUNT(s) OVER (PARTITION BY user_id, owid ORDER BY t, subsort
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS m
            FROM i
        """,
        "fenl_since": f"""
            WITH w AS (
              SELECT event_id, user_id, ts,
                     COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       OVER ({_EVENTS_ORDER} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS wid
              FROM events
            )
            SELECT event_id, user_id,
                   COUNT(*) OVER (PARTITION BY user_id, wid ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt_since
            FROM w
        """,
        "fenl_lookup_rekey": f"""
            SELECT event_id, user_id,
                   CAST(SUM(CAST(FLOOR(value) AS BIGINT))
                     OVER ({_EVENTS_ORDER}
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS s
            FROM events
        """,
        "fenl_lookup_spread": """
            WITH a AS (
              SELECT user_id AS k, ts AS t, event_id AS s,
                     CAST(FLOOR(value*100) AS BIGINT) AS cents
              FROM events WHERE event_type = 'click'
            ), b AS (
              SELECT user_id AS k, ts AS t, event_id AS s,
                     (user_id % 50) + 1 AS ref
              FROM events WHERE event_type = 'view'
            ), u AS (
              SELECT COALESCE(a.k, b.k) AS k, COALESCE(a.t, b.t) AS t,
                     COALESCE(a.s, b.s) AS s, a.cents, b.ref,
                     a.k IS NOT NULL AS is_a, b.k IS NOT NULL AS is_b
              FROM a FULL OUTER JOIN b ON a.k = b.k AND a.t = b.t AND a.s = b.s
            ), w AS (
              SELECT *,
                SUM(cents) OVER (PARTITION BY k ORDER BY t, s
                                 ROWS UNBOUNDED PRECEDING) AS sum_c,
                LAST_VALUE(ref IGNORE NULLS) OVER (
                  PARTITION BY k ORDER BY t, s
                  ROWS UNBOUNDED PRECEDING) AS last_ref
              FROM u
            ), stream AS (
              -- the foreign value stream (responses emit at A rows) and
              -- the requests (key-new = B rows), merged per foreign key
              SELECT k AS fk, t, s, 0 AS pos, sum_c AS val,
                     NULL::BIGINT AS rk, NULL::TIMESTAMP AS rt,
                     NULL::BIGINT AS rs
              FROM w WHERE is_a
              UNION ALL
              SELECT last_ref, t, s, 1, NULL, k, t, s
              FROM w WHERE is_b AND last_ref IS NOT NULL
            ), latched AS (
              SELECT *, LAST_VALUE(val IGNORE NULLS) OVER (
                PARTITION BY fk ORDER BY t, s, pos
                ROWS UNBOUNDED PRECEDING) AS asof_val
              FROM stream
            ), resp AS (
              -- encode so a genuinely-null response still latches
              SELECT rk, rt, rs,
                     COALESCE(CAST(asof_val AS VARCHAR), 'X') AS enc
              FROM latched WHERE pos = 1
            ), spreadin AS (
              SELECT w.*, resp.enc FROM w LEFT JOIN resp
                ON w.k = resp.rk AND w.t = resp.rt AND w.s = resp.rs
            )
            SELECT k AS user_id, t, s AS sub,
                   CAST(sum_c AS BIGINT) AS s_cents,
                   CAST(last_ref AS BIGINT) AS k_ref,
                   CAST(NULLIF(LAST_VALUE(enc IGNORE NULLS) OVER (
                     PARTITION BY k ORDER BY t, s
                     ROWS UNBOUNDED PRECEDING), 'X') AS BIGINT) AS looked
            FROM spreadin
        """,
        "fenl_finished": """
            SELECT user_id,
                   (SELECT MAX(ts) + INTERVAL 1 MICROSECOND FROM events) AS t,
                   event_type AS et,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM events
            QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) = 1
        """,
        "fenl_merge": """
            WITH l AS (
              SELECT CAST(user_id AS BIGINT) AS k, ts AS t, event_id AS s, value AS v FROM events
            ), r AS (
              SELECT o_custkey AS k, o_orderdate AS t, o_orderkey AS s, o_totalprice AS tp FROM orders
            )
            SELECT COALESCE(l.k, r.k) AS k, COALESCE(l.t, r.t) AS t,
                   COALESCE(l.s, r.s) AS s, l.v, r.tp
            FROM l FULL OUTER JOIN r ON l.k = r.k AND l.t = r.t AND l.s = r.s
        """,
        "lookup_asof": """
            WITH u AS (
              SELECT o_custkey AS k, o_orderdate AS t, o_orderkey AS s, FALSE AS is_req,
                     NULL::BIGINT AS event_id, NULL::BIGINT AS user_id,
                     struct_pack(ok := o_orderkey, tp := o_totalprice) AS snap
              FROM orders
              UNION ALL
              SELECT user_id, ts, event_id, TRUE, event_id, user_id, NULL
              FROM events
            ), f AS (
              SELECT *, LAST_VALUE(snap IGNORE NULLS) OVER (
                       PARTITION BY k ORDER BY t, s, is_req
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
              FROM u
            )
            SELECT event_id, user_id, filled.ok AS o_orderkey, filled.tp AS o_totalprice
            FROM f WHERE is_req
        """,
        "merge_align": """
            WITH l AS (
              SELECT CAST(user_id AS BIGINT) AS k, ts AS t, event_id AS s, value FROM events
            ), r AS (
              SELECT o_custkey AS k, o_orderdate AS t, o_orderkey AS s, o_totalprice FROM orders
            ), j AS (
              SELECT COALESCE(l.k, r.k) AS k, COALESCE(l.t, r.t) AS t, COALESCE(l.s, r.s) AS s,
                     l.value, r.o_totalprice
              FROM l FULL OUTER JOIN r ON l.k = r.k AND l.t = r.t AND l.s = r.s
            )
            SELECT k, t, s, value,
                   LAST_VALUE(o_totalprice IGNORE NULLS) OVER (
                     PARTITION BY k ORDER BY t, s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS o_totalprice
            FROM j
        """,
        "tokens_table": f"""
            WITH {TOKENS_ORACLE_CTE.strip()}
            SELECT doc_id, source, len(tokens) AS n_tok,
                   tokens[1] AS tok_first, tokens[-1] AS tok_last,
                   CAST(list_aggregate(list_transform(tokens, t -> CAST(t AS BIGINT)), 'sum') AS BIGINT) AS tok_sum
            FROM tokens_tbl
        """,
        "tokens_windowed": f"""
            WITH {TOKENS_ORACLE_CTE.strip()}
            SELECT source, date_trunc('minute', _time) AS bucket,
                   COUNT(*) AS n_seq,
                   CAST(SUM(len(tokens)) AS BIGINT) AS total_tokens,
                   CAST(SUM(list_aggregate(list_transform(tokens, t -> CAST(t AS BIGINT)), 'sum')) AS BIGINT) AS tok_checksum
            FROM tokens_tbl
            GROUP BY 1, 2
        """,
        "token_histogram": f"""
            WITH {TOKENS_ORACLE_CTE.strip()}
            SELECT token, COUNT(*) AS cnt
            FROM (SELECT unnest(tokens) AS token FROM tokens_tbl)
            GROUP BY token
            ORDER BY cnt DESC, token ASC
            LIMIT 50
        """,
        "seq_len_stats": f"""
            WITH {TOKENS_ORACLE_CTE.strip()}
            SELECT source,
                   COUNT(*) AS n_seq,
                   CAST(SUM(len(tokens)) AS BIGINT) AS total_tokens,
                   MIN(len(tokens)) AS min_len,
                   MAX(len(tokens)) AS max_len,
                   CAST(SUM(len(tokens)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_len,
                   CAST(median(len(tokens)) AS DOUBLE) AS median_len
            FROM tokens_tbl
            GROUP BY source
        """,
        "vocab_stats": f"""
            WITH {TOKENS_ORACLE_CTE.strip()},
            ex AS (SELECT source, unnest(tokens) AS token FROM tokens_tbl)
            SELECT source,
                   COUNT(DISTINCT token) AS vocab,
                   COUNT(*) AS occurrences,
                   ROUND(CAST(COUNT(DISTINCT token) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE), 6) AS type_token_ratio
            FROM ex
            GROUP BY source
        """,
        "vocab_drift": f"""
            WITH {TOKENS_ORACLE_CTE.strip()},
            cnts AS (
              SELECT date_trunc('minute', _time) AS w, token, COUNT(*) AS cnt
              FROM (SELECT _time, unnest(tokens) AS token FROM tokens_tbl)
              GROUP BY 1, 2
            ),
            cur AS (
              SELECT w, token, cnt, SUM(cnt) OVER (PARTITION BY w) AS tot FROM cnts
            ),
            prev AS (
              SELECT w + INTERVAL 1 MINUTE AS w, token,
                     cnt AS cnt_prev, tot AS tot_prev
              FROM cur
            ),
            joined AS (
              SELECT COALESCE(cur.w, prev.w) AS w,
                     COALESCE(cur.token, prev.token) AS token,
                     cur.cnt, cur.tot, prev.cnt_prev, prev.tot_prev
              FROM cur FULL OUTER JOIN prev
                ON cur.w = prev.w AND cur.token = prev.token
            ),
            fixed AS (
              SELECT w, token, cnt, cnt_prev,
                     MAX(tot) OVER (PARTITION BY w) AS tot,
                     MAX(tot_prev) OVER (PARTITION BY w) AS tot_prev
              FROM joined
            )
            SELECT w AS window_start,
                   ROUND(
                     CAST(SUM(ABS(COALESCE(cnt, 0) * COALESCE(tot_prev, 0)
                              - COALESCE(cnt_prev, 0) * COALESCE(tot, 0))) AS DOUBLE)
                     / (CAST(MAX(tot) AS DOUBLE) * CAST(MAX(tot_prev) AS DOUBLE)),
                     6) AS l1_drift
            FROM fixed
            GROUP BY w
            HAVING MAX(tot) IS NOT NULL AND MAX(tot_prev) IS NOT NULL
        """,
        "len_quantiles": f"""
            WITH {TOKENS_ORACLE_CTE.strip()}
            SELECT source,
                   COUNT(*) AS n_seq,
                   ROUND(quantile_cont(len(tokens), 0.25), 6) AS q25,
                   ROUND(quantile_cont(len(tokens), 0.5), 6) AS q50,
                   ROUND(quantile_cont(len(tokens), 0.75), 6) AS q75,
                   ROUND(quantile_cont(len(tokens), 0.99), 6) AS q99
            FROM tokens_tbl
            GROUP BY source
        """,
        "source_mix": f"""
            WITH {TOKENS_ORACLE_CTE.strip()},
            per AS (
              SELECT source, CAST(SUM(len(tokens)) AS BIGINT) AS src_tokens
              FROM tokens_tbl GROUP BY source
            ),
            tot AS (SELECT CAST(SUM(src_tokens) AS DOUBLE) AS all_tok FROM per)
            SELECT source, src_tokens,
                   ROUND(CAST(src_tokens AS DOUBLE) / all_tok, 6) AS natural_share,
                   ROUND(POW(CAST(src_tokens AS DOUBLE) / all_tok, 0.7)
                         / SUM(POW(CAST(src_tokens AS DOUBLE) / all_tok, 0.7)) OVER (),
                         6) AS sample_weight
            FROM per, tot
        """,
        **_pipeline_oracles(),
    }


_QIDS = ", ".join(str(i) for i in range(10))

# Mirror of _near_dup_corpus: embeddings + 20 planted near-copies.
# DuckDB list_transform's (x, i) index is 1-based (Spark's transform is
# 0-based), hence (i - 1). All literals cast to DOUBLE so the engine
# does IEEE double math (DuckDB bare decimals are DECIMAL-typed).
_NEAR_DUP_CORPUS_CTE = """
  corpus AS (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT CAST(vec_id + 100000 AS BIGINT) AS vec_id,
           list_transform(embedding, (x, i) ->
             CAST(CAST(x AS DOUBLE) * (CAST(1.0 AS DOUBLE) +
                  CASE WHEN (i - 1) % 2 = 0 THEN CAST(0.005 AS DOUBLE)
                       ELSE CAST(-0.005 AS DOUBLE) END) AS FLOAT)) AS embedding
    FROM embeddings WHERE vec_id < 20
  )
"""


def _pipeline_oracles() -> dict[str, str]:
    """Oracles for the training-data pipeline operators. Hashing is
    md5-derived on both sides; float folds use list_reduce with a 0.0
    prepend so the op sequence matches Spark's F.aggregate exactly."""
    simhash_terms = " + ".join(
        f"CASE WHEN 2 * len(list_filter(hv, h -> (h & {1 << j}) != 0)) - len(hv) > 0 "
        f"THEN {1 << j} ELSE 0 END"
        for j in range(16)
    )
    langs = ["en", "de", "fr", "es"]
    from kaskada_spark.operators.text import BPE_PATTERN, STOPWORDS

    def hits(lang: str) -> str:
        vocab = ", ".join(f"'{s}'" for s in STOPWORDS[lang])
        return f"len(list_filter(ws, x -> list_contains([{vocab}], x)))"

    lang_cases = " ".join(
        f"WHEN {lang} = greatest(en, de, fr, es) THEN '{lang}'" for lang in langs
    )
    knn_rank = """
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
          FROM scored
        ) WHERE rank <= 5
    """
    return {
        "exact_dedup": """
            SELECT md5(text) AS content_hash, MIN(doc_id) AS rep_id, COUNT(*) AS n_copies
            FROM documents GROUP BY 1
        """,
        "minhash_lsh": f"""
            WITH {_sql_minhash_pairs_ctes()}
            SELECT id_a, id_b FROM pairs
        """,
        "dup_spans": f"""
            WITH {TOKENS_ORACLE_CTE.strip()},
            kh AS (
              SELECT doc_id, tokens,
                list_transform(range(1, len(tokens) - 8 + 2), i ->
                  list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                                 list_transform(tokens[i : i + 7],
                                                t -> CAST(t AS BIGINT))),
                    (a, t) -> (a * 1000003 + t) % 2147483647)
                ) AS kh
              FROM tokens_tbl WHERE len(tokens) >= 8
            ),
            sel AS (
              SELECT doc_id, tokens,
                list_distinct(list_transform(
                  range(1, greatest(len(kh) - 25 + 1, 1) + 1), j ->
                    j - 1 + list_position(kh[j : j + 24],
                                          list_min(kh[j : j + 24]))
                )) AS sel
              FROM kh
            ),
            fps AS (
              SELECT doc_id,
                md5(array_to_string(
                  list_transform(tokens[p : p + 7], t -> CAST(t AS VARCHAR)),
                  ' ')) AS fp
              FROM sel, UNNEST(sel) AS u(p)
            )
            SELECT fp,
                   COUNT(DISTINCT doc_id) AS n_docs,
                   COUNT(*) AS n_occ,
                   MIN(doc_id) AS first_doc
            FROM fps GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
        """,
        "repetition": """
            WITH base AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ws,
                     list_filter(string_split(text, chr(10)), l -> len(l) > 0) AS lines
              FROM documents
            ), mid AS (
              SELECT doc_id, ws, lines,
                     list_sort(list_transform(
                       generate_series(1, greatest(len(ws) - 1, 0)),
                       i -> ws[i] || ' ' || ws[i+1])) AS bg,
                     list_sort(lines) AS ls
              FROM base
            ), runs AS (
              SELECT *, list_append(
                       list_filter(generate_series(1, len(bg)),
                                   i -> i = 1 OR bg[i] <> bg[i-1]),
                       len(bg) + 1) AS ext
              FROM mid
            ), scored AS (
              SELECT doc_id, ws, lines, bg, ls,
                     CASE WHEN len(bg) > 0 THEN
                       list_max(list_transform(generate_series(1, len(ext) - 1),
                                               j -> ext[j+1] - ext[j]))
                     END AS max_run,
                     coalesce(list_sum(list_transform(generate_series(1, len(ls)),
                       i -> CASE WHEN (i > 1 AND ls[i] = ls[i-1])
                                   OR (i < len(ls) AND ls[i] = ls[i+1])
                                 THEN len(ls[i]) ELSE 0 END)), 0) AS dup_chars,
                     coalesce(list_sum(list_transform(ls, l -> len(l))), 0) AS total_chars
              FROM runs
            )
            SELECT doc_id AS doc,
                   CAST(len(ws) AS BIGINT) AS n_words,
                   CAST(len(list_distinct(ws)) AS BIGINT) AS uniq_words,
                   CASE WHEN len(ws) > 0 THEN
                     CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE)
                   END AS dup_word_frac,
                   CASE WHEN len(bg) > 0 THEN
                     CAST(max_run AS DOUBLE) / CAST(len(bg) AS DOUBLE)
                   END AS top_bigram_frac,
                   CAST(len(lines) AS BIGINT) AS n_lines,
                   CASE WHEN len(lines) > 0 THEN
                     CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / CAST(len(lines) AS DOUBLE)
                   END AS dup_line_frac,
                   CASE WHEN total_chars > 0 THEN
                     CAST(dup_chars AS DOUBLE) / CAST(total_chars AS DOUBLE)
                   END AS dup_line_char_frac
            FROM scored
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE {_sql_minhash_pairs_ctes()}, edges AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs
            ), reach(id, lbl) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id
            )
            SELECT id AS doc, CAST(MIN(lbl) AS BIGINT) AS cluster_id
            FROM reach GROUP BY id
        """,
        "simhash": f"""
            WITH {_WORDS_CTE.strip()}, h AS (
              SELECT doc_id,
                     list_transform(ws, x -> CAST(('0x' || substr(md5(x), 1, 4)) AS BIGINT)) AS hv
              FROM w
            )
            SELECT doc_id, CAST(({simhash_terms}) AS BIGINT) AS simhash FROM h
        """,
        "ngram_jaccard": f"""
            WITH {_SHINGLES_CTE.strip()}, r AS (
              SELECT source AS grp, doc_id AS doc, sh,
                     row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
              FROM sh
            )
            SELECT a.grp AS grp, a.doc AS id_a, b.doc AS id_b,
                   CASE WHEN (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) > 0
                        THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                   END AS jaccard
            FROM r a JOIN r b ON a.grp = b.grp AND a.rn + 1 = b.rn
        """,
        "embed_knn": f"""
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id IN ({_QIDS})
            ), scored AS (
              SELECT e.vec_id AS neighbor_id, q.query_id,
                     {_sql_cosine("e.embedding", "q.qvec")} AS sim
              FROM embeddings e CROSS JOIN q
              WHERE e.vec_id != q.query_id
            )
            {knn_rank}
        """,
        "embed_knn_ivf": f"""
            WITH cent AS (
              SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
                     embedding AS cvec
              FROM (SELECT vec_id, embedding FROM embeddings
                    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)
            ), assign AS (
              SELECT neighbor_id, cell, nvec FROM (
                SELECT e.vec_id AS neighbor_id, c.cell, e.embedding AS nvec,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY {_sql_cosine("e.embedding", "c.cvec")} DESC, c.cell) AS rn
                FROM embeddings e CROSS JOIN cent c
              ) WHERE rn = 1
            ), probes AS (
              SELECT query_id, cell, qvec FROM (
                SELECT e.vec_id AS query_id, c.cell, e.embedding AS qvec,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY {_sql_cosine("e.embedding", "c.cvec")} DESC, c.cell) AS rn
                FROM embeddings e CROSS JOIN cent c
                WHERE e.vec_id IN ({_QIDS})
              ) WHERE rn <= 4
            ), scored AS (
              SELECT a.neighbor_id, p.query_id, {_sql_cosine("a.nvec", "p.qvec")} AS sim
              FROM assign a JOIN probes p USING (cell)
              WHERE a.neighbor_id != p.query_id
            )
            {knn_rank}
        """,
        "embed_knn_lsh": f"""
            WITH b AS (
              SELECT vec_id AS neighbor_id, embedding AS nvec,
                     {_sql_lsh_bucket("embedding", 6, 64)} AS bucket
              FROM embeddings
            ), q AS (
              SELECT neighbor_id AS query_id, nvec AS qvec, bucket
              FROM b WHERE neighbor_id IN ({_QIDS})
            ), scored AS (
              SELECT b.neighbor_id, q.query_id, {_sql_cosine("b.nvec", "q.qvec")} AS sim
              FROM b JOIN q USING (bucket)
              WHERE b.neighbor_id != q.query_id
            )
            {knn_rank}
        """,
        # auto_n_bits(520, 256) = 4 at sf0.01; the Spark side's
        # max_bucket_rows=512 cap never splits a bucket at this scale
        # (salt ≡ 0), so the unsalted SQL join is exact.
        "cosine_near_dup": f"""
            WITH {_NEAR_DUP_CORPUS_CTE.strip()}, b AS (
              SELECT vec_id AS doc, embedding AS vec,
                     {_sql_lsh_bucket("embedding", 4, 64)} AS bucket
              FROM corpus
            )
            SELECT l.doc AS id_a, r.doc AS id_b,
                   {_sql_cosine("l.vec", "r.vec")} AS sim
            FROM b l JOIN b r USING (bucket)
            WHERE l.doc < r.doc AND {_sql_cosine("l.vec", "r.vec")} > 0.8
        """,
        # band b planes use seed 42 + b * 1000003 (similarity.BAND_SEED_STRIDE)
        "cosine_near_dup_banded": f"""
            WITH {_NEAR_DUP_CORPUS_CTE.strip()}, b0 AS (
              SELECT vec_id AS doc, {_sql_lsh_bucket("embedding", 6, 64, seed=42)} AS bucket
              FROM corpus
            ), b1 AS (
              SELECT vec_id AS doc, {_sql_lsh_bucket("embedding", 6, 64, seed=1000045)} AS bucket
              FROM corpus
            ), cand AS (
              SELECT l.doc AS id_a, r.doc AS id_b FROM b0 l JOIN b0 r USING (bucket)
              WHERE l.doc < r.doc
              UNION
              SELECT l.doc AS id_a, r.doc AS id_b FROM b1 l JOIN b1 r USING (bucket)
              WHERE l.doc < r.doc
            )
            SELECT c.id_a, c.id_b, {_sql_cosine("ea.embedding", "eb.embedding")} AS sim
            FROM cand c
            JOIN corpus ea ON ea.vec_id = c.id_a
            JOIN corpus eb ON eb.vec_id = c.id_b
            WHERE {_sql_cosine("ea.embedding", "eb.embedding")} > 0.8
        """,
        "lang_id": f"""
            WITH {_WORDS_CTE.strip()}, h AS (
              SELECT doc_id, {hits('en')} AS en, {hits('de')} AS de,
                     {hits('fr')} AS fr, {hits('es')} AS es
              FROM w
            )
            SELECT doc_id,
                   CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und' {lang_cases} END AS detected_lang
            FROM h
        """,
        "pipeline_e2e": f"""
            WITH reps AS (
              SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
            ),
            dd AS (
              SELECT d.doc_id, d.text, d.source FROM documents d JOIN reps USING (doc_id)
            ),
            w AS (
              SELECT doc_id, source, text,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM dd
            ),
            f AS (
              SELECT doc_id,
                     CAST(length(text) AS DOUBLE) AS n_chars,
                     len(ws) AS wc,
                     CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) AS twc,
                     CAST(length(regexp_replace(text, '[A-Za-z0-9 \t\n]', '', 'g')) AS DOUBLE) AS punct,
                     CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS digits,
                     {hits('en')} AS sw
              FROM w
            ),
            r AS (
              SELECT doc_id,
                     CASE WHEN wc > 0 THEN twc / CAST(wc AS DOUBLE) END AS mean_word_len,
                     CASE WHEN n_chars > 0 THEN punct / n_chars END AS punct_ratio,
                     CASE WHEN n_chars > 0 THEN digits / n_chars END AS digit_ratio,
                     CASE WHEN wc > 0 THEN CAST(sw AS DOUBLE) / CAST(wc AS DOUBLE) END AS stopword_ratio
              FROM f
            ),
            q AS (
              SELECT doc_id,
                     least(coalesce(stopword_ratio, 0.0) * 2.5, 1.0) * 0.4
                     + (CASE WHEN coalesce(mean_word_len, 0.0) >= 3.0
                             AND coalesce(mean_word_len, 0.0) <= 10.0 THEN 1.0 ELSE 0.0 END) * 0.3
                     + greatest(1.0 - coalesce(punct_ratio, 0.0) * 4.0, 0.0) * 0.2
                     + greatest(1.0 - coalesce(digit_ratio, 0.0) * 2.0, 0.0) * 0.1 AS quality
              FROM r
            ),
            kept AS (
              SELECT dd.doc_id, dd.text, dd.source
              FROM dd JOIN q USING (doc_id) WHERE q.quality >= 0.3
            ),
            tok AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
                     CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tok,
                     CAST(doc_id AS BIGINT) AS _subsort
              FROM kept
            ),
            c AS (
              SELECT doc_id, source, n_tok,
                     CAST(SUM(n_tok) OVER (
                       PARTITION BY source ORDER BY _subsort
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) - n_tok AS BIGINT) AS tokens_before
              FROM tok
            )
            SELECT doc_id, source, n_tok, tokens_before,
                   tokens_before // 2048 AS pack_id,
                   tokens_before % 2048 AS pack_offset
            FROM c
        """,
        "quality": f"""
            WITH {_WORDS_CTE.strip()}, f AS (
              SELECT doc_id,
                     CAST(length(text) AS DOUBLE) AS n_chars,
                     len(ws) AS wc,
                     CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) AS twc,
                     CAST(length(regexp_replace(text, '[A-Za-z0-9 \t\n]', '', 'g')) AS DOUBLE) AS punct,
                     CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS digits,
                     {hits('en')} AS sw
              FROM w
            ), r AS (
              SELECT doc_id, CAST(wc AS BIGINT) AS word_cnt,
                     CASE WHEN wc > 0 THEN twc / CAST(wc AS DOUBLE) END AS mean_word_len,
                     CASE WHEN n_chars > 0 THEN punct / n_chars END AS punct_ratio,
                     CASE WHEN n_chars > 0 THEN digits / n_chars END AS digit_ratio,
                     CASE WHEN wc > 0 THEN CAST(sw AS DOUBLE) / CAST(wc AS DOUBLE) END AS stopword_ratio
              FROM f
            )
            SELECT doc_id, word_cnt, mean_word_len, punct_ratio, stopword_ratio,
                   least(coalesce(stopword_ratio, 0.0) * 2.5, 1.0) * 0.4
                   + (CASE WHEN coalesce(mean_word_len, 0.0) >= 3.0
                           AND coalesce(mean_word_len, 0.0) <= 10.0 THEN 1.0 ELSE 0.0 END) * 0.3
                   + greatest(1.0 - coalesce(punct_ratio, 0.0) * 4.0, 0.0) * 0.2
                   + greatest(1.0 - coalesce(digit_ratio, 0.0) * 2.0, 0.0) * 0.1 AS quality
            FROM r
        """,
        "token_counts": f"""
            WITH {_WORDS_CTE.strip()}
            SELECT doc_id, len(ws) AS ws_tokens,
                   len(regexp_extract_all(text, '{BPE_PATTERN}')) AS bpe_tokens
            FROM w
        """,
        "fingerprint": f"""
            WITH {_WORDS_CTE.strip()}
            SELECT doc_id,
                   CAST(coalesce(list_sum(list_transform(
                     generate_series(1, len(ws)),
                     i -> i * {_sql_hash28('ws[i]')}
                   )), 0) AS BIGINT) AS fp
            FROM w
        """,
        # Reproduces kaskada_spark/operators/multimodal.py exactly:
        # synthesize_media payload = unhex(md5('42' || id)); decode stub
        # seeds a 64-bit LCG from md5(lower(hex(payload)))[:16] and emits
        # (x >> 11) / 2^53 per step, rounded through float32. HUGEINT
        # keeps the mod-2^64 arithmetic exact (x*A < 2^127).
        "media_features": """
            WITH m AS (
              SELECT i AS id, 'm-' || CAST(i AS VARCHAR) AS media_id,
                     unhex(md5('42' || CAST(i AS VARCHAR))) AS payload,
                     CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS mt
              FROM (SELECT unnest(generate_series(0, 199)) AS i)
            ), s AS (
              SELECT media_id, mt,
                     CAST(octet_length(payload) AS BIGINT) AS n_bytes,
                     CAST(CAST(('0x' || substr(md5(lower(hex(payload))), 1, 16)) AS UBIGINT) AS HUGEINT) AS seed
              FROM m
            ), l AS (
              SELECT media_id, mt, n_bytes,
                list_reduce(list_prepend(seed, CAST(range(1, 2) AS HUGEINT[])),
                  (acc, i) -> (acc * 6364136223846793005 + 1442695040888963407)
                              % CAST(18446744073709551616 AS HUGEINT)) AS x1,
                list_reduce(list_prepend(seed, CAST(range(1, 9) AS HUGEINT[])),
                  (acc, i) -> (acc * 6364136223846793005 + 1442695040888963407)
                              % CAST(18446744073709551616 AS HUGEINT)) AS x8,
                list_reduce(list_prepend(seed, CAST(range(1, 17) AS HUGEINT[])),
                  (acc, i) -> (acc * 6364136223846793005 + 1442695040888963407)
                              % CAST(18446744073709551616 AS HUGEINT)) AS x16
              FROM s
            )
            SELECT media_id, mt, n_bytes,
                   CAST(CAST((x1 >> 11) / 9007199254740992.0 AS REAL) AS DOUBLE) AS f0,
                   CAST(CAST((x8 >> 11) / 9007199254740992.0 AS REAL) AS DOUBLE) AS f7,
                   CAST(CAST((x16 >> 11) / 9007199254740992.0 AS REAL) AS DOUBLE) AS f15
            FROM l
        """,
        # Mirror of operators/training.py decontaminate: distinct
        # 3-gram shingles (word arrays as in _SHINGLES_CTE), 28-bit md5
        # hash per shingle, probe set = docs with doc_id % 20 = 0.
        "decontam": f"""
            WITH {_SHINGLES_CTE.strip()}, probe AS (
              SELECT DISTINCT {_sql_hash28('s')} AS h
              FROM (SELECT unnest(sh) AS s FROM sh WHERE doc_id % 20 = 0)
            ), corpus AS (
              SELECT doc_id, {_sql_hash28('s')} AS h
              FROM (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id % 20 <> 0)
            ), hits AS (
              SELECT doc_id, COUNT(*) AS n
              FROM corpus WHERE h IN (SELECT h FROM probe)
              GROUP BY doc_id
            )
            SELECT d.doc_id AS doc,
                   CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
                   coalesce(h.n, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 20 <> 0
        """,
        # Mirror of operators/text.py scrub_pii over the same planted
        # enrichment. Patterns are RE2/Java-regex common subset;
        # single-quoted SQL strings keep backslashes literal.
        "scrub_pii": """
            WITH e AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com or 555-'
                            || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                            || '-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                            || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                     ELSE text END AS t
              FROM documents
            )
            SELECT doc_id AS doc,
                   CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(t, '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b')) AS BIGINT) AS n_phones,
                   CAST(len(regexp_extract_all(t, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS BIGINT) AS n_ips,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
                       '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'),
                     '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b', '<PHONE>', 'g') AS clean_text
            FROM e
        """,
        # Mirror of operators/training.py pack_sequences(budget=512):
        # running per-source token count in (_time, _subsort) order,
        # cut every 512 tokens. SUM(BIGINT) is HUGEINT in DuckDB ->
        # cast back; // is integer division (Spark side uses floor).
        "pack_sequences": f"""
            WITH {TOKENS_ORACLE_CTE.strip()}, base AS (
              SELECT doc_id, source, CAST(len(tokens) AS BIGINT) AS n_tok,
                     _time, _subsort
              FROM tokens_tbl
            ), c AS (
              SELECT doc_id, source, n_tok,
                     CAST(SUM(n_tok) OVER (
                       PARTITION BY source ORDER BY _time, _subsort
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) - n_tok AS BIGINT) AS tokens_before
              FROM base
            )
            SELECT doc_id, source, n_tok, tokens_before,
                   tokens_before // 512 AS pack_id,
                   tokens_before % 512 AS pack_offset
            FROM c
        """,
        # Mirror of operators/training.py chunk_sequences(32, overlap=8):
        # stride-24 offsets over each non-empty token array, slice of at
        # most 32 tokens per chunk. range(0, n, 24) == Spark
        # sequence(0, n-1, 24) for n > 0; list_slice clamps like
        # F.slice. Digests mirror q_tokens_table's conventions.
        "chunk_sequences": f"""
            WITH {TOKENS_ORACLE_CTE.strip()}, nz AS (
              SELECT doc_id, source, tokens, len(tokens) AS n_tok
              FROM tokens_tbl WHERE len(tokens) > 0
            )
            SELECT doc_id, source, chunk_id, chunk_off, chunk_len,
                   sl[1] AS tok_first,
                   sl[len(sl)] AS tok_last,
                   CAST(list_aggregate(
                     list_transform(sl, t -> CAST(t AS BIGINT)), 'sum'
                   ) AS BIGINT) AS tok_sum
            FROM (
              SELECT doc_id, source,
                     CAST(u.off // 24 AS BIGINT) AS chunk_id,
                     CAST(u.off AS BIGINT) AS chunk_off,
                     CAST(LEAST(32, n_tok - u.off) AS BIGINT) AS chunk_len,
                     list_slice(tokens, u.off + 1, u.off + 32) AS sl
              FROM nz, UNNEST(range(0, n_tok, 24)) AS u(off)
            )
        """,
        # Mirror of operators/training.py token_pair_counts(k=100):
        # adjacent pairs via 1-based positional lookup, count, top-100
        # with the same deterministic tie-break (cnt desc, t1, t2).
        "bpe_pairs": f"""
            WITH {TOKENS_ORACLE_CTE.strip()}, p AS (
              SELECT tokens[i] AS t1, tokens[i + 1] AS t2
              FROM tokens_tbl, UNNEST(range(1, len(tokens))) AS u(i)
              WHERE len(tokens) >= 2
            )
            SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM p
            GROUP BY t1, t2
            ORDER BY cnt DESC, t1, t2
            LIMIT 100
        """,
        # Mirror of operators/training.py epoch_shuffle(16, seed='ep1'):
        # shard = md5('ep1|' || id) first-7-hex % 16, pos = 0-based rank
        # of the full md5 hex (ties by id) within the shard.
        "epoch_shuffle": """
            WITH h AS (
              SELECT doc_id, source,
                     md5('ep1|' || CAST(doc_id AS VARCHAR)) AS hh
              FROM documents
            ), s AS (
              SELECT doc_id, source, hh,
                     CAST(('0x' || substr(hh, 1, 7)) AS BIGINT) % 16 AS shard
              FROM h
            )
            SELECT doc_id, source, shard,
                   CAST(row_number() OVER (
                     PARTITION BY shard ORDER BY hh, doc_id
                   ) - 1 AS BIGINT) AS pos
            FROM s
        """,
        # Mirror of operators/training.py mixture_sample +
        # train_valid_split: md5('salt|doc_id') 28-bit hash -> uniform
        # in [0,1) (division by 2^28 is exact in double), per-source
        # rate with replication for rate > 1, then the 5% valid split.
        "mixture_split": f"""
            WITH r AS (
              SELECT doc_id, source,
                     {_sql_hash28("'mix|' || CAST(doc_id AS VARCHAR)")} / 268435456.0 AS u,
                     CASE source WHEN 'src0' THEN 0.0 WHEN 'src1' THEN 0.35
                                 WHEN 'src2' THEN 1.5 WHEN 'src3' THEN 2.0
                                 ELSE 1.0 END AS rate
              FROM documents
            ), n AS (
              SELECT doc_id, source,
                     CAST(floor(rate) AS BIGINT)
                       + CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END AS n_copies
              FROM r
            ), ex AS (
              SELECT doc_id, source,
                     CAST(unnest(range(n_copies)) AS BIGINT) AS copy
              FROM n WHERE n_copies > 0
            )
            SELECT doc_id, source, copy,
                   CASE WHEN {_sql_hash28("'split|' || CAST(doc_id AS VARCHAR)")} / 268435456.0 < 0.05
                        THEN 'valid' ELSE 'train' END AS split
            FROM ex
        """,
    }
