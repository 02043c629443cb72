"""Drop-in stand-in for the reference Python client's module-level API.

The reference client (`/root/reference/clients/python/src/kaskada/
{table,view,query,materialization,slice_filters}.py`) is a gRPC wrapper
around the Rust services: ``create_table`` registers a (time, subsort,
entity-key) table config, ``load``/``load_dataframe`` append files to
it, ``create_view`` registers a named Fenl expression, ``create_query``
runs a Fenl expression over the registered tables, and
``create_materialization`` keeps a destination updated with results.

Here the same call shapes execute directly on a SparkSession — no
server, no protobufs: tables become prepared Timelines over unioned
loads, views become Fenl formulas, queries lower through
``compile_fenl`` (behaviors, changed_since, preview limits and entity
slicing included) and return live DataFrames. Existing notebooks built
on ``import kaskada.table as ktable`` can switch to ``from
kaskada_spark import compat as ktable`` and keep their call sites.

Intentional divergences (documented, not accidental):
- ``create_query`` returns a ``QueryResult`` whose ``.dataframe`` is
  the lazily-planned Spark DataFrame (the reference returns presigned
  parquet URLs; here the engine IS your Spark cluster).
- ``data_token_id`` is the load count as a string: querying with an
  older token replays only the loads present at that token — the same
  repeatable-query contract without a metadata service.
- Pulsar-backed ``TableSource``/destinations need packages absent from
  this environment and raise with a pointer to the Kafka recipe
  (`sources/readers.py read_kafka_stream`).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from kaskada_spark.fenl.compiler import compile_fenl
from kaskada_spark.prepare import KEY
from kaskada_spark.timeline import Timeline


# ---------------------------------------------------------------------
# session (the client/service state, minus the service)
# ---------------------------------------------------------------------
@dataclass
class _TableDef:
    time_column_name: str
    entity_key_column_name: str
    subsort_column_name: Optional[str]
    grouping_id: Optional[str]
    loads: list = field(default_factory=list)  # list[DataFrame]


class Session:
    """Holds table/view/materialization registries (the state the
    reference keeps behind its gRPC services, table.py:76-128)."""

    def __init__(self, spark: SparkSession | None = None):
        if spark is None:
            from kaskada_spark.session import get_spark

            spark = get_spark()
        self.spark = spark
        self.tables: dict[str, _TableDef] = {}
        self.views: dict[str, str] = {}
        self.materializations: dict[str, dict] = {}


_DEFAULT: Session | None = None


def _session(client: Session | None = None) -> Session:
    global _DEFAULT
    if client is not None:
        return client
    if _DEFAULT is None:
        _DEFAULT = Session()
    return _DEFAULT


def set_default_session(s: Session) -> None:
    global _DEFAULT
    _DEFAULT = s


# ---------------------------------------------------------------------
# tables (reference table.py)
# ---------------------------------------------------------------------
def create_table(
    table_name: str,
    time_column_name: str,
    entity_key_column_name: str,
    subsort_column_name: Optional[str] = None,
    grouping_id: Optional[str] = None,
    source: Any = None,
    client: Session | None = None,
) -> _TableDef:
    """Mirror of table.py:130-196 (minus protobuf plumbing)."""
    s = _session(client)
    if table_name in s.tables:
        raise ValueError(f"table {table_name!r} already exists")
    if source is not None:
        raise NotImplementedError(
            "Pulsar table sources need broker packages not present here; "
            "use kaskada_spark.sources.readers.read_kafka_stream for the "
            "live-stream path"
        )
    t = _TableDef(
        time_column_name, entity_key_column_name, subsort_column_name, grouping_id
    )
    s.tables[table_name] = t
    return t


def list_tables(client: Session | None = None) -> list[str]:
    return sorted(_session(client).tables)


def get_table(table_name: str, client: Session | None = None) -> _TableDef:
    s = _session(client)
    if table_name not in s.tables:
        raise KeyError(f"no such table {table_name!r}")
    return s.tables[table_name]


def delete_table(table_name: str, client: Session | None = None) -> None:
    _session(client).tables.pop(table_name, None)


def load(table_name: str, file: str, client: Session | None = None) -> str:
    """Load a parquet/csv file (type inferred from the extension,
    table.py:230-258). Returns the new data token."""
    s = _session(client)
    t = get_table(table_name, client)
    lower = file.lower()
    if lower.endswith(".parquet"):
        df = s.spark.read.parquet(file)
    elif lower.endswith(".csv"):
        df = s.spark.read.csv(file, header=True, inferSchema=True)
    else:
        raise ValueError(
            "invalid file type provided. only .parquet or .csv accepted"
        )
    t.loads.append(df)
    return str(len(t.loads))


def load_dataframe(
    table_name: str, dataframe, client: Session | None = None
) -> str:
    """Load a pandas or Spark DataFrame (table.py:272-306)."""
    s = _session(client)
    t = get_table(table_name, client)
    if isinstance(dataframe, pd.DataFrame):
        dataframe = s.spark.createDataFrame(dataframe)
    t.loads.append(dataframe)
    return str(len(t.loads))


def _timeline(t: _TableDef, upto: int | None = None) -> Timeline:
    loads = t.loads[: int(upto)] if upto is not None else t.loads
    if not loads:
        raise ValueError("table has no data loaded")
    df = loads[0]
    for d in loads[1:]:
        df = df.unionByName(d)
    return Timeline.from_events(
        df,
        t.time_column_name,
        t.entity_key_column_name,
        t.subsort_column_name,
    )


# ---------------------------------------------------------------------
# views (reference view.py — named Fenl expressions)
# ---------------------------------------------------------------------
def create_view(view_name: str, expression: str, client: Session | None = None):
    s = _session(client)
    if view_name in s.views:
        raise ValueError(f"view {view_name!r} already exists")
    s.views[view_name] = expression
    return {"view_name": view_name, "expression": expression}


def list_views(client: Session | None = None) -> list[str]:
    return sorted(_session(client).views)


def get_view(view_name: str, client: Session | None = None) -> str:
    return _session(client).views[view_name]


def delete_view(view_name: str, client: Session | None = None) -> None:
    _session(client).views.pop(view_name, None)


# ---------------------------------------------------------------------
# slice filters (reference slice_filters.py — applied at prepare)
# ---------------------------------------------------------------------
class SliceFilter:
    def predicate(self, key):  # pragma: no cover - interface
        raise NotImplementedError


class EntityPercentFilter(SliceFilter):
    """Keep ~percent% of entities by deterministic key hash
    (slice_filters.py:12-50; engine semantics in operators/slice.py)."""

    def __init__(self, percent: float):
        if not 0.1 <= percent <= 100.0:
            raise ValueError("percent must be in [0.1, 100.0]")
        self.percent = percent

    def predicate(self, key):
        from kaskada_spark.operators.slice import slice_predicate_md5

        return slice_predicate_md5(key, self.percent)


class EntityFilter(SliceFilter):
    """Keep an explicit entity-key list (slice_filters.py:53-79)."""

    def __init__(self, entity_keys: Sequence[str]):
        self.entity_keys = list(entity_keys)

    def predicate(self, key):
        return key.isin([*self.entity_keys])


# ---------------------------------------------------------------------
# queries (reference query.py create_query)
# ---------------------------------------------------------------------
class QueryResult:
    def __init__(self, dataframe: DataFrame, schema, dry_run: bool):
        self.dataframe = dataframe
        self.schema = schema
        self.dry_run = dry_run

    def to_pandas(self) -> pd.DataFrame:
        if self.dry_run:
            raise ValueError("dry_run query has no results, only .schema")
        return self.dataframe.toPandas()


def _coerce_time(v):
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    return v


def create_query(
    expression: str,
    result_behavior: str = "all-results",
    data_token_id: Optional[str] = None,
    dry_run: bool = False,
    changed_since_time=None,
    final_result_time=None,
    limits: Optional[int] = None,
    slice_filter: Optional[SliceFilter] = None,
    experimental: bool = False,
    client: Session | None = None,
) -> QueryResult:
    """Mirror of query.py:90-185: behaviors all-results/final-results
    (+ final_result_time -> FINAL_AT), changed_since_time incremental
    decoration, ``limits`` as preview_rows, and entity slicing applied
    to every input table before compilation."""
    s = _session(client)
    if result_behavior not in ("all-results", "final-results"):
        raise ValueError(f"unknown result_behavior {result_behavior!r}")
    tables: dict[str, Timeline] = {}
    for name, t in s.tables.items():
        if not t.loads:
            continue
        tl = _timeline(t, upto=data_token_id)
        if slice_filter is not None:
            tl = Timeline(tl.df.filter(slice_filter.predicate(tl.df[KEY])))
        tables[name] = tl
    behavior = "all"
    final_at = None
    if result_behavior == "final-results":
        if final_result_time is not None:
            behavior, final_at = "final_at", _coerce_time(final_result_time)
        else:
            behavior = "final"
    df = compile_fenl(
        expression,
        tables,
        formulas=dict(s.views) or None,
        behavior=behavior,
        final_at=final_at,
        changed_since=_coerce_time(changed_since_time),
        preview_rows=limits,
    )
    return QueryResult(df, df.schema, dry_run)


# ---------------------------------------------------------------------
# materializations (reference materialization.py)
# ---------------------------------------------------------------------
class Destination:
    pass


class ObjectStoreDestination(Destination):
    """materialization.py:70-80 — parquet/csv under a prefix URI."""

    def __init__(self, file_type: str, output_prefix_uri: str):
        if file_type not in ("parquet", "csv"):
            raise ValueError("file_type must be 'parquet' or 'csv'")
        self.file_type = file_type
        self.output_prefix_uri = output_prefix_uri


class RedisDestination(Destination):
    """materialization.py:26-61 — latest-per-entity feature rows into a
    key/value store. ``client_factory`` injects the store client (the
    sandbox has no Redis; sinks/feature_store.py pattern)."""

    def __init__(
        self,
        host_name: str = "localhost",
        port: int = 6379,
        key_prefix: str = "kaskada:",
        client_factory=None,
    ):
        self.host_name = host_name
        self.port = port
        self.key_prefix = key_prefix
        self.client_factory = client_factory


class PulsarDestination(Destination):
    def __init__(self, *a, **kw):
        raise NotImplementedError(
            "Pulsar client packages are not present in this environment; "
            "see README's Kafka live-stream recipe for the streaming path"
        )


def create_materialization(
    name: str,
    expression: str,
    destination: Destination,
    views: Optional[dict[str, str]] = None,
    client: Session | None = None,
) -> dict:
    """Compute the expression over current loads and deliver it to the
    destination (materialization.py:142-183). The reference re-runs on
    every new data load; call this again after ``load`` for the same
    effect, or use ``kaskada_spark.materialize_fenl`` for the live
    incremental stream."""
    s = _session(client)
    if name in s.materializations:
        raise ValueError(f"materialization {name!r} already exists")
    if views:
        for vn, ve in views.items():
            s.views.setdefault(vn, ve)
    res = create_query(expression, client=s)
    if isinstance(destination, ObjectStoreDestination):
        path = destination.output_prefix_uri.rstrip("/") + "/" + name
        w = res.dataframe.write.mode("overwrite")
        if destination.file_type == "csv":
            w.option("header", True).csv(path)
        else:
            w.parquet(path)
        info = {"name": name, "expression": expression, "path": path}
    elif isinstance(destination, RedisDestination):
        from kaskada_spark.sinks.feature_store import FeatureStoreSink

        value_cols = [c for c in res.dataframe.columns if c not in ("_time", "_subsort", KEY)]
        sink = FeatureStoreSink(
            KEY,
            value_cols,
            prefix=destination.key_prefix,
            client_factory=destination.client_factory,
        )
        sink(res.dataframe, batch_id=0)
        info = {"name": name, "expression": expression, "destination": "redis"}
    else:
        raise ValueError("unsupported destination")
    s.materializations[name] = info
    return info


def delete_materialization(name: str, client: Session | None = None) -> None:
    _session(client).materializations.pop(name, None)


def list_materializations(client: Session | None = None) -> list[str]:
    return sorted(_session(client).materializations)
