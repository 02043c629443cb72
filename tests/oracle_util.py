"""Local mirror of the driver's Spark-vs-DuckDB correctness compare:
row count, schema shape, and order-insensitive exact value equality
(columns sorted by name, rows sorted by all columns)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].dt.tz_localize(None) if getattr(df[c].dt, "tz", None) else df[c]
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def compare(spark_df, oracle_sql: str, sf_dir: str, float_ulps: bool = True) -> None:
    """Assert exact match between a Spark result and a DuckDB oracle."""
    sdf = _normalize(spark_df.toPandas())
    con = duck_con(sf_dir)
    odf = _normalize(con.sql(oracle_sql).df())
    con.close()

    assert list(sdf.columns) == list(odf.columns), f"columns {list(sdf.columns)} != {list(odf.columns)}"
    assert len(sdf) == len(odf), f"row count {len(sdf)} != {len(odf)}"
    for c in sdf.columns:
        a, b = sdf[c], odf[c]
        # Driver-hash parity guard: the driver's value hash is
        # dtype-KIND-sensitive (float vs int render differently even for
        # equal values — e.g. DuckDB HUGEINT -> float64 vs Spark bigint),
        # so a float/int kind split is a mismatch even if values agree.
        num_kinds = {"i", "u", "f"}
        if a.dtype.kind in num_kinds and b.dtype.kind in num_kinds:
            assert (a.dtype.kind == "f") == (b.dtype.kind == "f"), (
                f"column {c!r} dtype-kind mismatch (driver hash would differ): "
                f"spark {a.dtype} vs oracle {b.dtype} — add explicit casts on both sides"
            )
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            mism = []
            for i, (x, y) in enumerate(zip(a, b)):
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                if xn and yn:
                    continue
                if xn != yn or float(x) != float(y):
                    mism.append((i, x, y))
                    if len(mism) > 5:
                        break
            assert not mism, f"column {c!r} float mismatches (exact): {mism}"
        else:
            eq = (a == b) | (a.isna() & b.isna())
            assert eq.all(), f"column {c!r} mismatch at rows {list(a[~eq].index[:5])}: {a[~eq].head()} vs {b[~eq].head()}"
