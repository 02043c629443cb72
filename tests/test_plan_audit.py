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


def _read_schemas(plan: str, table: str) -> list[str]:
    """ReadSchema fragments of every FileScan over `table` in the plan."""
    out = []
    for scan in plan.split("FileScan")[1:]:
        head = scan.split("ReadSchema:")
        if len(head) == 2 and table in head[0]:
            out.append(head[1].split("\n")[0])
    return out


def test_scans_are_column_pruned(spark, sf_dir):
    """Column pruning reached the parquet scan: columns the query never
    touches must be ABSENT from ReadSchema (documents is the widest
    table — `text` dominates its byte size; embeddings carries a
    64-float vector per row)."""
    qs = entrymod.queries()
    # lang_id reads only (doc_id, text): lang/source/n_chars pruned
    plan = _plan(qs["lang_id"](spark, sf_dir))
    doc_schemas = _read_schemas(plan, "documents")
    assert doc_schemas, "lang_id must scan the documents table"
    for schema in doc_schemas:
        assert "text" in schema
        for unused in ("lang", "source", "n_chars"):
            assert unused not in schema, (
                f"lang_id documents scan reads unused column {unused!r}: "
                f"{schema}"
            )
    assert "embeddings" not in plan
    # brute-force knn reads only (vec_id, embedding): label pruned
    plan = _plan(qs["embed_knn"](spark, sf_dir))
    emb_schemas = _read_schemas(plan, "embeddings")
    assert emb_schemas, "embed_knn must scan the embeddings table"
    for schema in emb_schemas:
        assert "embedding" in schema
        assert "label" not in schema, (
            f"embed_knn embeddings scan reads unused column 'label': {schema}"
        )
    # token_counts reads only (doc_id, text) from documents
    plan = _plan(qs["token_counts"](spark, sf_dir))
    doc_schemas = _read_schemas(plan, "documents")
    assert doc_schemas, "token_counts must scan the documents table"
    for schema in doc_schemas:
        for unused in ("lang", "source", "n_chars"):
            assert unused not in schema, (
                f"token_counts documents scan reads unused column "
                f"{unused!r}: {schema}"
            )
    # frontend pruning (compile_fenl._prune_tables): fenl_finished
    # touches only event_type — the events scans must not read the
    # props JSON blob or value (max_by row structs block Catalyst's own
    # pruning, so this regression only holds while the frontend prunes)
    plan = _plan(qs["fenl_finished"](spark, sf_dir))
    ev_schemas = _read_schemas(plan, "events")
    assert ev_schemas, "fenl_finished must scan the events table"
    for schema in ev_schemas:
        for unused in ("props", "value"):
            assert unused not in schema, (
                f"fenl_finished events scan reads unused column "
                f"{unused!r}: {schema}"
            )
    # final_last projects before the max_by row struct: props/event_type
    # must stay out of the scan
    plan = _plan(qs["final_last"](spark, sf_dir))
    ev_schemas = _read_schemas(plan, "events")
    assert ev_schemas, "final_last must scan the events table"
    for schema in ev_schemas:
        for unused in ("props", "event_type"):
            assert unused not in schema, (
                f"final_last events scan reads unused column "
                f"{unused!r}: {schema}"
            )


def test_pack_sequences_plan_is_segmented(spark, sf_dir):
    """Pin the segmented pack_sequences shape (the r03 scale-killer was
    an unsegmented per-source running window / per-group rank — any
    reintroduction must fail here, not on the cluster):

    - the running token sum is windowed by (__seg, source), never by
      source alone ordering by _time (that window's sort is bounded by
      the whole group's row count);
    - the per-(segment, group) offsets come back via a BROADCAST hash
      join keyed on __seg — the big side never re-shuffles for it;
    - no rangepartitioning anywhere (a range exchange means a sampling
      pass that re-executes the upstream plan) and no row_number rank.
    """
    import re

    plan = _plan(entrymod.queries()["pack_sequences"](spark, sf_dir))
    assert "windowspecdefinition(__seg" in plan, (
        "running token sum is no longer segmented by __seg"
    )
    assert not re.search(r"windowspecdefinition\(source#\d+, _time", plan), (
        "unsegmented per-source running window reintroduced (the r03 "
        "scale-killer): a single task would scan a whole source's rows"
    )
    assert re.search(r"BroadcastHashJoin \[__seg", plan), (
        "segment-offset join-back is no longer broadcast"
    )
    assert "rangepartitioning" not in plan
    assert "row_number" not in plan


def test_epoch_shuffle_plan_single_shard_exchange(spark, sf_dir):
    """Pin epoch_shuffle's one-exchange shape: the ONLY exchange is the
    hash partition on `shard` (per-shard sort bounded by rows/n_shards);
    no rangepartitioning (no global sort, no sampling pass)."""
    import re

    plan = _plan(entrymod.queries()["epoch_shuffle"](spark, sf_dir))
    exchanges = re.findall(r"\bExchange \w+", plan)
    assert len(exchanges) == 1, f"expected exactly one exchange, got {exchanges}"
    assert "Exchange hashpartitioning(shard" in plan
    assert "rangepartitioning" not in plan


def test_entry_contract_smoke(spark):
    # the driver smoke test: entry() plans and carries a stable schema
    df = entrymod.entry(spark)
    assert len(df.columns) >= 1
    plan = _plan(df)
    assert "BatchEvalPython" not in plan


def test_winnow_no_inferred_filter_blowup(spark, sf_dir):
    """dup_spans uses explode_outer specifically so that
    InferFiltersFromGenerate cannot synthesize `size(__sel) > 0` and
    push the whole gram-hash + selection pipeline into a per-row scan
    Filter (measured 30x slower). Guard: the tokenizer expression may
    appear at most twice in the optimized plan (the n_tok >= w filter
    pushed to the scan + the staging projection), never the ~8 copies
    the inferred-filter inlining produces."""
    from kaskada_spark.operators.spans import winnow_fingerprints
    from kaskada_spark.sources.tokens import tokenize_documents

    fp = winnow_fingerprints(tokenize_documents(spark, sf_dir), impl="catalyst")
    plan = fp._jdf.queryExecution().optimizedPlan().toString()
    n_tok_evals = plan.count("regexp_extract_all")
    assert 1 <= n_tok_evals <= 2, (
        f"tokenizer inlined {n_tok_evals}x into the winnow plan — "
        "an optimizer rule is duplicating the staged pipeline"
    )
