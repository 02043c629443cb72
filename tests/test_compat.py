"""Client-compat facade tests: the reference Python client's call
shapes (table.py / view.py / query.py / materialization.py /
slice_filters.py) running against the Spark engine."""

from __future__ import annotations

import pandas as pd
import pytest

from kaskada_spark import compat as k


@pytest.fixture()
def sess(spark):
    s = k.Session(spark)
    k.create_table("Purchases", "purchase_time", "customer_id", client=s)
    pdf = pd.DataFrame(
        {
            "purchase_time": pd.to_datetime(
                ["2020-01-01", "2020-01-01", "2020-01-02", "2020-01-03", "2020-01-03"]
            ),
            "customer_id": ["karen", "patrick", "karen", "patrick", "karen"],
            "amount": [9, 3, 2, 5000, 4],
        }
    )
    k.load_dataframe("Purchases", pdf, client=s)
    return s


def test_table_registry_roundtrip(sess):
    assert k.list_tables(client=sess) == ["Purchases"]
    t = k.get_table("Purchases", client=sess)
    assert t.entity_key_column_name == "customer_id"
    with pytest.raises(ValueError):
        k.create_table("Purchases", "t", "k", client=sess)
    k.delete_table("Purchases", client=sess)
    assert k.list_tables(client=sess) == []


def test_create_query_all_and_final(sess):
    res = k.create_query("{ max_amount: Purchases.amount | max() }", client=sess)
    rows = res.to_pandas().sort_values(["_time", "_key"])
    assert list(rows["max_amount"]) == [9, 3, 9, 9, 5000]

    fin = k.create_query(
        "{ max_amount: Purchases.amount | max() }",
        result_behavior="final-results",
        client=sess,
    ).to_pandas()
    got = dict(zip(fin["_key"], fin["max_amount"]))
    assert got == {"karen": 9, "patrick": 5000}


def test_create_query_final_at_and_changed_since(sess):
    fin = k.create_query(
        "{ max_amount: Purchases.amount | max() }",
        result_behavior="final-results",
        final_result_time="2020-01-02 12:00:00",
        client=sess,
    ).to_pandas()
    got = dict(zip(fin["_key"], fin["max_amount"]))
    assert got == {"karen": 9, "patrick": 3}  # patrick's 5000 is later

    delta = k.create_query(
        "{ max_amount: Purchases.amount | max() }",
        changed_since_time="2020-01-03 00:00:00",
        client=sess,
    ).to_pandas()
    assert set(delta["_key"]) == {"karen", "patrick"}
    assert len(delta) == 2  # only the Jan-3 rows


def test_views_resolve_as_formulas(sess):
    k.create_view("BigSpend", "Purchases.amount > 100", client=sess)
    res = k.create_query(
        "{ big: count(Purchases.amount | when(BigSpend)) }", client=sess
    ).to_pandas()
    final = res.sort_values("_time").groupby("_key").last()
    assert final.loc["patrick", "big"] == 1
    assert final.loc["karen", "big"] == 0
    assert k.get_view("BigSpend", client=sess) == "Purchases.amount > 100"


def test_limits_and_dry_run(sess):
    res = k.create_query(
        "{ m: Purchases.amount | max() }", limits=2, client=sess
    ).to_pandas()
    assert len(res) == 2
    dr = k.create_query("{ m: Purchases.amount | max() }", dry_run=True, client=sess)
    assert "m" in dr.schema.names
    with pytest.raises(ValueError):
        dr.to_pandas()


def test_entity_filter_and_percent_validation(sess):
    res = k.create_query(
        "{ m: Purchases.amount | max() }",
        slice_filter=k.EntityFilter(["karen"]),
        client=sess,
    ).to_pandas()
    assert set(res["_key"]) == {"karen"}
    with pytest.raises(ValueError):
        k.EntityPercentFilter(0.01)
    pct = k.EntityPercentFilter(100.0)
    full = k.create_query(
        "{ m: Purchases.amount | max() }", slice_filter=pct, client=sess
    ).to_pandas()
    assert len(full) == 5


def test_data_token_replays_old_loads(sess, spark):
    more = pd.DataFrame(
        {
            "purchase_time": pd.to_datetime(["2020-01-04"]),
            "customer_id": ["karen"],
            "amount": [777],
        }
    )
    tok_before = "1"
    k.load_dataframe("Purchases", more, client=sess)
    old = k.create_query(
        "{ m: Purchases.amount | max() }",
        result_behavior="final-results",
        data_token_id=tok_before,
        client=sess,
    ).to_pandas()
    assert dict(zip(old["_key"], old["m"]))["karen"] == 9
    new = k.create_query(
        "{ m: Purchases.amount | max() }",
        result_behavior="final-results",
        client=sess,
    ).to_pandas()
    assert dict(zip(new["_key"], new["m"]))["karen"] == 777


def test_materialization_object_store_and_redis(sess, spark, tmp_path):
    out = k.create_materialization(
        "maxes",
        "{ m: Purchases.amount | max() }",
        k.ObjectStoreDestination("parquet", str(tmp_path)),
        client=sess,
    )
    back = spark.read.parquet(out["path"])
    assert back.count() == 5

    # the sink writes on executor processes — a driver-side dict won't
    # see the mutations, so the fake client is file-backed (same pattern
    # as tests/test_sources_sinks.py::test_feature_store_sink)
    import glob
    import json
    import os
    import uuid

    store_dir = str(tmp_path / "store")
    os.makedirs(store_dir)

    class FakeRedis:
        def __init__(self):
            self.path = os.path.join(store_dir, f"{uuid.uuid4().hex}.jsonl")

        def set(self, key, val):
            with open(self.path, "a") as f:
                f.write(json.dumps({"k": key, "v": val}) + "\n")

    k.create_materialization(
        "feat",
        "{ m: Purchases.amount | max() }",
        k.RedisDestination(client_factory=FakeRedis),
        client=sess,
    )
    store: dict[str, str] = {}
    for p in glob.glob(os.path.join(store_dir, "*.jsonl")):
        with open(p) as f:
            for line in f:
                rec = json.loads(line)
                store[rec["k"]] = rec["v"]
    assert "kaskada:karen" in store and '"m": 9' in store["kaskada:karen"]
    assert k.list_materializations(client=sess) == ["feat", "maxes"]
    with pytest.raises(ValueError):
        k.create_materialization(
            "maxes", "{ m: Purchases.amount | max() }",
            k.ObjectStoreDestination("parquet", str(tmp_path)), client=sess,
        )


def test_csv_load_and_pulsar_gates(sess, tmp_path, spark):
    p = tmp_path / "more.csv"
    pd.DataFrame(
        {
            "purchase_time": ["2020-01-05 00:00:00"],
            "customer_id": ["spongebob"],
            "amount": [7],
        }
    ).to_csv(p, index=False)
    k.load(("Purchases"), str(p), client=sess)
    res = k.create_query(
        "{ m: Purchases.amount | max() }", result_behavior="final-results", client=sess
    ).to_pandas()
    assert "spongebob" in set(res["_key"])
    with pytest.raises(ValueError):
        k.load("Purchases", "/tmp/nope.avro", client=sess)
    with pytest.raises(NotImplementedError):
        k.PulsarDestination()
    with pytest.raises(NotImplementedError):
        k.create_table("P2", "t", "k", source=object(), client=sess)
