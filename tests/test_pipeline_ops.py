"""Unit tests for the training-data pipeline operators: dedup,
similarity search, text analysis, multimodal plumbing.

Constructed micro-fixtures with known answers (the reference's
catalog-golden-example style, SURVEY §5.3) — the sf-scale oracle
equivalence is covered separately by the driver contract
(tools/verify_local.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kaskada_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash16,
)
from kaskada_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    sample_frames,
    synthesize_media,
)
from kaskada_spark.operators.similarity import brute_force_knn, cosine, lsh_knn
from kaskada_spark.operators.text import (
    bpe_token_count,
    detect_language,
    fingerprint,
    quality_score,
    word_count,
)

TEXT_A = "the quick brown fox jumps over the lazy dog and runs far away to the hills"
TEXT_B = "the quick brown fox jumps over the lazy dog and runs far away to the house"
TEXT_C = "completely different content about spark engines and columnar execution"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, TEXT_A, "s1"), (2, TEXT_A, "s1"), (3, TEXT_B, "s1"), (4, TEXT_C, "s2")],
        "doc_id long, text string, source string",
    )


def test_exact_dedup_clusters(docs):
    rows = {r["rep_id"]: r["n_copies"] for r in exact_dedup(docs, "doc_id", "text").collect()}
    assert rows[1] == 2          # docs 1,2 identical
    assert rows[3] == 1
    assert rows[4] == 1


def test_minhash_identical_and_near(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=8, bands=4).collect()
    }
    assert (1, 2) in pairs                      # identical -> always a pair
    assert not any(4 in p for p in pairs)       # unrelated doc never pairs
    # near-identical docs share most shingles; with 4 bands of 2 rows the
    # collision probability is high — accept either but identical must hit
    assert all(a < b for a, b in pairs)


def test_simhash_similarity(spark, docs):
    h = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", simhash16(F.col("text")).alias("sh")).collect()}
    assert h[1] == h[2]                               # identical text
    ham_near = bin(h[1] ^ h[3]).count("1")
    ham_far = bin(h[1] ^ h[4]).count("1")
    assert ham_near < ham_far                         # near-dup closer than unrelated


def test_simhash_staged_equals_unstaged(spark, docs):
    """The staged 16-fold form (word_hashes projected once) is
    bit-identical to the single-expression form — including empty and
    null text rows."""
    from kaskada_spark.operators.dedup import word_hashes

    extra = spark.createDataFrame(
        [(100, ""), (101, None), (102, "one")], ["doc_id", "text"]
    )
    frame = docs.select("doc_id", "text").unionByName(extra)
    plain = {r["doc_id"]: r["sh"] for r in frame.select(
        "doc_id", simhash16(F.col("text")).alias("sh")).collect()}
    staged_df = frame.select("doc_id", word_hashes(F.col("text")).alias("__hv"))
    staged = {r["doc_id"]: r["sh"] for r in staged_df.select(
        "doc_id", simhash16(hv=F.col("__hv")).alias("sh")).collect()}
    assert plain == staged


def test_ngram_jaccard_adjacent(docs):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", "source").collect()
    }
    assert out[(1, 2)] == pytest.approx(1.0)          # identical
    assert 0.0 < out[(2, 3)] < 1.0                    # near-dup
    assert (3, 4) not in out                          # different source group


@pytest.fixture(scope="module")
def vecs(spark):
    base = [1.0] + [0.0] * 7
    near = [0.9, 0.1] + [0.0] * 6
    anti = [-1.0] + [0.0] * 7
    ortho = [0.0, 0.0, 1.0] + [0.0] * 5
    return spark.createDataFrame(
        [(0, base), (1, near), (2, anti), (3, ortho)],
        "vec_id long, embedding array<float>",
    )


def test_brute_force_knn_order(vecs):
    out = [
        (r["neighbor_id"], r["rank"])
        for r in brute_force_knn(vecs, "vec_id", "embedding", [0], k=3)
        .orderBy("rank")
        .collect()
    ]
    assert out[0] == (1, 1)       # nearest = near vector
    assert out[-1][0] == 2        # anti-parallel last


def test_cosine_exact(spark):
    df = spark.createDataFrame([([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], "a array<float>, b array<float>")
    got = [r[0] for r in df.select(cosine(F.col("a"), F.col("b"))).collect()]
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(0.0)


def test_lsh_knn_self_bucket(vecs):
    # identical vectors always share a bucket; query finds its near twin
    out = lsh_knn(vecs, "vec_id", "embedding", [0], k=3, n_bits=2, dim=8).collect()
    ids = {r["neighbor_id"] for r in out}
    assert 1 in ids


def test_language_detection(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "der hund ist nicht in das haus und die katze"),
            (3, "le chat est dans la maison et les chiens"),
            (4, "xyzzy plugh abracadabra"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["lang"] for r in df.select("id", detect_language(F.col("text")).alias("lang")).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr" and got[4] == "und"


def test_quality_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox jumps over the lazy dog near the river bank."),
         (2, "$$$ ### !!! 123 456 789 @@@ %%%")],
        "id long, text string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            quality_score(F.col("text")).alias("q"),
            word_count(F.col("text")).alias("wc"),
            bpe_token_count(F.col("text")).alias("bpe"),
        ).collect()
    }
    assert rows[1]["q"] > rows[2]["q"]          # prose beats symbol soup
    assert rows[1]["wc"] == 13
    assert rows[1]["bpe"] >= rows[1]["wc"]      # BPE pieces >= words (punct)


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "id long, text string",
    )
    fp = {r["id"]: r["fp"] for r in df.select("id", fingerprint(F.col("text")).alias("fp")).collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]                       # anagram texts differ


def test_media_feature_extraction(spark):
    media = synthesize_media(spark, 50)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    assert all(r["n_bytes"] == 16 for r in rows)          # md5 payloads
    # deterministic: same payload -> same features on re-run
    again = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    for r in rows:
        assert again[r["media_id"]] == pytest.approx(r["features"])


def test_media_frame_sampling(spark):
    media = synthesize_media(spark, 10)
    frames = sample_frames(media, every_n=2, max_frames=8)
    pdf = frames.toPandas()
    assert set(pdf["frame_idx"].unique()) <= {0, 2, 4, 6}
    # frames reassemble subsets of the payload
    assert (pdf.groupby("media_id")["frame"].apply(lambda s: sum(len(b) for b in s)) > 0).all()


# ----------------------------------------------------------------------
# ANN scale levers: auto bucket sizing, banded recall, salted bucket cap
# ----------------------------------------------------------------------
def test_auto_n_bits_scales_with_corpus():
    from kaskada_spark.operators.similarity import auto_n_bits

    assert auto_n_bits(100, target_bucket_rows=256) == 4           # floor
    assert auto_n_bits(256 * 16, target_bucket_rows=256) == 4
    assert auto_n_bits(256 * 1024, target_bucket_rows=256) == 10
    assert auto_n_bits(10**12, target_bucket_rows=256) == 24       # cap
    # 100 TB-scale corpus never degenerates into a tiny bucket count
    assert auto_n_bits(10**9) >= 20


def _skewed_corpus(spark, n=400, dim=8):
    """Half the corpus is ONE identical vector (a pathological hot
    bucket); the rest are spread."""
    import math

    rows = []
    hot = [1.0] * dim
    for i in range(n // 2):
        rows.append((i, hot))
    for i in range(n // 2, n):
        v = [math.sin(i * (j + 1)) for j in range(dim)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_salted_bucket_cap_bounds_join_groups(spark):
    """max_bucket_rows: no (band, bucket, salt) join group exceeds the
    cap even when half the corpus lands in one bucket."""
    from kaskada_spark.operators.similarity import (
        BAND_SEED_STRIDE,
        _banded,
        auto_n_bits,
    )

    corpus = _skewed_corpus(spark)
    cap = 50
    n_bits = 6
    b = _banded(
        corpus.select(F.col("vec_id").alias("doc"), F.col("embedding").alias("vec")),
        "vec", n_bits, 2, 8, 42,
    )
    counts = b.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("__bn"))
    n_salt = F.greatest(F.ceil(F.col("__bn") / F.lit(cap)).cast("int"), F.lit(1))
    salted = (
        b.join(F.broadcast(counts), on=["band", "bucket"])
        .withColumn("salt", F.pmod(F.xxhash64(F.col("doc")), n_salt).cast("int"))
    )
    sizes = (
        salted.groupBy("band", "bucket", "salt").count().agg(F.max("count")).collect()[0][0]
    )
    # the salt split is hash-uniform, not exact: allow 2x headroom
    assert sizes <= 2 * cap, f"join group of {sizes} rows exceeds cap {cap}"
    # sanity: WITHOUT salting, the hot bucket is ~n/2
    unsalted_max = b.groupBy("band", "bucket").count().agg(F.max("count")).collect()[0][0]
    assert unsalted_max >= 150


def test_cosine_near_dup_salted_still_finds_dups(spark):
    """Salting caps bucket size while exact duplicates (same vector →
    same salt inputs differ but same bucket) are still mostly found;
    banded beats single-band recall on the unsalted path."""
    from kaskada_spark.operators.similarity import cosine_near_dup_pairs

    corpus = _skewed_corpus(spark, n=120)
    plain = cosine_near_dup_pairs(
        corpus, "vec_id", "embedding", threshold=0.99, n_bits=4, dim=8
    )
    banded = cosine_near_dup_pairs(
        corpus, "vec_id", "embedding", threshold=0.99, n_bits=4, dim=8, n_bands=2
    )
    capped = cosine_near_dup_pairs(
        corpus, "vec_id", "embedding", threshold=0.99, n_bits=4, dim=8,
        n_bands=2, max_bucket_rows=20,
    )
    p = {(r["id_a"], r["id_b"]) for r in plain.collect()}
    bd = {(r["id_a"], r["id_b"]) for r in banded.collect()}
    cp = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert p <= bd, "banded candidates must be a superset of single-band"
    # capped loses only cross-salt pairs; hot-vector dups within a salt remain
    assert cp <= bd
    assert len(cp) > 0
    # auto n_bits path runs end to end
    auto = cosine_near_dup_pairs(corpus, "vec_id", "embedding", threshold=0.99, dim=8)
    assert auto.count() >= 0


# ---------------------------------------------------------------- graph / clusters


def _uf_components(n_nodes, edges):
    """Pure-python union-find oracle: node -> min id in component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in range(n_nodes)}


def test_connected_components_vs_union_find(spark):
    """Randomized graphs vs a union-find oracle (deterministic seed)."""
    import random

    from kaskada_spark.operators.graph import connected_components

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(5, 45))
        ]
        df = spark.createDataFrame(
            [(a, b) for a, b in edges], "id_a long, id_b long"
        )
        got = {
            r["node"]: r["cluster_id"]
            for r in connected_components(df).collect()
        }
        want = _uf_components(n, edges)
        touched = {a for a, b in edges if a != b} | {b for a, b in edges if a != b}
        assert set(got) == touched, f"trial {trial}: node set mismatch"
        for v in touched:
            assert got[v] == want[v], f"trial {trial}: node {v}"


def test_connected_components_chain_and_empty(spark):
    from kaskada_spark.operators.graph import connected_components

    # a 12-node chain exercises multi-round convergence (diameter 11)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    got = {r["node"]: r["cluster_id"] for r in connected_components(chain).collect()}
    assert got == {i: 0 for i in range(12)}

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0


def test_connected_components_star_rounds_path(spark):
    """Force the distributed large-star/small-star path (the >2M-edge
    regime) by disabling the single-task finish, and the hybrid
    switch-over mid-loop with a tiny threshold — all three code paths
    must agree with the union-find oracle."""
    import random

    from kaskada_spark.operators.graph import connected_components

    rng = random.Random(13)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(50)]
    # chain appended: guarantees multi-round star convergence
    edges += [(100 + i, 101 + i) for i in range(10)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    want = _uf_components(200, edges)
    for thresh in (0, 30):  # 0 = pure stars; 30 = hybrid switch mid-loop
        got = {
            r["node"]: r["cluster_id"]
            for r in connected_components(df, local_finish_edges=thresh).collect()
        }
        touched = {a for a, b in edges if a != b} | {b for a, b in edges if a != b}
        assert set(got) == touched, f"thresh {thresh}: node set"
        for v in touched:
            assert got[v] == want[v], f"thresh {thresh}: node {v}"


def test_near_dup_clusters(docs):
    from kaskada_spark.operators.dedup import near_dup_clusters

    got = {
        r["doc"]: r["cluster_id"]
        for r in near_dup_clusters(docs, "doc_id", "text").collect()
    }
    # identical docs 1,2 and near-identical 3 all cluster under min id 1;
    # unrelated doc 4 is a singleton
    assert got[1] == 1 and got[2] == 1 and got[3] == 1
    assert got[4] == 4


# ---------------------------------------------------------------- repetition


def test_repetition_signals(spark):
    from kaskada_spark.operators.text import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "a b a b a b c"),            # "a b" 3x of 6 bigrams
            (2, "intro\nsame line\nsame line\nsame line\n\nend"),
            (3, ""),                          # degenerate: all null ratios
            (4, "unique words only here now"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc"]: r.asDict() for r in repetition_signals(df, "doc_id", "text").collect()}

    assert got[1]["n_words"] == 7 and got[1]["uniq_words"] == 3
    assert got[1]["dup_word_frac"] == pytest.approx(4 / 7)
    assert got[1]["top_bigram_frac"] == pytest.approx(3 / 6)

    # doc 2: 5 non-empty lines, "same line" x3 -> dup_line_frac (5-3)/5,
    # dup chars = 3*9 of total 5+9+9+9+3 = 35
    assert got[2]["n_lines"] == 5
    assert got[2]["dup_line_frac"] == pytest.approx(2 / 5)
    assert got[2]["dup_line_char_frac"] == pytest.approx(27 / 35)

    assert got[3]["n_words"] == 0
    assert got[3]["dup_word_frac"] is None
    assert got[3]["top_bigram_frac"] is None
    assert got[3]["dup_line_frac"] is None
    assert got[3]["dup_line_char_frac"] is None

    assert got[4]["dup_word_frac"] == 0.0
    assert got[4]["dup_line_frac"] == 0.0


def test_ivf_knn_exhaustive_equals_brute_force(spark):
    """With n_probe == n_cells, IVF searches every cell — results must
    be IDENTICAL to brute force (same ordering, same tie-breaks)."""
    import math

    from kaskada_spark.operators.similarity import brute_force_knn, ivf_knn

    rows = [
        (i, [math.sin(0.1 * (i + 1) * (j + 1)) for j in range(8)]) for i in range(40)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = [0, 1, 2]
    bf = sorted(
        map(tuple, brute_force_knn(corpus, "vec_id", "embedding", qids, k=4).collect())
    )
    ivf = sorted(
        map(
            tuple,
            ivf_knn(
                corpus, "vec_id", "embedding", qids, k=4, n_cells=4, n_probe=4
            ).collect(),
        )
    )
    assert ivf == bf

    # pruned probing returns k results per query (approximate but full)
    pruned = ivf_knn(corpus, "vec_id", "embedding", qids, k=4, n_cells=4, n_probe=2)
    cnt = {r["query_id"]: 0 for r in pruned.collect()}
    for r in pruned.collect():
        cnt[r["query_id"]] += 1
    assert all(v == 4 for v in cnt.values())


def test_cache_registry_explicit_unpersist(spark, docs):
    """cache_registry gives long-lived callers (foreachBatch loops) an
    explicit persist lifecycle: the persisted branch frames are handed
    back and unpersist() frees the blocks immediately (VERDICT r03
    item #7 — no reliance on ContextCleaner GC timing)."""
    from kaskada_spark.operators.dedup import minhash_lsh_pairs

    reg: list = []
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", cache_registry=reg)
    pairs.count()  # materialize while the cache is live
    assert len(reg) == 1
    assert reg[0].storageLevel.useMemory  # actually persisted
    for f in reg:
        f.unpersist(blocking=True)
    assert not reg[0].storageLevel.useMemory

    from kaskada_spark.operators.similarity import cosine_near_dup_pairs

    reg2: list = []
    vecs = _skewed_corpus(spark, n=60)
    out = cosine_near_dup_pairs(
        vecs, "vec_id", "embedding", n_bits=4, dim=8, cache_registry=reg2
    )
    out.count()
    assert len(reg2) == 1 and reg2[0].storageLevel.useMemory
    reg2[0].unpersist(blocking=True)
    assert not reg2[0].storageLevel.useMemory


def _clustered_corpus(spark, n_clusters=8, per_cluster=30, dim=16):
    """Planted ANN ground truth: ``n_clusters`` well-separated unit
    directions, ``per_cluster`` small deterministic perturbations each —
    a vector's true top-k neighbors are its own cluster."""
    import math

    rows = []
    for c in range(n_clusters):
        # separated centers: strong weight on axis (2c, 2c+1)
        center = [0.0] * dim
        center[(2 * c) % dim] = 1.0
        center[(2 * c + 1) % dim] = 0.5
        for i in range(per_cluster):
            vid = c * per_cluster + i
            v = [
                center[j] + 0.05 * math.sin(1.0 + vid * (j + 3))
                for j in range(dim)
            ]
            rows.append((vid, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _recall_at_k(approx_df, exact_df, k):
    """Mean fraction of exact top-k neighbors recovered per query."""
    truth: dict[int, set] = {}
    for r in exact_df.collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got: dict[int, set] = {q: set() for q in truth}
    for r in approx_df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return sum(len(got[q] & truth[q]) / k for q in truth) / len(truth)


def test_lsh_knn_recall_vs_brute_force(spark):
    """ANN recall contract: multi-band LSH recovers >=0.9 of the exact
    top-k on the planted clustered corpus (VERDICT r03 item #3)."""
    from kaskada_spark.operators.similarity import brute_force_knn, lsh_knn

    corpus = _clustered_corpus(spark)
    qids = [0, 35, 70, 105, 140, 175, 210]
    k = 5
    exact = brute_force_knn(corpus, "vec_id", "embedding", qids, k=k)
    approx = lsh_knn(
        corpus, "vec_id", "embedding", qids, k=k,
        n_bits=4, dim=16, n_bands=4,
    )
    assert _recall_at_k(approx, exact, k) >= 0.9


def test_ivf_knn_recall_vs_brute_force(spark):
    """ANN recall contract: pruned IVF probing (n_probe < n_cells)
    recovers >=0.9 of the exact top-k on the planted corpus."""
    from kaskada_spark.operators.similarity import brute_force_knn, ivf_knn

    corpus = _clustered_corpus(spark)
    qids = [0, 35, 70, 105, 140, 175, 210]
    k = 5
    exact = brute_force_knn(corpus, "vec_id", "embedding", qids, k=k)
    approx = ivf_knn(
        corpus, "vec_id", "embedding", qids, k=k, n_cells=8, n_probe=3
    )
    assert _recall_at_k(approx, exact, k) >= 0.9


# ---------------------------------------------------------------------
# training-data assembly: decontamination, PII scrub, sequence packing
# ---------------------------------------------------------------------
def test_decontaminate_planted_overlap(spark):
    """A corpus doc sharing a 3-gram run with the probe set is flagged;
    an unrelated doc is not; hit counts = distinct shared shingles."""
    from kaskada_spark.operators.training import decontaminate

    probes = spark.createDataFrame(
        [(100, "what is the capital of france paris is correct")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "quiz time what is the capital of france answer below"),
            (2, TEXT_C),
            (3, "short text"),  # fewer than 3 words of overlap
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(corpus, "doc_id", "text", probes).collect()
    }
    assert set(got) == {1, 2, 3}
    # doc 1 shares the run "what is the capital of france" ->
    # shingles {what is the, is the capital, the capital of, capital of france}
    assert got[1] == (4, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_scrub_pii_redacts_and_counts(spark):
    from kaskada_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+spam@mail.example.org thanks"),
            (2, "call 555-867-5309 or 555-123-4567 now"),
            (3, "server at 192.168.0.1 and 10.0.0.254"),
            (4, "clean document with no identifiers"),
        ],
        "doc_id long, text string",
    )
    cols = scrub_pii(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            cols["n_emails"].alias("e"),
            cols["n_phones"].alias("p"),
            cols["n_ips"].alias("i"),
            cols["clean_text"].alias("c"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["p"], out[1]["i"]) == (1, 0, 0)
    assert out[1]["c"] == "reach me at <EMAIL> thanks"
    assert (out[2]["e"], out[2]["p"], out[2]["i"]) == (0, 2, 0)
    assert out[2]["c"] == "call <PHONE> or <PHONE> now"
    assert (out[3]["e"], out[3]["p"], out[3]["i"]) == (0, 0, 2)
    assert out[3]["c"] == "server at <IP> and <IP>"
    assert out[4]["c"] == "clean document with no identifiers"


def test_pack_sequences_boundaries_and_segmented_equality(spark):
    """Packing semantics: contiguous stream cut every `budget` tokens —
    pack_id = floor(tokens_before / budget) — and the segmented
    3-stage prefix sum returns EXACTLY the plain-window result even
    with segments much smaller than a group."""
    import pandas as pd
    from kaskada_spark.operators.training import pack_sequences

    rows = []
    for src in ("a", "b"):
        for i in range(50):
            rows.append(
                (f"{src}{i}", src, 10 + (i * 7) % 23,
                 pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=i), i)
            )
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "n_tok", "_time", "_subsort"])
    )
    plain = pack_sequences(df, budget=64, segmented=False)
    # n_segments far above rows-per-group so every group straddles
    # many range slices — exercises the cross-segment offset path
    seg = pack_sequences(df, budget=64, segmented=True, n_segments=16)
    key = lambda r: r["doc_id"]
    p = sorted(plain.collect(), key=key)
    g = sorted(seg.collect(), key=key)
    assert [
        (r["doc_id"], r["tokens_before"], r["pack_id"], r["pack_offset"]) for r in p
    ] == [
        (r["doc_id"], r["tokens_before"], r["pack_id"], r["pack_offset"]) for r in g
    ]
    # semantics: per source, tokens_before is the running cumsum minus
    # self; offsets stay under budget; pack ids are non-decreasing
    for src in ("a", "b"):
        seqs = [r for r in p if r["source"] == src]
        seqs.sort(key=lambda r: r["_subsort"])
        cum = 0
        for r in seqs:
            assert r["tokens_before"] == cum
            assert r["pack_id"] == cum // 64
            assert r["pack_offset"] == cum % 64
            cum += r["n_tok"]


def test_pack_sequences_seg_bounds_and_skew(spark):
    """The value-bucket segmented path with EXPLICIT table-stats bounds
    (superset range, so values clamp into the bucket domain) matches the
    plain window exactly — including heavily time-skewed input (90% of
    rows in one narrow slice of the range, so most buckets are empty
    and one is hot) and equal-time ties broken by _subsort."""
    import pandas as pd
    from kaskada_spark.operators.training import pack_sequences

    rows = []
    t0 = pd.Timestamp(2024, 1, 1)
    for i in range(60):
        # 90% of rows land inside one second; stragglers spread a day
        ts = t0 + (pd.Timedelta(milliseconds=i) if i % 10 else pd.Timedelta(hours=i))
        rows.append((f"d{i}", "s", 5 + i % 3, ts, i))
    # equal-time ties: same timestamp, ordered by _subsort
    rows += [(f"tie{k}", "s", 7, t0, 100 + k) for k in range(5)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "n_tok", "_time", "_subsort"])
    )
    plain = pack_sequences(df, budget=16, segmented=False)
    # superset bounds (a whole-table stats range wider than this slice)
    seg = pack_sequences(
        df, budget=16, segmented=True, n_segments=8,
        seg_bounds=(pd.Timestamp(2023, 12, 1), pd.Timestamp(2024, 3, 1)),
    )
    key = lambda r: r["doc_id"]
    want = [(r["doc_id"], r["tokens_before"], r["pack_id"], r["pack_offset"])
            for r in sorted(plain.collect(), key=key)]
    got = [(r["doc_id"], r["tokens_before"], r["pack_id"], r["pack_offset"])
           for r in sorted(seg.collect(), key=key)]
    assert want == got


def test_parquet_column_bounds_footer_stats(spark, tmp_path):
    """parquet_column_bounds reads min/max from footers only (the
    Iceberg snapshot-stats stand-in) across a multi-file directory."""
    from kaskada_spark.sources.readers import parquet_column_bounds

    p = str(tmp_path / "t.parquet")
    # INT96 (Spark's legacy default) carries no footer min/max; modern
    # writers (and the driver's testdata) use TIMESTAMP_MICROS
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        spark.range(100, 200).selectExpr(
            "id", "timestamp_micros(cast(id * 1000000 as long)) as ts"
        ).repartition(4).write.parquet(p)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    lo, hi = parquet_column_bounds(p, "id")
    assert (lo, hi) == (100, 199)
    tlo, thi = parquet_column_bounds(p, "ts")
    assert (tlo.timestamp(), thi.timestamp()) == (100.0, 199.0)
    assert parquet_column_bounds(p, "nope") is None


def test_parquet_row_count_footer_only(spark, tmp_path):
    """parquet_row_count sums footer num_rows across a multi-file
    directory (the Iceberg total-records stand-in) — no row reads."""
    from kaskada_spark.sources.readers import parquet_row_count

    p = str(tmp_path / "t.parquet")
    spark.range(0, 1234).repartition(5).write.parquet(p)
    assert parquet_row_count(p) == 1234


def test_token_histogram(spark):
    from kaskada_spark.operators.training import token_histogram

    df = spark.createDataFrame(
        [([1, 2, 2, 3],), ([2, 3, 3],), ([9],)], "tokens array<int>"
    )
    got = [(r["token"], r["cnt"]) for r in token_histogram(df, k=3).collect()]
    # counts: 2->3, 3->3, 1->1, 9->1; ties break token-ascending
    assert got == [(2, 3), (3, 3), (1, 1)]


def test_seq_length_stats_median_odd_even(spark):
    from kaskada_spark.operators.training import seq_length_stats

    rows = [("a", n) for n in (1, 3, 7)] + [("b", n) for n in (2, 4, 10, 100)]
    df = spark.createDataFrame(rows, "source string, n_tok int")
    got = {r["source"]: r.asDict() for r in seq_length_stats(df).collect()}
    assert got["a"]["median_len"] == 3.0            # odd count: middle value
    assert got["b"]["median_len"] == 7.0            # even: (4+10)/2
    assert got["a"]["n_seq"] == 3 and got["b"]["n_seq"] == 4
    assert got["b"]["total_tokens"] == 116
    assert got["b"]["min_len"] == 2 and got["b"]["max_len"] == 100
    assert got["a"]["mean_len"] == (1 + 3 + 7) / 3.0


def test_seq_length_stats_duplicate_lengths(spark):
    from kaskada_spark.operators.training import seq_length_stats

    # duplicated length values: the grouped-count median must still
    # locate the correct middle ranks within a single length bucket
    df = spark.createDataFrame(
        [("s", n) for n in (5, 5, 5, 9)], "source string, n_tok int"
    )
    (row,) = seq_length_stats(df).collect()
    assert row["median_len"] == 5.0                 # ranks 2,3 both in the 5-bucket


def test_source_mixture_weights(spark):
    import math

    from kaskada_spark.operators.training import source_mixture_weights

    df = spark.createDataFrame(
        [("big", 900), ("small", 100)], "source string, n_tok int"
    )
    got = {r["source"]: r.asDict() for r in source_mixture_weights(df).collect()}
    assert got["big"]["natural_share"] == 0.9
    assert got["small"]["natural_share"] == 0.1
    pb, ps = 0.9 ** 0.7, 0.1 ** 0.7
    assert got["big"]["sample_weight"] == round(pb / (pb + ps), 6)
    assert got["small"]["sample_weight"] == round(ps / (pb + ps), 6)
    # alpha < 1 upsamples the small source above its natural share
    assert got["small"]["sample_weight"] > 0.1
    assert math.isclose(
        got["big"]["sample_weight"] + got["small"]["sample_weight"], 1.0,
        abs_tol=2e-6,
    )


def test_seq_length_quantiles_interpolation(spark):
    from kaskada_spark.operators.training import seq_length_quantiles

    # values 10,20,30,40 -> type-7: q25 at pos 0.75 = 10+0.75*10 = 17.5
    # q50 at 1.5 = 25.0, q75 at 2.25 = 32.5; q99 at 2.97 = 39.7
    df = spark.createDataFrame(
        [("s", n) for n in (10, 20, 30, 40)], "source string, n_tok int"
    )
    (row,) = seq_length_quantiles(df).collect()
    assert row["n_seq"] == 4
    assert row["q25"] == 17.5 and row["q50"] == 25.0 and row["q75"] == 32.5
    assert row["q99"] == 39.7

    # single value: every quantile is that value
    one = spark.createDataFrame([("t", 7)], "source string, n_tok int")
    (r1,) = seq_length_quantiles(one).collect()
    assert r1["q25"] == r1["q50"] == r1["q99"] == 7.0

    # duplicated values: ranks resolve inside one count bucket
    dup = spark.createDataFrame(
        [("u", n) for n in (5, 5, 5, 9)], "source string, n_tok int"
    )
    (r2,) = seq_length_quantiles(dup).collect()
    assert r2["q25"] == 5.0 and r2["q50"] == 5.0
    assert r2["q75"] == 5.0 + 0.25 * 4  # pos 2.25 between 5 and 9


def test_vocabulary_drift(spark):
    import datetime as dt

    from kaskada_spark.operators.training import vocabulary_drift

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (t0, [1, 1, 2]),             # w0: p = {1: 2/3, 2: 1/3}
        (t0 + m, [1, 2, 2]),         # w1: p = {1: 1/3, 2: 2/3} -> L1 = 2/3
        (t0 + 2 * m, [3, 3, 3]),     # w2: disjoint vocab -> L1 = 2
    ]
    df = spark.createDataFrame(rows, "_time timestamp, tokens array<int>")
    got = {
        r["window_start"]: r["l1_drift"]
        for r in vocabulary_drift(df).collect()
    }
    assert set(got) == {t0 + m, t0 + 2 * m}  # first window has no prev
    assert got[t0 + m] == round(2 / 3, 6)
    assert got[t0 + 2 * m] == 2.0


def test_mixture_sample_rates_and_determinism(spark):
    """Per-source rates honored within hash-uniform tolerance; rate > 1
    replicates with fractional top-up; output is a pure function of the
    row (identical across invocations and partitionings)."""
    from kaskada_spark.operators.training import mixture_sample

    rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"a": 0.0, "b": 0.4, "c": 1.0, "d": 2.5}
    out = mixture_sample(df, rates)
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "a" not in per                       # rate 0 drops everything
    assert 130 <= per["b"] <= 270               # ~0.4 * 500
    assert per["c"] == 500                      # rate 1 keeps all, once
    assert 1130 <= per["d"] <= 1370             # ~2.5 * 500
    # copy index is dense per row: rate<=1 rows have copy==0 only
    assert out.filter((F.col("source") == "c") & (F.col("copy") != 0)).count() == 0
    d_copies = out.filter(F.col("source") == "d").groupBy("doc_id").count()
    assert {r["count"] for r in d_copies.collect()} <= {2, 3}
    # determinism across partition layouts
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, mixture_sample(df.repartition(7), rates).collect()))
    assert a == b


def test_train_valid_split_stable_and_disjoint(spark):
    from kaskada_spark.operators.training import train_valid_split

    df = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    out = train_valid_split(df, valid_frac=0.1)
    n_valid = out.filter(F.col("split") == "valid").count()
    assert 320 <= n_valid <= 480  # ~400, hash-uniform tolerance
    # membership is a property of the row: same id -> same split, even
    # from a differently-built frame
    again = train_valid_split(
        spark.createDataFrame([(i,) for i in range(3999, -1, -1)], "doc_id long"),
        valid_frac=0.1,
    )
    assert (
        sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    )


# ---------------------------------------------------------------------------
# token-span exact-substring dedup (winnowing fingerprints)


def _tok_frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_winnow_guarantee_planted_span(spark):
    """The winnowing guarantee: any cross-document repeated run of
    >= window + w - 1 tokens yields a shared fingerprint, regardless of
    where the run sits in each document (selection is content-defined,
    so alignment doesn't matter)."""
    from kaskada_spark.operators.spans import dup_span_groups, winnow_fingerprints

    span = [1000 + i for i in range(32)]  # exactly the guarantee length
    for offset in (0, 7, 40):  # different alignments in doc b
        a = [2 * i + 1 for i in range(50)] + span + [9000 + i for i in range(20)]
        b = [3 * i + 2000 for i in range(offset)] + span + [7000 + i for i in range(35)]
        c = [5 * i + 40000 for i in range(80)]  # shares no 8-gram with anyone
        df = _tok_frame(spark, [("a", a), ("b", b), ("c", c)])
        groups = dup_span_groups(df, w=8, window=25).collect()
        assert groups, f"offset {offset}: planted 32-token span not found"
        assert all(g["n_docs"] == 2 for g in groups)
        # the shared fingerprints really belong to both a and b
        fps = winnow_fingerprints(df, w=8, window=25)
        dup_fp = {g["fp"] for g in groups}
        holders = {
            r["doc_id"]
            for r in fps.collect()
            if r["fp"] in dup_fp
        }
        assert holders == {"a", "b"}


def test_winnow_short_doc_edges(spark):
    """Docs shorter than w produce no fingerprints; a doc of exactly w
    tokens produces one; two identical w-token docs form a group."""
    from kaskada_spark.operators.spans import dup_span_groups, winnow_fingerprints

    g8 = list(range(8))
    df = _tok_frame(spark, [("x", g8), ("y", g8), ("tiny", g8[:7])])
    fps = winnow_fingerprints(df, w=8, window=25).collect()
    assert {r["doc_id"] for r in fps} == {"x", "y"}
    assert all(r["pos"] == 0 for r in fps)
    groups = dup_span_groups(df, w=8, window=25).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2 and groups[0]["n_occ"] == 2
    assert groups[0]["first_doc"] == "x"


def test_span_dup_rate_bounds(spark):
    """Identical docs score dup_rate 1.0; a disjoint doc scores 0."""
    from kaskada_spark.operators.spans import span_dup_rate

    a = [11 * i + 3 for i in range(60)]
    c = [7 * i + 90000 for i in range(60)]
    df = _tok_frame(spark, [("a1", a), ("a2", a), ("c", c)])
    rates = {r["doc_id"]: r for r in span_dup_rate(df, w=8, window=25).collect()}
    assert rates["a1"]["dup_rate"] == 1.0
    assert rates["a2"]["dup_rate"] == 1.0
    assert rates["c"]["dup_rate"] == 0.0 and rates["c"]["n_dup_fp"] == 0
    assert rates["a1"]["n_fp"] == rates["a2"]["n_fp"] >= 1


def _py_winnow(tokens: list[int], w: int = 8, window: int = 25):
    """Pure-Python reference model of winnow_fingerprints (independent
    implementation: direct per-position hashing + per-window leftmost
    argmin). Returns the set of selected 0-based positions and each
    position's fingerprint string."""
    import hashlib

    if len(tokens) < w:
        return {}
    kh = []
    for i in range(len(tokens) - w + 1):
        acc = 0
        for t in tokens[i : i + w]:
            acc = (acc * 1_000_003 + t) % 2_147_483_647
        kh.append(acc)
    nwin = max(len(kh) - window + 1, 1)
    sel = set()
    for j in range(nwin):
        win = kh[j : j + window]
        sel.add(j + win.index(min(win)))
    return {
        p: hashlib.md5(
            " ".join(str(t) for t in tokens[p : p + w]).encode()
        ).hexdigest()
        for p in sel
    }


def test_winnow_matches_python_model_randomized(spark):
    """Spark winnow_fingerprints == an independent pure-Python model on
    a randomized corpus (seeded): random lengths incl. < w and < window
    edges, small alphabet (forces gram-hash ties -> exercises leftmost
    tie-breaking), and planted cross-doc spans. One Spark job for all
    docs."""
    import random

    from kaskada_spark.operators.spans import winnow_fingerprints

    rng = random.Random(20240819)
    span = [rng.randrange(1 << 20) for _ in range(40)]
    docs = []
    for i in range(40):
        n = rng.choice([3, 7, 8, 9, 20, 24, 25, 26, 31, 32, 60, 200])
        toks = [rng.randrange(6) for _ in range(n)]  # tiny alphabet: ties
        if i % 5 == 0 and n >= 40:
            at = rng.randrange(0, n - 39)
            toks[at : at + 40] = span
        docs.append((f"doc{i:02d}", toks))
    df = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    expected = {
        d: _py_winnow(toks) for d, toks in docs if len(toks) >= 8
    }
    for impl in ("arrow", "catalyst"):
        got = {}
        for r in winnow_fingerprints(df, w=8, window=25, impl=impl).collect():
            got.setdefault(r["doc_id"], {})[r["pos"]] = r["fp"]
        assert got == expected, impl


def test_chunk_sequences_matches_python_model(spark):
    """chunk_sequences == a pure-Python striding model: every offset
    0, step, 2*step, ... < n_tok yields a chunk of at most max_len
    tokens; zero-token rows yield nothing; tail chunks are short."""
    from kaskada_spark.operators.training import chunk_sequences

    rows = [
        ("d0", []),                       # no chunks
        ("d1", [1]),                      # one short chunk
        ("d2", list(range(8))),           # exactly max_len
        ("d3", list(range(9))),           # max_len + 1 -> tail of 4
        ("d4", list(range(23))),          # several + short tail
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    df = df.withColumn("n_tok", F.size("tokens"))
    max_len, overlap = 8, 3
    step = max_len - overlap
    expected = {}
    for d, toks in rows:
        for i, off in enumerate(range(0, len(toks), step)):
            expected[(d, i)] = (off, toks[off : off + max_len])
    got = {}
    for r in chunk_sequences(df, max_len=max_len, overlap=overlap).collect():
        got[(r["doc_id"], r["chunk_id"])] = (r["chunk_off"], list(r["tokens"]))
        assert r["chunk_len"] == len(r["tokens"])
        assert r["n_tok"] == r["chunk_len"]
    assert got == expected

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_sequences(df, max_len=8, overlap=8)
    with _pytest.raises(ValueError):
        chunk_sequences(df, max_len=8, overlap=-1)


def test_chunk_sequences_covers_all_tokens(spark):
    """Union of chunks covers every token position exactly once when
    overlap=0 (disjoint partition of each sequence)."""
    from kaskada_spark.operators.training import chunk_sequences

    df = spark.createDataFrame(
        [(f"d{i}", list(range(i * 7 % 50 + 1))) for i in range(30)],
        "doc_id string, tokens array<int>",
    ).withColumn("n_tok", F.size("tokens"))
    out = (
        chunk_sequences(df, max_len=16, overlap=0)
        .groupBy("doc_id")
        .agg(
            F.sum("chunk_len").alias("covered"),
            F.flatten(F.collect_list("tokens")).alias("cat"),
        )
        .collect()
    )
    assert len(out) == 30
    for r in out:
        n = int(r["doc_id"][1:]) * 7 % 50 + 1
        assert r["covered"] == n
        assert sorted(r["cat"]) == sorted(range(n))


def test_epoch_shuffle_permutation_and_determinism(spark):
    """epoch_shuffle: shards partition the rows, pos is 0..count-1
    inside each shard (a permutation), the assignment is identical
    across runs, and a different seed yields a different order."""
    from kaskada_spark.operators.training import epoch_shuffle

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    a = epoch_shuffle(df, n_shards=8, seed="e1").collect()
    b = epoch_shuffle(df, n_shards=8, seed="e1").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard = {}
    for r in a:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert sum(len(v) for v in by_shard.values()) == 500
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    # every shard is populated at 500 rows / 8 shards
    assert len(by_shard) == 8

    c = epoch_shuffle(df, n_shards=8, seed="e2").collect()
    assert sorted(map(tuple, c)) != sorted(map(tuple, a))

    import pytest as _pytest

    with _pytest.raises(ValueError):
        epoch_shuffle(df, n_shards=0)


def test_token_pair_counts_matches_python_model(spark):
    """token_pair_counts == a pure-Python bigram counter, including the
    deterministic tie-break at the top-k boundary and rows with < 2
    tokens contributing nothing."""
    from collections import Counter

    from kaskada_spark.operators.training import token_pair_counts

    rows = [
        ("d0", []),
        ("d1", [5]),
        ("d2", [1, 2, 1, 2, 3]),
        ("d3", [2, 3, 2, 3]),
        ("d4", [1, 2]),
        ("d5", [9, 9, 9, 9]),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    cnt = Counter()
    for _, toks in rows:
        for a, b in zip(toks, toks[1:]):
            cnt[(a, b)] += 1
    k = 4
    expected = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    got = [((r["t1"], r["t2"]), r["cnt"]) for r in token_pair_counts(df, k=k).collect()]
    assert got == expected
