"""Connected components, hash split, and n-gram containment."""

import random

import pytest

import pyspark.sql.functions as F

from xagg_spark.operators.dedup import connected_components, ngram_containment
from xagg_spark.operators.split import (hash_split, mixture_rates,
                                        mixture_sample,
                                        mixture_thresholds,
                                        split_thresholds)


def _uf_components(pairs, nodes):
    """Ground truth: union-find, component = min node id."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def test_components_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(120))
    pairs = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    pairs = [(a, b) for a, b in pairs if a != b]
    truth = _uf_components(pairs, nodes)
    pdf = spark.createDataFrame(pairs, "id_a: long, id_b: long")
    uni = spark.createDataFrame([(n,) for n in nodes], "doc_id: long")
    got = {r.node: r.component
           for r in connected_components(pdf, nodes=uni).collect()}
    assert got == truth


def test_components_chain_converges_log_rounds(spark):
    # a 300-node chain is the worst case for plain hash-min (300 rounds);
    # pointer jumping must close it well under max_iter=15
    n = 300
    pairs = [(i, i + 1) for i in range(n - 1)]
    pdf = spark.createDataFrame(pairs, "id_a: long, id_b: long")
    out = connected_components(pdf, max_iter=15).collect()
    assert len(out) == n
    assert {r.component for r in out} == {0}


def test_components_singletons_and_no_universe(spark):
    pdf = spark.createDataFrame([(5, 9)], "id_a: long, id_b: long")
    # without a universe only pair members appear
    got = {r.node: r.component for r in connected_components(pdf).collect()}
    assert got == {5: 5, 9: 5}
    uni = spark.createDataFrame([(i,) for i in range(12)], "id: long")
    got = {r.node: r.component
           for r in connected_components(pdf, nodes=uni).collect()}
    assert got[5] == 5 and got[9] == 5
    assert all(got[i] == i for i in range(12) if i != 9)


def test_components_nonconvergence_raises(spark):
    pdf = spark.createDataFrame([(i, i + 1) for i in range(40)],
                                "id_a: long, id_b: long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pdf, max_iter=1)


def test_split_thresholds_portable_hex():
    ths = split_thresholds([("train", 0.9), ("val", 0.05), ("test", 0.05)])
    assert [n for n, _ in ths] == ["train", "val"]
    assert all(len(t) == 8 and t == t.lower() for _, t in ths)
    # normalized: weights that don't sum to 1 give the same cuts
    assert ths == split_thresholds([("train", 18), ("val", 1), ("test", 1)])
    with pytest.raises(ValueError):
        split_thresholds([("a", 0.0), ("b", -0.1), ("c", 1.0)])


def test_hash_split_proportions_disjoint_deterministic(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id").groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in out}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 20000          # exhaustive + disjoint
    assert abs(counts["train"] / 20000 - 0.9) < 0.01
    assert abs(counts["val"] / 20000 - 0.05) < 0.005
    # deterministic under repartitioning
    a = hash_split(df, "doc_id").orderBy("doc_id").collect()
    b = hash_split(df.repartition(13), "doc_id").orderBy("doc_id").collect()
    assert [r.split for r in a] == [r.split for r in b]
    # salt redraws: some rows must move
    c = hash_split(df, "doc_id", salt="other").orderBy("doc_id").collect()
    assert [r.split for r in a] != [r.split for r in c]


def test_hash_split_needs_two_splits(spark):
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="two splits"):
        hash_split(df, "doc_id", weights=[("all", 1.0)])


def test_ngram_containment_hand_checked(spark):
    train = spark.createDataFrame(
        [(1, "abcdef"), (2, "zzzzz")], "doc_id: long, t: string")
    ev = spark.createDataFrame([(9, "abcdxx")], "doc_id: long, t: string")
    rows = {r.doc_id: r for r in
            ngram_containment(train, ev, "t", "doc_id").collect()}
    # doc 1 grams: abcd bcde cdef; eval grams: abcd bcdx cdxx -> 1 hit
    assert rows[1].n_grams == 3 and rows[1].n_hit == 1
    assert rows[1].containment == pytest.approx(1 / 3, abs=1e-6)
    assert rows[2].n_hit == 0 and rows[2].containment == 0.0


def test_split_thresholds_rejects_negative_last_weight():
    with pytest.raises(ValueError, match="negative"):
        split_thresholds([("a", 0.5), ("b", 0.6), ("c", -0.1)])


def test_mixture_rates_exact_arithmetic():
    # N = min(100/.5, 50/.5) = 100 -> a keeps half, b keeps all
    r = mixture_rates({"a": 100, "b": 50}, {"a": 0.5, "b": 0.5})
    assert r == {"a": 0.5, "b": 1.0}
    # budget caps the total: N=60 -> a 30/100, b 30/50
    r = mixture_rates({"a": 100, "b": 50}, {"a": 0.5, "b": 0.5}, budget=60)
    assert r == pytest.approx({"a": 0.3, "b": 0.6})
    # unnormalized target weights normalize; zero-weight source -> 0.0
    r = mixture_rates({"a": 10, "b": 10, "c": 99}, {"a": 3.0, "b": 1.0,
                                                    "c": 0.0})
    assert r["c"] == 0.0 and r["a"] == pytest.approx(1.0)
    assert r["b"] == pytest.approx(10 / 30)


def test_mixture_rates_validates():
    with pytest.raises(ValueError, match="absent from counts"):
        mixture_rates({"a": 10}, {"a": 0.5, "b": 0.5})
    with pytest.raises(ValueError, match="negative"):
        mixture_rates({"a": 10}, {"a": -1.0})
    with pytest.raises(ValueError, match="positive"):
        mixture_rates({"a": 10}, {"a": 0.0})
    with pytest.raises(ValueError, match="budget"):
        mixture_rates({"a": 10}, {"a": 1.0}, budget=0)
    with pytest.raises(ValueError, match="empty"):
        mixture_rates({"a": 10}, {})


def test_mixture_thresholds_rate_one_is_keep_all_not_9_hex_chars():
    # rate 1.0 MUST NOT become the 9-char '100000000': an 8-char hash
    # prefix compares lexicographically ('f...' > '1...') and would
    # wrongly drop ~15/16 of the source
    assert mixture_thresholds({"a": 1.0}) == [("a", None)]
    assert mixture_thresholds({"a": 0.5}) == [("a", "80000000")]
    with pytest.raises(ValueError, match="outside"):
        mixture_thresholds({"a": 1.5})


def test_mixture_sample_proportions_branches_determinism(spark):
    rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string")
    rates = {"a": 1.0, "b": 0.5, "c": 0.0}   # d absent -> dropped
    got = mixture_sample(df, "source", rates, "doc_id",
                         salt="s1").toPandas()
    by = got.groupby("source").size().to_dict()
    assert by.get("a") == 1000                      # keep-all branch
    assert by.get("c") is None and "d" not in by    # zero rate + no rate
    assert 400 < by["b"] < 600                      # ~0.5 of 1000
    # deterministic under repartitioning, and salt redraws
    again = mixture_sample(df.repartition(13), "source", rates, "doc_id",
                           salt="s1").toPandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])
    redrawn = mixture_sample(df, "source", rates, "doc_id",
                             salt="s2").toPandas()
    assert sorted(got["doc_id"]) != sorted(redrawn["doc_id"])
    # map-only: the physical plan carries no exchange
    plan = (mixture_sample(df, "source", rates, "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


def test_mixture_rates_feed_sample_end_to_end(spark):
    # counts -> rates -> sample: realized mixture tracks the target
    rows = [(i, "big" if i % 10 else "small") for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string")
    counts = {r["source"]: r["n"] for r in
              df.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert counts == {"big": 4500, "small": 500}
    rates = mixture_rates(counts, {"big": 0.5, "small": 0.5})
    # N = min(4500/.5, 500/.5) = 1000 -> big 1/9, small keep-all
    assert rates == pytest.approx({"big": 1 / 9, "small": 1.0})
    got = mixture_sample(df, "source", rates, "doc_id").toPandas()
    by = got.groupby("source").size().to_dict()
    assert by["small"] == 500 and 400 < by["big"] < 620


def test_leakage_safe_split_same_component_same_split(spark):
    from xagg_spark.operators.split import leakage_safe_split
    # clusters {0,1,2}, {10,11}; 20..29 singletons (absent from comp)
    pairs = spark.createDataFrame([(0, 1), (1, 2), (10, 11)],
                                  "id_a: long, id_b: long")
    comp = connected_components(pairs)
    docs = spark.createDataFrame([(i,) for i in (0, 1, 2, 10, 11,
                                                 *range(20, 30))],
                                 "doc_id: long")
    out = leakage_safe_split(docs, "doc_id", comp, salt="x").toPandas()
    by = out.set_index("doc_id")["split"]
    # invariant: every component's members share one split
    assert len({by[0], by[1], by[2]}) == 1
    assert by[10] == by[11]
    # singletons split EXACTLY like hash_split on their own id
    solo = (hash_split(docs.filter(F.col("doc_id") >= 20), "doc_id",
                       salt="x").toPandas().set_index("doc_id")["split"])
    assert all(by[i] == solo[i] for i in range(20, 30))
    # reserved-column guard
    with pytest.raises(ValueError, match="_split_key"):
        leakage_safe_split(docs.withColumn("_split_key", F.lit(1)),
                           "doc_id", comp)


def test_hash_split_rejects_existing_split_column(spark):
    df = (spark.range(5).withColumnRenamed("id", "doc_id")
          .withColumn("split", F.lit("train")))
    with pytest.raises(ValueError, match="already has a split column"):
        hash_split(df, "doc_id")


def test_components_free_superseded_checkpoints(spark):
    """Code-review r5s4: each round's superseded label checkpoint (and
    the edge table, on return) must be freed eagerly — a multi-round
    graph otherwise retains O(rounds) node-table copies for the life of
    the session.  Only the RETURNED final label table may stay resident."""
    sc = spark.sparkContext

    def n_persisted():
        return len(sc._jsc.sc().getRDDStorageInfo())

    before = n_persisted()
    # a 300-node chain runs several propagate+jump rounds
    pdf = spark.createDataFrame([(i, i + 1) for i in range(299)],
                                "id_a: long, id_b: long")
    out = connected_components(pdf, max_iter=15)
    assert out.count() == 300
    # final labels only (edges + per-round checkpoints freed): the leak
    # this pins would retain rounds+2 tables here
    assert n_persisted() - before <= 1


def test_corpus_pipeline_join_shifts_past_broadcast_threshold(spark):
    """The capstone's scale claim, executed: the dedup-keeper semi-join
    is AQE-broadcast at gate scale (EXPLAIN.md capture), and past the
    10MB broadcast threshold size-based planning must shift it to a
    SHUFFLED semi-join on doc_id BY ITSELF — the query carries no hints,
    so this pins that nothing in the composition (localCheckpoint-free,
    hint-free) blocks the planner from making the scale choice."""
    from xagg_spark.operators.dedup import exact_dedup

    n = 2_000_000          # ~16MB of bigint keepers > 10MB threshold
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text body "), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 3)).alias("source"))
    keyed = docs.withColumn("_k", F.substring("text", 1, 32))
    keepers = (exact_dedup(keyed, ["lang", "_k"], "doc_id")
               .select(F.col("keeper").alias("doc_id")))
    out = (keyed.join(keepers, "doc_id", "semi")
                .groupBy("source").count())
    rows = {r.source: r["count"] for r in out.collect()}
    assert sum(rows.values()) == n          # unique texts: all kept
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    semi_lines = [ln for ln in plan.splitlines() if "LeftSemi" in ln]
    assert semi_lines and all("Broadcast" not in ln for ln in semi_lines), \
        semi_lines
