"""Tests for the as-of join and the one-pass weighted zonal stats."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
import pyspark.sql.functions as F

from tests.test_corpus_stats_quantile import _toy_wm_and_facts


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(pd.DataFrame([
        {"user_id": 1, "ts": _ts(5), "event_id": 100},
        {"user_id": 1, "ts": _ts(10), "event_id": 101},
        {"user_id": 1, "ts": _ts(2), "event_id": 102},   # before any right
        {"user_id": 2, "ts": _ts(7), "event_id": 200},   # equal-ts match
        {"user_id": 3, "ts": _ts(9), "event_id": 300},   # key with no right
    ]))
    right = spark.createDataFrame(pd.DataFrame([
        {"user_id": 1, "ts": _ts(3), "value": 30.0},
        {"user_id": 1, "ts": _ts(8), "value": 80.0},
        {"user_id": 2, "ts": _ts(7), "value": 70.0},
    ]))
    return left, right


def test_asof_join_backward_inclusive_matches_pandas(spark):
    from xagg_spark.operators.sessions import asof_join
    left, right = _frames(spark)
    out = (asof_join(left, right).orderBy("event_id").toPandas())
    got = dict(zip(out["event_id"], out["value_r"]))
    assert got[100] == 30.0          # latest right <= ts(5) is ts(3)
    assert got[101] == 80.0
    assert np.isnan(got[102])        # nothing at or before ts(2)
    assert got[200] == 70.0          # equal ts is INCLUSIVE
    assert np.isnan(got[300])        # key absent from right
    # matched right timestamp comes through; unmatched is NaT
    ts_r = dict(zip(out["event_id"], out["ts_r"]))
    assert ts_r[101] == _ts(8) and pd.isna(ts_r[102])
    # pandas merge_asof agrees on the matched values
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    ref = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
    ref_map = dict(zip(ref["event_id"], ref["value"]))
    for eid, v in got.items():
        assert (np.isnan(v) and np.isnan(ref_map[eid])) or v == ref_map[eid]


def test_asof_join_tolerance_and_repartition_stability(spark):
    from xagg_spark.operators.sessions import asof_join
    left, right = _frames(spark)
    # tolerance is INCLUSIVE (diff <= tol survives): both matches sit at
    # exactly 2s staleness, the equal-ts match at 0s
    out = (asof_join(left, right, tolerance_seconds=2.0)
           .orderBy("event_id").toPandas())
    got = dict(zip(out["event_id"], out["value_r"]))
    assert got[100] == 30.0 and got[101] == 80.0 and got[200] == 70.0
    tight = (asof_join(left, right, tolerance_seconds=1.0)
             .orderBy("event_id").toPandas())
    got_t = dict(zip(tight["event_id"], tight["value_r"]))
    assert np.isnan(got_t[100]) and np.isnan(got_t[101])   # 2s stale > 1s
    assert got_t[200] == 70.0                              # 0s stale
    assert pd.isna(dict(zip(tight["event_id"], tight["ts_r"]))[100])
    out2 = (asof_join(left.repartition(5), right.repartition(3))
            .orderBy("event_id").toPandas())
    base = (asof_join(left, right).orderBy("event_id").toPandas())
    pd.testing.assert_frame_equal(base.reset_index(drop=True),
                                  out2.reset_index(drop=True))


def test_asof_join_guards(spark):
    from xagg_spark.operators.sessions import asof_join
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="value_cols"):
        asof_join(left, right, value_cols=())
    with pytest.raises(ValueError, match="tolerance_seconds"):
        asof_join(left, right, tolerance_seconds=-1)
    with pytest.raises(ValueError, match="right side lacks"):
        asof_join(left, right, value_cols=("nope",))
    with pytest.raises(ValueError, match="different suffix"):
        asof_join(left.withColumn("value_r", F.lit(1.0)), right)


def test_aggregate_stats_matches_numpy(spark):
    from xagg_spark.operators.aggregate import aggregate_stats
    rng = np.random.RandomState(5)
    vals = rng.rand(50) * 100
    wts = rng.rand(50) + 0.01
    wm, facts = _toy_wm_and_facts(spark, vals, wts)
    out = aggregate_stats(facts, wm).toPandas().iloc[0]
    w = wts / wts.sum()
    mean = float((w * vals).sum() / w.sum())
    var = float((w * vals * vals).sum() / w.sum() - mean * mean)
    assert out["mean"] == pytest.approx(mean, rel=1e-12)
    assert out["variance"] == pytest.approx(var, rel=1e-9)
    assert out["min"] == vals.min() and out["max"] == vals.max()
    assert out["n_valid"] == 50


def test_aggregate_stats_nan_and_collision_guard(spark):
    from xagg_spark.operators.aggregate import aggregate_stats
    wm, facts = _toy_wm_and_facts(
        spark, [10.0, np.nan, 30.0], [1.0, 1.0, 1.0])
    out = aggregate_stats(facts, wm).toPandas().iloc[0]
    assert out["n_valid"] == 2 and out["min"] == 10.0 and out["max"] == 30.0
    with pytest.raises(ValueError, match="stat output"):
        aggregate_stats(facts.withColumnRenamed("t", "mean"), wm,
                        dims=("var", "mean"))


def test_rolling_stats_matches_pandas_and_is_tie_safe(spark):
    from xagg_spark.operators.sessions import rolling_stats
    rows = [
        {"user_id": 1, "ts": _ts(0), "event_id": 0, "value": 10.0},
        {"user_id": 1, "ts": _ts(4), "event_id": 1, "value": 20.0},
        {"user_id": 1, "ts": _ts(4), "event_id": 2, "value": 30.0},  # tie
        {"user_id": 1, "ts": _ts(9), "event_id": 3, "value": 40.0},
        {"user_id": 2, "ts": _ts(1), "event_id": 4, "value": 5.0},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = (rolling_stats(df, "user_id", "ts", "value", window_seconds=5.0)
           .orderBy("event_id").toPandas())
    got = dict(zip(out["event_id"], zip(out["roll_sum"], out["roll_n"])))
    assert got[0] == (10.0, 1)
    # RANGE frame: BOTH tied rows see each other AND the t=0 row (4-5<=0)
    assert got[1] == (60.0, 3) and got[2] == (60.0, 3)
    assert got[3] == (90.0, 3)          # t in [4, 9]: 20+30+40
    assert got[4] == (5.0, 1)
    # tie order cannot matter: repartition + reversed input give same rows
    out2 = (rolling_stats(df.orderBy(F.desc("event_id")).repartition(4),
                          "user_id", "ts", "value", window_seconds=5.0)
            .orderBy("event_id").toPandas())
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  out2.reset_index(drop=True))
    with pytest.raises(ValueError, match="window_seconds"):
        rolling_stats(df, "user_id", "ts", window_seconds=0)
    with pytest.raises(ValueError, match="reserved"):
        rolling_stats(df.withColumn("roll_n", F.lit(1)), "user_id", "ts")


def test_asof_and_rolling_plan_shape(spark):
    """Both event-time operators must plan as ONE data Exchange + Sort
    with the window(s) riding it — never a join for asof, never a second
    shuffle for rolling."""
    from xagg_spark.operators.sessions import asof_join, rolling_stats
    left, right = _frames(spark)
    plan = (asof_join(left, right)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    df = left.withColumn("value", F.lit(1.0))
    plan2 = (rolling_stats(df, "user_id", "ts")._jdf.queryExecution()
             .executedPlan().toString())
    assert plan2.count("Exchange hashpartitioning") == 1, plan2
    assert "Window" in plan2


def test_interval_join_matches_naive_and_boundaries(spark):
    from xagg_spark.operators.sessions import interval_join
    pts = spark.createDataFrame(pd.DataFrame([
        {"user_id": 1, "ts": _ts(0), "event_id": 0},     # == start: IN
        {"user_id": 1, "ts": _ts(10), "event_id": 1},    # == end: OUT
        {"user_id": 1, "ts": _ts(5), "event_id": 2},     # interior
        {"user_id": 1, "ts": _ts(9999), "event_id": 3},  # far outside
        {"user_id": 2, "ts": _ts(5), "event_id": 4},     # other key
    ]))
    ivs = spark.createDataFrame(pd.DataFrame([
        {"user_id": 1, "start": _ts(0), "end": _ts(10), "iv_id": 100},
        # crosses MANY 3s buckets + overlaps the first interval
        {"user_id": 1, "start": _ts(4), "end": _ts(20), "iv_id": 101},
        {"user_id": 2, "start": _ts(0), "end": _ts(3), "iv_id": 102},
    ]))
    out = (interval_join(pts, ivs, by="user_id", bucket_seconds=3.0)
           .select("event_id", "iv_id").toPandas())
    got = set(map(tuple, out.itertuples(index=False)))
    # naive cross-check
    pp, ii = pts.toPandas(), ivs.toPandas()
    want = {(p.event_id, i.iv_id)
            for p in pp.itertuples() for i in ii.itertuples()
            if p.user_id == i.user_id and i.start <= p.ts < i.end}
    assert got == want and (0, 100) in got and (1, 100) not in got
    # each qualifying pair appears EXACTLY once despite multi-bucket spans
    assert len(out) == len(want)
    # guards
    with pytest.raises(ValueError, match="buckets"):
        interval_join(pts, ivs, by="user_id", bucket_seconds=3.0,
                      max_buckets_per_interval=2)
    with pytest.raises(ValueError, match="share column"):
        interval_join(pts, ivs.withColumnRenamed("iv_id", "event_id"),
                      by="user_id")
    with pytest.raises(ValueError, match="bucket_seconds"):
        interval_join(pts, ivs, by="user_id", bucket_seconds=0)


def test_interval_join_no_by_key_and_empty_intervals(spark):
    from xagg_spark.operators.sessions import interval_join
    pts = spark.createDataFrame(pd.DataFrame(
        [{"ts": _ts(5), "event_id": 0}]))
    ivs = spark.createDataFrame(pd.DataFrame([
        {"start": _ts(0), "end": _ts(10), "iv_id": 1},
        {"start": _ts(7), "end": _ts(7), "iv_id": 2},    # empty: drops
    ]))
    out = interval_join(pts, ivs).select("event_id", "iv_id").toPandas()
    assert set(map(tuple, out.itertuples(index=False))) == {(0, 1)}


def test_asof_join_null_payload_and_null_keys_match_duckdb_semantics(spark):
    """The matched right row's NULL payload must come through as NULL
    (struct carry, never a stale older value) and NULL by-keys never
    match — both pinned against DuckDB's native ASOF JOIN."""
    import duckdb
    from xagg_spark.operators.sessions import asof_join
    lp = pd.DataFrame([
        {"user_id": 1.0, "ts": _ts(10), "event_id": 1},
        {"user_id": None, "ts": _ts(10), "event_id": 2},
    ])
    rp = pd.DataFrame([
        {"user_id": 1.0, "ts": _ts(3), "value": 30.0},
        {"user_id": 1.0, "ts": _ts(8), "value": None},   # matched, NULL
        {"user_id": None, "ts": _ts(5), "value": 99.0},  # NULL key
    ])
    out = (asof_join(spark.createDataFrame(lp), spark.createDataFrame(rp))
           .orderBy("event_id").toPandas())
    con = duckdb.connect()
    con.register("lp", lp); con.register("rp", rp)
    ref = con.execute("""
        SELECT l.event_id, r.value AS value_r
        FROM lp l ASOF LEFT JOIN rp r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY l.event_id""").df()
    got = dict(zip(out["event_id"], out["value_r"]))
    want = dict(zip(ref["event_id"], ref["value_r"]))
    for eid in (1, 2):
        g, w_ = got[eid], want[eid]
        assert (pd.isna(g) and pd.isna(w_)) or g == w_, (eid, g, w_)
    # matched-row attribution: event 1 matched the t=8 row (NULL value)
    assert pd.isna(got[1]) and out[out.event_id == 1]["ts_r"].iloc[0] == _ts(8)
    with pytest.raises(ValueError, match="reserved by asof_join"):
        asof_join(spark.createDataFrame(lp).withColumn("_src", F.lit(1)),
                  spark.createDataFrame(rp))


def test_rolling_stats_null_values_and_stats_float_input(spark):
    from xagg_spark.operators.sessions import rolling_stats
    df = spark.createDataFrame(pd.DataFrame([
        {"user_id": 1, "ts": _ts(0), "event_id": 0, "value": 10.0},
        {"user_id": 1, "ts": _ts(1), "event_id": 1, "value": None},
    ]))
    out = (rolling_stats(df, "user_id", "ts", "value", window_seconds=5.0)
           .orderBy("event_id").toPandas())
    # NULL value: excluded from roll_n and roll_mean (mean stays 10)
    assert out["roll_n"].tolist() == [1, 1]
    assert out["roll_mean"].tolist() == [10.0, 10.0]
    # zero-overlap polygon: stats NaN-filled even for FLOAT value input,
    # n_valid = 0 (not NULL)
    from xagg_spark.operators.aggregate import aggregate_stats
    from xagg_spark.polygons import PolygonSet, rect_ring
    wm, facts = _toy_wm_and_facts(spark, [1.0, 2.0], [1.0, 1.0])
    wm.polys = PolygonSet([rect_ring(0, 0, 1, 1), rect_ring(2, 2, 3, 3)],
                          pd.DataFrame({"name": ["p0", "p1"]}))
    ffacts = facts.withColumn("value", F.col("value").cast("float"))
    res = (aggregate_stats(ffacts, wm).orderBy("poly_idx").toPandas())
    assert np.isnan(res["min"].iloc[1]) and np.isnan(res["max"].iloc[1])
    assert res["n_valid"].iloc[1] == 0


def test_asof_join_property_vs_pandas_merge_asof(spark):
    """Randomized equivalence: asof_join == pandas merge_asof(backward)
    on frames with multiple keys, ties between left/right, and gaps.
    Right side generated unique per (key, ts) (the documented contract)."""
    rng = np.random.RandomState(42)
    for trial in range(5):
        n_l, n_r = rng.randint(5, 40), rng.randint(3, 30)
        lp = pd.DataFrame({
            "user_id": rng.randint(0, 4, n_l),
            "ts": [_ts(int(s)) for s in rng.randint(0, 50, n_l)],
            "event_id": np.arange(n_l),
        })
        rp = (pd.DataFrame({
                "user_id": rng.randint(0, 4, n_r),
                "ts": [_ts(int(s)) for s in rng.randint(0, 50, n_r)],
                "value": rng.rand(n_r).round(3),
              })
              .drop_duplicates(["user_id", "ts"]).reset_index(drop=True))
        from xagg_spark.operators.sessions import asof_join
        out = asof_join(spark.createDataFrame(lp), spark.createDataFrame(rp))
        got = (out.orderBy("event_id").toPandas()
                  .set_index("event_id")["value_r"])
        ref = (pd.merge_asof(lp.sort_values(["ts", "event_id"]),
                             rp.sort_values("ts"),
                             on="ts", by="user_id", direction="backward")
               .set_index("event_id")["value"])
        for eid in lp["event_id"]:
            g, w_ = got[eid], ref[eid]
            assert (pd.isna(g) and pd.isna(w_)) or g == w_, \
                (trial, eid, g, w_)


def test_interval_join_plans_as_equi_join_never_nested_loop(spark):
    from xagg_spark.operators.sessions import interval_join
    pts = spark.createDataFrame(pd.DataFrame(
        [{"user_id": 1, "ts": _ts(5), "event_id": 0}]))
    ivs = spark.createDataFrame(pd.DataFrame(
        [{"user_id": 1, "start": _ts(0), "end": _ts(10), "iv_id": 1}]))
    plan = (interval_join(pts, ivs, by="user_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "NestedLoop" not in plan, plan
    assert ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan), plan


def test_funnel_greedy_matching_and_edge_cases(spark):
    from xagg_spark.operators.sessions import funnel
    rows = [
        # u1 completes a-b-c with a decoy 'b' BEFORE the first 'a'
        {"user_id": 1, "ts": _ts(0), "event_id": 0, "event_type": "b"},
        {"user_id": 1, "ts": _ts(1), "event_id": 1, "event_type": "a"},
        {"user_id": 1, "ts": _ts(2), "event_id": 2, "event_type": "b"},
        {"user_id": 1, "ts": _ts(3), "event_id": 3, "event_type": "c"},
        # u2 stalls after 'a' ('c' precedes any 'b')
        {"user_id": 2, "ts": _ts(0), "event_id": 4, "event_type": "a"},
        {"user_id": 2, "ts": _ts(1), "event_id": 5, "event_type": "c"},
        # u3 never starts
        {"user_id": 3, "ts": _ts(0), "event_id": 6, "event_type": "x"},
        # u4: same-ts chain a,b ordered by event_id (tie-break matches)
        {"user_id": 4, "ts": _ts(5), "event_id": 7, "event_type": "a"},
        {"user_id": 4, "ts": _ts(5), "event_id": 8, "event_type": "b"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = (funnel(df, ["a", "b", "c"], order_cols=("event_id",))
           .orderBy("user_id").toPandas().set_index("user_id"))
    assert out.loc[1, "n_completed"] == 3
    assert [out.loc[1, f"step_{i}_us"] for i in (1, 2, 3)] == \
        [_ts(i).timestamp() * 1e6 for i in (1, 2, 3)]
    assert out.loc[2, "n_completed"] == 1
    assert pd.isna(out.loc[2, "step_2_us"])
    assert out.loc[3, "n_completed"] == 0
    assert out.loc[4, "n_completed"] == 2     # tie chain via event_id order
    # repeated step types: a -> a requires two distinct 'a' events
    out2 = (funnel(df, ["a", "a"], order_cols=("event_id",))
            .orderBy("user_id").toPandas().set_index("user_id"))
    assert out2.loc[1, "n_completed"] == 1    # only one 'a' for u1
    with pytest.raises(ValueError, match="steps"):
        funnel(df, [])


def test_funnel_property_vs_python_greedy(spark):
    """Randomized equivalence against a literal Python greedy walk —
    covers tie orders, repeated types, and absent steps the fixed
    fixtures might miss."""
    rng = np.random.RandomState(9)
    types = ["a", "b", "c"]
    for trial in range(4):
        n = rng.randint(10, 60)
        pdf = pd.DataFrame({
            "user_id": rng.randint(0, 5, n),
            "ts": [_ts(int(s)) for s in rng.randint(0, 12, n)],  # many ties
            "event_id": np.arange(n),
            "event_type": rng.choice(types, n),
        })
        steps = [types[i] for i in rng.randint(0, 3, rng.randint(1, 4))]
        from xagg_spark.operators.sessions import funnel
        out = (funnel(spark.createDataFrame(pdf), steps,
                      order_cols=("event_id",))
               .toPandas().set_index("user_id"))
        for uid, grp in pdf.groupby("user_id"):
            seq = grp.sort_values(["ts", "event_id"]).itertuples()
            k, last = 0, None
            stamps = []
            for e in seq:
                if k < len(steps) and e.event_type == steps[k] and (
                        last is None
                        or (e.ts, e.event_id) > last):
                    stamps.append(e.ts.timestamp() * 1e6)
                    last = (e.ts, e.event_id)
                    k += 1
            assert out.loc[uid, "n_completed"] == k, (trial, uid)
            for i, s in enumerate(stamps):
                assert out.loc[uid, f"step_{i + 1}_us"] == s, (trial, uid, i)


def test_funnel_same_ts_chain_without_order_cols_and_string_ids(spark):
    """Review regressions: (1) a same-timestamp a->b chain completes on
    the DEFAULT parameter path; (2) string order columns work (no long
    cast); (3) multiple order_cols are all honored; (4) NULL-ts events
    drop."""
    from xagg_spark.operators.sessions import funnel
    df = spark.createDataFrame(pd.DataFrame([
        {"user_id": 1, "ts": _ts(0), "eid": "x0", "event_type": "a"},
        {"user_id": 1, "ts": _ts(0), "eid": "x1", "event_type": "b"},
    ]))
    out = funnel(df, ["a", "b"], type_col="event_type").toPandas()
    assert out["n_completed"].iloc[0] == 2          # positional "after"
    out_s = funnel(df, ["a", "b"], order_cols=("eid",)).toPandas()
    assert out_s["n_completed"].iloc[0] == 2        # string id: no cast
    # multiple order cols: second col decides within equal first col
    df2 = spark.createDataFrame(pd.DataFrame([
        {"user_id": 1, "ts": _ts(0), "g": 0, "eid": 1, "event_type": "b"},
        {"user_id": 1, "ts": _ts(0), "g": 0, "eid": 0, "event_type": "a"},
    ]))
    out2 = funnel(df2, ["a", "b"], order_cols=("g", "eid")).toPandas()
    assert out2["n_completed"].iloc[0] == 2         # a(eid 0) before b(1)
    # NULL ts drops: a user with only NULL-ts events is absent
    df3 = spark.createDataFrame(pd.DataFrame([
        {"user_id": 1, "ts": _ts(0), "eid": 0, "event_type": "a"},
        {"user_id": 2, "ts": pd.NaT, "eid": 1, "event_type": "a"},
    ]))
    out3 = funnel(df3, ["a"], order_cols=("eid",)).toPandas()
    assert set(out3["user_id"]) == {1}
