"""Sessionization (gaps-and-islands) and repetition ratio."""

import datetime as dt

import pytest

import pyspark.sql.functions as F

from xagg_spark.operators.sessions import sessionize
from xagg_spark.operators.text import repetition_ratio


def _ts(minutes, micros=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes,
                                                  microseconds=micros)


def test_sessionize_hand_checked_with_boundary(spark):
    # gap 60s: new session iff diff >= 60s (matches F.session_window's
    # half-open [ts, ts+gap) extension)
    rows = [
        (1, 7, _ts(0)),            # session 0
        (2, 7, _ts(0, 500)),       # +0.0005s        -> session 0
        (3, 7, _ts(1)),            # +~60s (59.9995) -> session 0
        (4, 7, _ts(2)),            # +60s EXACTLY    -> session 1 (boundary)
        (5, 7, _ts(2, 1)),         # +1us            -> session 1
        (6, 7, _ts(100)),          # huge gap        -> session 2
        (10, 8, _ts(0)),           # other user      -> session 0
    ]
    df = spark.createDataFrame(rows, "event_id: long, user_id: long, "
                                     "ts: timestamp")
    out = {r.event_id: r.session_idx
           for r in sessionize(df, "user_id", "ts", 60.0,
                               order_cols=("event_id",)).collect()}
    assert out == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 2, 10: 0}


def test_sessionize_agrees_with_session_window(spark):
    # per-user session COUNTS from the islands assignment must equal the
    # number of F.session_window groups at the same gap
    import random
    rng = random.Random(3)
    rows = [(i, rng.randrange(5),
             _ts(rng.randrange(0, 5000), rng.randrange(0, 1000000)))
            for i in range(400)]
    df = spark.createDataFrame(rows, "event_id: long, user_id: long, "
                                     "ts: timestamp")
    ours = (sessionize(df, "user_id", "ts", 1800.0,
                       order_cols=("event_id",))
            .groupBy("user_id")
            .agg(F.countDistinct("session_idx").alias("n")))
    theirs = (df.groupBy("user_id", F.session_window("ts", "30 minutes"))
                .count()
                .groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("n")))
    a = {r.user_id: r.n for r in ours.collect()}
    b = {r.user_id: r.n for r in theirs.collect()}
    assert a == b


def test_sessionize_ntz_timestamps(spark):
    df = spark.createDataFrame(
        [(1, 7, _ts(0)), (2, 7, _ts(2))],
        "event_id: long, user_id: long, ts: timestamp_ntz")
    out = {r.event_id: r.session_idx
           for r in sessionize(df, "user_id", "ts", 60.0,
                               order_cols=("event_id",)).collect()}
    assert out == {1: 0, 2: 1}


def test_sessionize_validates(spark):
    df = spark.createDataFrame([(1, 7, _ts(0), 0)],
                               "event_id: long, user_id: long, "
                               "ts: timestamp, _is_new: long")
    with pytest.raises(ValueError, match="_is_new"):
        sessionize(df, "user_id", "ts", 60.0)
    df2 = df.drop("_is_new")
    with pytest.raises(ValueError, match="gap_seconds"):
        sessionize(df2, "user_id", "ts", 0.0)


def test_repetition_ratio_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"),          # grams aaa,aaa -> 2 total, 1 distinct
         (2, "abcd")],         # grams abc,bcd -> all distinct
        "doc_id: long, text: string")
    rows = {r.doc_id: r for r in repetition_ratio(df).collect()}
    assert rows[1].n_grams == 2 and rows[1].n_distinct == 1
    assert rows[1].rep_ratio == pytest.approx(0.5)
    assert rows[2].rep_ratio == 0.0


def test_sessionize_plan_single_exchange_and_sort(spark):
    # both window passes (lag, running sum) must ride ONE hash exchange
    # and ONE per-key sort — a second exchange or sort here would double
    # the shuffle cost of every sessionization at scale
    df = spark.createDataFrame([(1, 7, _ts(0))],
                               "event_id: long, user_id: long, "
                               "ts: timestamp")
    out = sessionize(df, "user_id", "ts", 3600.0, order_cols=("event_id",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("+- Sort ") == 1, plan
    assert plan.count("Window") == 2, plan


def test_chunk_documents_hand_checked_and_reassembly(spark):
    from xagg_spark.operators.text import chunk_documents
    text = "abcdefghij"                       # len 10
    df = spark.createDataFrame([(1, text), (2, ""), (3, "xy")],
                               "doc_id: long, text: string")
    out = chunk_documents(df, "text", "doc_id", size=4, overlap=2)
    rows = sorted([(r.doc_id, r.chunk_idx, r.chunk_start, r.chunk_text)
                   for r in out.collect()])
    # stride 2: chunks at 0,2,4,6 cover [0:4..6:10] -> (10-2-1)//2+1 = 4
    assert [r for r in rows if r[0] == 1] == [
        (1, 0, 0, "abcd"), (1, 1, 2, "cdef"),
        (1, 2, 4, "efgh"), (1, 3, 6, "ghij")]
    # empty doc -> one empty chunk; short doc -> one truncated chunk
    assert [r for r in rows if r[0] == 2] == [(2, 0, 0, "")]
    assert [r for r in rows if r[0] == 3] == [(3, 0, 0, "xy")]
    # reassembly invariant: stripping the overlap from every chunk but
    # the first reconstructs the original text exactly
    chunks = [r[3] for r in rows if r[0] == 1]
    assert chunks[0] + "".join(c[2:] for c in chunks[1:]) == text


def test_chunk_documents_validates(spark):
    from xagg_spark.operators.text import chunk_documents
    df = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="size"):
        chunk_documents(df, size=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, size=4, overlap=4)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, size=4, overlap=-1)
