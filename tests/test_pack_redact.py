"""Sequence packing and PII redaction."""

import pytest

from xagg_spark.operators.pack import pack_sequences
from xagg_spark.operators.text import redact_pii


def test_pack_sequences_hand_checked(spark):
    # shard A token stream: 4,5,3,7 with budget 10 ->
    # cum_prev 0,4,9,12 -> chunks 0,0,0,1 offsets 0,4,9,2
    # (doc 3 starts at position 9 and STRADDLES the chunk boundary)
    rows = [(1, "A", 4), (2, "A", 5), (3, "A", 3), (4, "A", 7),
            (10, "B", 25), (11, "B", 2)]
    df = spark.createDataFrame(rows, "doc_id: long, src: string, toks: long")
    out = {r.doc_id: (r.chunk, r.offset)
           for r in pack_sequences(df, "doc_id", "toks", 10, "src").collect()}
    assert out == {1: (0, 0), 2: (0, 4), 3: (0, 9), 4: (1, 2),
                   10: (0, 0), 11: (2, 5)}


def test_pack_sequences_deterministic_and_validates(spark):
    df = spark.range(0, 3000).selectExpr(
        "id AS doc_id", "CAST(id % 7 AS STRING) AS src",
        "(id % 90) + 1 AS toks")
    a = pack_sequences(df, "doc_id", "toks", 128, "src") \
        .orderBy("doc_id").collect()
    b = pack_sequences(df.repartition(17), "doc_id", "toks", 128, "src") \
        .orderBy("doc_id").collect()
    assert [(r.chunk, r.offset) for r in a] == [(r.chunk, r.offset) for r in b]
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "doc_id", "toks", 0, "src")


def test_redact_pii_all_shapes_and_order(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b-c@ex.co.uk tel 555-010-1234 ssn 123-45-6789 "
             "ip 10.0.0.7 clean end")],
        "doc_id: long, text: string")
    r = redact_pii(df).collect()[0]
    # SSN shape must win over the 3-3-4 phone shape (pattern order)
    assert r.redacted == ("mail <EMAIL> tel <PHONE> ssn <SSN> "
                          "ip <IP> clean end")
    assert r.n_redacted_chars == len(r.text) - len(r.redacted)


def test_redact_pii_is_identity_on_clean_text(spark):
    df = spark.createDataFrame([(1, "no pii here just words 42")],
                               "doc_id: long, text: string")
    r = redact_pii(df).collect()[0]
    assert r.redacted == r.text and r.n_redacted_chars == 0


def test_pack_sequences_reserved_column_raises(spark):
    df = spark.createDataFrame([(1, "A", 4, 0)],
                               "doc_id: long, src: string, toks: long, "
                               "_cum_prev: long")
    with pytest.raises(ValueError, match="_cum_prev"):
        pack_sequences(df, "doc_id", "toks", 10, "src")


def test_redact_pii_same_out_col_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="out_col"):
        redact_pii(df, "text", out_col="text")
