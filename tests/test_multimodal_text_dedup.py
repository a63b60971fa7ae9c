"""Tests for multimodal plumbing, text ops, dedup and similarity operators."""

import numpy as np
import pandas as pd
import pytest

from xagg_spark.grid import GridSpec
from xagg_spark.synth import generate_spark, value_fn

GRID = GridSpec(lat_edge=0.0, lon_edge=0.0, dlat=0.5, dlon=0.5,
                nlat=16, nlon=16, tile_h=8, tile_w=8)

SF = "/root/testdata/sf0.001"


def test_image_features(spark):
    from xagg_spark.operators.multimodal import image_features
    imgs = generate_spark(spark, GRID, ntime=1, fmt="png")
    f = image_features(imgs).toPandas()
    assert len(f) == GRID.ntiles
    assert (f["p_nan"] == 0.0).all()
    assert (f["mean"] > 0).all() and (f["mean"] < 98).all()
    assert all(abs(sum(h) - 1.0) < 1e-5 for h in f["hist"])


def test_image_resize(spark):
    from xagg_spark.operators.multimodal import image_resize
    from xagg_spark.codecs import decode_tile
    imgs = generate_spark(spark, GRID, ntime=1, fmt="raw32")
    small = image_resize(imgs, 4, 4).toPandas()
    assert set(small["w"]) == {4} and set(small["h"]) == {4}
    arr = decode_tile(small["bytes"].iloc[0], "raw32", 4, 4)
    assert arr.shape == (4, 4) and np.isfinite(arr).all()


def test_psnr_check_lossy_passes_gate(spark):
    from xagg_spark.operators.multimodal import psnr_check
    imgs = generate_spark(spark, GRID, ntime=1, fmt="q8")
    res = psnr_check(imgs, GRID, value_fn).toPandas()
    assert res["passed"].all(), res


def test_caption_equality(spark):
    # input_hint: caption carried through unmodified
    from xagg_spark.synth import caption_for
    imgs = generate_spark(spark, GRID, ntime=1, fmt="raw32").toPandas()
    for r in imgs.itertuples():
        parts = r.image_id.split("_")
        tx, ty, t = int(parts[-1]), int(parts[-2]), int(parts[-3])
        assert r.caption == caption_for("test", t, ty, tx, GRID)


def test_audio_plumbing_with_injected_decoder(spark):
    """The audio mapInPandas plumbing is real; only the codec is
    delegated.  A deterministic fake decoder exercises the full
    distributed path (schema, Arrow batches, fan-in); the default
    decoder raises the env-constraint error AT EXECUTION."""
    from xagg_spark.operators.multimodal import decode_audio

    pdf = pd.DataFrame({
        "clip_id": ["c0", "c1", "c2"],
        "bytes": [np.int64(i).tobytes() for i in (3, 5, 7)],
        "sample_rate": [16000, 8000, 44100],
        "n_samples": [4, 6, 2],
        "fmt": ["fake"] * 3,
    })
    df = spark.createDataFrame(pdf).repartition(2)

    def fake(buf, fmt, n):        # deterministic: seed from the payload
        seed = int(np.frombuffer(buf, dtype=np.int64)[0])
        return (np.arange(n, dtype=np.float32) * seed) / 10.0

    out = decode_audio(df, decoder=fake).toPandas().set_index("clip_id")
    assert len(out) == 3
    assert out.loc["c1", "sample_rate"] == 8000
    np.testing.assert_allclose(out.loc["c1", "samples"],
                               np.arange(6) * 0.5)
    with pytest.raises(Exception, match="libsndfile|ffmpeg"):
        decode_audio(df).collect()              # default decoder: env error


def test_video_frame_sampling_plumbing(spark):
    """Frame sampling fan-out (one row per every_n-th frame, re-encoded
    via the engine's own codec) is real; only the per-frame decode is
    delegated to an injected fake."""
    from xagg_spark.codecs import decode_tile
    from xagg_spark.operators.multimodal import sample_video_frames

    pdf = pd.DataFrame({
        "video_id": ["v0", "v1"],
        "bytes": [b"\x01", b"\x02"],
        "fps": [30.0, 24.0],
        "n_frames": [95, 10],
        "fmt": ["fake"] * 2,
    })
    df = spark.createDataFrame(pdf)

    def fake_frame(buf, fmt, fno):
        base = float(buf[0]) * 100 + fno
        return np.full((4, 6), base, dtype=np.float32)

    out = sample_video_frames(df, every_n=30, frame_decoder=fake_frame) \
        .toPandas()
    # v0: frames 0,30,60,90; v1: frame 0
    got = sorted(zip(out["video_id"], out["frame_no"]))
    assert got == [("v0", 0), ("v0", 30), ("v0", 60), ("v0", 90), ("v1", 0)]
    assert set(out["fmt"]) == {"raw32"}
    r = out[(out.video_id == "v0") & (out.frame_no == 60)].iloc[0]
    np.testing.assert_allclose(
        decode_tile(r["bytes"], r["fmt"], int(r["w"]), int(r["h"])),
        np.full((4, 6), 160.0))


def test_exact_dedup_finds_planted_dups(spark):
    from xagg_spark.operators.dedup import exact_dedup
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["aaa", "bbb", "aaa", "ccc", "aaa"]}))
    out = exact_dedup(df, ["text"], "doc_id").toPandas()
    g = out[out.group_size == 3]
    assert len(g) == 1 and g.keeper.iloc[0] == 1


def test_minhash_lsh_finds_near_dups(spark):
    from xagg_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [base, base.replace("dog", "cat"),
                 "completely different content about spark aggregation plans"]}))
    sigs = minhash_signatures(df, "text", "doc_id")
    pairs = lsh_candidate_pairs(sigs, "doc_id").toPandas()
    pairset = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (0, 1) in pairset
    assert (0, 2) not in pairset and (1, 2) not in pairset


def test_ngram_jaccard_values(spark):
    from xagg_spark.operators.dedup import ngram_jaccard_pairs
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1], "text": ["abcdef", "abcdeg"]}))
    out = ngram_jaccard_pairs(df, "text", "doc_id", n=3).toPandas()
    # grams: {abc,bcd,cde,def} vs {abc,bcd,cde,deg}: 3 shared / 5 union
    assert len(out) == 1 and np.isclose(out.jaccard.iloc[0], 0.6)


def test_simhash_similar_docs_close(spark):
    from xagg_spark.operators.dedup import simhash16
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha beta gamma delta epsilon zeta theta iota kappa lambention mu nu",
                 "alpha beta gamma delta epsilon zzzz theta iota kappa lambention mu nu",
                 "one two three four five six seven eight nine ten eleven twelve"]}))
    out = simhash16(df, "text", "doc_id").toPandas().set_index("doc_id")
    h0, h1, h2 = int(out.loc[0, "simhash"]), int(out.loc[1, "simhash"]), int(out.loc[2, "simhash"])
    d01 = bin(h0 ^ h1).count("1")
    d02 = bin(h0 ^ h2).count("1")
    assert d01 < d02


def test_cosine_topk_ranks_exact_match_first(spark):
    from xagg_spark.operators.similarity import cosine_topk
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = (emb.filter("vec_id = 7")
            .select(emb.vec_id.alias("q_id"), emb.embedding.alias("q_vec")))
    top = cosine_topk(q, emb, k=3).toPandas()
    assert top[top["rank"] == 1].vec_id.iloc[0] == 7  # self-match first
    assert np.isclose(top[top["rank"] == 1].cos.iloc[0], 1.0)


def test_lsh_buckets_deterministic(spark):
    from xagg_spark.operators.similarity import lsh_bucket_candidates
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter("vec_id < 50")
    b1 = lsh_bucket_candidates(emb).select("vec_id", "bucket").toPandas() \
        .sort_values("vec_id").reset_index(drop=True)
    b2 = lsh_bucket_candidates(emb).select("vec_id", "bucket").toPandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(b1, b2)
    assert b1["bucket"].nunique() > 1


def test_lang_id_markers(spark):
    from xagg_spark.operators.text import lang_id
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["this is the house of the dog", "la casa es la mejor es",
                 "xyz qqq zzz"]}))
    out = lang_id(df).toPandas().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[1, "lang_pred"] == "es"
    assert out.loc[2, "lang_pred"] == "und"


def test_ivf_assign_join_path_matches_numpy(spark):
    """Large quantizer (> IVF_INLINE_MAX_CENTROIDS): the broadcast-join +
    struct-min path must produce the same deterministic assignment as a
    numpy argmax (max cos, smallest-id ties) — and the same as the inline
    literal path on the same data."""
    import pyspark.sql.functions as F

    from xagg_spark.operators import similarity as sim

    emb = (spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
                .filter(F.col("vec_id") < 300))
    cents = (emb.filter(F.col("vec_id") < 100)
                .select(F.col("vec_id").alias("cent_id"),
                        F.col("embedding").alias("cent_vec")))
    assert cents.count() > sim.IVF_INLINE_MAX_CENTROIDS
    got = {r["vec_id"]: r["cell"]
           for r in sim.ivf_assign(emb, cents).collect()}

    # numpy ground truth with the same rounding
    cp = cents.orderBy("cent_id").toPandas()
    ep = emb.toPandas()
    C = np.stack(cp["cent_vec"].map(np.asarray)).astype(np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    for r in ep.itertuples():
        v = np.asarray(r.embedding, dtype=np.float64)
        cos = np.round(Cn @ (v / np.linalg.norm(v)), 6)
        want = int(cp["cent_id"].iloc[int(np.argmax(cos))])  # first max
        assert got[r.vec_id] == want, (r.vec_id, got[r.vec_id], want)

    # inline path (forced) agrees
    old = sim.IVF_INLINE_MAX_CENTROIDS
    sim.IVF_INLINE_MAX_CENTROIDS = 10_000
    try:
        inline = {r["vec_id"]: r["cell"]
                  for r in sim.ivf_assign(emb, cents).collect()}
    finally:
        sim.IVF_INLINE_MAX_CENTROIDS = old
    assert inline == got


def test_topk_skew_safe_rejects_colliding_columns(spark):
    import pyspark.sql.functions as F

    from xagg_spark.operators.similarity import _topk_skew_safe

    df = spark.createDataFrame(pd.DataFrame(
        {"g": [1], "x": [1.0], "_pid": [9]}))
    with pytest.raises(ValueError, match="_pid"):
        _topk_skew_safe(df, "g", [F.desc("x")], 1)


def test_warn_partial_nan_rejects_missing_dim(spark):
    from xagg_spark.operators.subset import warn_if_partial_nan

    df = spark.createDataFrame(pd.DataFrame(
        {"pix_idx": [0], "var": ["v"], "t": [0], "value": [1.0]}))
    with pytest.raises(ValueError, match="time"):
        warn_if_partial_nan(df, dims=("time",))


def test_ivf_assign_join_path_edge_cases(spark):
    """Join-path hardening: duplicate corpus rows survive (row multiplicity
    preserved), a NULL-element centroid can never win the argmin, and
    colliding column names raise up front."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import (ArrayType, FloatType, LongType,
                                   StructField, StructType)

    from xagg_spark.operators import similarity as sim

    sch = StructType([StructField("vec_id", LongType()),
                      StructField("embedding", ArrayType(FloatType()))])
    csch = StructType([StructField("cent_id", LongType()),
                       StructField("cent_vec", ArrayType(FloatType()))])
    corpus = spark.createDataFrame(
        [(5, [1.0, 0.0]), (5, [1.0, 0.0]), (7, [0.0, 1.0])], schema=sch)
    # 70 centroids (> inline max): cents 0 and 1 are both exact matches
    # for [1,0] (tie -> smallest id 0); cent 40 has a NULL element
    rows = [(int(i), [float(np.cos(i / 7.0)), float(np.sin(i / 7.0))])
            for i in range(70)]
    rows[40] = (40, [None, 1.0])
    rows[1] = (1, [1.0, 0.0])
    cents = spark.createDataFrame(rows, schema=csch)

    out = sim.ivf_assign(corpus, cents).toPandas()
    assert len(out) == 3                         # duplicate row preserved
    assert (out[out.vec_id == 5]["cell"] == 0).all()   # tie -> smallest id
    assert (out["cell"] != 40).all()             # broken centroid never wins

    with pytest.raises(ValueError, match="_negcos"):
        sim.ivf_assign(corpus.withColumn("_negcos", F.lit(1.0)), cents)
    with pytest.raises(ValueError, match="cell"):
        sim.ivf_assign(corpus.withColumn("cell", F.lit(0)), cents)


def test_ngram_jaccard_stop_gram_cut(spark):
    """max_doc_freq drops ubiquitous grams from intersection AND sizes
    consistently (Jaccard over the informative-gram subsets)."""
    from xagg_spark.operators.dedup import ngram_jaccard_pairs

    # 'zzz' (gram 'zzz' with n=3 context) appears in all 3 docs
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["zzzabc", "zzzabd", "zzzxyz"]}))
    exact = ngram_jaccard_pairs(df, "text", "doc_id", n=3).toPandas()
    cut = ngram_jaccard_pairs(df, "text", "doc_id", n=3,
                              max_doc_freq=2).toPandas()
    # exact: doc0 grams {zzz,zza,zab,abc}, doc1 {zzz,zza,zab,abd}:
    # inter 3 / union 5 = 0.6
    e01 = exact[(exact.id_a == 0) & (exact.id_b == 1)].jaccard.iloc[0]
    assert np.isclose(e01, 0.6)
    # with max_doc_freq=2 the all-docs grams zzz (df=3) drop; zza/zab have
    # df=2 and stay: doc0 {zza,zab,abc}, doc1 {zza,zab,abd}: 2/4 = 0.5
    c01 = cut[(cut.id_a == 0) & (cut.id_b == 1)].jaccard.iloc[0]
    assert np.isclose(c01, 0.5)
    # pair (0,2) shared only the dropped ubiquitous grams -> disappears
    assert len(cut[(cut.id_a == 0) & (cut.id_b == 2)]) == 0


def test_ivf_assign_degenerate_rows_same_on_both_paths(spark):
    """ADVICE r3: a zero-norm (NULL cosine) or NaN-producing corpus vector
    must be assigned IDENTICALLY by the inline (<=64 centroids) and the
    broadcast-join paths — one degenerate-input rule for both."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                   StructField, StructType)

    from xagg_spark.operators import similarity as sim

    sch = StructType([StructField("vec_id", LongType()),
                      StructField("embedding", ArrayType(DoubleType()))])
    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]),            # normal row
         (1, [0.0, 0.0]),            # zero norm -> NULL cosine (x/0 -> NULL)
         (2, [None, 1.0]),           # null element -> NULL cosine
         (3, [0.6, 0.8])], schema=sch)
    cents = spark.createDataFrame(
        [(7, [0.0, 1.0]), (3, [1.0, 0.0]), (5, [0.7, 0.7])], schema=sch) \
        .select(F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cent_vec"))

    inline = {r["vec_id"]: r["cell"]
              for r in sim.ivf_assign(corpus, cents).collect()}
    old = sim.IVF_INLINE_MAX_CENTROIDS
    sim.IVF_INLINE_MAX_CENTROIDS = 0          # force the join path
    try:
        joined = {r["vec_id"]: r["cell"]
                  for r in sim.ivf_assign(corpus, cents).collect()}
    finally:
        sim.IVF_INLINE_MAX_CENTROIDS = old
    assert inline == joined
    # normal rows assigned by cosine; degenerate rows -> smallest cent_id
    assert inline[0] == 3 and inline[3] == 5
    assert inline[1] == 3 and inline[2] == 3


def test_train_ivf_centroids_deterministic_across_parallelism(spark):
    """VERDICT r3 ask #6: the k-means trainer must learn BIT-IDENTICAL
    centroids (fixed-point integer M-step) and therefore identical
    assignments at different partitionings — and actually move the
    centroids off the seeds."""
    import pyspark.sql.functions as F

    from xagg_spark.operators import similarity as sim

    emb = (spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
                .filter(F.col("vec_id") < 400))
    c1 = sim.train_ivf_centroids(emb.repartition(1), k=8, n_iters=3).collect()
    c13 = sim.train_ivf_centroids(emb.repartition(13), k=8, n_iters=3).collect()
    v1 = {r["cent_id"]: list(r["cent_vec"]) for r in c1}
    v13 = {r["cent_id"]: list(r["cent_vec"]) for r in c13}
    assert v1 == v13                                  # bit-identical floats

    cdf = spark.createDataFrame(c1)
    a1 = {r["vec_id"]: r["cell"] for r in
          sim.ivf_assign(emb.repartition(3), cdf).collect()}
    a2 = {r["vec_id"]: r["cell"] for r in
          sim.ivf_assign(emb.repartition(17), cdf).collect()}
    assert a1 == a2
    # trained centroids differ from the raw seeds (k-means actually ran)
    seeds = (emb.withColumn("_h", F.xxhash64("vec_id"))
                .orderBy("_h", "vec_id").limit(8).collect())
    seed0 = [float(v) for v in seeds[0]["embedding"]]
    assert any(abs(a - b) > 1e-12 for a, b in zip(v1[0], seed0))
    # every cell is populated by its own centroid-count partition of data
    assert len(a1) == 400 and set(a1.values()) <= set(range(8))

    with pytest.raises(ValueError, match="exceeds"):
        sim.train_ivf_centroids(emb.filter("vec_id < 4"), k=8)
