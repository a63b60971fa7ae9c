"""Text-analysis operators for large-scale training-data pipelines.

All pure JVM-side column expressions (no Python UDFs): language-ID heuristic,
quality scoring, token counting, document fingerprinting.  Every function
returns a DataFrame and has an exact ANSI-SQL twin in driver_queries (the
DuckDB oracle), so results are engine-independent and deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# marker words per language for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": [" the ", " a ", " is "],
    "es": [" la ", " el ", " es "],
    "de": [" der ", " die ", " und "],
    "fr": [" le ", " les ", " est "],
}


def _count_occurrences(col, needle: str):
    """# of occurrences of `needle` via length arithmetic (exact, portable)."""
    n = len(needle)
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / n


def token_count(df: DataFrame, text_col: str = "text",
                out_col: str = "n_tokens") -> DataFrame:
    """Whitespace token count as pure length arithmetic (single-space
    separated corpora); exact and identical in any SQL engine."""
    c = F.col(text_col)
    return df.withColumn(
        out_col,
        F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
            (F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit("")))) + 1
        ).cast("long"))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simple quality features + composite score (rounded for stability):
    length, token count, mean token length, stopword ratio."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = (F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit("")))) + 1
    stop_hits = sum((_count_occurrences(c, m) for m in (" the ", " a ", " data ")),
                    F.lit(0.0))
    return (df
            .withColumn("n_chars_calc", n_chars.cast("long"))
            .withColumn("n_tokens", n_tokens.cast("long"))
            .withColumn("mean_token_len",
                        F.round((n_chars - n_tokens + 1) / n_tokens, 6))
            .withColumn("stop_ratio", F.round(stop_hits / n_tokens, 6))
            .withColumn("quality",
                        F.round(
                            F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.5
                            + F.least(F.lit(1.0), stop_hits / F.lit(5.0)) * 0.5, 6)))


def lang_id(df: DataFrame, text_col: str = "text",
            out_col: str = "lang_pred") -> DataFrame:
    """Marker-word language heuristic: argmax of per-language marker counts
    over a fixed alternative order (deterministic tie-break)."""
    c = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    scores = {lang: sum((_count_occurrences(c, m) for m in ms), F.lit(0.0))
              for lang, ms in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    # first language (in LANG_MARKERS order) with the maximal positive score:
    # lang wins iff score>0 and no earlier lang has >= score and no later
    # lang has > score.  Built as a CASE chain in declaration order, which
    # encodes the tie-break for free.
    expr = F.lit("und")
    for lang in reversed(langs):
        later = langs[langs.index(lang) + 1:]
        cond = scores[lang] > 0
        for other in later:
            cond = cond & (scores[other] <= scores[lang])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return df.withColumn(out_col, expr)


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fp") -> DataFrame:
    """64-bit-ish content fingerprint: md5 prefix of the lowercased first
    64 chars, as int (matches the SQL oracle's hex cast)."""
    key = F.lower(F.substring(F.col(text_col), 1, 64))
    return df.withColumn(
        out_col, F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long"))


# (name, regex, replacement) — applied in order; patterns restricted to a
# dialect subset identical in Java regex (Spark) and RE2 (DuckDB): no
# backrefs, no lookaround, explicit character classes only
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
     "<EMAIL>"),
    ("ssn", r"[0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9][0-9][0-9]", "<SSN>"),
    ("phone", r"[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]",
     "<PHONE>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
]


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Masks common PII shapes (emails, SSNs, phone numbers, IPv4) with
    typed placeholder tokens — the standard scrub pass before a corpus
    ships to training.  Pure JVM regexp_replace chain (replace-all), no
    Python; ordering matters (SSN before the 3-3-4 phone shape) and is
    fixed by PII_PATTERNS.  Adds `out_col` plus `n_redacted_chars` (net
    chars removed; negative when a placeholder outgrows its match)."""
    if out_col == text_col:
        raise ValueError("out_col must differ from text_col "
                         "(n_redacted_chars compares both)")
    c = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return (df.withColumn(out_col, c)
              .withColumn("n_redacted_chars",
                          (F.length(text_col) - F.length(out_col)
                           ).cast("long")))


def repetition_ratio(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Intra-document repetition signal (Gopher-style quality rule): the
    fraction of a document's character n-grams that are repeats,
    1 - distinct/total.  Boilerplate and looping generations score high.
    One explode + per-doc aggregate — map-side combinable, no joins.
    Returns (id_col, n_grams, n_distinct, rep_ratio)."""
    from .dedup import _shingles
    grams = df.select(F.col(id_col),
                      F.explode(_shingles(text_col, n)).alias("g"))
    return (grams.groupBy(id_col)
                 .agg(F.count(F.lit(1)).alias("n_grams"),
                      F.countDistinct("g").alias("n_distinct"))
                 .withColumn("rep_ratio",
                             F.round(1 - F.col("n_distinct")
                                     / F.col("n_grams"), 6)))


def remove_frequent_units(df: DataFrame, min_doc_count: int,
                          text_col: str = "text", id_col: str = "doc_id",
                          delim: str = " ") -> DataFrame:
    """Corpus-level boilerplate removal (CCNet-style line dedup, applied
    at unit = `delim`-separated token): a unit is boilerplate iff it
    occurs in >= min_doc_count DISTINCT documents; every occurrence is
    struck from every document, remaining units re-joined in original
    order.  With delim='\\n' this is the classic cross-document duplicated
    -line scrub; with delim=' ' it is document-frequency stopword removal.

    Plan (100 TB shape): posexplode units -> distinct (unit, doc) ->
    count = document frequency -> left-anti join against the boilerplate
    set -> one groupBy(doc) re-assembles with an in-memory
    array_sort(struct(pos, unit)) — order restored without a window, so
    the only wide stages are the df-count aggregate and the final
    re-assembly shuffle.  No Python UDFs anywhere.  The anti-join is NOT
    hint-forced to broadcast: at realistic thresholds the boilerplate set
    is tiny and AQE converts the join to broadcast from its measured
    size, but a low min_doc_count on a big corpus makes the set most of
    the vocabulary — size-based planning must stay in charge or the
    forced broadcast OOMs.

    Returns (id_col, clean_text, n_kept, n_removed); documents whose
    every unit is boilerplate come back with clean_text = ''.
    """
    if min_doc_count < 2:
        raise ValueError("min_doc_count must be >= 2 "
                         "(1 would strike every unit)")
    import re as _re
    units = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(delim)))
         .alias("pos", "u"))
    freq = (units.select(id_col, "u").distinct()
                 .groupBy("u").agg(F.count(F.lit(1)).alias("df")))
    boiler = freq.filter(F.col("df") >= min_doc_count).select("u")
    kept = units.join(boiler, "u", "left_anti")
    rebuilt = (kept.groupBy(id_col)
                   .agg(F.array_join(
                            F.transform(
                                F.array_sort(F.collect_list(
                                    F.struct("pos", "u"))),
                                lambda s: s["u"]),
                            delim).alias("clean_text"),
                        F.count(F.lit(1)).alias("n_kept")))
    base = df.select(id_col, F.size(F.split(F.col(text_col),
                                            _re.escape(delim)))
                     .cast("long").alias("_n_units"))
    return (base.join(rebuilt, id_col, "left")
                .select(F.col(id_col),
                        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                        F.coalesce(F.col("n_kept"), F.lit(0))
                         .cast("long").alias("n_kept"),
                        (F.col("_n_units")
                         - F.coalesce(F.col("n_kept"), F.lit(0)))
                        .cast("long").alias("n_removed")))


def ngram_topk(df: DataFrame, n: int = 2, k: int = 5,
               by: str = "lang", text_col: str = "text") -> DataFrame:
    """Top-k word n-grams per group by corpus count — the corpus-statistics
    pass (vocabulary audit, contamination screening, boilerplate survey)
    over a whitespace-tokenized corpus.  Word n-grams are built JVM-side
    (split -> transform(sequence) -> slice/array_join -> explode; no
    Python); counting is one map-side-combinable hash aggregate; ranking
    reuses the skew-safe two-phase top-k so a dominant group (one language
    = most of the corpus) cannot concentrate in a single task.
    Deterministic tie-break: higher count first, then n-gram string asc.
    Returns (by, rank, ngram, n_occurrences).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    from .similarity import _topk_skew_safe
    arr = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(arr) - n),
        lambda i: F.array_join(F.slice(arr, i + 1, n), " "))
    exploded = (df.filter(F.size(arr) >= n)
                  .select(F.col(by), F.explode(grams).alias("ngram")))
    counts = (exploded.groupBy(by, "ngram")
                      .agg(F.count(F.lit(1)).alias("n_occurrences")))
    top = _topk_skew_safe(counts, by,
                          [F.desc("n_occurrences"), F.col("ngram").asc()], k)
    return top.select(by, "rank", "ngram", "n_occurrences")


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", size: int = 256,
                    overlap: int = 32) -> DataFrame:
    """Split each document into fixed-size character windows with
    `overlap` shared chars between neighbors — the context-chunking
    step ahead of tokenize/pack.  stride = size - overlap; chunk i
    covers [i*stride, i*stride + size); every doc emits >= 1 chunk
    (empty docs one empty chunk).  Chunk count uses INTEGER arithmetic
    (`div`), not float ceil — bit-portable to any engine and safe past
    2^53 chars.  Pure JVM sequence/explode + substring: no Python, no
    shuffle, output scales by ~len/stride.
    Returns (id_col, chunk_idx, chunk_start, chunk_text)."""
    if size <= 0:
        raise ValueError("size must be positive")
    if not (0 <= overlap < size):
        raise ValueError("overlap must satisfy 0 <= overlap < size")
    stride = size - overlap
    n = F.greatest(
        F.expr(f"(length({text_col}) - {overlap} - 1) div {stride}")
        + F.lit(1), F.lit(1)).cast("int")
    out = df.select(
        F.col(id_col), F.col(text_col).alias("_t"),
        F.explode(F.sequence(F.lit(0), n - 1)).alias("chunk_idx"))
    return (out.withColumn("chunk_start",
                           (F.col("chunk_idx") * stride).cast("long"))
               .withColumn("chunk_text",
                           F.expr(f"substring(_t, chunk_idx * {stride} + 1, "
                                  f"{size})"))
               .drop("_t"))
