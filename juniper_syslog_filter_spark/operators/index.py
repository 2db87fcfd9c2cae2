"""Inverted-index build — posting lists over a distributed corpus.

The classic IR/batch-indexing operator: tokenize → distinct
``(term, doc)`` pairs → one partial+final aggregate keyed by term,
emitting the document frequency and the sorted posting list. On Spark
this is ONE shuffle (on ``term``) with map-side combine; the per-doc
``array_distinct`` happens inside the scan projection, so a term that
repeats inside a document never leaves its partition more than once.

Scale notes (100 TB): the posting list of a stop-word is unbounded —
exactly the skew that kills a collect_list on the full vocabulary.
The ``min_df``/``max_df`` band is therefore part of the operator, not
the query: ultra-high-df terms are dropped by a cheap pre-aggregated
count BEFORE the list aggregation (two-pass: df census first, then
postings only for in-band terms), so no reducer ever materializes a
stop-word's posting list. The df census is a pure count — tiny — and
the band join is a broadcast semi-join on the surviving vocabulary.

Postings are emitted as a comma-joined string of ascending doc ids —
an engine-portable, hash-stable representation of the sorted list
(the array form is ``array_sort(collect_list(...))`` right before the
join step).

Reference parity: the reference repo has no index surface; this
belongs to the added training-data family (document frequency t7 is
the census half; this operator materializes the postings half).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int,
    max_df: int,
) -> DataFrame:
    """Posting lists for every whitespace term whose document frequency
    lies in ``[min_df, max_df]``.

    Returns ``(term, df, postings)`` where ``postings`` is the
    comma-joined ascending list of ``id_col`` values containing the
    term. Two aggregations, both keyed on ``term``: the df census and
    the list build share one shuffle boundary (the census output is a
    semi-join filter on the same key, so AQE plans it as a broadcast).
    """
    pairs = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias(
            "term"
        ),
    )
    census = (
        pairs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= min_df) & (F.col("df") <= max_df))
    )
    postings = (
        pairs.join(census.select("term").hint("broadcast"), "term", "left_semi")
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("_doc")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return census.join(postings, "term").select("term", "df", "postings")


def top_ngrams_per_group(
    df: DataFrame,
    group_col: str,
    grams_col,
    k: int,
) -> DataFrame:
    """Top-``k`` most frequent n-grams per group (count desc, gram asc
    tie-break — a total order, so ranks are deterministic).

    ``grams_col`` is an ``array<string>`` Column (e.g.
    :func:`..functions.text.word_bigrams`). One shuffle for the
    ``(group, gram)`` count, one for the per-group window; the
    ``rk <= k`` predicate pushes into WindowGroupLimit, so each
    shuffle partition keeps only its top-k candidates before the
    final sort (no full per-group materialization).
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.col(group_col).alias("grp"), F.explode(grams_col).alias("gram"))
        .groupBy("grp", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("grp").orderBy(F.desc("n"), F.asc("gram"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(F.col("grp").alias(group_col), "gram", "n", "rk")
    )
