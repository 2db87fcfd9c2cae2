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


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """BM25 (Robertson/Walker Okapi) ranked retrieval for a fixed query
    term set — the ranking half of the index family (iv1 builds the
    postings; this scores against them analytically).

    Scale shape: with the query terms known, per-doc ``tf_t`` is a
    map-side ``size(filter(split(text)))`` per term — the corpus is
    scanned ONCE with zero shuffle; the only aggregate is the
    single-row global stats tuple (N, avgdl, df per term), which rides
    back on a broadcast crossJoin. No (doc, term) explode, no posting
    materialization — at 100 TB this is a scan + one tiny agg, and the
    final ``TakeOrderedAndProject`` keeps top-k per partition before
    the driver merge. (The iv1 posting-list route answers the same
    query by seeking instead of scanning; this form is the one you use
    when the query set is fixed and the corpus pass is already paid,
    e.g. relevance-labeling a training corpus against a probe set.)

    Determinism: all scoring inputs (tf, df, N, dl, avgdl) are
    integer-exact in both engines (avg of ints = exact long sum /
    count); the score is a fixed-order expression fold over the terms,
    so cross-engine drift is bounded to the ``ln`` ulp and absorbed by
    ``round(6)``. Ordering is (rounded score desc, id asc) — total, so
    the top-k SET is engine-stable. Docs matching no term are dropped
    (score 0 rows are not ranked).
    """
    toks = F.split(F.col(text_col), " ")

    def _match(term):  # HOF lambdas must be unary — no default-arg capture
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(toks, _match(t))).cast("double").alias(f"_tf_{i}")
        for i, t in enumerate(terms)
    ]
    base = df.select(
        F.col(id_col), F.size(toks).cast("double").alias("_dl"), *tf_cols
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long"))
            .cast("double")
            .alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    norm = k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            (F.col("_n") - F.col(f"_df_{i}") + 0.5) / (F.col(f"_df_{i}") + 0.5)
            + 1.0
        )
        score = score + idf * F.col(f"_tf_{i}") * (k1 + 1) / (
            F.col(f"_tf_{i}") + norm
        )
    out = scored.select(F.col(id_col), F.round(score, 6).alias("score"))
    return (
        out.where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )


def bm25_sql(
    table: str,
    id_expr: str,
    text_expr: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> str:
    """DuckDB twin of :func:`bm25_scores` (same fixed-order fold)."""
    tfs = [
        f"len(list_filter(string_split({text_expr}, ' '), x -> x = '{t}'))"
        f"::DOUBLE AS _tf_{i}"
        for i, t in enumerate(terms)
    ]
    dfs = [
        f"sum(CASE WHEN _tf_{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS _df_{i}"
        for i in range(len(terms))
    ]
    parts = [
        f"ln((_n - _df_{i} + 0.5) / (_df_{i} + 0.5) + 1.0)"
        f" * _tf_{i} * {k1 + 1} / (_tf_{i} + {k1} * (1 - {b} + {b} * _dl / _avgdl))"
        for i in range(len(terms))
    ]
    return f"""
    WITH _bm_base AS (
      SELECT {id_expr} AS _id,
             len(string_split({text_expr}, ' '))::DOUBLE AS _dl,
             {', '.join(tfs)}
      FROM {table}
    ),
    _bm_stats AS (
      SELECT count(*)::DOUBLE AS _n, avg(_dl) AS _avgdl, {', '.join(dfs)}
      FROM _bm_base
    ),
    _bm_scored AS (
      SELECT _id, round(0.0 + {' + '.join(parts)}, 6) AS score
      FROM _bm_base, _bm_stats
    )
    SELECT _id, score FROM _bm_scored
    WHERE score > 0 ORDER BY score DESC, _id LIMIT {top_k}
    """


def bpe_merge_step(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One BPE vocabulary-induction iteration (Sennrich et al. ACL'16,
    at word granularity): find the corpus-wide most frequent adjacent
    token pair, then merge its occurrences into a single token
    (``"w1 w2"`` → ``"w1_w2"``) across every document. A tokenizer
    trainer runs this loop to a target vocab size; one iteration is the
    distributed primitive.

    Dataflow: bigram census (ONE shuffle, map-side combined) → global
    argmax pair (count desc, pair asc — total order) as a 1-row
    broadcast → map-side literal ``replace`` over the corpus. The
    corpus never shuffles; per iteration the moving data is one string.

    Merge semantics: space-padded literal replace, left-to-right
    non-overlapping — IDENTICAL in Spark and DuckDB, which is the
    contract here. Note one divergence from paper-BPE: in a run like
    ``a b a b`` the second occurrence shares its leading space with the
    first match's consumed trailing space, so only the first merges per
    scan (paper-BPE merges both). A trainer loops the step anyway, so
    remaining occurrences merge on later iterations.

    Returns per-doc ``(id, pair, n_before, n_after)`` — ``n_before -
    n_after`` is the number of merges applied in the doc.
    """
    from ..functions.text import word_bigrams

    counts = (
        df.select(F.explode(word_bigrams(F.col(text_col))).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    best = counts.orderBy(F.desc("n"), F.asc("pair")).limit(1).select("pair")
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    pat = F.concat(F.lit(" "), F.col("pair"), F.lit(" "))
    repl = F.concat(
        F.lit(" "), F.replace(F.col("pair"), F.lit(" "), F.lit("_")), F.lit(" ")
    )
    merged = F.trim(F.replace(padded, pat, repl))
    return df.crossJoin(F.broadcast(best)).select(
        F.col(id_col),
        F.col("pair"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_before"),
        F.size(F.split(merged, " ")).cast("long").alias("n_after"),
    )


def bpe_merge_sql(table: str, id_expr: str, text_expr: str) -> str:
    """DuckDB twin of :func:`bpe_merge_step` (same argmax total order,
    same space-padded left-to-right literal replace)."""
    return f"""
    WITH _bpe_grams AS (
      SELECT unnest(list_transform(
               range(1, len(string_split({text_expr}, ' '))),
               i -> string_split({text_expr}, ' ')[i] || ' ' ||
                    string_split({text_expr}, ' ')[i + 1])) AS pair
      FROM {table}
    ),
    _bpe_best AS (
      SELECT pair FROM _bpe_grams
      GROUP BY pair ORDER BY count(*) DESC, pair LIMIT 1
    )
    SELECT {id_expr}, b.pair,
           len(string_split({text_expr}, ' '))::BIGINT AS n_before,
           len(string_split(trim(replace(' ' || {text_expr} || ' ',
               ' ' || b.pair || ' ',
               ' ' || replace(b.pair, ' ', '_') || ' ')), ' '))::BIGINT
             AS n_after
    FROM {table}, _bpe_best b
    """
