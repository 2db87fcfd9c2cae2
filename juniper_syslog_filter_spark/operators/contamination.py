"""Benchmark n-gram contamination check — flag corpus documents that
share verbatim word n-grams with an evaluation/benchmark set.

A training-data pipeline must exclude documents that leak benchmark
text (the standard decontamination step: exact word-n-gram overlap, as
in GPT-3 appendix C / PaLM / Llama data cards; 8–13 grams on real text).
The reference repo has no such surface (bounded syslog archives); this
operator joins the added training-data family (dedup/ANN/sampling).

Dataflow and 100-TB design:

* The benchmark side is SMALL by construction (an eval suite is a few
  thousand documents) → its distinct gram set is **broadcast**; the
  corpus side streams map-side through the hash join — no shuffle of
  corpus grams at all.
* Grams are deduplicated per document BEFORE the join
  (``select(id, gram).distinct()``), so a pathological page repeating
  one benchmark sentence a million times costs one row, and
  ``n_shared`` counts distinct shared grams.
* If the suite ever outgrows the broadcast threshold, the same shape
  degrades gracefully: replace the broadcast with a Bloom filter over
  ``xxhash64(gram)`` built from the benchmark side (map-side prefilter,
  exact verify join after) — noted here, not needed at suite sizes.

Gram construction is expression-only (split → sequence → slice →
array_join), restatable in ANSI SQL, so the whole operator is
oracle-checkable value-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngram_array(text_col: Column, n: int) -> Column:
    """Array of overlapping word ``n``-grams (space-tokenized, joined
    back with single spaces). Documents with fewer than ``n`` words
    yield an empty array.

    The inner ``sequence`` upper bound is clamped to ≥1 so ``slice``
    never sees a non-positive start (Spark raises on start=0 even in a
    dead ``when`` branch — both branches of ``when`` are evaluated)."""
    ws = F.split(text_col, " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(ws) - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(ws, i, n), " "))
    return F.when(F.size(ws) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Documents in ``corpus`` sharing at least one word ``n``-gram with
    any ``benchmark`` document → ``(id_col, n_shared)`` where
    ``n_shared`` is the count of DISTINCT shared grams."""
    grams = word_ngram_array(F.col(text_col), n)
    bench_grams = (
        benchmark.select(F.explode(grams).alias("gram")).distinct()
    )
    doc_grams = (
        corpus.select(F.col(id_col), F.explode(grams).alias("gram")).distinct()
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
