"""Model inference at scale: a fastText-style hashed bag-of-words
linear classifier scoring every document of a corpus — the "quality
classifier" stage of a web-text training pipeline (CCNet / GPT-3 /
LLaMA-style Wikipedia-vs-crawl filters). The reference repo has no
model surface (its classification is the scalar IP rule,
``modules/classify_ip.py:101-139``); this module is part of the added
training-data family.

Dataflow (all Catalyst, no Python):

1. tokenize: ``split(text, ' ')`` (map-side),
2. feature-hash each token to one of ``n_buckets`` buckets via the
   first two hex chars of ``md5(token)`` — the deterministic,
   engine-portable twin of fastText's FNV feature hashing,
3. **broadcast-join the weight table** (``n_buckets`` rows — a real
   model's weight vector, always corpus-dwarfed; at 100 TB this is THE
   pattern: the model rides the closure/broadcast, the corpus never
   moves),
4. partial-aggregated ``groupBy(doc)`` sum of matched weights,
5. sigmoid → score, threshold → keep/drop label.

One shuffle total (the per-doc sum; the join is broadcast). The
exploded (doc, token) stream never materializes wider than
(id, bucket) — project before the join so the scan prunes ``text``
out of the shuffle.

Weights here are a deterministic fixture (seeded affine formula over
the bucket index) so the oracle can restate them as a ``range()``
CTE; swapping in trained weights is loading a different 256-row table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 256
_W_MUL = 37
_W_ADD = 11
_W_MOD = 101


def hashed_weights(spark: SparkSession, n_buckets: int = N_BUCKETS) -> DataFrame:
    """The fixture weight vector: ``bucket`` (2 lowercase hex chars) →
    ``w = ((i*37 + 11) % 101)/101 - 0.5``. Exact-rational inputs keep
    both engines' doubles bit-identical (:data:`WEIGHTS_SQL` twin)."""
    i = F.col("id")
    return spark.range(n_buckets).select(
        F.lpad(F.lower(F.hex(i)), 2, "0").alias("bucket"),
        (((i * _W_MUL + _W_ADD) % _W_MOD).cast("double") / _W_MOD - 0.5).alias("w"),
    )


WEIGHTS_SQL = f"""
    SELECT lpad(lower(to_hex(i)), 2, '0') AS bucket,
           ((i * {_W_MUL} + {_W_ADD}) % {_W_MOD})::DOUBLE / {_W_MOD} - 0.5 AS w
    FROM range({N_BUCKETS}) t(i)
"""


def token_bucket(token: Column) -> Column:
    """First two lowercase hex chars of ``md5(token)`` — 256 buckets.
    DuckDB twin: ``substr(md5(tok), 1, 2)``."""
    return F.substring(F.md5(token.cast("binary")), 1, 2)


def score_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    threshold: float = 0.6,
) -> DataFrame:
    """Score every document: ``score = round(sigmoid(Σ w[bucket(tok)]),
    6)``, ``label = keep if score > threshold``. Repeated tokens count
    each occurrence (bag, not set) — fastText semantics.

    The threshold compares the ROUNDED score so the keep/drop decision
    is made on the exact value both engines agree on (the raw sigmoid
    differs across engines in the last ulp from summation order).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    scored = (
        toks.select(id_col, token_bucket(F.col("tok")).alias("bucket"))
        .join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.round(1.0 / (1.0 + F.exp(-F.sum("w"))), 6).alias("score"))
    )
    return scored.select(
        id_col,
        "score",
        F.when(F.col("score") > threshold, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("label"),
    )
