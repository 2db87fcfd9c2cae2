"""Count-min sketch (Cormode & Muthukrishnan '05) — sublinear-memory
frequency estimation over a token stream, the classic heavy-hitter /
frequency sketch of a web-scale ingest pipeline.

The reference repo has no sketch surface (its only aggregate is a
groupBy count); this belongs to the added training-data family: at
100 TB the exact vocabulary census (t7/t10) is a full shuffle of the
token stream, while the sketch is a FIXED d×width table — the shuffle
carries at most d·width distinct keys after map-side combine, no matter
the corpus (the reduce side is O(sketch), not O(vocabulary)).

Determinism/portability: row ``r``'s bucket for token ``t`` is the
first 4 hex chars of ``md5('r:t')`` as an integer, mod ``width`` —
restated verbatim in DuckDB with ``strpos``/``substr`` arithmetic
(same trick as ``sampling._hex2int``), so the sketch table and every
estimate are engine-exact, not just approximately equal.

Estimate guarantee: ``est(t) = min_r sketch[r][bucket_r(t)] >=
true(t)`` always (one-sided error); ``est - true <= 2N/width`` with
probability ``1 - 2^-d``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def _bucket(row: int, tok: Column, width: int) -> Column:
    """First 4 hex chars of ``md5('{row}:' || tok)`` as int, mod width."""
    key = F.md5(F.concat(F.lit(f"{row}:"), tok).cast("binary"))
    acc = F.lit(0)
    for i in range(1, 5):
        acc = acc * 16 + (F.instr(F.lit(_HEX), F.substring(key, i, 1)) - 1)
    return (acc % width).cast("long")


def _bucket_sql(row: int, tok_expr: str, width: int) -> str:
    key = f"md5('{row}:' || {tok_expr})"
    terms = " + ".join(
        f"(strpos('{_HEX}', substr({key}, {i}, 1)) - 1) * {16 ** (4 - i)}"
        for i in range(1, 5)
    )
    return f"(({terms}) % {width})"


def cms_build(
    df: DataFrame, text_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the d×width sketch: ``(row, bucket, cnt)``. One shuffle of
    (depth × tokens) rows that map-side-combines down to ≤ depth·width
    keys per partition — the reducer never sees the vocabulary."""
    toks = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).where(F.col("tok") != "")
    hashed = toks.select(
        F.posexplode(
            F.array(*[_bucket(r, F.col("tok"), width) for r in range(depth)])
        ).alias("row", "bucket")
    )
    return hashed.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    term_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each probe term: ``est = min_r
    sketch[r][bucket_r(term)]``. The sketch is depth×width rows —
    always broadcast-sized by construction (that is the point of the
    sketch); the probe side joins it without moving."""
    pb = probes.select(
        F.col(term_col),
        F.posexplode(
            F.array(*[_bucket(r, F.col(term_col), width) for r in range(depth)])
        ).alias("row", "bucket"),
    )
    return (
        pb.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_sql(
    table: str,
    text_expr: str,
    probe_values: list[str],
    depth: int = 4,
    width: int = 1024,
) -> str:
    """DuckDB twin: SELECTs ``(term, est, exact)`` for the probe terms —
    the sketch estimate alongside the true count, both from the same
    token stream."""
    probes = ", ".join(f"('{t}')" for t in probe_values)
    rows = ", ".join(f"({r})" for r in range(depth))
    return f"""
    WITH _cms_toks AS (
      SELECT unnest(string_split({text_expr}, ' ')) AS tok FROM {table}
    ),
    _cms_t AS (SELECT tok FROM _cms_toks WHERE tok <> ''),
    _cms_sketch AS (
      SELECT r.row, CASE r.row
               {' '.join(f"WHEN {r} THEN {_bucket_sql(r, 'tok', width)}" for r in range(depth))}
             END AS bucket,
             count(*) AS cnt
      FROM _cms_t, (VALUES {rows}) r(row)
      GROUP BY 1, 2
    ),
    _cms_probe AS (
      SELECT p.term, r.row, CASE r.row
               {' '.join(f"WHEN {r} THEN {_bucket_sql(r, 'term', width)}" for r in range(depth))}
             END AS bucket
      FROM (VALUES {probes}) p(term), (VALUES {rows}) r(row)
    ),
    _cms_est AS (
      SELECT p.term, min(coalesce(s.cnt, 0))::BIGINT AS est
      FROM _cms_probe p LEFT JOIN _cms_sketch s USING (row, bucket)
      GROUP BY 1
    ),
    _cms_exact AS (
      SELECT p.term,
             (SELECT count(*) FROM _cms_t WHERE tok = p.term)::BIGINT AS exact
      FROM (VALUES {probes}) p(term)
    )
    SELECT e.term, e.est, x.exact
    FROM _cms_est e JOIN _cms_exact x USING (term)
    """
