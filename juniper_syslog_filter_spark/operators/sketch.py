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


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al. '07)
# ---------------------------------------------------------------------------

# Scaling constant for the HLL estimator at 2^41 (the fixed-point scale
# of the register sum: rho <= 41, so every 2^(41-rho) term is an exact
# BIGINT and the register sum never sees float rounding).
_HLL_SCALE = 1 << 41


def _hll_check_m(m: int) -> None:
    """The register index is 12 hash bits (3 hex chars, 0..4095), so the
    sketch is uniform ONLY when ``m`` divides 4096 — any other m silently
    biases registers (m=2000 folds unevenly; m>4096 caps distinct
    registers at 4096). Enforced here rather than in a docstring."""
    if m <= 0 or m > 4096 or 4096 % m != 0:
        raise ValueError(
            f"HLL m={m} must be a positive divisor of 4096 (register "
            "index comes from 12 hash bits); use 16, 64, 256, 1024, 4096…"
        )


def _hll_register(key: Column, m: int) -> Column:
    """Register index from the first 3 hex chars (0..4095) mod ``m``
    (uniform whenever m divides 4096)."""
    acc = F.lit(0)
    for i in range(1, 4):
        acc = acc * 16 + (F.instr(F.lit(_HEX), F.substring(key, i, 1)) - 1)
    return (acc % m).cast("long")


def _hll_register_sql(key: str, m: int) -> str:
    terms = " + ".join(
        f"(strpos('{_HEX}', substr({key}, {i}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(1, 4)
    )
    return f"(({terms}) % {m})"


def _hll_rho(tail: Column) -> Column:
    """Leading-zero rank of the 40-bit suffix (hex chars 4..13): number
    of leading zero BITS + 1, computed with pure string/integer ops —
    no ``log2``/``pow`` floats (Spark's ``log2`` is ``ln(x)/ln(2)`` and
    NOT exact at powers of two, so a float formulation could disagree
    with the oracle at floor boundaries). ``4 × leading-'0'-hex-chars +
    zeros-inside-the-first-nonzero-nibble + 1``; all-zero tail → 41."""
    z = F.length(F.regexp_extract(tail, "^(0*)", 1))
    d = F.instr(F.lit(_HEX), tail.substr(z + 1, F.lit(1))) - 1
    nlz = (
        F.when(d >= 8, 0).when(d >= 4, 1).when(d >= 2, 2).otherwise(3)
    )
    return (
        F.when(z == 10, 41).otherwise(z * 4 + nlz + 1)
    ).cast("int")


def _hll_rho_sql(tail: str) -> str:
    z = f"length(regexp_extract({tail}, '^(0*)', 1))"
    d = f"(strpos('{_HEX}', substr({tail}, {z} + 1, 1)) - 1)"
    nlz = (
        f"(CASE WHEN {d} >= 8 THEN 0 WHEN {d} >= 4 THEN 1 "
        f"WHEN {d} >= 2 THEN 2 ELSE 3 END)"
    )
    return f"(CASE WHEN {z} = 10 THEN 41 ELSE {z} * 4 + {nlz} + 1 END)"


def _hll_est_fragment(m: int) -> str:
    """The estimator arithmetic as ONE SQL string evaluated verbatim by
    BOTH engines (Spark ``F.expr`` and DuckDB) over the aggregate row
    ``(hit, sum_scaled)`` — identical literals and operator order, so
    the IEEE-double intermediate is bit-identical and the rounded BIGINT
    estimate hash-matches. ``sum_scaled = Σ_j 2^(41-M_j)`` over ALL m
    registers (empty registers contribute 2^41), an exact integer;
    raw estimate ``alpha_m · m² · 2^41 / sum_scaled`` with the standard
    small-range linear-counting correction ``m·ln(m/V)``.

    Determinism envelope, made explicit: the ALPHA branch uses only
    ``*`` and ``/``, which IEEE 754 requires to be correctly rounded —
    bit-identical across engines unconditionally (including the branch
    PREDICATE, a comparison on a correctly-rounded quotient). The
    LINEAR-COUNTING branch uses ``ln``, which IEEE does NOT require to
    be correctly rounded; a 1-ULP divergence between JVM ``Math.log``
    and DuckDB's libm could flip the rounded BIGINT only when
    ``m·ln(m/V)`` sits within ~m ULPs of a .5 boundary. The integer
    register columns (``registers_hit``, ``sum_scaled``) remain the
    unconditionally exact-compared ground truth either way, and
    ``tests/test_new_ops.py::test_hl1_oracle_est_far_from_libm_boundary``
    pins, per oracle SF, that either the alpha branch fires (sf0.01,
    the driver's gate) or the lc value sits >= 1e-3 (~10^10 ULPs) from
    the nearest rounding boundary (sf0.001) — so the gate never rides
    on libm agreement (round-3 advice)."""
    alpha_raw = (
        f"0.7213 / (1.0 + 1.079 / {m}.0) * ({m}.0 * {m}.0) "
        f"* {float(_HLL_SCALE)} / sum_scaled"
    )
    lc = f"{m}.0 * ln({m}.0 / ({m} - hit))"
    return (
        f"CAST(round(CASE WHEN ({m} - hit) > 0 AND ({alpha_raw}) <= {2.5 * m} "
        f"THEN {lc} ELSE {alpha_raw} END) AS BIGINT)"
    )


def hll_build(df: DataFrame, value_col: str, m: int = 1024) -> DataFrame:
    """Build the m-register HLL sketch ``(register, mx)`` over a value
    column: ``key = md5('hll:' || v)``; register from the first 3 hex
    chars, rho from the next 10 (40 bits). ONE aggregate that map-side
    combines to ≤ m keys per partition — the reducer sees O(m) rows no
    matter the stream, where exact ``countDistinct`` shuffles every
    distinct value. Sketches MERGE by ``max`` per register, so daily /
    per-split sketches roll up without re-reading data — the
    cardinality census a 100-TB ingest keeps per partition."""
    _hll_check_m(m)
    key = F.md5(F.concat(F.lit("hll:"), F.col(value_col)).cast("binary"))
    tail = F.substring(key, 4, 10)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(
            _hll_register(key, m).alias("register"),
            _hll_rho(tail).alias("rho"),
        )
        .groupBy("register")
        .agg(F.max("rho").alias("mx"))
    )


def hll_estimate(sketch: DataFrame, m: int = 1024) -> DataFrame:
    """Collapse the sketch to one row ``(est_hll, registers_hit,
    sum_scaled)``. The register sum is kept as an exact 2^41-scaled
    BIGINT (``shiftleft``; rho ≤ 41 so every term is integral) and the
    float estimator runs through :func:`_hll_est_fragment`'s shared
    expression string, so the estimate is engine-exact — the sketch
    VALUES are oracle-checked, not just the estimate's ballpark.

    Empty-sketch edge: ``F.sum`` over zero rows is NULL, which would
    null the whole estimator — the register sum is coalesced to 0 so an
    empty sketch yields ``sum_scaled = m·2^41``, hit = 0, and the
    linear-counting branch returns ``m·ln(m/m) = 0``, the right answer
    for an empty stream."""
    _hll_check_m(m)
    agg = sketch.agg(
        F.count(F.lit(1)).alias("hit"),
        (
            F.coalesce(
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 41 - mx)")),
                F.lit(0).cast("long"),
            )
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(_HLL_SCALE)
        ).cast("long").alias("sum_scaled"),
    )
    return agg.select(
        F.expr(_hll_est_fragment(m)).alias("est_hll"),
        F.col("hit").cast("long").alias("registers_hit"),
        "sum_scaled",
    )


def hll_sql(values_select: str, m: int = 1024) -> str:
    """DuckDB twin of build+estimate: ``values_select`` is a full
    SELECT producing one column ``v``; emits ``(est_hll,
    registers_hit, sum_scaled)``."""
    _hll_check_m(m)
    key = "md5('hll:' || v)"
    return f"""
    WITH _hll_v AS ({values_select}),
    _hll_k AS (
      SELECT {key} AS key, substr({key}, 4, 10) AS tail
      FROM _hll_v WHERE v IS NOT NULL
    ),
    _hll_r AS (
      SELECT {_hll_register_sql('key', m)} AS register,
             {_hll_rho_sql('tail')} AS rho
      FROM _hll_k
    ),
    _hll_sk AS (SELECT register, max(rho) AS mx FROM _hll_r GROUP BY 1),
    _hll_agg AS (
      SELECT count(*) AS hit,
             CAST(coalesce(sum(1::BIGINT << (41 - mx)), 0) AS BIGINT)
               + ({m} - count(*)) * {_HLL_SCALE} AS sum_scaled
      FROM _hll_sk
    )
    SELECT {_hll_est_fragment(m)} AS est_hll,
           CAST(hit AS BIGINT) AS registers_hit,
           CAST(sum_scaled AS BIGINT) AS sum_scaled
    FROM _hll_agg
    """


# ---------------------------------------------------------------------------
# Bloom filter (Bloom '70) — membership sketch for broadcast pruning
# ---------------------------------------------------------------------------


def _bloom_pos(i: int, v: Column, m_bits: int) -> Column:
    """Bit position ``i`` for value ``v``: first 4 hex chars of
    ``md5('{i}#' || v)`` as int, mod ``m_bits`` (same engine-portable
    string arithmetic as the CMS buckets)."""
    key = F.md5(F.concat(F.lit(f"{i}#"), v).cast("binary"))
    acc = F.lit(0)
    for c in range(1, 5):
        acc = acc * 16 + (F.instr(F.lit(_HEX), F.substring(key, c, 1)) - 1)
    return (acc % m_bits).cast("long")


def _bloom_pos_sql(i: int, v_expr: str, m_bits: int) -> str:
    key = f"md5('{i}#' || {v_expr})"
    terms = " + ".join(
        f"(strpos('{_HEX}', substr({key}, {c}, 1)) - 1) * {16 ** (4 - c)}"
        for c in range(1, 5)
    )
    return f"(({terms}) % {m_bits})"


def bloom_build(
    df: DataFrame, value_col: str, m_bits: int = 8192, k: int = 4
) -> DataFrame:
    """Build the filter as its SET BIT POSITIONS ``(pos)`` — ≤ m_bits
    rows regardless of the keyed set's size (the relational form of the
    bit array; a real deployment ORs the positions into a bitmap UDAF,
    but the distinct-positions table is the same information and joins
    the same way). One aggregate with map-side combine to ≤ m_bits keys
    per partition. False-positive rate ≈ (1 - e^(-kn/m))^k — size
    ``m_bits ≥ ~10n`` for ~1% at k=4."""
    pos = df.where(F.col(value_col).isNotNull()).select(
        F.explode(
            F.array(
                *[_bloom_pos(i, F.col(value_col), m_bits) for i in range(k)]
            )
        ).alias("pos")
    )
    return pos.distinct()


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    value_col: str,
    m_bits: int = 8192,
    k: int = 4,
) -> DataFrame:
    """Membership test, map-side: the filter collapses to ONE row
    holding its set-bit array (≤ m_bits ints — broadcastable by
    construction, that is the point), and every probe row computes its
    k positions and tests them with ``forall``/``array_contains`` in
    the scan stage — the probe side NEVER shuffles and keeps all its
    columns. Exactly the shape of a 100-TB decontamination pre-pass:
    only bloom-candidate rows reach the expensive exact anti-join. No
    false negatives (a keyed value always hits); false positives ≈
    (1 - e^(-kn/m))^k are resolved by the exact verify that follows.

    Returns ``probes`` + ``bloom_hit`` (boolean). A NULL probe value is
    pinned to ``bloom_hit = false`` (NULL is never a member — matching
    :func:`bloom_build`, which drops NULL keys), not SQL's three-valued
    NULL, so probe semantics agree across engines on nullable columns."""
    bits = bloom.agg(F.collect_set("pos").alias("_bits"))
    pos_arr = F.array(
        *[_bloom_pos(i, F.col(value_col), m_bits) for i in range(k)]
    )
    return (
        probes.crossJoin(F.broadcast(bits))
        .withColumn(
            "bloom_hit",
            F.coalesce(
                F.forall(
                    pos_arr, lambda p: F.array_contains(F.col("_bits"), p)
                ),
                F.lit(False),
            ),
        )
        .drop("_bits")
    )


def bloom_sql(
    keyed_select: str,
    probe_select: str,
    probe_cols: list[str],
    value_expr: str,
    m_bits: int = 8192,
    k: int = 4,
) -> str:
    """DuckDB twin of build+probe: ``keyed_select`` yields one column
    ``v`` (the keyed set); ``probe_select`` yields ``probe_cols`` plus
    whatever ``value_expr`` reads. Emits ``probe_cols + (bloom_hit)``
    — per probe ROW, like the Spark map-side form. ``bloom_hit`` is
    COALESCEd to FALSE so a NULL probe value reads "not a member",
    pinning the same semantics as :func:`bloom_probe`."""
    set_pos = " UNION ".join(
        f"SELECT {_bloom_pos_sql(i, 'v', m_bits)} AS pos FROM _bl_keyed"
        for i in range(k)
    )
    hit = " AND ".join(
        f"({_bloom_pos_sql(i, value_expr, m_bits)} IN (SELECT pos FROM _bl_bits))"
        for i in range(k)
    )
    cols = ", ".join(probe_cols)
    return f"""
    WITH _bl_keyed AS ({keyed_select}),
    _bl_bits AS ({set_pos}),
    _bl_probe AS ({probe_select})
    SELECT {cols}, COALESCE(({hit}), FALSE) AS bloom_hit
    FROM _bl_probe
    """
