"""Deduplication operators for training-data pipelines.

Four families, all engine-portable (every primitive has an exact DuckDB
twin so the driver's oracle gate can verify values, not just shapes):

* exact dedup        — hash groupBy (driver query ``d1``)
* MinHash + LSH      — shingle → per-band min-hash → bucket self-join →
                       exact-Jaccard verify (classic banding scheme)
* SimHash            — per-bit majority vote over token hashes
* n-gram Jaccard     — blocked pairwise token/ngram set similarity

Portability rules:

* the hash everywhere is ``md5`` of a seed-prefixed string — identical
  hex in Spark and DuckDB, and hex strings min/compare identically, so
  min-hash signatures match across engines byte-for-byte;
* shingle/ngram ARRAYS never appear in outputs (element order differs
  between engines); only order-insensitive scalars derived from them do.

Scale notes (100 TB): signatures are computed in one narrow pass
(map-side); the only shuffle is the (band, bucket) self-join, whose
fan-out is bounded by bucket size — at web scale you additionally cap
bucket width (drop buckets with > ~1k members as spam clusters, see
``lsh_candidate_pairs(max_bucket)``), which also bounds skew. AQE
skew-join splitting stays on as backstop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Shingling
# ---------------------------------------------------------------------------


def char_shingles(col: Column, k: int = 8) -> Column:
    """Distinct character k-grams of ``col`` (shorter texts yield their
    whole text as the single shingle)."""
    n = F.greatest(F.lit(1), F.length(col) - (k - 1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(col, i, k))
    )


def char_shingles_sql(expr: str, k: int = 8) -> str:
    """DuckDB twin of :func:`char_shingles`."""
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(1, length({expr}) - {k - 1}) + 1), "
        f"i -> substr({expr}, i::INT, {k})))"
    )


def word_ngrams(col: Column, n: int = 2, sep: str = " ") -> Column:
    """Distinct word n-grams (space-joined) of a token list."""
    toks = F.split(col, sep)
    if n == 1:
        return F.array_distinct(toks)
    cnt = F.greatest(F.lit(1), F.size(toks) - (n - 1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def word_ngrams_sql(expr: str, n: int = 2, sep: str = " ") -> str:
    """DuckDB twin of :func:`word_ngrams`."""
    toks = f"string_split({expr}, '{sep}')"
    if n == 1:
        return f"list_distinct({toks})"
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(1, len({toks}) - {n - 1}) + 1), "
        f"i -> array_to_string(list_slice({toks}, i::INT, i::INT + {n - 1}), ' ')))"
    )


# ---------------------------------------------------------------------------
# Jaccard
# ---------------------------------------------------------------------------


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_distinct(F.concat(a, b)))
    return inter.cast("double") / union


def jaccard_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`jaccard`."""
    return (
        f"len(list_intersect({a}, {b}))::DOUBLE"
        f" / len(list_distinct(list_concat({a}, {b})))"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_for_band_row(shingles: Column, band: int, row: int) -> Column:
    """One min-hash value: min over shingles of md5 with a (band,row)
    seed prefix. Hex-string min == numeric min of the 128-bit hash, and
    is engine-identical."""
    seed = f"{band}:{row}:"
    return F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(F.lit(seed), s))))


def minhash_for_band_row_sql(shingles: str, band: int, row: int) -> str:
    return f"list_min(list_transform({shingles}, s -> md5('{band}:{row}:' || s)))"


def band_bucket(shingles: Column, band: int, rows_per_band: int) -> Column:
    """LSH bucket id for one band: md5 of the concatenated row minhashes."""
    sig = F.concat_ws(
        "|", *[minhash_for_band_row(shingles, band, r) for r in range(rows_per_band)]
    )
    return F.md5(sig)


def band_bucket_sql(shingles: str, band: int, rows_per_band: int) -> str:
    parts = ", ".join(
        minhash_for_band_row_sql(shingles, band, r) for r in range(rows_per_band)
    )
    return f"md5(concat_ws('|', {parts}))"


def minhash_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bands: int = 8,
    rows_per_band: int = 2,
    k: int = 8,
) -> DataFrame:
    """(id, band, bucket) — one row per (doc, band). One narrow pass."""
    sh = char_shingles(F.col(text_col), k)
    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_bucket(sh, b, rows_per_band).alias("bucket"))
            for b in range(n_bands)
        ]
    )
    return df.select(F.col(id_col).alias("id"), F.explode(bands).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def lsh_candidate_pairs(
    buckets: DataFrame, max_bucket: int | None = 1000
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any (band, bucket).

    ``max_bucket`` drops pathological buckets (boilerplate/spam clusters)
    — the standard web-scale guard that also bounds join skew: a bucket
    of size m yields m² pair rows, so one 10⁶-doc bucket would emit 10¹²
    rows without the cap.
    """
    if max_bucket is not None:
        sizes = buckets.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_n"))
        buckets = (
            buckets.join(sizes, ["band", "bucket"])
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n_bands: int = 8,
    rows_per_band: int = 2,
    k: int = 8,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates verified by exact Jaccard.

    Returns (id_a, id_b, jacc) with jacc ≥ threshold. The verify join
    re-attaches shingle arrays to both sides; at scale the shingle table
    is the same narrow projection both times, so the scan is shared.
    """
    cand = lsh_candidate_pairs(
        minhash_buckets(df, id_col, text_col, n_bands, rows_per_band, k),
        max_bucket=max_bucket,
    )
    sh = df.select(
        F.col(id_col).alias("id"), char_shingles(F.col(text_col), k).alias("sh")
    )
    return (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jacc"),
        )
        .filter(F.col("jacc") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def _spark_bit(tok: Column, j: int) -> Column:
    """Bit j (0-based) of the 128-bit md5 of ``tok``, reading hex digit
    j//4 (1-based position) bit j%4."""
    digit = F.conv(F.substring(F.md5(tok), j // 4 + 1, 1), 16, 10).cast("int")
    return F.shiftright(digit, j % 4).bitwiseAND(F.lit(1))


def simhash(col: Column, bits: int = 32) -> Column:
    """SimHash over whitespace tokens: bit j of the result is set iff
    the majority of tokens have bit j of md5(token) set (ties → 0).

    Majority-count formulation is order-independent — required for
    cross-engine equality (token lists aren't reordered, but counts make
    the computation associative regardless)."""
    toks = F.split(col, " ")
    n = F.size(toks)
    out = F.lit(0).cast("long")

    def bit_pred(j: int):
        # Single-arg lambda: a 2-arg lambda would be treated by
        # F.filter as the (element, index) form.
        return lambda t: _spark_bit(t, j) == 1

    for j in range(bits):
        cnt = F.size(F.filter(toks, bit_pred(j)))
        out = out + F.when(cnt * 2 > n, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash_sql(expr: str, bits: int = 32) -> str:
    """DuckDB twin of :func:`simhash`."""
    toks = f"string_split({expr}, ' ')"
    terms = []
    for j in range(bits):
        pos = j // 4 + 1
        shift = j % 4
        bit = (
            f"((strpos('{_HEX}', substr(md5(t), {pos}, 1)) - 1) >> {shift}) & 1 = 1"
        )
        cnt = f"len(list_filter({toks}, t -> {bit}))"
        terms.append(f"CASE WHEN {cnt} * 2 > len({toks}) THEN {1 << j}::BIGINT ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash values (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# Exact dedup (the d1 family, as a reusable operator)
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """One keeper row id per distinct key tuple + copy count."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(f"keeper_{id_col}"),
        F.count(F.lit(1)).alias("n_copies"),
    )
