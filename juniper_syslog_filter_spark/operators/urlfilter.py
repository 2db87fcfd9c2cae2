"""Domain-blocklist URL filtering (UT1/RefinedWeb-style).

Every public Common-Crawl curation pipeline starts by dropping pages
whose host matches a blocklist of domains (exact host OR any
label-boundary suffix: ``ads.example.com`` blocks
``cdn.ads.example.com``). The blocklists are large (UT1 ships ~4M
entries) but HOSTS are vastly fewer than PAGES (~10⁸ hosts vs ~10¹²
pages in a crawl), which fixes the 100-TB shape:

1. ``distinct`` hosts — one shuffle over the HOST universe, not the
   corpus;
2. explode each distinct host's label suffixes (a host has ≤ ~6
   labels — bounded fan-out on the small side);
3. left-semi broadcast join against the blocklist → the blocked-host
   set, which is ≤ the host universe and usually tiny;
4. broadcast the blocked set back onto the corpus — the corpus lineage
   is scan → broadcast hash join, zero corpus-side Exchange.

Step 3 broadcasts the BLOCKLIST; if it outgrows the broadcast
threshold (4M short strings ≈ 100 MB), flip the semi-join build side
or shuffle the suffix join — the corpus-side contract (step 4) is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_suffixes(host: Column) -> Column:
    """All label-boundary suffixes of a hostname, longest first:
    ``cdn.news.example.com`` → ``[cdn.news.example.com,
    news.example.com, example.com, com]``. Pure Catalyst HOFs."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
    )


def blocked_hosts(hosts: DataFrame, blocklist: DataFrame, host_col: str = "host") -> DataFrame:
    """The subset of ``hosts`` (one column, any multiplicity) matching
    ``blocklist.entry`` exactly or by label-boundary suffix. Output is
    distinct hosts — small by construction, meant to broadcast back
    onto the corpus."""
    return (
        hosts.select(host_col)
        .distinct()
        .select(host_col, F.explode(host_suffixes(F.col(host_col))).alias("_suf"))
        .join(F.broadcast(blocklist), F.col("_suf") == F.col("entry"), "left_semi")
        .select(host_col)
        .distinct()
    )


def robots_verdict(
    corpus: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """RFC 9309 (robots.txt) rule-precedence verdict, simplified to its
    load-bearing core: among a host's rules whose ``rule_path`` is a
    PREFIX of the URL path, the LONGEST wins; on a length tie, allow
    beats disallow; no matching rule (or no rules for the host) means
    allowed. Prefix matching is deliberately not segment-aware —
    ``/article/1`` also matches ``/article/12/`` — because that is what
    the robots spec says and what real crawlers implement.

    100-TB shape: rules aggregate per host into ONE array row (a
    crawl's robots universe is host-sized, broadcastable) and the
    verdict is a pure map-side HOF over the broadcast join — filter
    rules by prefix, ``array_max`` over (len, allow, path) structs for
    the precedence, zero corpus-side Exchange. Adds a column
    ``allowed``."""
    rule_sets = rules.groupBy(host_col).agg(
        F.collect_list(
            F.struct(
                F.length("rule_path").alias("l"),
                F.col("allow"),
                F.col("rule_path"),
            )
        ).alias("_rules")
    )
    joined = corpus.join(F.broadcast(rule_sets), on=host_col, how="left")
    cands = F.filter(
        F.col("_rules"), lambda r: F.col(path_col).startswith(r["rule_path"])
    )
    # array_max on (l, allow, rule_path): longest prefix first, then
    # allow=true beats false, then the path string as a deterministic
    # (verdict-neutral) final tie-break.
    best = F.array_max(cands)
    allowed = F.when(
        F.col("_rules").isNull() | (F.size(cands) == 0), F.lit(True)
    ).otherwise(best["allow"])
    return joined.withColumn("allowed", allowed).drop("_rules")


def mark_blocked(corpus: DataFrame, blocklist: DataFrame, host_col: str = "host") -> DataFrame:
    """Corpus + a ``blocked`` boolean. The corpus side never shuffles:
    the blocked-host set is derived on the (small) host universe and
    broadcast."""
    blocked = blocked_hosts(corpus, blocklist, host_col).withColumn(
        "_hit", F.lit(True)
    )
    return corpus.join(
        F.broadcast(blocked), on=host_col, how="left"
    ).withColumn("blocked", F.coalesce(F.col("_hit"), F.lit(False))).drop("_hit")


# ---------------------------------------------------------------------------
# URL canonicalization — the normalize-before-anything pass a crawl
# frontier / dedup / blocklist stage all share.
# ---------------------------------------------------------------------------

TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL, as one Catalyst
    expression (map-only, zero Python, shared regex semantics with
    :func:`canonicalize_url_sql` — RE2-safe: no lookbehind):

    * scheme and host lowercased; default port stripped (``:80`` for
      http, ``:443`` for https);
    * fragment dropped;
    * path: empty → ``/``; trailing slashes stripped except on the
      bare root;
    * query: tracking params removed (``utm_*``, ``gclid``,
      ``fbclid``, ``ref``), survivors SORTED for order-insensitive
      equality, ``?`` dropped when nothing survives.

    The canonical key is what d8-style URL dedup, frontier dedup and
    blocklist matching should group on; two syntactically different
    crawl hits of the same resource collide here.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host_raw = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    host = F.when(
        scheme == "http", F.regexp_replace(host_raw, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host_raw, ":443$", "")
    ).otherwise(host_raw)
    path_raw = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    path = F.when(path_raw == "", F.lit("/")).otherwise(
        F.regexp_replace(path_raw, r"(.)/+$", "$1")
    )
    # anchor the search BEFORE the fragment: a '?' inside the fragment
    # (SPA hash routes like /#/search?q=x) is not a query separator
    q = F.regexp_extract(url, r"^[^#]*?\?([^#]*)", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(q, "&"),
                lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` — identical regexes
    (RE2-compatible by construction), identical ordering semantics
    (lexicographic sort of the surviving params)."""
    scheme = f"lower(regexp_extract({expr}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    host_raw = f"lower(regexp_extract({expr}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host_raw}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host_raw}, ':443$', '') "
        f"ELSE {host_raw} END"
    )
    path_raw = f"regexp_extract({expr}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1)"
    path = (
        f"CASE WHEN {path_raw} = '' THEN '/' "
        f"ELSE regexp_replace({path_raw}, '(.)/+$', '\\1') END"
    )
    q = f"regexp_extract({expr}, '^[^#]*?\\?([^#]*)', 1)"
    # COALESCE: DuckDB's array_to_string returns NULL (not '') for an
    # empty list, which would null the whole concatenation.
    kept = (
        f"COALESCE(array_to_string(list_sort(list_filter(string_split({q}, '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}'))), '&'), '')"
    )
    return (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {kept} = '' THEN '' ELSE '?' || {kept} END"
    )
