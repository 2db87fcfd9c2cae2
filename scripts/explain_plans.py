"""Print physical plans for the headline dataflows and grep the
properties that matter at 100 TB:

* parquet scans show PushedFilters + pruned ReadSchema (no full-row
  reads for narrow projections);
* dimension joins are BroadcastHashJoin (never shuffle the fact side);
* the keyword pre-filter sits IN the scan stage, before the Python
  parse;
* aggregates are partial (map-side) + final HashAggregate.

Usage: python scripts/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, ".")


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check(name: str, plan: str, must: list[str], must_not: list[str] = ()) -> bool:
    ok = True
    for m in must:
        if m not in plan:
            print(f"  MISSING {m!r}")
            ok = False
    for m in must_not:
        if m in plan:
            print(f"  UNEXPECTED {m!r}")
            ok = False
    print(f"{name}: {'OK' if ok else 'CHECK PLAN ABOVE'}")
    return ok


def main(sf_dir: str) -> int:
    from pyspark.sql import functions as F

    from juniper_syslog_filter_spark.datagen import (
        generate_pages, severity_dim, device_dim, load_table,
    )
    from juniper_syslog_filter_spark.enrich import enrich
    from juniper_syslog_filter_spark.functions.parse import parse_pages
    from juniper_syslog_filter_spark.session import build_session

    spark = build_session(app_name="plans", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0

    # 1. Scan pruning + pushdown: projection/filter over a parquet table.
    orders = load_table(spark, sf_dir, "orders")
    q = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")
    p = plan_of(q)
    print(p)
    failures += not check(
        "scan pruning+pushdown", p,
        must=["PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]"],
    )

    # 2. Keyword pre-filter precedes the Python parse stage (Filter is
    #    below MapInPandas in the tree ⇒ listed after it in `formatted`).
    import tempfile
    tmp = tempfile.mkdtemp()
    generate_pages(spark, 1000).write.mode("overwrite").parquet(f"{tmp}/pages")
    pages = spark.read.parquet(f"{tmp}/pages")
    parsed = parse_pages(pages, keyword="RT_IDP_ATTACK")
    p = plan_of(parsed)
    print(p)
    # In `formatted` output the tree prints top-down, so the Filter that
    # executes BEFORE MapInPandas must appear AFTER it in the text.
    ok = ("MapInPandas" in p and "Filter" in p
          and p.index("MapInPandas") < p.index("(4) Filter" if "(4) Filter" in p else "Filter"))
    if not ok:
        print("  MISSING Filter-below-MapInPandas ordering")
    failures += not (ok and check("raw-byte prefilter before Python", p, must=["MapInPandas", "contains"]))

    # 3. Dim joins broadcast; fact side never shuffles for the join.
    e = enrich(parsed, severity_dim(spark), device_dim(spark))
    p = plan_of(e)
    print(p)
    failures += not check(
        "broadcast enrich", p,
        must=["BroadcastHashJoin"],
        must_not=["SortMergeJoin", "ShuffledHashJoin"],
    )

    # 4. Partial+final hash aggregation for the groupBy count.
    agg = e.groupBy("Severity", "lang").count()
    p = plan_of(agg)
    print(p)
    failures += not check(
        "partial aggregation", p,
        must=["HashAggregate", "partial_count"],
    )

    # 5. Near-dup verify: every join hash-based (bucket self-join and
    #    both signature joins) — a nested-loop/cartesian anywhere here
    #    is quadratic at scale; the only Python stages are the one
    #    signature kernel (MapInPandas) and the pair-Jaccard kernel
    #    (ArrowEvalPython).
    from juniper_syslog_filter_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    p = plan_of(minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5))
    print(p)
    failures += not check(
        "near-dup verify joins", p,
        must=["ArrowEvalPython"],
        must_not=["BroadcastNestedLoopJoin", "CartesianProduct"],
    )

    # 6. IVF ANN: the centroid cross product and the probe join are
    #    broadcast (tiny side), the per-vector argmax is a partial
    #    (map-side) max_by aggregate, the final top-k is
    #    TakeOrderedAndProject — no shuffle-side sort, no cartesian on
    #    fact×fact.
    from juniper_syslog_filter_spark.operators.similarity import ivf_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    p = plan_of(ivf_ann_topk(emb.filter(F.col("vec_id") != 0), qv))
    print(p)
    failures += not check(
        "ivf ann", p,
        must=["TakeOrderedAndProject", "max_by", "BroadcastHashJoin", "partial_max_by"],
        must_not=["SortMergeJoin", "CartesianProduct"],
    )

    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
