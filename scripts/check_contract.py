"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the same sf, compare row count, column names, and order-insensitive
values. Usage: python scripts/check_contract.py [sf_dir] [name_prefix...]
(prefixes, when given, restrict which queries run)

Set ``CONTRACT_JSON=/path/out.json`` to also write a machine-readable
per-query record — {name: {status, rows_spark, rows_oracle, wall_sec,
mode}} plus a summary — so a FULL sweep can be committed as a round
artifact (the driver's own CORRECTNESS file samples only the first 50
queries).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, then rows — order-insensitive compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_val(v):
        if isinstance(v, float):
            return round(v, 6)
        return v

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main(sf_dir: str, prefixes: list[str] | None = None) -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from juniper_syslog_filter_spark.session import build_session

    spark = build_session(app_name="contract-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    if prefixes:
        qs = {
            n: f
            for n, f in qs.items()
            if any(n.startswith(p) for p in prefixes)
        }
    oracles = entry_mod.oracle_sql()
    failures = []
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            wall = time.time() - t0
            print(f"  {name}: rows-only ({len(srows)} rows) [{wall:.1f}s]")
            record[name] = {
                "status": "rows-only", "mode": "rows_only",
                "rows_spark": len(srows), "rows_oracle": None,
                "wall_sec": round(wall, 2),
            }
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = False
        if ok_cols and ok_count:
            ok_vals = normalize(srows, scols) == normalize(drows, dcols)
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        wall = time.time() - t0
        print(
            f"  {name}: {status} rows={len(srows)}/{len(drows)} "
            f"cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'} "
            f"vals={'=' if ok_vals else 'MISMATCH'} [{wall:.1f}s]"
        )
        record[name] = {
            "status": status, "mode": "value_exact",
            "rows_spark": len(srows), "rows_oracle": len(drows),
            "cols_match": ok_cols, "vals_match": ok_vals,
            "wall_sec": round(wall, 2),
        }
        if status == "FAIL":
            failures.append(name)
            if name in ("d2_minhash_lsh", "d4_ngram_jaccard"):
                print(
                    "    note: these verify Jaccard via 64-bit shingle "
                    "fingerprints (collision bound ~1e-14 per corpus); a "
                    "value mismatch here could be a fingerprint collision "
                    "shifting jacc off the oracle's string-set value — "
                    "see dedup.sig_jaccard_udf."
                )
            if ok_cols and ok_count:
                a = normalize(srows, scols)
                b = normalize(drows, dcols)
                for x, y in zip(a, b):
                    if x != y:
                        print(f"    first diff:\n      spark={x}\n      duck ={y}")
                        break

    # entry() smoke (full-suite runs only)
    entry_ok = None
    if not prefixes:
        try:
            n = entry_mod.entry(spark).count()
            print(f"  entry(): {n} rows")
            entry_ok = n >= 0
        except Exception as e:  # noqa: BLE001 - smoke check must record, not mask
            print(f"  entry(): FAIL ({e})")
            entry_ok = False
        if not entry_ok:
            failures.append("entry")

    spark.stop()
    out_json = os.environ.get("CONTRACT_JSON")
    if out_json:
        import json

        with open(out_json, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(record),
                    # n_ok counts per-query records only; a failed
                    # entry() smoke surfaces via entry_ok AND failures,
                    # so n_ok == n_queries alone does NOT mean green —
                    # check failures == [].
                    "n_ok": sum(
                        1 for r in record.values()
                        if r["status"] in ("OK", "rows-only")
                    ),
                    "entry_ok": entry_ok,
                    "failures": failures,
                    "total_wall_sec": round(
                        sum(r["wall_sec"] for r in record.values()), 1
                    ),
                    "queries": record,
                },
                fh,
                indent=1,
            )
        print(f"wrote {out_json}")
    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            sys.argv[2:] or None,
        )
    )
