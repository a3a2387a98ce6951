#!/usr/bin/env python
"""Simulate the round driver's correctness gate locally.

Runs the first 50 entries of ``__spark_entry__.queries()`` (the driver's
bounded verification window) against ``oracle_sql()`` via DuckDB at the
driver's scale factor and reports per-query rows/schema/value-hash
matches — the exact comparison CORRECTNESS_r{N}.json records. Run this
BEFORE committing any registry window rotation or oracle change:

    python tools/sim_driver.py                     # window, sf0.01
    python tools/sim_driver.py sf0.001 q1 q2 ...   # specific queries/SF

Exit code 1 if any checked query mismatches.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

DRIVER_WINDOW = 50
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """The driver's comparison canonicalization: columns sorted by name,
    every cell stringified (NULL-safe ordering), rows sorted."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)


def main() -> int:
    import __spark_entry__ as entry
    from cs_5542_lab_6_spark.session import get_spark

    args = sys.argv[1:]
    sf = "sf0.01"
    if args and args[0].startswith("sf"):
        sf, args = args[0], args[1:]
    sf_dir = f"/root/testdata/{sf}" if not os.path.isdir(sf) else sf

    # no console progress bars: the \r-overwritten stage lines swallow
    # the per-query OK/MISMATCH verdicts when output is captured
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs, oracles = entry.queries(), entry.oracle_sql()
    names = args or list(qs)[:DRIVER_WINDOW]

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results: dict[str, dict] = {}
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            sp_cols = df.columns
            sp_rows = [tuple(r) for r in df.collect()]
            if name not in oracles:
                results[name] = {"err": "no_oracle", "spark_rows": len(sp_rows)}
                print(f"{name}: rows-only {len(sp_rows)}", flush=True)
                continue
            rel = con.sql(oracles[name])
            du_cols = [d[0] for d in rel.description]
            du_rows = rel.fetchall()
            r = {
                "rows_match": len(sp_rows) == len(du_rows),
                "schema_match": sorted(sp_cols) == sorted(du_cols),
                "hash_match": canon(sp_rows, sp_cols) == canon(du_rows, du_cols),
                "spark_rows": len(sp_rows),
                "oracle_rows": len(du_rows),
            }
            results[name] = r
            ok = r["rows_match"] and r["schema_match"] and r["hash_match"]
            print(f"{name}: {'OK' if ok else 'MISMATCH ' + json.dumps(r)}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue, like the driver
            results[name] = {"err": str(e)[:300]}
            print(f"{name}: ERR {str(e)[:200]}", flush=True)
    spark.stop()

    bad = {
        k: v
        for k, v in results.items()
        if v.get("err") != "no_oracle"
        and not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
    }
    print("BAD:", json.dumps(bad, indent=1) if bad else "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
