#!/usr/bin/env python3
"""Refresh tools/duckdb_baseline_sf01.json for changed/new oracle SQL.

Usage: python3 tools/update_baseline.py <oracle_sql.json> <name> [name ...]

Re-times only the NAMED queries (best-of-3 at sf0.1) and merges them into
the committed baseline, bumping n_queries. Unchanged oracle texts keep
their previously measured numbers — re-timing the full set would couple
every row's denominator to this host's load of the day.
"""
import sys, json, time
import duckdb

SF_DIR = "/root/testdata/sf0.1"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
BASELINE = "tools/duckdb_baseline_sf01.json"

def main():
    oracle_path, names = sys.argv[1], sys.argv[2:]
    oracles = json.load(open(oracle_path))
    base = json.load(open(BASELINE))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    for name in names:
        sql = oracles[name]
        best = None
        for _ in range(3):
            t0 = time.time()
            con.sql(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        base["queries"][name] = round(best, 3)
        print(f"{name}: {best:.3f}s")
    base["n_queries"] = len(base["queries"])
    base["note"] = (base.get("note", "") +
                    f"; re-timed: {', '.join(names)}")
    json.dump(base, open(BASELINE, "w"), indent=1)
    print(f"wrote {BASELINE} with {base['n_queries']} queries")

if __name__ == "__main__":
    main()
