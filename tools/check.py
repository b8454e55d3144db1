#!/usr/bin/env python3
"""Local self-check harness (builder-side only, not part of the library).

Mimics the driver's correctness gate: for each query result parquet written
by graft.Verify, run the declared oracle SQL in DuckDB over the same source
tables and compare schema + row count + cell values exactly.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def _types_hash_compatible(g, e):
    """True when the driver's typed-value hasher would see identical cells.

    Spark int64 vs DuckDB decimal128 (HUGEINT) is the known divergence class;
    any integer-width difference is tolerated (values hash by magnitude at
    the driver only within the same arrow family), so flag family mismatches:
    int-vs-decimal, int-vs-float, etc.
    """
    import pyarrow.types as pt
    def fam(t):
        if pt.is_integer(t): return "int"
        if pt.is_decimal(t): return "decimal"
        if pt.is_floating(t): return "float"
        if pt.is_timestamp(t): return "timestamp"
        if pt.is_date(t): return "date"
        if pt.is_boolean(t): return "bool"
        if pt.is_string(t) or pt.is_large_string(t): return "str"
        if pt.is_binary(t) or pt.is_large_binary(t): return "bin"
        if pt.is_list(t) or pt.is_large_list(t): return "list"
        return str(t)
    return fam(g) == fam(e)


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        spark_glob = f"{out_dir}/{name}/*.parquet"
        try:
            got = con.sql(f"SELECT * FROM '{spark_glob}'")
            got_cols = list(got.columns)
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(got_rows)})")
            continue
        try:
            exp = con.sql(oracles[name])
            exp_cols = list(exp.columns)
            exp_rows = exp.fetchall()
            exp_arrow = con.sql(oracles[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns differ spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_fail += 1
            continue
        # The driver hashes TYPED arrow values: DuckDB HUGEINT (e.g. from a
        # windowed SUM) arrives as decimal128 while Spark writes int64 — equal
        # Python ints, different hashes. Compare post-arrow types explicitly.
        got_arrow = con.sql(f"SELECT * FROM '{spark_glob}'").arrow()
        gt = {f.name: f.type for f in got_arrow.schema}
        et = {f.name: f.type for f in exp_arrow.schema}
        type_mismatch = [(c, gt[c], et[c]) for c in sorted(gt)
                         if not _types_hash_compatible(gt[c], et[c])]
        if type_mismatch:
            print(f"FAIL {name}: arrow type mismatch (driver hash would diverge): "
                  + "; ".join(f"{c}: spark={g} oracle={e}" for c, g, e in type_mismatch))
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rowcount spark={len(got_rows)} oracle={len(exp_rows)}")
            n_fail += 1
            continue
        bad = None
        for r, (g, e) in enumerate(zip(got_rows, exp_rows)):
            gr = [canon(g[i]) for i in gi]
            er = [canon(e[i]) for i in ei]
            if gr != er:
                bad = (r, gr, er)
                break
        if bad:
            r, gr, er = bad
            print(f"FAIL {name}: row {r} differs\n  spark : {gr}\n  oracle: {er}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} results ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
