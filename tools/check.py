#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first,
then this script compares each spark result parquet against the DuckDB
oracle on the same tables (sorted columns, sorted rows, exact compare with
a float-tolerance fallback report).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    rr.append("NaN")
                else:
                    rr.append(v)
            else:
                rr.append(v)
        out.append(tuple(rr))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))

def close(a, b):
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return False

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck = con.sql(
                f"SELECT {', '.join(duck_cols)} FROM duck_rel").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        s, dk = norm(spark), norm(duck)
        if len(s) != len(dk):
            print(f"FAIL {name}: rowcount spark={len(s)} duck={len(dk)}")
            n_fail += 1
            continue
        exact = s == dk
        if exact:
            print(f"PASS {name} ({len(s)} rows, exact)")
            n_pass += 1
            continue
        # locate first mismatch; report whether within float tolerance
        bad = None
        for i, (rs, rd) in enumerate(zip(s, dk)):
            if rs != rd and not all(close(a, b) for a, b in zip(rs, rd)):
                bad = (i, rs, rd)
                break
        if bad is None:
            print(f"TOL  {name} ({len(s)} rows): equal only within 1e-9 "
                  f"float tolerance — would FAIL an exact hash compare")
            n_fail += 1
        else:
            i, rs, rd = bad
            print(f"FAIL {name}: row {i} differs\n  spark={rs}\n  duck ={rd}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
