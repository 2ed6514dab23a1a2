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

def type_class(t):
    """Collapse DuckDB types into pandas-rendering equivalence classes."""
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t == "DOUBLE":
        return "float64"
    if t == "FLOAT":
        return "float32"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return t


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
        # Driver parity: the driver's hash renders values through pandas.
        # Calibrated against CORRECTNESS_r07: every hash-red row had a
        # HUGEINT or DECIMAL output column (pandas renders those as
        # object/Decimal vs int64 — hash diverges even when values are
        # equal), and array columns crash the driver's sort (unhashable
        # numpy.ndarray). Int-width skew (INTEGER vs BIGINT) hashed green.
        spark_t = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
        duck_t = dict(zip(duck_rel.columns, [str(t) for t in duck_rel.types]))
        type_bad = []
        for c in spark_cols:
            st, dt = spark_t[c], duck_t[c]
            if "[]" in st or "[]" in dt or st.startswith("STRUCT") \
                    or dt.startswith("STRUCT"):
                type_bad.append(f"{c}: ARRAY/STRUCT column (spark={st}, "
                                f"duck={dt}) crashes the driver harness")
            elif "HUGEINT" in st + dt or "DECIMAL" in st + dt:
                type_bad.append(f"{c}: driver-unsafe type spark={st} duck={dt}"
                                f" (cast to BIGINT/DOUBLE on both sides)")
            elif type_class(st) != type_class(dt):
                type_bad.append(f"{c}: spark={st} duck={dt}")
        if type_bad:
            print(f"FAIL {name}: type skew — " + "; ".join(type_bad))
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
