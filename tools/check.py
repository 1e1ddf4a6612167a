#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Loads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>'s tables, then
compares: column names (sorted), row count, and values (rows sorted by all
columns). Reports exact match / tolerance-only match / mismatch.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def key(row):
        return tuple((v is None, str(type(v)), v if v is not None else 0)
                     for v in row)
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=key), [cols[i] for i in order]


def type_names(rel, cols):
    """DuckDB column types, sorted by column name, normalized.

    Tolerated (r1 driver evidence — these hashed green): integer widths
    up to 64-bit fold together (Spark INTEGER vs oracle BIGINT passed),
    TIMESTAMP_NS vs TIMESTAMP (events.ts is NANOS at the source).
    NOT tolerated: HUGEINT (DuckDB integer sum() returns INT128 — the
    exact class the r1 driver hash rejected on a2/f_json/t7/t8), and any
    other divergence (DOUBLE vs DECIMAL etc.), since the driver's hash is
    type-sensitive while Python fetchall() is not.
    """
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def norm(t):
        s = str(t)
        if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
            return "INT<=64"
        if s in ("TIMESTAMP_NS", "TIMESTAMP"):
            return "TIMESTAMP"
        return s
    return [norm(rel.types[i]) for i in order]


def approx_eq(a, b):
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.is_dir():  # Spark-written tables (e.g. DataGen sf1) are dirs
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_path = Path(out_dir, name)
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'")
            g_rows, g_cols = canon(got.fetchall(), got.columns)
            exp = con.sql(oracle[name])
            e_rows, e_cols = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if g_cols != e_cols:
            print(f"FAIL {name}: cols spark={g_cols} oracle={e_cols}")
            n_fail += 1
            continue
        g_types, e_types = type_names(got, got.columns), type_names(exp, exp.columns)
        if g_types != e_types:
            print(f"FAIL {name}: types spark={g_types} oracle={e_types} "
                  f"(driver hash is type-sensitive; CAST the oracle)")
            n_fail += 1
            continue
        if len(g_rows) != len(e_rows):
            print(f"FAIL {name}: rows spark={len(g_rows)} oracle={len(e_rows)}")
            n_fail += 1
            continue
        exact = g_rows == e_rows
        if exact:
            print(f"PASS {name} ({len(g_rows)} rows, exact)")
            n_pass += 1
            continue
        bad = None
        for gr, er in zip(g_rows, e_rows):
            if not all(approx_eq(a, b) for a, b in zip(gr, er)):
                bad = (gr, er)
                break
        if bad is None:
            print(f"WARN {name} ({len(g_rows)} rows): tolerance-only match — "
                  f"driver hash may reject; make it bit-exact")
            n_fail += 1
        else:
            print(f"FAIL {name}: first diff\n  spark : {bad[0]}\n  oracle: {bad[1]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
