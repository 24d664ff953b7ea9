#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir> [query ...]

Reads each <outDir>/<name> parquet result (written by graft.Verify),
runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB
(with every sf table registered as a view), sorts columns by name and
rows by all columns, and compares values strictly. Floats are compared
bit-exactly first, then with 1e-9 relative tolerance reported separately.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        # floats sort by a rounded representation so last-ulp engine
        # differences can't reorder rows and misalign the comparison
        def k(v):
            if isinstance(v, float):
                return (v is None, "float", f"{v:.9g}")
            return (v is None, str(type(v)), str(v))
        return tuple(k(v) for v in t)
    out.sort(key=key)
    return [cols[i] for i in order], out


def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if a == b or (math.isnan(a) and math.isnan(b)):
            return True
        return False
    return a == b


def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    try:
        import decimal
        if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
            return float(a) == float(b) or math.isclose(float(a), float(b), rel_tol=1e-9)
    except Exception:
        pass
    return False


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [c.lower() for c in got_rel.columns]
            got = got_rel.fetchall()
            want_rel = con.sql(sql)
            want_cols = [c.lower() for c in want_rel.columns]
            want = want_rel.fetchall()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        gc, g = canon(got, got_cols)
        wc, w = canon(want, want_cols)
        if gc != wc:
            results[name] = f"SCHEMA MISMATCH: got {gc} want {wc}"
            continue
        if len(g) != len(w):
            results[name] = f"ROWCOUNT MISMATCH: got {len(g)} want {len(w)}"
            continue
        bad = None
        n_close = 0
        for i, (rg, rw) in enumerate(zip(g, w)):
            for j, (vg, vw) in enumerate(zip(rg, rw)):
                if not eq(vg, vw):
                    if close(vg, vw):
                        n_close += 1
                    else:
                        bad = (i, gc[j], vg, vw)
                        break
            if bad:
                break
        if bad:
            results[name] = f"VALUE MISMATCH row {bad[0]} col {bad[1]}: got {bad[2]!r} want {bad[3]!r}"
        elif n_close:
            results[name] = f"CLOSE-ONLY ({n_close} float cells differ in last ulps)"
        else:
            results[name] = f"OK ({len(g)} rows)"
    width = max(len(k) for k in results) if results else 10
    n_ok = 0
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v}")
        n_ok += v.startswith("OK")
    print(f"== {n_ok}/{len(results)} OK")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
