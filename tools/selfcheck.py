#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (graft.Verify output), runs the
matching SQL from oracle_sql.json in DuckDB with the sfDir parquet tables
registered by name, and compares: sorted columns (by name), sorted rows,
exact values (tiny float tolerance reported separately so we can see
near-misses before the driver's hash compare fails).
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        return v
    return v


def rows_of(df):
    cols = sorted(df.columns)
    recs = df[cols].values.tolist()
    out = []
    for r in recs:
        out.append(tuple(str(x) for x in r))
    return sorted(out), cols


def approx_equal(a, b):
    try:
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    except (ValueError, TypeError):
        return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        grows, gcols = rows_of(got)
        erows, ecols = rows_of(exp)
        if gcols != ecols:
            print(f"FAIL {name}: columns differ spark={gcols} duck={ecols}")
            failures += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows spark={len(grows)} duck={len(erows)}")
            sg, se = set(grows), set(erows)
            for x in list(sg - se)[:3]:
                print(f"  spark-only: {x}")
            for x in list(se - sg)[:3]:
                print(f"  duck-only:  {x}")
            failures += 1
            continue
        exact = grows == erows
        if exact:
            print(f"PASS {name}: {len(grows)} rows exact")
            continue
        # near-miss analysis
        bad = [(g, e) for g, e in zip(grows, erows) if g != e]
        near = all(all(approx_equal(a, b) for a, b in zip(g, e)) for g, e in bad)
        tag = "NEAR (float-only diff — driver hash WILL fail)" if near else "FAIL"
        print(f"{tag} {name}: {len(bad)}/{len(grows)} differing rows; first: ")
        for g, e in bad[:3]:
            print(f"  spark={g}\n  duck ={e}")
        failures += 1
    # rows-only queries: report row counts
    import os
    for d in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, d)
        if os.path.isdir(path) and d not in oracle:
            try:
                n = duckdb.sql(f"SELECT count(*) FROM '{path}/*.parquet'").fetchone()[0]
                print(f"ROWS-ONLY {d}: {n} rows")
                if n == 0:
                    print(f"WARN {d}: zero rows")
            except Exception as e:
                print(f"ROWS-ONLY {d}: unreadable: {e}")
    print(f"\n{'ALL PASS' if failures == 0 else str(failures) + ' FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
