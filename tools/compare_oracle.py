#!/usr/bin/env python3
"""Driver-equivalent correctness check (dev tool only, not part of the
library): run each oracle_sql.json entry in DuckDB against the sf dir's
parquet tables, compare with the Spark result parquet dumped by
graft.Verify. Columns sorted by name; exact match after canonicalization.

usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    return df

def cell_eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            expected = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        try:
            actual = canon(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if list(expected.columns) != list(actual.columns):
            print(f"FAIL {name}: columns {list(actual.columns)} != {list(expected.columns)}")
            n_fail += 1
            continue
        if len(expected) != len(actual):
            print(f"FAIL {name}: rows {len(actual)} != {len(expected)}")
            n_fail += 1
            continue
        mism = 0
        first = None
        for c in expected.columns:
            ev, av = expected[c].tolist(), actual[c].tolist()
            for i, (e, a) in enumerate(zip(ev, av)):
                # normalize numpy/pandas scalars
                e = e.item() if hasattr(e, "item") else e
                a = a.item() if hasattr(a, "item") else a
                if isinstance(e, float) or isinstance(a, float):
                    ok = (e is None and a is None) or \
                         (e is not None and a is not None and
                          (e == a or (isinstance(e, float) and isinstance(a, float)
                                      and math.isnan(e) and math.isnan(a))))
                else:
                    ok = str(e) == str(a)
                if not ok:
                    mism += 1
                    if first is None:
                        first = (c, i, e, a)
        if mism:
            print(f"FAIL {name}: {mism} cell mismatches; first: col={first[0]} row={first[1]} oracle={first[2]!r} spark={first[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(expected)} rows)")
            n_pass += 1
    # queries without oracle
    import os
    no_oracle = [d for d in os.listdir(out_dir)
                 if os.path.isdir(f"{out_dir}/{d}") and d not in oracle]
    for d in sorted(no_oracle):
        n = con.sql(f"SELECT count(*) FROM '{out_dir}/{d}/*.parquet'").fetchone()[0]
        print(f"INFO {d}: no oracle, {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(no_oracle)} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
