#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate:
   1) run graft.Verify (outside this script) to dump query results + oracle_sql.json
   2) this script runs each oracle SQL in DuckDB over the same parquet tables
      and compares (rows sorted, columns sorted by name) against Spark's dump.
Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

import datetime

def norm(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    # pd.Timestamp vs datetime.datetime (ns vs us parquet physical type)
    # are the same logical value — compare type-agnostically.
    if isinstance(v, datetime.datetime):
        return ("ts", str(v))
    return (str(type(v).__name__), str(v))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        if only and name not in only:
            continue
        try:
            spark_tbl = ds.dataset(path, format="parquet").to_table()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark dump: {e}")
            n_bad += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({spark_tbl.num_rows} rows)")
            n_skip += 1
            continue
        try:
            duck_tbl = con.sql(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck_tbl.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            n_bad += 1
            continue
        s_rows = sorted(tuple(norm(v) for v in row) for row in zip(*[spark_tbl.column(c).to_pylist() for c in s_cols]))
        d_rows = sorted(tuple(norm(v) for v in row) for row in zip(*[duck_tbl.column(c).to_pylist() for c in d_cols]))
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: row count spark={len(s_rows)} duck={len(d_rows)}")
            n_bad += 1
            continue
        diff = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        if diff:
            i, a, b = diff[0]
            print(f"FAIL {name}: {len(diff)}/{len(s_rows)} rows differ; first at {i}:")
            print(f"  cols : {s_cols}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(s_rows)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail, {n_skip} no-oracle")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
