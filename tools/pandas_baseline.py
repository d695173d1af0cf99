#!/usr/bin/env python3
"""Reference-architecture baseline: the imputations transform (q54's
incoming window) implemented the way the reference implements it —
eager pandas, merge-per-stage, and the per-row iterrows contains-lookup
(`get_field_id`, function_app.py:233-256) — timed against graft's Spark
plan on the same parquet at the same scale factor.

Usage: python3 tools/pandas_baseline.py <sfDir>
Prints one JSON line with the pandas wall time and output rows.
"""
import sys, time, json
import pandas as pd


def get_field_id(name, dim_df, cmp_col):
    # faithful to the reference: full iterrows scan, first containment match
    for _, row in dim_df.iterrows():
        if str(row[cmp_col]).lower() in str(name).lower():
            return row[cmp_col]
    return None


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    t0 = time.time()
    lineitem = pd.read_parquet(f"{sf}/lineitem.parquet")
    supplier = pd.read_parquet(f"{sf}/supplier.parquet")
    part = pd.read_parquet(f"{sf}/part.parquet")

    # ranged scan (S3/S4)
    staged = lineitem[(lineitem.l_shipdate >= "1998-06-01") &
                      (lineitem.l_shipdate < "1998-09-01")].copy()
    # derive (P2/F1-F3)
    staged["fecha"] = pd.to_datetime(staged.l_shipdate).dt.date
    staged["horas"] = staged.l_quantity.astype(float)
    # J4 inner dim resolve (drops unmatched)
    emp = supplier[supplier.s_acctbal > 0][["s_suppkey", "s_name"]]
    merged = staged.merge(emp, left_on="l_suppkey", right_on="s_suppkey")
    # J1 task text
    merged = merged.merge(part[["p_partkey", "p_name"]],
                          left_on="l_partkey", right_on="p_partkey")
    # J7 contains lookup — the reference's per-row apply over iterrows
    type_dim = part[["p_type"]].drop_duplicates().sort_values("p_type")
    merged["tipo"] = merged["p_name"].apply(
        lambda x: get_field_id(x, type_dim, "p_type"))
    # F11 defaults
    merged["tipo"] = merged["tipo"].fillna("No asignado")
    # A2 summarize
    out = merged.groupby(["s_suppkey", "fecha", "tipo"], as_index=False).agg(
        horas=("horas", "sum"),
        precio_min=("l_extendedprice", "min"),
        n_lineas=("l_orderkey", "count"))
    elapsed = time.time() - t0
    print(json.dumps({"engine": "pandas-reference-style", "sf": sf,
                      "seconds": round(elapsed, 2), "rows": len(out)}))


if __name__ == "__main__":
    main()
