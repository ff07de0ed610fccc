#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL
in DuckDB over the sf-dir parquet tables and compare with the parquet
results graft.Verify wrote. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query...]
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    # Type-SENSITIVE normalization: the driver hashes the typed arrow
    # cell, so a DuckDB DECIMAL/HUGEINT against a Spark BIGINT must
    # FAIL here too (r14 lesson: floating Decimals masked exactly
    # that class on emb_pca_project). Each scalar carries a coarse
    # type tag; equal values of different families compare unequal.
    import math, decimal, datetime
    import numpy as np
    if isinstance(v, np.bool_): v = bool(v)
    if isinstance(v, (np.integer,)): v = int(v)
    if isinstance(v, (np.floating,)): v = float(v)
    if v is None: return None
    if isinstance(v, bool): return ("b", v)
    # normalize() strips trailing zeros so numerically equal decimals
    # of different SCALE (1.5 vs 1.50) compare equal — the gate's job
    # is catching cross-FAMILY drift (DECIMAL vs BIGINT/DOUBLE), and
    # the family tag alone does that; pinning scale was stricter than
    # the stated goal and a latent false-failure source if the two
    # engines' scale inference ever differs (round-16 fix)
    if isinstance(v, decimal.Decimal): return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", "NaN" if math.isnan(v) else v)
    if isinstance(v, int): return ("i", v)
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("t", str(v))
    if isinstance(v, bytes): return ("x", v.hex())
    return v

def rows_of(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in data:
        out.append(tuple(norm_cell(row[i]) for i in order))
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result"); n_fail += 1; continue
        try:
            tbl = pq.read_table(files[0])
            s_cols = list(tbl.column_names)
            s_rows = [tuple(col[i].as_py() for col in tbl.columns)
                      for i in range(tbl.num_rows)]
            s_cols_sorted, s_norm = rows_of(s_cols, s_rows)
        except Exception as ex:
            print(f"FAIL {name}: spark read error {ex}"); n_fail += 1; continue
        try:
            cur = con.execute(sql)
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
            d_cols_sorted, d_norm = rows_of(d_cols, d_rows)
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {str(ex).splitlines()[0][:160]}")
            n_fail += 1; continue
        if s_cols_sorted != d_cols_sorted:
            print(f"FAIL {name}: columns {s_cols_sorted} != {d_cols_sorted}")
            n_fail += 1; continue
        if len(s_norm) != len(d_norm):
            print(f"FAIL {name}: rows {len(s_norm)} != {len(d_norm)}")
            n_fail += 1; continue
        if s_norm != d_norm:
            diff = next(i for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b) \
                if s_norm and d_norm else -1
            if sorted(map(repr, s_norm)) == sorted(map(repr, d_norm)):
                print(f"FAIL {name}: ROW ORDER ONLY (row {diff})")
            else:
                print(f"FAIL {name}: values differ at row {diff}:")
                print(f"  spark : {s_norm[diff] if diff >= 0 else '?'}")
                print(f"  duckdb: {d_norm[diff] if diff >= 0 else '?'}")
            n_fail += 1; continue
        print(f"OK   {name} ({len(s_norm)} rows)")
        n_ok += 1
    print(f"== {n_ok} ok, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
