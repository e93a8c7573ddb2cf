#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Verify output
parquet, run the matching oracle SQL in DuckDB over the same testdata
tables, and compare row-count, schema (column names), and an order-
insensitive value hash. Usage: check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize numeric types; stringify rows; sort row strings
    rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if isinstance(v, float):
                cells.append(repr(round(v, 9)))
            else:
                cells.append(repr(v))
        rows.append("|".join(cells))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

fails = []
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pq.read_table(glob.glob(f"{outdir}/{name}/*.parquet")[0] if glob.glob(f"{outdir}/{name}/*.parquet") else f"{outdir}/{name}").to_pandas()
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); fails.append(name); continue
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails.append(name); continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"FAIL {name}: schema {sc} vs {dc}"); fails.append(name); continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}"); fails.append(name); continue
    hs, hd = canon(spark_df), canon(duck_df)
    if hs != hd:
        print(f"FAIL {name}: hash mismatch ({len(spark_df)} rows)")
        fails.append(name)
        # show a small diff sample
        try:
            m = spark_df.reindex(sorted(spark_df.columns), axis=1).round(6)
            d = duck_df.reindex(sorted(duck_df.columns), axis=1).round(6)
            ms = set(map(tuple, m.astype(str).values.tolist()))
            ds = set(map(tuple, d.astype(str).values.tolist()))
            only_s = list(ms - ds)[:3]; only_d = list(ds - ms)[:3]
            if only_s: print(f"  spark-only: {only_s}")
            if only_d: print(f"  duck-only:  {only_d}")
        except Exception:
            pass
        continue
    print(f"OK   {name} ({len(spark_df)} rows)")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
