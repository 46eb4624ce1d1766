#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read Verify's parquet
dumps, run each oracle_sql.json query in DuckDB against the same sf-dir
tables, sort columns by name + rows, and compare — BIT-EXACT for every
column (matching the driver's hash compare); a float column that passes
only at 1e-9 tolerance is reported loudly as TOLERANT-ONLY, never as a
silent OK. Usage: compare.py <sfDir> <verifyOutDir>"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
tolerant = []
dirs = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
        if os.path.isdir(p)}
names = sorted(dirs | set(oracle))
for missing in sorted(set(oracle) - dirs):
    print(f"FAIL {missing}: query did not produce output"); fail += 1
names = sorted(dirs)
for name in names:
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no parquet output"); fail += 1; continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files])
    if name not in oracle:
        print(f"ROWS-ONLY {name}: {len(spark_df)} rows "
              f"{'OK' if len(spark_df)>0 else 'FAIL-EMPTY'}")
        if len(spark_df) == 0: fail += 1
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if sorted(a.columns) != sorted(b.columns):
        print(f"FAIL {name}: cols {sorted(a.columns)} vs {sorted(b.columns)}")
        fail += 1; continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); fail += 1; continue
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    ok = True
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                import numpy as np
                # BIT-EXACT first: the driver's gate hashes values, so a
                # tolerance here hides exactly the class of red the
                # driver would report (round-6 q_embed_project passed
                # locally at 1e-9 while the driver hash-mismatched).
                # Every oracle routes rounding through the shared
                # engine-identical recipe, so exact is the expectation;
                # a tolerant-only pass is flagged LOUDLY as its own
                # outcome, not silently folded into OK.
                if np.array_equal(av.astype(float), bv.astype(float),
                                  equal_nan=True):
                    pass
                elif np.allclose(av.astype(float), bv.astype(float),
                                 rtol=1e-9, atol=1e-9, equal_nan=True):
                    tolerant.append(f"{name}.{c}")
                else:
                    ok = False; print(f"FAIL {name}: col {c} float mismatch")
                    print(pd.concat([av, bv], axis=1)[
                        ~np.isclose(av.astype(float), bv.astype(float),
                                    rtol=1e-9, atol=1e-9, equal_nan=True)].head())
            else:
                if not av.astype(str).equals(bv.astype(str)):
                    ok = False; print(f"FAIL {name}: col {c} mismatch")
                    m = av.astype(str) != bv.astype(str)
                    print(pd.concat([av[m], bv[m]], axis=1).head())
        except Exception as e:
            ok = False; print(f"FAIL {name}: col {c} compare error {e}")
    if ok: print(f"OK   {name}: {len(a)} rows")
    else: fail += 1
if tolerant:
    # TOLERANT-ONLY is FAIL-class: the driver's hash compare flags these
    # as red, so the local gate must go red too — an automation consumer
    # keyed off exit status must never see a would-be driver red as 0.
    print(f"\nFAIL-CLASS: {len(tolerant)} float column(s) passed only at 1e-9 "
          f"tolerance — the DRIVER's hash compare WILL flag these as red:")
    for t in tolerant: print(f"  TOLERANT-ONLY {t}")
red = fail + len(tolerant)
print(f"\n{'ALL GREEN' if red==0 else str(red)+' FAILURES'} "
      f"({len(names)} queries)"
      + (f" [{len(tolerant)} tolerant-only float cols — fix before driver]"
         if tolerant else " [all float columns bit-exact]"))
sys.exit(1 if red else 0)
