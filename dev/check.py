#!/usr/bin/env python3
"""Local pre-validation mimicking the driver's DuckDB-oracle compare.

Usage: python3 dev/check.py [sfdir] [outdir]
Reads outdir/<name>/ parquet (written by graft.Verify) and outdir/oracle_sql.json,
runs each oracle in DuckDB over the sfdir tables, compares schema+values.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

partial = "--partial" in sys.argv  # dev: only check queries Verify dumped
oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        if partial:
            continue
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    stab = pq.read_table(spark_files[0])
    sdf = stab.to_pandas()
    try:
        otab = con.execute(sql).arrow()
        odf = otab.to_pandas()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    stypes = {f.name: str(f.type) for f in stab.schema}
    otypes = {f.name: str(f.type) for f in otab.schema}
    for c in set(stypes) & set(otypes):
        if stypes[c] != otypes[c]:
            print(f"WARN {name}: col {c} type spark={stypes[c]} oracle={otypes[c]}")
    # driver-style: sort columns by name, then compare values
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    if list(sdf.columns) != list(odf.columns):
        print(f"FAIL {name}: columns {list(sdf.columns)} vs {list(odf.columns)}"); fails += 1; continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}"); fails += 1; continue
    ssort = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    osort = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    ok = True
    for c in sdf.columns:
        a, b = ssort[c], osort[c]
        try:
            pd.testing.assert_series_equal(a, b, check_dtype=False, check_exact=True)
        except AssertionError as e:
            ok = False
            print(f"FAIL {name}: col {c} mismatch: {str(e).splitlines()[-1] if str(e) else e}")
            mism = a[a.astype(str) != b.astype(str)]
            print(f"   first diffs spark={a[mism.index[:3]].tolist() if len(mism) else '?'} oracle={b[mism.index[:3]].tolist() if len(mism) else '?'}")
            break
    if ok:
        print(f"OK   {name} ({len(sdf)} rows)")
    else:
        fails += 1
print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'} / {len(oracles)} queries")
sys.exit(1 if fails else 0)
