#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle in DuckDB
over the same testdata, compare against the parquet dumped by graft.Verify
(columns sorted by name, rows sorted, exact value equality)."""
import sys, json, math, duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    # Mirror the driver: both sides go through PANDAS (DuckDB HUGEINT -> float64,
    # array cells -> ndarray which sort_values can't hash), then value-compare.
    try:
        spark_pd = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        scols = sorted(spark_pd.columns)
        spark_pd = spark_pd[scols]
        sdf = [tuple(r) for r in spark_pd.itertuples(index=False)]
        spark_pd.sort_values(by=scols)  # raises like the driver on unhashable cells
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable/unsortable: {str(e)[:200]}"); fails.append(name); continue
    try:
        orel = con.sql(sql)
        # DECIMAL results double-round through DuckDB's DOUBLE cast path and
        # HUGEINT becomes float64 in pandas — both diverge from Spark's
        # parquet dtypes. Oracles must cast these away explicitly.
        risky = [f"{c}:{t}" for c, t in zip(orel.columns, orel.types)
                 if "DECIMAL" in str(t).upper() or "HUGEINT" in str(t).upper()]
        if risky:
            print(f"FAIL {name}: oracle returns gate-unsafe dtypes {risky}"); fails.append(name); continue
        opd = orel.df()
        ocols = sorted(opd.columns)
        opd = opd[ocols]
        odf = [tuple(r) for r in opd.itertuples(index=False)]
        opd.sort_values(by=ocols)
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}"); fails.append(name); continue
    if scols != ocols:
        print(f"FAIL {name}: columns spark={scols} oracle={ocols}"); fails.append(name); continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}"); fails.append(name); continue
    srows, orows = sorted(map(repr, sdf)), sorted(map(repr, odf))
    bad = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
    if bad:
        i = bad[0]
        print(f"FAIL {name}: {len(bad)} mismatched rows; first:\n  spark  {srows[i][:300]}\n  oracle {orows[i][:300]}")
        fails.append(name); continue
    print(f"ok   {name} ({len(sdf)} rows)")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass" + (f"; FAILING: {sorted(fails)}" if fails else ""))
sys.exit(1 if fails else 0)
