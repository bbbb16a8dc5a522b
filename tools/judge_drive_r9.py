import os, sys, time, json, traceback
os.chdir("/root/repo"); sys.path.insert(0, "/root/repo")
import duckdb, pandas as pd
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as m
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
qs, osql = m.queries(), m.oracle_sql()
results = {}
t00 = time.time()
for name in qs:
    t0 = time.time()
    try:
        a = qs[name](spark, SF).toPandas()
        b = con.execute(osql[name]).df()
        a = a[sorted(a.columns)].sort_values(by=sorted(a.columns)).reset_index(drop=True)
        b = b[sorted(b.columns)].sort_values(by=sorted(b.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        results[name] = {"ok": True, "rows": len(a), "secs": round(time.time()-t0, 2)}
        print(f"OK   {name} rows={len(a)} {results[name]['secs']}s", flush=True)
    except Exception as e:
        results[name] = {"ok": False, "err": repr(e)[:500], "secs": round(time.time()-t0, 2)}
        print(f"FAIL {name}: {repr(e)[:300]}", flush=True)
ok = sum(1 for v in results.values() if v["ok"])
print(f"TOTAL {ok}/{len(results)} green in {round(time.time()-t00)}s", flush=True)
json.dump(results, open("/root/repo/tools/judge_drive_r9_results.json", "w"), indent=1)
spark.stop()
