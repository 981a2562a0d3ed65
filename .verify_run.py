import traceback, duckdb, pandas as pd
import __spark_entry__ as m
from osm_poi_cloud_spark.config import get_spark
spark = get_spark("verify", master="local[8]", shuffle_partitions=8)
SF = "/root/testdata/sf0.01"
print("entry rows:", len(m.entry(spark).collect()), flush=True)
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
fails = 0
for name, fn in sorted(m.queries().items()):
    try:
        got = fn(spark, SF).toPandas()
        o = m.oracle_sql().get(name)
        if o is None:
            print(name, len(got), "(rows-only)", flush=True); continue
        exp = con.execute(o).df()
        g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True).round(9)
        e = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True).round(9)
        pd.testing.assert_frame_equal(g, e, check_dtype=False, rtol=1e-9, atol=1e-9)
        print(name, len(got), "oracle OK", flush=True)
    except Exception:
        fails += 1
        print(name, "FAIL", flush=True)
        traceback.print_exc()
print("TOTAL FAILS:", fails, flush=True)
