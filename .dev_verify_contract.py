"""Drive the driver contract end-to-end the way the driver would:
bare SparkSession (no engine confs), non-UTC host TZ, fresh DuckDB."""
import os, sys, time
os.environ["TZ"] = "America/New_York"
time.tzset()
sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = (SparkSession.builder.appName("driver-sim").master("local[8]")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

df = E.entry(spark)
n = df.count()
print(f"ENTRY:: rows={n} schema={df.schema.simpleString()}", flush=True)
assert n > 0

import duckdb
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

from tests.oracle_harness import compare
qs, os_ = E.queries(), E.oracle_sql()
fails = []
for name, fn in qs.items():
    t0 = time.time()
    try:
        sdf = fn(spark, sf)
        if name not in os_:
            cnt = sdf.count()
            print(f"PASS(rows-only) {name}: {cnt} [{time.time()-t0:.1f}s]", flush=True)
            continue
        r = compare(name, sdf, con, os_[name])
        print(("PASS " if r.ok else "FAIL ") + name + f" ({r.spark_rows} rows) [{time.time()-t0:.1f}s]", flush=True)
        if not r.ok:
            print(r.message(), flush=True)
            fails.append(name)
    except Exception as exc:
        print(f"ERROR {name}: {exc}", flush=True)
        fails.append(name)
print(f"CONTRACT:: {len(qs)-len(fails)}/{len(qs)} pass; fails={fails}", flush=True)
