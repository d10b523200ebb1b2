import time, importlib
import postgres_es_cdc_spark.functions.scalar as S
import tests.oracle_harness as H
importlib.reload(S)
sf = "/root/testdata/sf0.001"

t0=time.time(); df = S.scalar_string_funcs(spark, sf); t1=time.time()
n = df.count(); t2=time.time()
pdf = df.toPandas(); t3=time.time()
con = H.duck_connection(sf)
du = con.execute(S.SCALAR_STRING_SQL).fetchdf(); t4=time.time()
print(f"PROF:: build={t1-t0:.2f} count={t2-t1:.2f} toPandas={t3-t2:.2f} duckdb={t4-t3:.2f} rows={n}")
t0=time.time(); pdf2 = df.toPandas(); print(f"toPandas again={time.time()-t0:.2f}")
