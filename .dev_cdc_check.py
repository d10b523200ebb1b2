import time
t0 = time.time()
from postgres_es_cdc_spark.cdc.generate import (
    orders_cdc_events, orders_cdc_value_schema, ORDERS_CDC_EXPECTED_SQL)
from postgres_es_cdc_spark.cdc.apply import apply_changes
ev = orders_cdc_events(spark, "/root/testdata/sf0.001")
state = apply_changes(ev, orders_cdc_value_schema())
sp = {r.id: (r.custkey, r.status, r.totalprice, r.priority) for r in state.collect()}
print("spark fold secs:", round(time.time() - t0, 1))
import duckdb
con = duckdb.connect()
con.execute("CREATE OR REPLACE VIEW orders AS SELECT * FROM read_parquet('/root/testdata/sf0.001/orders.parquet')")
du = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.execute(ORDERS_CDC_EXPECTED_SQL).fetchall()}
mism = [(kk, sp.get(kk), du.get(kk)) for kk in set(sp) | set(du) if sp.get(kk) != du.get(kk)]
print("RESULT:: spark", len(sp), "duck", len(du), "mismatches", len(mism), mism[:4])
