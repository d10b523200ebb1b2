import time
import importlib
import postgres_es_cdc_spark.cdc.generate as G
import postgres_es_cdc_spark.cdc.apply as A
importlib.reload(G); importlib.reload(A)
sf = "/root/testdata/sf0.1"

def t(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.time()-t0:.1f}s", flush=True)

ev = G.orders_cdc_events(spark, sf)
t("gen only", ev)
t("gen only again", ev)
from postgres_es_cdc_spark.cdc.envelope import decode_events
dec = decode_events(ev, G.orders_cdc_value_schema())
t("gen+decode", dec)
state = A.apply_changes(ev, G.orders_cdc_value_schema())
t("full fold", state)
t("full fold again", state)
print("PROFDONE", flush=True)
