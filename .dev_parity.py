import sys, time, traceback
sf = globals().get("SF_DIR", "/root/testdata/sf0.001")
only = globals().get("ONLY", None)
import importlib
import postgres_es_cdc_spark.queries as Q
import tests.oracle_harness as H
for m in list(sys.modules.values()):
    pass
importlib.reload(H)
con = H.duck_connection(sf)
results = []
for name, spec in Q.REGISTRY.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        df = spec.fn(spark, sf)
        if spec.oracle is None:
            n = df.count()
            results.append((name, True, f"rows-only: {n} rows"))
            print(f"PASS {name} (rows-only, {n} rows) [{time.time()-t0:.1f}s]")
            continue
        r = H.compare(name, df, con, spec.oracle)
        results.append((name, r.ok, r.message()))
        print(r.message(), f"[{time.time()-t0:.1f}s]")
    except Exception as e:
        results.append((name, False, str(e)))
        print(f"ERROR {name}: {traceback.format_exc().splitlines()[-1]} [{time.time()-t0:.1f}s]")
fails = [n for n, ok, _ in results if not ok]
print(f"DONE:: {len(results)-len(fails)}/{len(results)} pass; fails: {fails}")
