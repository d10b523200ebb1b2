import time
import importlib
import postgres_es_cdc_spark.llm.dedup as D
importlib.reload(D)
sf = "/root/testdata/sf0.1"

def t(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.time()-t0:.2f}s", flush=True)

corp = D.mutated_corpus(spark, sf)
t("corpus", corp)
sh = D._shingle_hashes(corp)
t("shingles", sh)
sigs = D._signatures(corp)
t("signatures", sigs)
t("signatures again", sigs)
t("lsh pairs", D.docs_minhash_lsh_pairs(spark, sf))
print("LSHPROF done", flush=True)
