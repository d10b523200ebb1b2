import io, re, contextlib
import postgres_es_cdc_spark.queries as Q
sf = "/root/testdata/sf0.01"

def plan_of(name):
    df = Q.REGISTRY[name].fn(spark, sf)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()

checks = {
  "q5_region_revenue": ["BroadcastHashJoin"],
  "q3_shipping_priority": ["BroadcastHashJoin", "TakeOrderedAndProject"],
  "q1_pricing_summary": ["PushedFilters"],
  "q6_revenue_forecast": ["PushedFilters"],
  "cdc_apply_changes": ["Exchange"],
  "topk_per_group": ["WindowGroupLimit"],
  "join_semi": ["LeftSemi"],
  "join_anti": ["LeftAnti"],
  "emb_cosine_topk": ["BroadcastNestedLoopJoin"],
  "events_asof_join": ["Window"],
}
for name, pats in checks.items():
    p = plan_of(name)
    found = {pat: (pat in p) for pat in pats}
    n_exch = len(re.findall(r"\bExchange\b", p))
    print(f"{name}: exchanges={n_exch} " + " ".join(f"{k}={'Y' if v else 'N'}" for k, v in found.items()), flush=True)

# details worth eyeballing
p = plan_of("q1_pricing_summary")
for line in p.splitlines():
    if "PushedFilters" in line or "ReadSchema" in line:
        print("q1 |", line.strip()[:200], flush=True)
p = plan_of("cdc_apply_changes")
print("cdc exchanges:", re.findall(r"Exchange (\w+)", p), flush=True)
print("PLANSDONE", flush=True)
