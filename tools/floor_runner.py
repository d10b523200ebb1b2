"""Isolated sf-floor runner: one process, warm best-of-2, one query —
the SCALE.md floor methodology (in-sweep numbers lie; floors are
measured one JVM at a time on an idle box).

Usage: PYTHONPATH=. python tools/floor_runner.py <query> [sf_dir]
Prints one JSON line {"query":..., "sf_dir":..., "warm_best_s":...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(REPO, ".scale", "sf10")

    from postgres_es_cdc_spark.queries import REGISTRY
    from postgres_es_cdc_spark.session import get_spark

    spark = get_spark(app_name=f"floor-{name}")
    spark.sparkContext.setLogLevel("ERROR")

    def run() -> float:
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        return time.time() - t0

    cold = run()                       # JIT/codegen warm-up
    best = min(run(), run())
    print(json.dumps({"query": name, "sf_dir": sf_dir,
                      "cold_s": round(cold, 2),
                      "warm_best_s": round(best, 2)}))


if __name__ == "__main__":
    main()
