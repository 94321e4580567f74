"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Each query executes end-to-end via the noop sink (full plan runs on the
cluster, no driver-side result transfer skewing the timing). Session
startup and the warmup run are excluded — the numbers are steady-state
query wall-clock on local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from insect_observation_data_pipeline_spark import get_spark
from insect_observation_data_pipeline_spark.queries import QUERIES

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "flagship_top_part_supplier",
    "a8_top_nation_months",
    "w2_best_month_per_customer",
    "a7_distinct_on_first_line",
    "j9_interval_attribution",
    "s8_quarantine_events",
    "x1_dedup_exact",
    "x7_minhash_lsh",
    "x8_simhash",
    "x9_ann_bruteforce",
    "e2_sessionization",
]


def run_once(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: one untimed pass over the full set (JIT, codegen compile,
    # parquet footer caches) so timings measure steady-state execution
    for name in BENCH_QUERIES:
        run_once(QUERIES[name](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        run_once(QUERIES[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline query wall-clock, noop sink",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
