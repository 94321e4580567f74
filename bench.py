"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>,
   "n": <runs per query>, "deltas_vs_prev": {name: ratio, ...}}

Each query executes end-to-end via the noop sink (full plan runs on the
cluster, no driver-side result transfer skewing the timing). Session
startup and the warmup run are excluded. Each query is timed
$SPARK_GRAFT_BENCH_N times (default 5) in round-robin passes — order
bias and GC spikes average out — and the reported number is the
per-query MEDIAN, so run-to-run noise can't masquerade as a
regression. ``deltas_vs_prev`` is this run / the latest committed
BENCH_r*.json per query (>1 = slower than last round).
"""

from __future__ import annotations

import glob
import json
import os
import statistics
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

# round-3+ operators, timed separately so the headline total stays
# comparable across rounds (same 14-query set since round 1)
EXTENDED_QUERIES = [
    "x11_dedup_embedding",
    "x13_ann_lsh_multiprobe",
    "x15_pack_sequences",
    "x17_tfidf_top_terms",
    "x19_bigram_topk",
    "h1_dup_clusters",
    "e3_sliding_window_stats",
    "m2_media_features",
    "x27_jaccard_maxdf",
    "x28_quantize_int8",
    "x29_incremental_dedup",
    "x31_corpus_summary",
]


def run_once(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def calibration_sec(spark, n_runs: int = 3) -> float:
    """Median wall-clock of a FIXED pure-codegen workload (sum over a
    2e8 range — no I/O, no shuffle variance). Query timings on a shared
    host move with CPU steal / frequency drift; this number moves with
    them, so cross-round comparisons can separate machine-speed drift
    from genuine plan regressions: if every query's delta matches the
    calibration delta, the machine changed, not the code."""
    samples = []
    df = spark.range(200_000_000).selectExpr("sum(id) AS s")
    run_once(df)  # warm
    for _ in range(n_runs):
        t0 = time.time()
        run_once(df)
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 3)


def _prev_bench() -> dict[str, float]:
    """Per-query timings from the latest committed BENCH_r*.json."""
    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if not files:
        return {}
    try:
        with open(files[-1]) as f:
            d = json.load(f)
        # the driver wraps bench.py's JSON line under "parsed"
        return d.get("queries") or d.get("parsed", {}).get("queries", {})
    except (OSError, json.JSONDecodeError):
        return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_N", "5"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: one untimed pass over the full set (JIT, codegen compile,
    # parquet footer caches) so timings measure steady-state execution
    for name in BENCH_QUERIES:
        run_once(QUERIES[name](spark, sf_dir))

    samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for _ in range(n_runs):
        for name in BENCH_QUERIES:
            t0 = time.time()
            run_once(QUERIES[name](spark, sf_dir))
            samples[name].append(time.time() - t0)
    timings = {
        name: round(statistics.median(ts), 3) for name, ts in samples.items()
    }

    # extended set: warm once, 3 timed round-robin passes, medians
    ext_samples: dict[str, list[float]] = {n: [] for n in EXTENDED_QUERIES}
    for name in EXTENDED_QUERIES:
        run_once(QUERIES[name](spark, sf_dir))
    for _ in range(min(3, n_runs)):
        for name in EXTENDED_QUERIES:
            t0 = time.time()
            run_once(QUERIES[name](spark, sf_dir))
            ext_samples[name].append(time.time() - t0)
    ext_timings = {
        name: round(statistics.median(ts), 3) for name, ts in ext_samples.items()
    }

    prev = _prev_bench()
    deltas = {
        name: round(timings[name] / prev[name], 3)
        for name in timings
        if prev.get(name)
    }
    calib = calibration_sec(spark)

    print(
        json.dumps(
            {
                "metric": "headline query wall-clock, noop sink",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n": n_runs,
                "deltas_vs_prev": deltas,
                "calib_sec": calib,
                "extended_queries": ext_timings,
                "extended_total": round(sum(ext_timings.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
