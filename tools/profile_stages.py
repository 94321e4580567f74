"""Per-STAGE drill-down for one query via the Spark UI REST API.

Runs the query once (noop sink) and prints every non-skipped stage with
executor run time, task count, I/O and the first line of the stage name
— identifies WHICH stage inside a multi-job query burns the time.

Usage: python tools/profile_stages.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from insect_observation_data_pipeline_spark import get_spark  # noqa: E402
from insect_observation_data_pipeline_spark.queries import QUERIES  # noqa: E402


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("profile-stages")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    if sc.uiWebUrl is None:  # ADVICE r15: fail fast
        sys.exit(
            "Spark UI disabled (sc.uiWebUrl is None): the REST profiler "
            "needs spark.ui.enabled=true"
        )
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    # warm once so JIT noise doesn't dominate the ranking
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    sc.setJobGroup(name, name)
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    sc.setJobGroup(None, None)
    jobs = [j for j in _get(f"{base}/jobs") if j.get("jobGroup") == name]
    stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
    rows = []
    for sid in stage_ids:
        try:
            for st in _get(f"{base}/stages/{sid}"):
                if st.get("status") == "SKIPPED":
                    continue
                rows.append(st)
        except Exception:  # noqa: BLE001
            continue
    rows.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(f"{name}: wall {wall:.2f}s, {len(jobs)} jobs, {len(rows)} stages")
    print(
        f"{'sid':>4} {'run_s':>7} {'tasks':>5} {'in_mb':>7} {'shr_mb':>7} "
        f"{'shw_mb':>7}  name"
    )
    for st in rows:
        nm = (st.get("name") or "").splitlines()[0][:90]
        print(
            f"{st['stageId']:>4} {st.get('executorRunTime', 0) / 1000:>7.2f} "
            f"{st.get('numCompleteTasks', 0):>5} "
            f"{st.get('inputBytes', 0) / 1e6:>7.1f} "
            f"{st.get('shuffleReadBytes', 0) / 1e6:>7.1f} "
            f"{st.get('shuffleWriteBytes', 0) / 1e6:>7.1f}  {nm}"
        )


if __name__ == "__main__":
    main()
