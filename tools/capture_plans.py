"""Capture ``.explain("formatted")`` for queries into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [sf_dir] [query ...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt for each
query (suffix is "before" / "after"; round defaults to r16).
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from insect_observation_data_pipeline_spark import get_spark  # noqa: E402
from insect_observation_data_pipeline_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    if len(sys.argv) < 2:  # ADVICE r15: usage, not a bare IndexError
        sys.exit(__doc__)
    suffix = sys.argv[1]
    args = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.1"
    # ADVICE r15: only treat args[0] as sf_dir when it is NOT a known
    # query name — a same-named directory in the cwd must not silently
    # flip a one-query capture into a 120-query run
    if args and args[0] not in QUERIES and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    names = args or list(QUERIES)
    out_dir = os.path.join(
        REPO_ROOT, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {type(e).__name__}: {e}\n"
        finally:
            spark.catalog.clearCache()
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name)


if __name__ == "__main__":
    main()
