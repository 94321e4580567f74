"""Physical-plan introspection: make scale properties assertable.

The 100 TB posture lives or dies on plan shape, not code style. These
helpers parse ``explain('formatted')`` output so tests can assert the
properties that matter:

- filters reached the parquet scan (PushedFilters),
- column pruning happened (ReadSchema width),
- small dims broadcast (BroadcastHashJoin / BroadcastNestedLoopJoin),
- no accidental CartesianProduct,
- whole-stage codegen covers the hot path.

Parsing explain text is inherently version-coupled; these are test/debug
aids, not runtime dependencies.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    """``explain()`` simple-mode text. Unlike formatted mode, exchange
    nodes here carry their partitioning inline ("Exchange
    hashpartitioning(...)"), so shuffle counting must use THIS form —
    formatted mode splits the arguments onto separate lines and a
    substring count silently reads 0."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def executed_plan_string(df: DataFrame) -> str:
    """Final physical plan AFTER running the query (empty string if the
    run fails). Under AQE this is the only form that shows the real
    story: WholeStageCodegen subtrees exist only once stages
    materialize, and runtime re-plans (broadcast conversion, skew
    splits, coalesced partitions) appear nowhere else. Executes the
    DataFrame's OWN query execution (collect) — a noop-sink write would
    finalize the write command's separate QueryExecution and leave this
    df's AdaptiveSparkPlanExec untouched (observed: codegen invisible)."""
    try:
        df.collect()
        return df._jdf.queryExecution().executedPlan().toString()
    except Exception:  # noqa: BLE001 — audit aid, never the gate
        return ""


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans, one WHOLE entry per item.

    Bracket-matched + top-level split (round-12 review): the old
    ``[^\\]]*`` regex truncated the list at the first ``]`` inside an
    ``In(col, [a,b])`` entry — silently dropping every later pushed
    filter — and a flat ``split(',')`` sheared two-argument entries
    like ``GreaterThan(l_quantity,45.0)`` into fragments no assertion
    could ever match."""
    plan = formatted_plan(df)
    out: list[str] = []
    marker = "PushedFilters: ["
    pos = 0
    while True:
        start = plan.find(marker, pos)
        if start < 0:
            break
        i, depth = start + len(marker), 1
        while i < len(plan) and depth:
            if plan[i] == "[":
                depth += 1
            elif plan[i] == "]":
                depth -= 1
            i += 1
        entry = plan[start + len(marker) : i - 1].strip()
        if entry:
            out.extend(
                p.strip() for p in _split_top_level(entry) if p.strip()
            )
        pos = i
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """TOP-LEVEL column lists read by each parquet scan (pruning check).

    Angle-bracket matched + top-level split (round-13 review, the same
    defect class as round-12's pushed_filters fix): the old
    ``struct<([^>]*)>`` regex stopped at the FIRST ``>`` and the flat
    ``split(',')`` then minted phantom columns from nested struct
    fields — ``struct<a:int,b:struct<c:int,d:int>>`` read back as
    ``['a', 'b', 'd']``."""
    plan = formatted_plan(df)
    out = []
    marker = "ReadSchema: struct<"
    pos = 0
    while True:
        start = plan.find(marker, pos)
        if start < 0:
            break
        i, depth = start + len(marker), 1
        while i < len(plan) and depth:
            if plan[i] == "<":
                depth += 1
            elif plan[i] == ">":
                depth -= 1
            i += 1
        body = plan[start + len(marker) : i - 1]
        cols, d, cur = [], 0, []
        for ch in body + ",":
            if ch in "<(":
                d += 1
            elif ch in ">)":
                d -= 1
            if ch == "," and d == 0:
                seg = "".join(cur).strip()
                if seg:
                    cols.append(seg.split(":", 1)[0].strip())
                cur = []
            else:
                cur.append(ch)
        out.append(cols)
        pos = i
    return out


def _balanced_args(txt: str, start: int) -> str:
    """Return the argument string of the call whose '(' is at ``start``,
    consuming nested parens correctly."""
    depth = 0
    for i in range(start, len(txt)):
        c = txt[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return txt[start + 1 : i]
    return txt[start + 1 :]


def _split_top_level(args: str) -> list[str]:
    """Split on commas at paren/bracket depth 0 only (``round(x, 2)
    ASC`` and ``In(col, [a,b])`` each stay one segment)."""
    out, depth, cur = [], 0, []
    for c in args:
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        if c == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    out.append("".join(cur))
    return out


def unpartitioned_windows(df: DataFrame) -> int:
    """Count window specs with NO partition columns — global sorts that
    funnel every row through one partition (the scale killer the hashed
    surrogate keys removed; assert 0 in ETL plans).

    In the analyzed plan a spec prints as
    ``windowspecdefinition([part cols,] order col ASC|DESC ..., frame)``;
    partition columns never carry a sort direction, so a first top-level
    segment with ASC/DESC (or going straight to the frame) means
    unpartitioned. Parsing is paren-aware: an order expression containing
    commas or nested parens (``round(x, 2) ASC``) cannot split
    mid-expression and silently hide a global sort.
    """
    txt = df._jdf.queryExecution().analyzed().toString()
    n = 0
    for m in re.finditer(r"windowspecdefinition\(", txt):
        args = _balanced_args(txt, m.end() - 1)
        first = _split_top_level(args)[0]
        if (
            " ASC" in first
            or " DESC" in first
            or first.strip().startswith("specifiedwindowframe")
        ):
            n += 1
    return n


def join_key_names(df: DataFrame) -> list[list[str]]:
    """Equi-join key column names per join side, from the formatted plan's
    ``Left keys``/``Right keys`` lines — lets tests assert that a salting
    rewrite really moved the salt columns into the shuffle key."""
    plan = formatted_plan(df)
    out: list[list[str]] = []
    # bracket-matched like pushed_filters (round-13 review): the old
    # [^\]]* regex stopped at a ']' INSIDE a key expression (e.g.
    # arr#3[0]), truncating the key list
    for m in re.finditer(r"(?:Left|Right) keys(?: \[\d+\])?: \[", plan):
        i, depth = m.end(), 1
        while i < len(plan) and depth:
            if plan[i] == "[":
                depth += 1
            elif plan[i] == "]":
                depth -= 1
            i += 1
        entry = plan[m.end() : i - 1]
        cols = [
            re.sub(r"#\d+L?", "", c).strip()
            for c in _split_top_level(entry)
            if c.strip()
        ]
        out.append(cols)
    return out


def plan_flags(df: DataFrame) -> dict[str, bool]:
    plan = formatted_plan(df)
    return {
        "broadcast_hash_join": "BroadcastHashJoin" in plan,
        "broadcast_nested_loop_join": "BroadcastNestedLoopJoin" in plan,
        "sort_merge_join": "SortMergeJoin" in plan,
        "shuffled_hash_join": "ShuffledHashJoin" in plan,
        "cartesian_product": "CartesianProduct" in plan,
        "whole_stage_codegen": "WholeStageCodegen" in plan or "codegen id" in plan,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "python_udf": "BatchEvalPython" in plan or "ArrowEvalPython" in plan,
    }


def _stage_seq(spark):
    """All stages the app status store knows about, as a py4j Seq of
    v1.StageData (py4j needs the scala default args passed explicitly;
    ``stageList$default$4`` is the unresolved-quantiles array)."""
    store = spark._jsc.sc().statusStore()
    jvm = spark._jvm
    d4 = getattr(store, "stageList$default$4")()
    return store.stageList(
        jvm.java.util.ArrayList(), False, False, d4, jvm.java.util.ArrayList()
    )


def shuffle_write_stages(df: DataFrame) -> list[dict]:
    """Execute the DataFrame (collect) and return the shuffle-WRITE
    metrics of exactly the stages that ran for it: one dict per new
    non-skipped stage with ``bytes``/``records``/``name``. This is the
    measured form of the plan-shape claims — "this agg's shuffle is
    bounded by groups x 256 registers" (w2b) becomes an assertable
    number instead of an explain-text argument (round-11 verdict #2).

    Implementation: the driver's AppStatusStore accumulates every
    stage's executor-aggregated metrics; snapshot the known stage ids,
    run, drain the listener bus (the store is fed asynchronously),
    and report only stages that appeared. Driver-side introspection —
    scale-safe (metrics are O(stages), pre-aggregated by the engine),
    but a test/evidence aid, never a runtime dependency."""
    spark = df.sparkSession
    # drain the async listener bus BEFORE the snapshot too (round-12
    # review): a just-finished previous action's stage events may still
    # be queued — without the drain they land in the store after the
    # snapshot and get attributed to THIS run's measurement
    spark._jsc.sc().listenerBus().waitUntilEmpty()
    before = set()
    seq = _stage_seq(spark)
    for i in range(seq.length()):
        before.add(seq.apply(i).stageId())
    df.collect()
    spark._jsc.sc().listenerBus().waitUntilEmpty()
    out: list[dict] = []
    skipped: list[int] = []
    seq = _stage_seq(spark)
    for i in range(seq.length()):
        s = seq.apply(i)
        if s.stageId() in before:
            continue
        if s.status().toString() == "SKIPPED":
            skipped.append(s.stageId())
            continue
        out.append(
            {
                "stage_id": s.stageId(),
                "bytes": s.shuffleWriteBytes(),
                "records": s.shuffleWriteRecords(),
                "name": str(s.name()),
            }
        )
    # An evidence helper must fail loudly, never attest 0 bytes for a
    # run that reused materialized shuffle output (round-12 review): a
    # DataFrame whose action already ran re-reads its map outputs, the
    # shuffle stages come back SKIPPED, and a bounded-shuffle assertion
    # over the totals would pass on numbers that measure nothing.
    # SKIPPED entries alone are NOT the signal — AQE reports skipped
    # parent entries even on a completely fresh execution (each
    # materialized query stage reappears as a skipped parent of the
    # final job, with the real write counted in its own COMPLETE
    # stage). The malign case is skipped entries with NO observed
    # shuffle write anywhere: full lineage reuse (indistinguishable
    # here from a fresh run whose every shuffle is empty — the helper
    # refuses both rather than attest an unverifiable zero). Partial
    # reuse of a persisted upstream is NOT detected; callers must
    # rebuild the DataFrame from source, as tools/shuffle_evidence.py
    # does.
    if skipped and not any(s["bytes"] or s["records"] for s in out):
        raise RuntimeError(
            f"shuffle measurement vacuous: stages {sorted(skipped)} were "
            "SKIPPED and no new stage wrote shuffle output — this "
            "DataFrame's lineage was already materialized (or every "
            "shuffle is empty); rebuild it from source so the writes are "
            "observed"
        )
    if not out:
        raise RuntimeError(
            "shuffle measurement vacuous: the collect launched no stages "
            "(local relation or fully short-circuited plan)"
        )
    return sorted(out, key=lambda d: d["stage_id"])


def shuffle_write_totals(df: DataFrame) -> tuple[int, int]:
    """(total shuffle bytes written, total records) for one execution
    of ``df`` — the sum over :func:`shuffle_write_stages`."""
    stages = shuffle_write_stages(df)
    return (
        sum(s["bytes"] for s in stages),
        sum(s["records"] for s in stages),
    )
