"""Quarantine split: route invalid rows to an error sink with a reason.

Reproduces the reference's validate-then-delete pattern (S8/J7 in SURVEY
§2): every load appends rows violating NOT-NULL / format / range rules to
``invalid_*`` tables with a human-readable reason and a JSON snapshot of
the row, then removes them from staging
(/root/reference/03_sql/02_etl_csv_to_oltp/02_ETL1_part1.sql:30-35,
03_ETL1_part2.sql:54-74, 04_ETL1_part3.sql:158-235).

Spark-first design: ONE expression computes the first matching rule per
row as a CASE chain (``coalesce(when(r1)..., when(r2)...)``), then the
good/bad split is two filters over the same tagged projection — no
semi-join delete, no PER-RULE scan of the input. At 100 TB this matters:
the reference's formulation is k appends + k deletes (2k scans of
staging); ours evaluates every rule in one codegen'd projection with
zero shuffles. The two returned frames are LAZY — materializing both
rescans the input once each (2 scans total, vs the reference's 2k);
callers writing both sinks back-to-back should ``df.persist()`` the
input (or write the tagged frame once and filter the files) if even
that second scan is too expensive.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ERROR_COL = "error_message"
ROW_DATA_COL = "row_data"


@dataclass(frozen=True)
class Rule:
    """A validation rule: rows where ``predicate`` holds are INVALID."""

    predicate: Column
    message: str


def first_violation(rules: list[Rule]) -> Column:
    """First matching rule's message, NULL when the row is valid.

    Rule order is the reference's script order — the first failing check
    names the row's error, like the sequential INSERT..WHERE batches in
    04_ETL1_part3.sql:158-235.
    """
    out = F.lit(None).cast("string")
    for rule in reversed(rules):
        out = F.when(rule.predicate, F.lit(rule.message)).otherwise(out)
    return out


def split_valid_invalid(
    df: DataFrame, rules: list[Rule], *, capture_row: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Return ``(valid, invalid)``.

    ``invalid`` carries ``error_message`` plus (optionally) the whole input
    row serialized as JSON — the Spark analogue of the reference's
    ``to_jsonb(stg)`` payload (04_ETL1_part3.sql:162,179,194).
    """
    tagged = df.withColumn(ERROR_COL, first_violation(rules))
    valid = tagged.filter(F.col(ERROR_COL).isNull()).drop(ERROR_COL)
    invalid = tagged.filter(F.col(ERROR_COL).isNotNull())
    if capture_row:
        invalid = invalid.withColumn(
            ROW_DATA_COL, F.to_json(F.struct(*[F.col(c) for c in df.columns]))
        )
    return valid, invalid
