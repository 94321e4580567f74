"""Text normalization functions from the reference ETL.

Reference semantics reproduced (file:line into /root/reference/):
- NA/''->NULL normalization: 03_sql/02_etl_csv_to_oltp/04_ETL1_part3.sql:117-154
- person-name parsing ("R. E. Chapman" -> initials + last name):
  03_ETL1_part2.sql:112-121 (LIKE '%.% %' detector, REVERSE/SPLIT_PART
  mechanics re-expressed with substring_index)
- species capitalization ("apis MELLIFERA" -> "Apis mellifera"):
  04_ETL1_part3.sql:246-251
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_na(c: Column) -> Column:
    """TRIM; then ''/'NA' -> NULL (the reference's NULLIF ladder)."""
    t = F.trim(c)
    return F.when((t == "") | (t == "NA"), F.lit(None).cast("string")).otherwise(t)


def is_initials_name(full_name: Column) -> Column:
    """The reference's LIKE '%.% %' detector: a dot before a space means
    'initials + last name' format (else an org/full name)."""
    return full_name.like("%.% %")


def parse_last_name(full_name: Column) -> Column:
    """Last word for initials-format names; the whole name otherwise."""
    t = F.trim(full_name)
    return F.when(is_initials_name(t), F.substring_index(t, " ", -1)).otherwise(t)


def parse_first_name(full_name: Column) -> Column:
    """Everything before the last word for initials-format names; NULL
    otherwise."""
    t = F.trim(full_name)
    prefix = F.regexp_extract(t, r"^(.*)\s+\S+$", 1)
    return F.when(is_initials_name(t), prefix).otherwise(F.lit(None).cast("string"))


def boolean_literal(c: Column) -> Column:
    """Postgres-style boolean-literal cast, the semantics the reference's
    ``pollen::BOOLEAN`` / ``nectar::BOOLEAN`` relies on
    (04_ETL1_part3.sql:441-442): case-insensitive y/yes/t/true/1/on ->
    true, n/no/f/false/0/off -> false, anything else -> NULL (the
    reference rows with junk flags are quarantined before the cast, so
    NULL-for-invalid keeps the valid-path semantics identical while
    staying total)."""
    t = F.lower(F.trim(c))
    return (
        F.when(t.isin("y", "yes", "t", "true", "1", "on"), F.lit(True))
        .when(t.isin("n", "no", "f", "false", "0", "off"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def species_case(c: Column) -> Column:
    """'Genus species' normalization: first letter upper, rest lower."""
    t = F.trim(c)
    return F.concat(F.upper(F.substring(t, 1, 1)), F.lower(F.substring(t, 2, 1_000_000)))
