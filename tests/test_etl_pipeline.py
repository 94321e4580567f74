"""End-to-end ETL1+ETL2 on reference-shaped fixtures (SURVEY §5 rebuild
test plan): invariants from the reference's constraints + quirks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insect_observation_data_pipeline_spark.etl import etl1, etl2
from insect_observation_data_pipeline_spark.queries import reference as refq
from insect_observation_data_pipeline_spark.sources.csv import read_csv_staging


@pytest.fixture(scope="module")
def pipeline(spark, fixtures_dir):
    inst_stg = read_csv_staging(
        spark, str(fixtures_dir / "institutions.csv"), etl1.INSTITUTIONS_COLS,
        defaults={"country": "United Kingdom"},
    )
    users_stg = read_csv_staging(
        spark, str(fixtures_dir / "users.csv"), etl1.USERS_COLS
    )
    obs_stg = read_csv_staging(
        spark, str(fixtures_dir / "observations.csv"), etl1.OBSERVATIONS_COLS
    ).withColumn("raw_data_id", F.monotonically_increasing_id())

    r1 = etl1.load_institutions(inst_stg)
    r2 = etl1.load_users(users_stg, r1.silver["institutions"])
    r3 = etl1.load_observations(
        obs_stg, r2.silver["users"], r2.silver["user_institution"]
    )
    silver = {**r1.silver, **r2.silver, **r3.silver}
    quarantine = {**r1.quarantine, **r2.quarantine, **r3.quarantine}
    gold = etl2.build_gold(silver)
    return {"silver": silver, "quarantine": quarantine, "gold": gold,
            "obs_stg": obs_stg}


def test_quarantine_counts(pipeline):
    q = pipeline["quarantine"]
    assert q["invalid_institutions"].count() == 1
    # bbroken (missing email) + cbadd (bad date)
    msgs = {r["username"]: r["error_message"] for r in q["invalid_users"].collect()}
    assert msgs == {
        "bbroken": "Missing required field: email.",
        "cbadd": "Unparseable date: affiliation_start.",
    }
    obs_msgs = sorted(
        r["error_message"] for r in q["invalid_observations"].collect()
    )
    assert obs_msgs == sorted([
        "Missing authors.", "Missing pollinator species.",
        "Invalid interactions value.", "Invalid latitude.",
        "Invalid pollination quality.", "Invalid pollen flag.",
    ])


def test_geography_and_lookups(pipeline):
    s = pipeline["silver"]
    assert s["countries"].count() == 1
    assert {r["institution_name"] for r in s["institutions"].collect()} == {
        "Institute of Advanced Waggling", "The Bumblebee Behaviour Bureau",
        "Apiary Analytics", "Unaffiliated",
    }
    # species normalized to 'Genus species'
    assert {r["species_name"] for r in s["pollinator_species"].collect()} == {
        "Apis mellifera", "Bombus terrestris",
    }
    # locations deduped on (lat, lon), all valid rows with coords
    locs = s["locations"].collect()
    assert len(locs) == len({(r["latitude"], r["longitude"]) for r in locs})
    assert len(locs) == 2


def test_scd2_invariants(pipeline):
    ui = pipeline["silver"]["user_institution"].orderBy("user_id", "start_date")
    rows = ui.collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for intervals in by_user.values():
        for a, b in zip(intervals, intervals[1:]):
            assert a["end_date"] is not None and a["end_date"] < b["start_date"]
        assert intervals[-1]["end_date"] is None  # current interval open
    # chapdude63 has 2 affiliation intervals
    chap = [r for r in rows if r["institution_name"] == "The Bumblebee Behaviour Bureau"]
    assert len(chap) == 1 and chap[0]["end_date"] is None


def test_january_placeholder_and_null_year(pipeline):
    obs = pipeline["silver"]["observations"]
    jan = obs.filter(
        (F.month("observation_date") == 1) & (F.dayofmonth("observation_date") == 1)
    )
    assert jan.count() == 1  # the missing-month row
    assert obs.filter(F.col("observation_date").isNull()).count() == 1  # missing year


def test_feb_clamp(pipeline):
    obs = pipeline["silver"]["observations"]
    feb = obs.filter(F.month("observation_date") == 2).collect()
    assert len(feb) == 1 and str(feb[0]["observation_date"]) == "2019-02-28"


def test_duplicates_survive_and_rerun_doubles(spark, pipeline):
    """Observations are append-only; full dup rows are legal and re-ingest
    doubles the data by design (README.md:19)."""
    obs = pipeline["silver"]["observations"]
    n = obs.count()
    assert n == 8  # 14 staged - 6 quarantined
    doubled_stg = pipeline["obs_stg"].unionByName(pipeline["obs_stg"]).withColumn(
        "raw_data_id", F.monotonically_increasing_id()
    )
    r = __import__("insect_observation_data_pipeline_spark.etl.etl1", fromlist=["etl1"]).load_observations(
        doubled_stg,
        pipeline["silver"]["users"],
        pipeline["silver"]["user_institution"],
    )
    assert r.silver["observations"].count() == 2 * n
    # dims must NOT double
    assert r.silver["pollinator_species"].count() == pipeline["silver"]["pollinator_species"].count()


def test_earliest_affiliation_fallback(pipeline):
    """An observation predating the user's first affiliation attaches to
    the earliest interval (README.md:26-27)."""
    s = pipeline["silver"]
    old = s["observations"].filter(F.year("observation_date") == 2005).collect()
    assert len(old) == 1
    ui = {r["user_institution_id"]: r for r in s["user_institution"].collect()}
    attached = ui[old[0]["user_institution_id"]]
    users = {r["user_id"]: r["username"] for r in s["users"].collect()}
    assert users[attached["user_id"]] == "chapdude63"
    assert str(attached["start_date"]) == "2018-04-08"  # earliest interval


def test_fact_grain_unique(pipeline):
    g = pipeline["gold"]
    for name, keys in [
        ("fact_pollination_activity",
         ["pollinator_sk", "caste_sk", "plant_sk", "habitat_sk", "location_sk", "date_sk"]),
        ("fact_user_location_monthly",
         ["user_sk", "location_sk", "date_sk", "institution_sk", "subscription_type_sk"]),
        ("fact_user_monthly_summary",
         ["user_sk", "date_sk", "institution_sk", "subscription_type_sk"]),
    ]:
        f = g[name]
        assert f.count() == f.select(*keys).distinct().count(), name


def test_fact_totals_consistent(pipeline):
    s, g = pipeline["silver"], pipeline["gold"]
    base = s["observations"].filter(
        F.col("observation_date").isNotNull() & F.col("location_id").isNotNull()
    )
    total = base.count()
    fact_total = g["fact_pollination_activity"].agg(
        F.sum("observation_count").alias("n")
    ).collect()[0]["n"]
    assert fact_total == total


def test_reference_queries_run(pipeline):
    s, g = pipeline["silver"], pipeline["gold"]
    assert refq.top_plant_pollinator_pairs(s).count() > 0
    assert refq.most_observed_habitats(s).count() > 0
    assert refq.summary_by_pollination_quality(s).count() > 0
    assert refq.top_users_by_observations(s).count() > 0
    months = refq.top_confirmed_months(g).collect()
    assert all(r["month_name"] != "January" for r in months)
    assert refq.top_location_months(g).count() > 0
    assert refq.top_monthly_locations_per_user(g).count() > 0


def test_reference_sql_twins_match_dataframe(spark, pipeline):
    """EP3 dual surface: spark.sql twins produce the same rows as the
    DataFrame functions (same Catalyst plans underneath)."""
    from insect_observation_data_pipeline_spark.queries import reference as refq

    s, g = pipeline["silver"], pipeline["gold"]
    refq.register_layers(spark, s, g)
    pairs = [
        (refq.top_plant_pollinator_pairs(s), "top_plant_pollinator_pairs"),
        (refq.most_observed_habitats(s), "most_observed_habitats"),
        (refq.top_users_by_observations(s), "top_users_by_observations"),
        (refq.summary_by_pollination_quality(s), "summary_by_pollination_quality"),
        (refq.top_confirmed_months(g), "top_confirmed_months"),
        (refq.top_location_months(g), "top_location_months"),
        (refq.top_monthly_locations_per_user(g), "top_monthly_locations_per_user"),
    ]
    for df, key in pairs:
        got = [tuple(r) for r in spark.sql(refq.REFERENCE_SQL[key]).collect()]
        expected = [tuple(r) for r in df.collect()]
        assert got == expected, key


def test_observation_etl_at_volume(spark, pipeline):
    """50k synthetic staged observation rows through the full ETL1
    observation path: guards against accidentally quadratic behavior
    (self-joins, per-row Python) and re-checks invariants at volume."""
    from insect_observation_data_pipeline_spark.etl import etl1

    n = 50_000
    base = spark.range(n).withColumnRenamed("id", "raw_data_id")
    cols = {
        "authors": F.concat(F.lit("R. E. Chapman; observer "), F.col("raw_data_id") % 7),
        "pollinator_species": F.concat(F.lit("bombus sp"), F.col("raw_data_id") % 50),
        "plant_species": F.concat(F.lit("trifolium sp"), F.col("raw_data_id") % 40),
        "habitat": F.when(F.col("raw_data_id") % 2 == 0, "urban").otherwise("suburban"),
        "caste": F.when(F.col("raw_data_id") % 3 == 0, "worker").otherwise("queen"),
        "interactions": (F.col("raw_data_id") % 9 + 1).cast("string"),
        "date": F.lit(None).cast("string"),
        "month": ((F.col("raw_data_id") % 12) + 1).cast("string"),
        "year": (F.lit(2015) + F.col("raw_data_id") % 8).cast("string"),
        "latitude": (F.lit(51.0) + (F.col("raw_data_id") % 500) / 1000.0).cast("string"),
        "longitude": (F.lit(-1.0) - (F.col("raw_data_id") % 500) / 1000.0).cast("string"),
        "pollination": ((F.col("raw_data_id") % 4) + 1).cast("string"),
        "pollen": F.when(F.col("raw_data_id") % 2 == 0, "Y").otherwise("N"),
        "nectar": F.when(F.col("raw_data_id") % 5 == 0, "Y").otherwise("N"),
    }
    staged = base
    for c in etl1.OBSERVATIONS_COLS:
        staged = staged.withColumn(c, cols.get(c, F.lit("NA")))

    users = pipeline["silver"]["users"]
    ui = pipeline["silver"]["user_institution"]
    r = etl1.load_observations(staged, users, ui)
    obs = r.silver["observations"]
    assert obs.count() == n  # all rows valid by construction
    assert r.silver["pollinator_species"].count() == 50
    assert r.silver["plant_species"].count() == 40
    assert r.silver["locations"].count() == 500
    # January-placeholder rule: month backfilled dates always day 1
    assert (
        obs.filter(F.dayofmonth("observation_date") != 1).count() == 0
    )
