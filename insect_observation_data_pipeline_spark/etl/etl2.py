"""ETL2: silver (OLTP-shaped) -> gold Kimball star (OLAP-shaped).

Rebuilds /root/reference/03_sql/04_etl_oltp_to_olap/ (dims 07_ETL2_part1,
facts 08_ETL2_part2) plus the star DDL semantics of
03_olap/05_create_olap.sql. The reference's ON CONFLICT upserts become
full recompute + overwrite: every gold table is a pure function of silver
state, which is exactly what the upserts converge to (M2 in SURVEY §2i).
The postgres_fdw staging hop (06_connect_olap_to_oltp.sql) disappears —
silver frames are read directly.

Scale notes: dims are small (broadcast everywhere); facts group the
observation stream by a handful of surrogate keys — one shuffle each,
partial aggregation map-side. dim_date is month-grain (05_create_olap.sql:
37-44), so fact date joins are on (year, month) extracted once.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from insect_observation_data_pipeline_spark.functions.keys import with_hash_sk
from insect_observation_data_pipeline_spark.sources.seed import SUBSCRIPTION_TYPES


def _sk(df: DataFrame, name: str, business_cols: list[str]) -> DataFrame:
    """xxhash64(business key) surrogate — per-row, no global window
    (functions/keys.py)."""
    return with_hash_sk(df, name, business_cols)


def build_dims(silver: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Dimensions by business key (07_ETL2_part1.sql:5-145)."""
    dims: dict[str, DataFrame] = {}
    dims["dim_pollinator"] = _sk(
        silver["pollinator_species"].select(
            F.col("pollinator_id").alias("pollinator_id_bk"),
            "nbn_code",
            "species_name",
        ),
        "pollinator_sk",
        ["species_name"],
    )
    dims["dim_plant"] = _sk(
        silver["plant_species"].select(
            F.col("plant_id").alias("plant_id_bk"), "nbn_code", "species_name"
        ),
        "plant_sk",
        ["species_name"],
    )
    dims["dim_caste"] = _sk(
        silver["castes"].select(
            F.col("caste_id").alias("caste_id_bk"), "caste_name"
        ),
        "caste_sk",
        ["caste_name"],
    )
    dims["dim_habitat"] = _sk(
        silver["habitats"].select(
            F.col("habitat_id").alias("habitat_id_bk"), "habitat_name"
        ),
        "habitat_sk",
        ["habitat_name"],
    )
    dims["dim_location"] = _sk(
        silver["locations"].select(
            F.col("location_id").alias("location_id_bk"), "latitude", "longitude"
        ),
        "location_sk",
        ["latitude", "longitude"],
    )
    # month-grain dim_date from observed dates (05_create_olap.sql:37-44)
    dates = (
        silver["observations"]
        .filter(F.col("observation_date").isNotNull())
        .select(
            F.year("observation_date").alias("year"),
            F.month("observation_date").alias("month"),
        )
        .distinct()
    )
    dims["dim_date"] = _sk(
        dates.withColumn(
            "month_name",
            F.date_format(F.make_date("year", "month", F.lit(1)), "MMMM"),
        ).withColumn(
            "month_year",
            F.date_format(F.make_date("year", "month", F.lit(1)), "yyyy-MM"),
        ),
        "date_sk",
        ["year", "month"],
    )
    dims["dim_user"] = _sk(
        silver["users"].select(
            F.col("user_id").alias("user_id_bk"),
            "username",
            "last_name",
            F.col("first_name").alias("first_name_or_initials"),
        ),
        "user_sk",
        ["username"],
    )
    # per-user SCD2 slices (05_create_olap.sql:54-73; 07_ETL2_part1.sql:70-130)
    spark = silver["users"].sparkSession
    sub_types = _sk(
        spark.createDataFrame(SUBSCRIPTION_TYPES, "type_name string"),
        "subscription_type_id",
        ["type_name"],
    )
    dims["dim_subscription_type"] = _sk(
        silver["user_subscription"]
        .join(
            F.broadcast(sub_types),
            silver["user_subscription"]["subscription_type_name"]
            == sub_types["type_name"],
            "left",
        )
        .select(
            F.col("user_id").alias("user_id_bk"),
            F.col("subscription_type_id").alias("subscription_type_id_bk"),
            F.col("subscription_type_name").alias("type_name"),
            "start_date",
            "end_date",
        ),
        "subscription_type_sk",
        # full natural key (07_ETL2_part1.sql:86-90: the reference's
        # insert dedups on user+type+start): silver's keeps-both grain
        # means a user can start two TYPES on one date, and a
        # (user, start) hash minted duplicate sks for them (round-13)
        ["user_id_bk", "type_name", "start_date"],
    )
    dims["dim_institution"] = _sk(
        silver["user_institution"].select(
            F.col("user_id").alias("user_id_bk"),
            F.col("institution_id").alias("institution_id_bk"),
            "institution_name",
            "start_date",
            "end_date",
        ),
        "institution_sk",
        # full natural key (07_ETL2_part1.sql:115-119: insert dedups on
        # user+institution+start): silver's keeps-both grain means a user
        # can join two institutions on one date — or one NAME in two
        # cities — and a (user, start) hash minted duplicate sks, which
        # merged distinct institutions in the fact group-bys (round-13)
        ["user_id_bk", "institution_id_bk", "start_date"],
    )
    return dims


def build_bridge(
    silver: dict[str, DataFrame], dims: dict[str, DataFrame]
) -> DataFrame:
    """bridge_pollinator_caste: observed pollinator-caste combos
    (07_ETL2_part1.sql:133-145)."""
    obs = silver["observations"].filter(F.col("caste_id").isNotNull())
    return (
        obs.select("pollinator_id", "caste_id")
        .distinct()
        .join(
            F.broadcast(dims["dim_pollinator"]),
            F.col("pollinator_id") == F.col("pollinator_id_bk"),
        )
        .join(
            F.broadcast(dims["dim_caste"]),
            F.col("caste_id") == F.col("caste_id_bk"),
        )
        .select("pollinator_sk", "caste_sk")
    )


def _with_date_sk(obs: DataFrame, dim_date: DataFrame) -> DataFrame:
    return obs.join(
        F.broadcast(dim_date.select("date_sk", "year", "month")),
        (F.year("observation_date") == F.col("year"))
        & (F.month("observation_date") == F.col("month")),
    ).drop("year", "month")


def build_fact_pollination_activity(
    silver: dict[str, DataFrame], dims: dict[str, DataFrame]
) -> DataFrame:
    """Grain (pollinator, caste, plant, habitat, location, month)
    (08_ETL2_part2.sql:5-66). Confirmed = quality present and != 4."""
    obs = silver["observations"].filter(
        F.col("observation_date").isNotNull() & F.col("location_id").isNotNull()
    )
    obs = _with_date_sk(obs, dims["dim_date"])
    obs = (
        obs.join(
            F.broadcast(dims["dim_pollinator"].select("pollinator_sk", "pollinator_id_bk")),
            F.col("pollinator_id") == F.col("pollinator_id_bk"),
        )
        .join(
            F.broadcast(dims["dim_caste"].select("caste_sk", "caste_id_bk")),
            F.col("caste_id") == F.col("caste_id_bk"),
            "left",
        )
        .join(
            F.broadcast(dims["dim_plant"].select("plant_sk", "plant_id_bk")),
            F.col("plant_id") == F.col("plant_id_bk"),
        )
        .join(
            F.broadcast(dims["dim_habitat"].select("habitat_sk", "habitat_id_bk")),
            F.col("habitat_id") == F.col("habitat_id_bk"),
            "left",
        )
        .join(
            F.broadcast(dims["dim_location"].select("location_sk", "location_id_bk")),
            F.col("location_id") == F.col("location_id_bk"),
        )
    )
    return obs.groupBy(
        "pollinator_sk", "caste_sk", "plant_sk", "habitat_sk", "location_sk", "date_sk"
    ).agg(
        F.coalesce(F.sum("interaction_count"), F.lit(0)).alias("interaction_count"),
        F.count(F.lit(1)).alias("observation_count"),
        F.sum(F.when(F.col("pollen_collected"), 1).otherwise(0)).alias(
            "pollen_collected"
        ),
        F.sum(F.when(F.col("nectar_collected"), 1).otherwise(0)).alias(
            "nectar_collected"
        ),
        F.sum(
            F.when(
                F.col("pollination_quality_id").isNotNull()
                & (F.col("pollination_quality_id") != 4),
                1,
            ).otherwise(0)
        ).alias("confirmed_pollination_count"),
    )


def _user_attribution(
    silver: dict[str, DataFrame], dims: dict[str, DataFrame]
) -> DataFrame:
    """Shared obs->user/institution/subscription attribution
    (08_ETL2_part2.sql:90-108): active subscription else the one starting
    at join_date."""
    obs = silver["observations"].filter(
        F.col("observation_date").isNotNull() & F.col("location_id").isNotNull()
    )
    ui = silver["user_institution"].select(
        "user_institution_id",
        F.col("user_id").alias("ui_user_id"),
        F.col("institution_id").alias("ui_institution_id"),
    )
    users = silver["users"].select(
        F.col("user_id").alias("u_user_id"), "join_date"
    )
    obs = (
        obs.join(F.broadcast(ui), "user_institution_id")
        .join(F.broadcast(users), F.col("ui_user_id") == F.col("u_user_id"))
        .join(
            F.broadcast(dims["dim_user"].select("user_sk", "user_id_bk")),
            F.col("ui_user_id") == F.col("user_id_bk"),
        )
        .join(
            F.broadcast(
                dims["dim_institution"].select(
                    "institution_sk",
                    F.col("user_id_bk").alias("i_user_bk"),
                    F.col("institution_id_bk").alias("i_inst_bk"),
                )
            ),
            (F.col("ui_user_id") == F.col("i_user_bk"))
            & (F.col("ui_institution_id") == F.col("i_inst_bk")),
        )
    )
    sub = dims["dim_subscription_type"]
    active = F.broadcast(
        sub.select(
            F.col("subscription_type_sk").alias("sub_active_sk"),
            F.col("user_id_bk").alias("sa_user_bk"),
            F.col("start_date").alias("sa_start"),
            F.col("end_date").alias("sa_end"),
        )
    )
    earliest = F.broadcast(
        sub.select(
            F.col("subscription_type_sk").alias("sub_earliest_sk"),
            F.col("user_id_bk").alias("se_user_bk"),
            F.col("start_date").alias("se_start"),
        )
    )
    obs = (
        obs.join(
            active,
            (F.col("ui_user_id") == F.col("sa_user_bk"))
            & (F.col("sa_start") <= F.col("observation_date"))
            & (F.col("sa_end").isNull() | (F.col("sa_end") >= F.col("observation_date"))),
            "left",
        )
        .join(
            earliest,
            (F.col("ui_user_id") == F.col("se_user_bk"))
            & (F.col("se_start") == F.col("join_date")),
            "left",
        )
        .withColumn(
            "subscription_type_sk",
            F.coalesce(F.col("sub_active_sk"), F.col("sub_earliest_sk")),
        )
    )
    return _with_date_sk(obs, dims["dim_date"])


def build_fact_user_location_monthly(
    silver: dict[str, DataFrame], dims: dict[str, DataFrame]
) -> DataFrame:
    """Grain (user, location, month, institution, subscription)
    (08_ETL2_part2.sql:71-122)."""
    obs = _user_attribution(silver, dims).join(
        F.broadcast(dims["dim_location"].select("location_sk", "location_id_bk")),
        F.col("location_id") == F.col("location_id_bk"),
    )
    return obs.groupBy(
        "user_sk", "location_sk", "date_sk", "institution_sk", "subscription_type_sk"
    ).agg(
        F.count(F.lit(1)).alias("observation_count"),
        F.coalesce(F.sum("interaction_count"), F.lit(0)).alias("interaction_count"),
    )


def build_fact_user_monthly_summary(
    silver: dict[str, DataFrame], dims: dict[str, DataFrame]
) -> DataFrame:
    """Grain (user, month, institution, subscription) with 4 distinct
    counts (08_ETL2_part2.sql:127-185)."""
    obs = _user_attribution(silver, dims)
    return obs.groupBy(
        "user_sk", "date_sk", "institution_sk", "subscription_type_sk"
    ).agg(
        F.count(F.lit(1)).alias("observation_count"),
        F.coalesce(F.sum("interaction_count"), F.lit(0)).alias("interaction_count"),
        F.countDistinct("location_id").alias("distinct_locations_count"),
        F.countDistinct("habitat_id").alias("distinct_habitats_count"),
        F.countDistinct("pollinator_id").alias("distinct_pollinator_species_count"),
        F.countDistinct("plant_id").alias("distinct_plant_species_count"),
    )


def build_gold(silver: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Full gold layer: 9 dims + bridge + 3 facts."""
    dims = build_dims(silver)
    gold = dict(dims)
    gold["bridge_pollinator_caste"] = build_bridge(silver, dims)
    gold["fact_pollination_activity"] = build_fact_pollination_activity(silver, dims)
    gold["fact_user_location_monthly"] = build_fact_user_location_monthly(
        silver, dims
    )
    gold["fact_user_monthly_summary"] = build_fact_user_monthly_summary(silver, dims)
    return gold
