"""The reference's 7 analytical queries as DataFrame functions.

OLTP queries (05_queries/oltp_queries.sql) run over silver frames; OLAP
queries (05_queries/olap_queries.sql) over gold frames. Ties are broken
deterministically (name columns) — the reference's bare LIMITs are
tie-unstable (SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from insect_observation_data_pipeline_spark.operators import top_k


def top_plant_pollinator_pairs(silver: dict[str, DataFrame], k: int = 10) -> DataFrame:
    """oltp_queries.sql:6-15."""
    o = silver["observations"]
    ps = silver["plant_species"].select(
        F.col("plant_id"), F.col("species_name").alias("plant")
    )
    po = silver["pollinator_species"].select(
        F.col("pollinator_id"), F.col("species_name").alias("pollinator")
    )
    agg = (
        o.join(F.broadcast(ps), "plant_id")
        .join(F.broadcast(po), "pollinator_id")
        .groupBy("plant", "pollinator")
        .agg(F.count(F.lit(1)).alias("interaction_count"))
    )
    return top_k(
        agg, [F.desc("interaction_count"), F.asc("plant"), F.asc("pollinator")], k
    )


def most_observed_habitats(silver: dict[str, DataFrame]) -> DataFrame:
    """oltp_queries.sql:18-24."""
    o = silver["observations"]
    h = silver["habitats"]
    return (
        o.join(F.broadcast(h), "habitat_id")
        .groupBy("habitat_name")
        .agg(F.count(F.lit(1)).alias("total_observations"))
        .orderBy(F.desc("total_observations"), F.asc("habitat_name"))
    )


def summary_by_pollination_quality(silver: dict[str, DataFrame]) -> DataFrame:
    """oltp_queries.sql:27-37 (COUNT FILTER + LEFT JOIN USING)."""
    o = silver["observations"]
    pq = silver["pollination_qualities"].select(
        "pollination_quality_id", "description"
    )
    return (
        o.join(F.broadcast(pq), "pollination_quality_id", "left")
        .groupBy("pollination_quality_id", "description")
        .agg(
            F.count(F.when(F.col("pollen_collected"), True)).alias("with_pollen"),
            F.count(F.when(F.col("nectar_collected"), True)).alias("with_nectar"),
            F.count(F.lit(1)).alias("total"),
        )
        .orderBy(F.asc_nulls_last("pollination_quality_id"))
    )


def top_users_by_observations(silver: dict[str, DataFrame], k: int = 10) -> DataFrame:
    """oltp_queries.sql:40-48."""
    o = silver["observations"]
    ui = silver["user_institution"].select("user_institution_id", "user_id")
    u = silver["users"].select("user_id", "last_name")
    agg = (
        o.join(F.broadcast(ui), "user_institution_id")
        .join(F.broadcast(u), "user_id")
        .groupBy("last_name")
        .agg(F.count(F.lit(1)).alias("total_observations"))
    )
    return top_k(agg, [F.desc("total_observations"), F.asc("last_name")], k)


def top_confirmed_months(gold: dict[str, DataFrame], k: int = 5) -> DataFrame:
    """olap_queries.sql:6-16 — January excluded (placeholder month)."""
    fp = gold["fact_pollination_activity"]
    d = gold["dim_date"]
    agg = (
        fp.join(F.broadcast(d), "date_sk")
        .filter(F.col("month_name") != "January")
        .groupBy("month_name")
        .agg(F.sum("confirmed_pollination_count").alias("total_confirmed"))
    )
    return top_k(agg, [F.desc("total_confirmed"), F.asc("month_name")], k)


def top_location_months(gold: dict[str, DataFrame], k: int = 10) -> DataFrame:
    """olap_queries.sql:19-35."""
    fp = gold["fact_pollination_activity"]
    loc = gold["dim_location"]
    d = gold["dim_date"]
    agg = (
        fp.join(F.broadcast(loc), "location_sk")
        .join(F.broadcast(d), "date_sk")
        .groupBy("latitude", "longitude", "month_year")
        .agg(F.sum("observation_count").alias("total_observations"))
    )
    return top_k(
        agg,
        [
            F.desc("total_observations"),
            F.asc("latitude"),
            F.asc("longitude"),
            F.asc("month_year"),
        ],
        k,
    )


def top_monthly_locations_per_user(gold: dict[str, DataFrame], k: int = 10) -> DataFrame:
    """olap_queries.sql:39-69 — rank rn=1 per user over monthly distinct
    location counts."""
    ful = gold["fact_user_location_monthly"]
    du = gold["dim_user"].select("user_sk", "username")
    d = gold["dim_date"].select("date_sk", "month_year")
    monthly = (
        ful.join(F.broadcast(du), "user_sk")
        .join(F.broadcast(d), "date_sk")
        .groupBy("user_sk", "username", "date_sk", "month_year")
        .agg(F.countDistinct("location_sk").alias("distinct_location_count"))
    )
    w = Window.partitionBy("user_sk").orderBy(
        F.desc("distinct_location_count"), F.asc("month_year")
    )
    best = (
        monthly.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("username", "month_year", "distinct_location_count")
    )
    return top_k(
        best,
        [F.desc("distinct_location_count"), F.asc("username"), F.asc("month_year")],
        k,
    )


def register_layers(
    spark, silver: dict[str, DataFrame], gold: dict[str, DataFrame]
) -> None:
    """Expose silver/gold frames as temp views so the SQL twins below run
    via ``spark.sql`` (EP3's dual DataFrame/SQL surface — both compile to
    the same Catalyst plans)."""
    for name, df in {**silver, **gold}.items():
        df.createOrReplaceTempView(name)


REFERENCE_SQL: dict[str, str] = {
    # oltp_queries.sql:6-15
    "top_plant_pollinator_pairs": """
        SELECT ps.species_name AS plant, po.species_name AS pollinator,
               count(*) AS interaction_count
        FROM observations o
        JOIN plant_species ps USING (plant_id)
        JOIN pollinator_species po USING (pollinator_id)
        GROUP BY 1, 2
        ORDER BY interaction_count DESC, plant, pollinator
        LIMIT 10
    """,
    # oltp_queries.sql:18-24
    "most_observed_habitats": """
        SELECT h.habitat_name, count(*) AS total_observations
        FROM observations o JOIN habitats h USING (habitat_id)
        GROUP BY h.habitat_name
        ORDER BY total_observations DESC, habitat_name
    """,
    # oltp_queries.sql:40-48
    "top_users_by_observations": """
        SELECT u.last_name, count(*) AS total_observations
        FROM observations o
        JOIN user_institution ui USING (user_institution_id)
        JOIN users u USING (user_id)
        GROUP BY u.last_name
        ORDER BY total_observations DESC, last_name
        LIMIT 10
    """,
    # oltp_queries.sql:27-37 (COUNT FILTER + LEFT JOIN USING)
    "summary_by_pollination_quality": """
        SELECT o.pollination_quality_id, pq.description,
               count(CASE WHEN o.pollen_collected THEN TRUE END) AS with_pollen,
               count(CASE WHEN o.nectar_collected THEN TRUE END) AS with_nectar,
               count(*) AS total
        FROM observations o
        LEFT JOIN pollination_qualities pq USING (pollination_quality_id)
        GROUP BY o.pollination_quality_id, pq.description
        ORDER BY o.pollination_quality_id ASC NULLS LAST
    """,
    # olap_queries.sql:6-16
    "top_confirmed_months": """
        SELECT d.month_name,
               sum(fp.confirmed_pollination_count) AS total_confirmed
        FROM fact_pollination_activity fp
        JOIN dim_date d USING (date_sk)
        WHERE d.month_name <> 'January'
        GROUP BY d.month_name
        ORDER BY total_confirmed DESC, month_name
        LIMIT 5
    """,
    # olap_queries.sql:19-35
    "top_location_months": """
        SELECT l.latitude, l.longitude, d.month_year,
               sum(fp.observation_count) AS total_observations
        FROM fact_pollination_activity fp
        JOIN dim_location l USING (location_sk)
        JOIN dim_date d USING (date_sk)
        GROUP BY 1, 2, 3
        ORDER BY total_observations DESC, latitude, longitude, month_year
        LIMIT 10
    """,
    # olap_queries.sql:39-69
    "top_monthly_locations_per_user": """
        WITH monthly AS (
            SELECT f.user_sk, u.username, f.date_sk, d.month_year,
                   count(DISTINCT f.location_sk) AS distinct_location_count
            FROM fact_user_location_monthly f
            JOIN dim_user u USING (user_sk)
            JOIN dim_date d USING (date_sk)
            GROUP BY 1, 2, 3, 4
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY user_sk
                ORDER BY distinct_location_count DESC, month_year
            ) AS rn
            FROM monthly
        )
        SELECT username, month_year, distinct_location_count
        FROM ranked WHERE rn = 1
        ORDER BY distinct_location_count DESC, username, month_year
        LIMIT 10
    """,
}
