"""DuckDB oracle SQL, one string per key in
:mod:`insect_observation_data_pipeline_spark.queries.testdata`.

Conventions that keep the driver's (row-count, schema, value-hash) compare
stable across engines:
- every computed column aliased identically to the Spark side;
- integer SUMs cast to BIGINT (DuckDB widens to HUGEINT, Spark uses long);
- year()/month()/length()/instr() cast to INTEGER (DuckDB returns BIGINT);
- double aggregates rounded on both sides;
- every LIMIT query ordered by a total order (metric + unique tiebreaks);
- timestamps kept naive (both engines run in UTC).
"""

from __future__ import annotations

_SIGNUP_WINDOWS = """
    SELECT user_id, ts AS start_ts,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS end_ts
    FROM events WHERE event_type = 'signup'
"""

_PURCHASES = """
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
"""

ORACLE: dict[str, str] = {
    "flagship_top_part_supplier": """
        SELECT p.p_name AS part_name, s.s_name AS supplier_name,
               count(*) AS interaction_count
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
        ORDER BY interaction_count DESC, part_name, supplier_name
        LIMIT 10
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ((floor(abs(sum(l_quantity)) * 100.0 + 0.5) / 100.0) * (CASE WHEN (sum(l_quantity)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS sum_qty,
               ((floor(abs(sum(l_extendedprice)) * 100.0 + 0.5) / 100.0) * (CASE WHEN (sum(l_extendedprice)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS sum_base_price,
               ((floor(abs(sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0) * (CASE WHEN (sum(l_extendedprice * (1 - l_discount))) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS sum_disc_price,
               ((floor(abs(avg(l_quantity)) * 100.0 + 0.5) / 100.0) * (CASE WHEN (avg(l_quantity)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS avg_qty,
               ((floor(abs(avg(l_discount)) * 10000.0 + 0.5) / 10000.0) * (CASE WHEN (avg(l_discount)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT o.o_orderkey, o.o_orderdate::DATE AS order_date,
               ((floor(abs(sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0) * (CASE WHEN (sum(l.l_extendedprice * (1 - l.l_discount))) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY o.o_orderkey, o.o_orderdate::DATE
        ORDER BY revenue DESC, o.o_orderkey
        LIMIT 10
    """,
    "q5_local_supplier_volume": """
        SELECT n.n_name,
               ((floor(abs(sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0) * (CASE WHEN (sum(l.l_extendedprice * (1 - l.l_discount))) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """,
    "t2_orders_by_priority": """
        SELECT o_orderpriority, count(*) AS total_orders
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY total_orders DESC, o_orderpriority
    """,
    "a4_status_filtered_counts": """
        SELECT l_linestatus,
               count(*) FILTER (WHERE l_returnflag = 'R') AS returned_cnt,
               count(*) FILTER (WHERE l_returnflag = 'A') AS accepted_cnt,
               count(*) AS total_cnt
        FROM lineitem
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "j1_top_customers_by_orders": """
        SELECT c.c_name, count(*) AS total_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_name
        ORDER BY total_orders DESC, c.c_name
        LIMIT 10
    """,
    "a2_monthly_revenue_no_january": """
        SELECT monthname(o_orderdate) AS month_name,
               ((floor(abs(sum(o_totalprice)) * 100.0 + 0.5) / 100.0) * (CASE WHEN (sum(o_totalprice)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS total_revenue
        FROM orders
        WHERE monthname(o_orderdate) <> 'January'
        GROUP BY month_name
        ORDER BY total_revenue DESC, month_name
        LIMIT 5
    """,
    "a8_top_nation_months": """
        SELECT n.n_name, strftime(o.o_orderdate, '%Y-%m') AS month_year,
               count(*) AS total_orders,
               ((floor(abs(sum(o.o_totalprice)) * 100.0 + 0.5) / 100.0) * (CASE WHEN (sum(o.o_totalprice)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS total_revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, month_year
        ORDER BY total_revenue DESC, n.n_name, month_year
        LIMIT 10
    """,
    "w2_best_month_per_customer": """
        WITH monthly AS (
            SELECT c.c_custkey, c.c_name,
                   strftime(o.o_orderdate, '%Y-%m') AS month_year,
                   count(DISTINCT l.l_suppkey) AS distinct_suppliers
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey, c.c_name, month_year
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY c_custkey
                ORDER BY distinct_suppliers DESC, month_year
            ) AS rn
            FROM monthly
        )
        SELECT c_name, month_year, distinct_suppliers
        FROM ranked WHERE rn = 1
        ORDER BY distinct_suppliers DESC, c_name, month_year
        LIMIT 10
    """,
    # w2b: rebuilt below from the shared HLL literals (must match the
    # Spark kernel bit-for-bit); placeholder replaced right after the
    # dict literal so the entry keeps the w2-family position.
    "w2b_best_month_sketch": "",
    "s1_scan_prune": """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_quantity > 45
    """,
    "s4_seed_static_union": """
        SELECT r_name FROM region
        UNION ALL
        SELECT 'SEED_REGION' AS r_name
    """,
    "s8_quarantine_events": """
        WITH tagged AS (
            SELECT event_id,
                   CASE
                     WHEN value > 95 THEN 'value out of range'
                     WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 90
                       THEN 'props k out of range'
                     WHEN upper(event_type) NOT IN
                          ('CLICK','VIEW','PURCHASE','SIGNUP','ERROR')
                       THEN 'unknown event type'
                   END AS error_message
            FROM events
        )
        SELECT event_id, error_message FROM tagged
        WHERE error_message IS NOT NULL
    """,
    "p2_customers_without_events": """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        LEFT JOIN (SELECT DISTINCT user_id FROM events) e
          ON c.c_custkey = e.user_id
        WHERE e.user_id IS NULL
    """,
    "p3_regex_extract_brand": """
        SELECT p_partkey,
               CAST(regexp_extract(p_brand, '\\d+') AS INTEGER) AS brand_num
        FROM part
        WHERE regexp_matches(p_brand, '^Brand#\\d+$')
    """,
    "p4_range_validation": """
        SELECT l_returnflag, count(*) AS in_range_cnt
        FROM lineitem
        WHERE l_quantity BETWEEN 20 AND 30
          AND l_discount BETWEEN 0.02 AND 0.08
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "p5_set_membership": """
        SELECT event_id, event_type
        FROM events
        WHERE upper(event_type) NOT IN ('CLICK','VIEW','PURCHASE','SIGNUP')
    """,
    "p6_conditional_repair": """
        SELECT l_returnflag,
               ((floor(abs(sum(CASE WHEN l_quantity > 40 THEN 40.0 ELSE l_quantity END)) * 10.0 + 0.5) / 10.0) * (CASE WHEN (sum(CASE WHEN l_quantity > 40 THEN 40.0 ELSE l_quantity END)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS sum_qty_clamped
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "p7_nullif_normalize": """
        SELECT doc_id,
               coalesce(nullif(nullif(trim(source), ''), 'src0'), 'UNKNOWN')
                 AS source_norm
        FROM documents
    """,
    "j3_compound_on_left": """
        SELECT o.o_orderstatus, count(l.l_orderkey) AS matched_lines
        FROM orders o
        LEFT JOIN lineitem l
          ON o.o_orderkey = l.l_orderkey AND l.l_quantity > 48
        GROUP BY o.o_orderstatus
        ORDER BY o.o_orderstatus
    """,
    "j4_customers_no_orders": """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
        )
    """,
    "j7_customers_with_open_orders": """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
        )
    """,
    "j8_substring_theta": """
        SELECT p.p_partkey, t.type_word
        FROM part p
        JOIN (SELECT DISTINCT p_type AS type_word FROM part) t
          ON p.p_name LIKE '%' || lower(t.type_word) || '%'
    """,
    "j9_interval_attribution": f"""
        WITH w AS ({_SIGNUP_WINDOWS}), p AS ({_PURCHASES})
        SELECT p.event_id, p.user_id, w.start_ts
        FROM p JOIN w
          ON p.user_id = w.user_id
         AND p.ts >= w.start_ts
         AND (w.end_ts IS NULL OR p.ts < w.end_ts)
    """,
    "j11_priority_attribution": f"""
        WITH w0 AS ({_SIGNUP_WINDOWS}),
        w AS (
            SELECT *, min(start_ts) OVER (PARTITION BY user_id) AS first_start
            FROM w0
        ),
        p AS ({_PURCHASES}),
        c AS (
            SELECT p.event_id, p.user_id, w.start_ts,
                   CASE
                     WHEN w.start_ts IS NULL THEN 3
                     WHEN p.ts >= w.start_ts
                          AND (w.end_ts IS NULL OR p.ts < w.end_ts) THEN 1
                     WHEN p.ts < w.first_start
                          AND w.start_ts = w.first_start THEN 2
                     ELSE 3
                   END AS prio
            FROM p LEFT JOIN w ON p.user_id = w.user_id
        ),
        r AS (
            SELECT *, row_number() OVER (
                PARTITION BY event_id ORDER BY prio, start_ts
            ) AS rn
            FROM c
        )
        SELECT event_id, user_id, start_ts AS attributed_start
        FROM r WHERE rn = 1
    """,
    "j12_fallback_active_else_earliest": f"""
        WITH w AS ({_SIGNUP_WINDOWS}),
        fw AS (
            SELECT user_id AS fw_user_id, min(ts) AS first_start
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        p AS ({_PURCHASES})
        SELECT p.event_id, p.user_id,
               coalesce(w.start_ts, fw.first_start) AS attributed_start
        FROM p
        LEFT JOIN w ON p.user_id = w.user_id
                   AND p.ts >= w.start_ts
                   AND (w.end_ts IS NULL OR p.ts < w.end_ts)
        LEFT JOIN fw ON p.user_id = fw.fw_user_id
    """,
    "a5_count_distinct_multi": """
        SELECT o.o_orderpriority,
               count(DISTINCT l.l_partkey) AS distinct_parts,
               count(DISTINCT l.l_suppkey) AS distinct_suppliers,
               count(*) AS total_lines
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    "a7_distinct_on_first_line": """
        WITH ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY l_orderkey
                ORDER BY l_linenumber, l_partkey, l_quantity
            ) AS rn
            FROM lineitem
        )
        SELECT l_orderkey, l_partkey, l_quantity FROM ranked WHERE rn = 1
    """,
    "a9_group_by_expression": """
        SELECT coalesce(nullif(p_type, 'PROMO'), 'OTHER') AS type_class,
               count(*) AS n_parts,
               ((floor(abs(avg(p_retailprice)) * 100.0 + 0.5) / 100.0) * (CASE WHEN (avg(p_retailprice)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS avg_price
        FROM part
        GROUP BY type_class
        ORDER BY type_class
    """,
    "w1_lag_delta": """
        SELECT event_id, user_id,
               ((floor(abs(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)) * 100.0 + 0.5) / 100.0) * (CASE WHEN (value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS value_delta
        FROM events
    """,
    "w3_scd2_intervals": f"""
        SELECT user_id, start_ts, end_ts FROM ({_SIGNUP_WINDOWS})
    """,
    "t1_topk_lineitems": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 10
    """,
    "f_string_date_census": """
        SELECT 'part' AS src,
               CAST(p_partkey AS BIGINT) AS key,
               upper(p_name) AS up_name,
               array_to_string(
                   list_transform(string_split(p_name, ' '),
                                  -- lower() the tail: Spark initcap
                                  -- LOWERCASES the rest of each word
                                  -- ('McIntosh' -> 'Mcintosh'); the old
                                  -- twin diverged on interior capitals
                                  -- (round-12 review)
                                  w -> upper(w[1]) || lower(substr(w, 2))),
                   ' ') AS cap_name,
               reverse(p_name) AS rev_name,
               CAST(length(p_name) AS INTEGER) AS name_len,
               CAST(instr(p_name, ' ') AS INTEGER) AS space_pos,
               split_part(p_name, ' ', 1) AS first_word,
               split_part(p_name, ' ', -1) AS last_word,
               lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
               p_name || '|' || p_brand AS name_brand,
               CAST(NULL AS INTEGER) AS order_year,
               CAST(NULL AS INTEGER) AS order_month,
               CAST(NULL AS VARCHAR) AS month_name,
               CAST(NULL AS VARCHAR) AS month_year,
               CAST(NULL AS DATE) AS prev_day,
               CAST(NULL AS DATE) AS month_start
        FROM part
        UNION ALL
        SELECT 'orders' AS src,
               CAST(o_orderkey AS BIGINT) AS key,
               CAST(NULL AS VARCHAR) AS up_name,
               CAST(NULL AS VARCHAR) AS cap_name,
               CAST(NULL AS VARCHAR) AS rev_name,
               CAST(NULL AS INTEGER) AS name_len,
               CAST(NULL AS INTEGER) AS space_pos,
               CAST(NULL AS VARCHAR) AS first_word,
               CAST(NULL AS VARCHAR) AS last_word,
               CAST(NULL AS VARCHAR) AS size_pad,
               CAST(NULL AS VARCHAR) AS name_brand,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               monthname(o_orderdate) AS month_name,
               strftime(o_orderdate, '%Y-%m') AS month_year,
               o_orderdate::DATE - 1 AS prev_day,
               make_date(CAST(year(o_orderdate) AS INTEGER),
                         CAST(month(o_orderdate) AS INTEGER), 1) AS month_start
        FROM orders
    """,
    "f_event_cast_census": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
               CAST(CAST(((floor(abs(value) * 100.0 + 0.5) / 100.0) * (CASE WHEN (value) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS DECIMAL(9,2)) AS DOUBLE) AS value_dec,
               (upper(CASE WHEN event_type = 'click' THEN 'Y' ELSE 'N' END) = 'Y')
                 AS is_click,
               CASE WHEN event_type = 'click' THEN 'Y'
                    WHEN event_type = 'view' THEN 'n'
                    WHEN event_type = 'purchase' THEN 'Yes'
                    WHEN event_type = 'signup' THEN 'FALSE'
                    ELSE 'maybe'
               END AS flag_raw,
               CASE WHEN lower(trim(CASE WHEN event_type = 'click' THEN 'Y'
                        WHEN event_type = 'view' THEN 'n'
                        WHEN event_type = 'purchase' THEN 'Yes'
                        WHEN event_type = 'signup' THEN 'FALSE'
                        ELSE 'maybe' END))
                         IN ('y','yes','t','true','1','on') THEN TRUE
                    WHEN lower(trim(CASE WHEN event_type = 'click' THEN 'Y'
                        WHEN event_type = 'view' THEN 'n'
                        WHEN event_type = 'purchase' THEN 'Yes'
                        WHEN event_type = 'signup' THEN 'FALSE'
                        ELSE 'maybe' END))
                         IN ('n','no','f','false','0','off') THEN FALSE
               END AS flag_bool
        FROM events
    """,
    "f_array_name_census": """
        WITH base AS (
            SELECT p_partkey,
                   string_split(p_name, ' ') AS w,
                   CASE WHEN p_partkey % 3 = 0
                          THEN 'A. B. ' || split_part(p_name, ' ', 1)
                        WHEN p_partkey % 3 = 1
                          THEN 'Dr ' || split_part(p_name, ' ', 1)
                        ELSE split_part(p_name, ' ', 1)
                   END AS full_name
            FROM part
        )
        SELECT p_partkey,
               CAST(len(w) AS INTEGER) AS n_words,
               list_contains(w, 'green') AS has_green,
               array_to_string(list_sort(list_distinct(w)), ',') AS distinct_sorted,
               array_to_string(w[1:2], ',') AS first_two,
               full_name,
               full_name LIKE '%.% %' AS is_initials,
               CASE WHEN full_name LIKE '%.% %' THEN
                   left(full_name,
                        length(full_name) - position(' ' IN reverse(full_name)))
               END AS first_name_or_initials,
               CASE WHEN full_name LIKE '%.% %' THEN
                   split_part(reverse(split_part(reverse(full_name), ' ', 1)),
                              ' ', 1)
               ELSE full_name END AS last_name
        FROM base
    """,
    "e7_cohort_retention": """
        WITH firsts AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY user_id
        ), active AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS w
            FROM events
        )
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, a.w) / 7 AS INTEGER)
                   AS week_n,
               CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        FROM active a JOIN firsts f ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
    "j13_asof_latest_signup": """
        WITH s AS (
            SELECT user_id, ts AS asof_start FROM events
            WHERE event_type = 'signup'
        ), p AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        )
        SELECT p.event_id, p.user_id, s.asof_start
        FROM p ASOF JOIN s
          ON p.user_id = s.user_id AND p.ts >= s.asof_start
    """,
    "j14_band_join_coincident": """
        SELECT l.event_id,
               count(*) AS n_coincident
        FROM events l
        JOIN events r
          ON r.user_id <> l.user_id
         AND abs(epoch_us(l.ts) - epoch_us(r.ts)) <= 5000000
        GROUP BY l.event_id
    """,
    "j5_multikey_anti": """
        SELECT DISTINCT l_partkey, l_suppkey
        FROM lineitem l
        WHERE l_quantity >= 45
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
              AND l2.l_suppkey = l.l_suppkey
              AND l2.l_quantity <= 5
          )
    """,
    "j10_join_using": """
        SELECT c.c_nationkey, count(*) AS n_events,
               ((floor(abs(sum(e.value)) * 100.0 + 0.5) / 100.0) * (CASE WHEN (sum(e.value)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS sum_value
        FROM (SELECT user_id AS custkey, value FROM events) e
        JOIN (SELECT c_custkey AS custkey, c_nationkey FROM customer) c
          USING (custkey)
        GROUP BY c.c_nationkey
        ORDER BY c.c_nationkey
    """,
    "g3_set_ops": """
        WITH v AS (SELECT DISTINCT user_id, ts::DATE AS event_day
                   FROM events WHERE event_type = 'view'),
             p AS (SELECT DISTINCT user_id, ts::DATE AS event_day
                   FROM events WHERE event_type = 'purchase')
        SELECT user_id, event_day, 'except' AS set_op
        FROM (SELECT * FROM v EXCEPT SELECT * FROM p)
        UNION ALL
        SELECT user_id, event_day, 'intersect' AS set_op
        FROM (SELECT * FROM v INTERSECT SELECT * FROM p)
    """,
    "a3_conditional_sum": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS discounted_cnt,
               CAST(sum(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS taxfree_cnt,
               count(*) AS total_cnt
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "a6_distinct_pairs": """
        SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
    "a10_coalesce_zero_agg": """
        SELECT c.c_custkey,
               ((floor(abs(coalesce(sum(e.value), 0)) * 100.0 + 0.5) / 100.0) * (CASE WHEN (coalesce(sum(e.value), 0)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS total_value
        FROM customer c
        LEFT JOIN events e ON c.c_custkey = e.user_id
        GROUP BY c.c_custkey
    """,
    "a11_grouping_lattice": """
        SELECT * FROM (
            SELECT 'rollup_orders' AS src,
                   o_orderstatus AS k1, o_orderpriority AS k2,
                   count(*) AS n_rows,
                   ((floor(abs(sum(o_totalprice)) * 100.0 + 0.5) / 100.0) * (CASE WHEN (sum(o_totalprice)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS total
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
            UNION ALL
            SELECT 'cube_lineitem' AS src,
                   l_returnflag AS k1, l_linestatus AS k2,
                   count(*) AS n_rows,
                   ((floor(abs(sum(l_quantity)) * 10.0 + 0.5) / 10.0) * (CASE WHEN (sum(l_quantity)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS total
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        )
        ORDER BY src, k1 NULLS FIRST, k2 NULLS FIRST
    """,
    "a12_pivot_status": """
        SELECT l_returnflag,
               count(*) FILTER (WHERE l_linestatus = 'F') AS cnt_f,
               count(*) FILTER (WHERE l_linestatus = 'O') AS cnt_o
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "u1_upsert_last_wins": """
        WITH r AS (
            SELECT user_id, event_type, event_id, value,
                   row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        SELECT user_id, event_type, event_id AS last_event_id,
               ((floor(abs(value) * 100.0 + 0.5) / 100.0) * (CASE WHEN (value) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS last_value
        FROM r WHERE rn = 1
    """,
}


# single spelling of the sign-stable rounding SQL (round-12 review: two
# more hand-maintained copies of the one formula the hash-parity scheme
# depends on lived here and in the sibling oracle module; an edit to one
# would desynchronize stable_round from one oracle but not the other) —
# byte-identical output to the deleted local twin for every digits used
from insect_observation_data_pipeline_spark.functions.numeric import sround_sql as _sr  # noqa: E501


_W_ORDER = "PARTITION BY user_id ORDER BY ts, event_id"

_W_FULL = (
    f"{_W_ORDER} ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
)

ORACLE["w45_window_frames"] = f"""
    SELECT event_id, user_id,
           {_sr(f"avg(value) OVER ({_W_ORDER} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)", 2)}
               AS moving_avg3,
           {_sr(f"first_value(value) OVER ({_W_FULL})", 2)} AS first_val,
           {_sr(f"last_value(value) OVER ({_W_FULL})", 2)} AS last_val,
           {_sr(f"nth_value(value, 2) OVER ({_W_FULL})", 2)} AS second_val
    FROM events
"""

ORACLE["f_stats_census"] = f"""
    SELECT l_returnflag,
           {_sr("stddev_samp(l_extendedprice)", 2)} AS sd_price,
           {_sr("var_samp(l_quantity)", 2)} AS var_qty,
           {_sr("corr(l_quantity, l_extendedprice)", 4)} AS corr_qty_price,
           {_sr("covar_samp(l_quantity, l_extendedprice)", 2)} AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""

ORACLE["f_sketch_audit"] = f"""
    -- exact twins of the Spark sketch audit; sketch_ok is literal TRUE
    -- because the sketches are REQUIRED to land inside tolerance — a
    -- Spark-side sketch drifting out flips the boolean and fails the
    -- value hash. quantile_cont matches Spark's interpolated percentile.
    WITH g AS (
        SELECT l_returnflag,
               CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS exact_distinct,
               quantile_cont(l_extendedprice, 0.5) AS p50,
               quantile_cont(l_extendedprice, 0.95) AS p95
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'distinct_orderkeys' AS metric,
           {_sr('exact_distinct', 4)} AS exact_value, TRUE AS sketch_ok
    FROM g
    UNION ALL
    SELECT l_returnflag, 'p50_price', {_sr('p50', 4)}, TRUE FROM g
    UNION ALL
    SELECT l_returnflag, 'p95_price', {_sr('p95', 4)}, TRUE FROM g
"""

ORACLE["f_levenshtein_fuzzy"] = """
    WITH t AS (
        SELECT p_partkey,
               split_part(p_name, ' ', 1) AS first_word,
               split_part(p_name, ' ', -1) AS last_word
        FROM part
    )
    SELECT p_partkey, first_word, last_word,
           CAST(levenshtein(first_word, last_word) AS INTEGER) AS edit_dist,
           (levenshtein(first_word, last_word) <= 3) AS is_near
    FROM t
"""




def _w2b_oracle_sql() -> str:
    """w2b: rebuild the identical per-(customer, month) md5-register HLL
    (p=8, m=256) and its readback, then w2's rank/top-10 shape on the
    ROUNDED estimate. Literals come from functions/approx.py (the x40
    oracle's discipline): everything upstream of the one add+divide is
    integer-exact, and the ln on the linear-counting branch — the one
    libm call that is NOT guaranteed bit-exact across engines — is
    neutralized by ranking on stable_round(est, 2) in lockstep with the
    Spark side (round-14 review)."""
    from insect_observation_data_pipeline_spark.functions.approx import hll_sql

    frag = hll_sql("supp")
    est = frag["est"]
    return f"""
    -- w2 at scale: deterministic HLL estimate per (customer, month)
    WITH rows_ AS (
        SELECT o.o_custkey,
               strftime(o.o_orderdate, '%Y-%m') AS month_year,
               CAST(l.l_suppkey AS VARCHAR) AS supp
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    hb AS (
        SELECT o_custkey, month_year,
               {frag["bucket"]} AS bucket,
               {frag["rho"]} AS rho
        FROM rows_
    ),
    regs AS (
        SELECT o_custkey, month_year, bucket, max(rho) AS max_rho
        FROM hb GROUP BY 1, 2, 3
    ),
    per AS (
        SELECT o_custkey, month_year, count(*) AS regs_used,
               sum(CAST(power(2, 53 - max_rho) AS BIGINT)) AS sum_scaled
        FROM regs GROUP BY 1, 2
    ),
    est_t AS (
        -- rank on the ROUNDED estimate (round-14 review, lockstep with
        -- the Spark side: libm ln in the linear-counting branch is not
        -- bit-exact across engines; after rounding, ties fall to the
        -- month/name tiebreaks identically)
        SELECT o_custkey, month_year, {_sr(est, 2)} AS est_suppliers
        FROM per
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey ORDER BY est_suppliers DESC, month_year
        ) AS rn
        FROM est_t
    )
    SELECT c.c_name, r.month_year, r.est_suppliers
    FROM ranked r
    JOIN customer c ON r.o_custkey = c.c_custkey
    WHERE rn = 1
    ORDER BY r.est_suppliers DESC, c.c_name, r.month_year
    LIMIT 10
"""


ORACLE["w2b_best_month_sketch"] = _w2b_oracle_sql()
