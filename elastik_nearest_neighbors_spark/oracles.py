"""DuckDB oracle SQL — the ANSI-SQL twins of every Spark operator.

Each builder returns a SQL string runnable by DuckDB against the
pre-registered views (region nation customer supplier part orders lineitem
events documents embeddings). The Spark operator and its oracle share the
exact determinism contract (constants.py / functions/text.py docstrings):
decimal money math, md5-prefix base hashes, rounded distances, id tie-breaks,
UTC timestamp formatting.
"""

from __future__ import annotations

from .constants import (
    Q3_DATE,
    Q3_SEGMENT,
    Q4_DATE_HI,
    Q4_DATE_LO,
    Q5_DATE_HI,
    Q5_DATE_LO,
    Q5_REGION,
    Q6_DISC_HI,
    Q6_DISC_LO,
    Q6_QTY,
    Q6_YEAR,
    SESSION_GAP_MS,
)

DEC = "DECIMAL(18,6)"


def q1_pricing_summary() -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS {DEC})) AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * (CAST(1 AS {DEC}) - CAST(l_discount AS {DEC}))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS {DEC}) * (CAST(1 AS {DEC}) - CAST(l_discount AS {DEC})) AS {DEC})
           * (CAST(1 AS {DEC}) + CAST(l_tax AS {DEC}))) AS VARCHAR) AS DOUBLE) AS sum_charge,
  CAST(COUNT(*) AS BIGINT) AS count_order,
  CAST(CAST(SUM(CAST(l_quantity AS {DEC})) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority() -> str:
    return f"""
SELECT l_orderkey AS orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * (CAST(1 AS {DEC}) - CAST(l_discount AS {DEC}))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, orderkey ASC
LIMIT 10
"""


def q6_revenue_delta() -> str:
    return f"""
SELECT
  CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * CAST(l_discount AS {DEC})) AS VARCHAR) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR}-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '{Q6_YEAR + 1}-01-01 00:00:00'
  AND l_discount >= {Q6_DISC_LO} AND l_discount <= {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY}
"""


def events_hourly() -> str:
    return f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS {DEC})) AS VARCHAR) AS DOUBLE) AS sum_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
"""


def streaming_events_hourly() -> str:
    """Batch-twin oracle for the drained streaming hourly aggregation —
    events_hourly minus the distinct-user count the streaming agg doesn't
    carry (complete-mode availableNow over the static file replays the
    whole history, so the drained output equals this batch SQL)."""
    return f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS {DEC})) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def events_sessionize() -> str:
    return f"""
WITH ev AS (
  SELECT user_id, ts, epoch_ms(ts) AS ms, CAST(value AS {DEC}) AS v FROM events
), flagged AS (
  SELECT user_id, ts, v,
    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > {SESSION_GAP_MS} THEN 1 ELSE 0 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms, ts)
), sess AS (
  SELECT user_id, ts, v,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ms, ts ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM (SELECT *, epoch_ms(ts) AS ms FROM flagged)
)
SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) AS sum_value
FROM sess
GROUP BY user_id, sess_id
"""


def streaming_sessionize() -> str:
    """Batch-twin oracle for the streaming sessionizer: identical session
    definition (>30-min gap per user), minus the running sess_id the
    streaming output doesn't carry — (user_id, session_start) is still a
    unique key because two sessions of one user are ≥30 min apart."""
    return f"""
WITH ev AS (
  SELECT user_id, ts, epoch_ms(ts) AS ms, CAST(value AS {DEC}) AS v FROM events
), flagged AS (
  SELECT user_id, ts, v,
    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > {SESSION_GAP_MS} THEN 1 ELSE 0 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms, ts)
), sess AS (
  SELECT user_id, ts, v,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ms, ts ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM (SELECT *, epoch_ms(ts) AS ms FROM flagged)
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) AS sum_value
FROM sess
GROUP BY user_id, sess_id
"""


def streaming_sessionize_check() -> str:
    """Oracle for the append-mode twin (streaming.ingest.
    streaming_sessionize_check): the watermark-closed session prefix —
    sessions whose end (last event + gap) the final watermark
    (max ts − gap) passed — reduced to integer scalars. The mismatch
    counters are literal zeros: the Spark side measures them against the
    real drained stream, so the value-hash matches iff the streaming
    state machine emitted exactly the closed set."""
    return f"""
WITH ev AS (
  SELECT user_id, epoch_ms(ts) AS ms, ts FROM events
), flagged AS (
  SELECT user_id, ms, ts,
    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > {SESSION_GAP_MS} THEN 1 ELSE 0 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms, ts)
), sess AS (
  SELECT user_id, ms,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ms, ts ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
), agg AS (
  SELECT user_id, sess_id, MAX(ms) AS end_ms, COUNT(*) AS n_events
  FROM sess GROUP BY user_id, sess_id
), closed AS (
  SELECT * FROM agg
  WHERE end_ms + {SESSION_GAP_MS} <= (SELECT MAX(ms) FROM ev) - {SESSION_GAP_MS}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COALESCE(SUM(n_events), 0) AS BIGINT) AS total_events,
       CAST(0 AS BIGINT) AS only_stream,
       CAST(0 AS BIGINT) AS only_batch
FROM closed
"""


def events_dau_wau() -> str:
    """DAU/WAU per day (operators/analytics.events_dau_wau mirror)."""
    return """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
days AS (SELECT DISTINCT day FROM ud),
contrib AS (
  SELECT user_id, CAST(day + x.i * INTERVAL 1 DAY AS DATE) AS tday
  FROM ud, LATERAL (SELECT unnest(range(0, 7)) AS i) x
),
wau AS (
  SELECT c.tday AS day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
  FROM contrib c JOIN days d ON d.day = c.tday
  GROUP BY 1
),
dau AS (
  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau FROM ud GROUP BY 1
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
       round(d.dau / CAST(w.wau AS DOUBLE), 6) AS stickiness
FROM dau d JOIN wau w ON w.day = d.day
"""


def events_approx_distinct_check() -> str:
    """Tolerance-contract gate for the HLL entry: exact counts plus a
    literal TRUE — the hash matches iff Spark's measured within_5pct
    boolean is TRUE for every group (operators/analytics mirror)."""
    return """
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
  TRUE AS within_5pct
FROM events
GROUP BY event_type
"""


def events_rolling_7d() -> str:
    """Trailing-7-day RANGE window per user (operators/analytics mirror):
    frame peers are rows with equal epoch-ms, identical on both engines."""
    return f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ms, CAST(value AS {DEC}) AS v FROM events
)
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
       CAST(CAST(SUM(v) OVER w AS VARCHAR) AS DOUBLE) AS value_7d
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ms
             RANGE BETWEEN {7 * 86400 * 1000 - 1} PRECEDING AND CURRENT ROW)
"""


def q4_order_priority() -> str:
    return f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_DATE_LO} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{Q4_DATE_HI} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


def q5_local_supplier_volume() -> str:
    return f"""
SELECT n.n_name,
  CAST(CAST(SUM(CAST(l.l_extendedprice AS {DEC}) * (CAST(1 AS {DEC}) - CAST(l.l_discount AS {DEC}))) AS VARCHAR) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE s.s_nationkey = c.c_nationkey
  AND r.r_name = '{Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{Q5_DATE_LO} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{Q5_DATE_HI} 00:00:00'
GROUP BY n.n_name
"""


def q14_promo_revenue() -> str:
    return f"""
SELECT
  round(100.0 * CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
        THEN CAST(l.l_extendedprice AS {DEC}) * (CAST(1 AS {DEC}) - CAST(l.l_discount AS {DEC}))
        ELSE CAST(0 AS {DEC}) END) AS VARCHAR) AS DOUBLE)
      / CAST(CAST(SUM(CAST(l.l_extendedprice AS {DEC}) * (CAST(1 AS {DEC}) - CAST(l.l_discount AS {DEC}))) AS VARCHAR) AS DOUBLE), 6) AS promo_pct,
  CAST(CAST(SUM(CAST(l.l_extendedprice AS {DEC}) * (CAST(1 AS {DEC}) - CAST(l.l_discount AS {DEC}))) AS VARCHAR) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{Q6_YEAR}-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '{Q6_YEAR + 1}-01-01 00:00:00'
"""


def events_topk_users() -> str:
    from .constants import TOPK_USERS

    return f"""
SELECT event_type, user_id, total_value, n_events FROM (
  SELECT event_type, user_id,
    CAST(CAST(SUM(CAST(value AS {DEC})) AS VARCHAR) AS DOUBLE) AS total_value,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY CAST(CAST(SUM(CAST(value AS {DEC})) AS VARCHAR) AS DOUBLE) DESC, user_id) AS rn
  FROM events GROUP BY 1, 2)
WHERE rn <= {TOPK_USERS}
"""


def events_asof_join() -> str:
    return """
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN event_type = 'click' THEN event_id END AS c_id,
         CASE WHEN event_type = 'click' THEN ts END AS c_ts
  FROM events WHERE event_type IN ('click', 'purchase')
), carried AS (
  SELECT user_id, event_id, ts, event_type,
         last_value(c_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
         last_value(c_ts IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
  FROM tagged
)
SELECT user_id, event_id AS purchase_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       click_id,
       strftime(click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts
FROM carried WHERE event_type = 'purchase'
"""


def source_stats() -> str:
    return f"""
WITH q AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
    round(0.4 * round(len(list_filter(string_split(text, ' '), t -> t IN ('the','a','is','and','of','to','in'))) / len(string_split(text, ' ')), 6)
        + 0.3 * least(1.0, len(string_split(text, ' ')) / 100.0)
        + 0.3 * (1.0 - round(len(regexp_extract_all(text, '[^a-z0-9 ]')) / length(text), 6)), 6) AS quality
  FROM documents
)
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(q.n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(CAST(SUM(CAST(q.quality AS {DEC})) AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS mean_quality
FROM documents d JOIN q ON q.doc_id = d.doc_id
GROUP BY d.source
"""


def q7_volume_shipping() -> str:
    from .constants import Q7_NATION_A, Q7_NATION_B

    return f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
  CAST(year(l.l_shipdate) AS INT) AS ship_year,
  CAST(CAST(SUM(CAST(l.l_extendedprice AS {DEC}) * (CAST(1 AS {DEC}) - CAST(l.l_discount AS {DEC}))) AS VARCHAR) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
WHERE ns.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND nc.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND ns.n_name <> nc.n_name
GROUP BY 1, 2, 3
"""


def q10_returned_revenue() -> str:
    from .constants import Q10_DATE_HI, Q10_DATE_LO, Q10_TOPK

    return f"""
SELECT c.c_custkey AS custkey, c.c_name,
  round(c.c_acctbal, 2) AS acctbal,
  CAST(CAST(SUM(CAST(l.l_extendedprice AS {DEC}) * (CAST(1 AS {DEC}) - CAST(l.l_discount AS {DEC}))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '{Q10_DATE_LO} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{Q10_DATE_HI} 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, custkey
LIMIT {Q10_TOPK}
"""


def q18_large_orders() -> str:
    from .constants import Q18_QTY

    return f"""
WITH big AS (
  SELECT l_orderkey, CAST(CAST(SUM(CAST(l_quantity AS {DEC})) AS VARCHAR) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING CAST(CAST(SUM(CAST(l_quantity AS {DEC})) AS VARCHAR) AS DOUBLE) > {Q18_QTY}
)
SELECT o.o_orderkey AS orderkey, c.c_name,
  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
  round(o.o_totalprice, 2) AS totalprice,
  b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


def events_daily_pivot() -> str:
    from .constants import EVENT_TYPES

    cells = ",\n  ".join(
        f"CAST(COUNT(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}"
        for t in EVENT_TYPES
    )
    return f"""
SELECT strftime(ts, '%Y-%m-%d') AS day,
  {cells}
FROM events
GROUP BY 1
"""


def bucketed_join_revenue() -> str:
    return f"""
SELECT o.o_orderpriority,
  CAST(CAST(SUM(CAST(l.l_extendedprice AS {DEC}) * (CAST(1 AS {DEC}) - CAST(l.l_discount AS {DEC}))) AS VARCHAR) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


def q12_priority_lateness() -> str:
    from .constants import Q12_LATE_DAYS

    return f"""
SELECT o.o_orderpriority,
  CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
  CAST(COUNT(*) AS BIGINT) AS n_total,
  round(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
                 THEN 1 ELSE 0 END) / COUNT(*), 6) AS late_ratio
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


def q21_waiting_supplier() -> str:
    from .constants import Q21_LATE_DAYS, Q21_TOPK

    return f"""
WITH j AS (
  SELECT l.l_orderkey, l.l_suppkey,
    CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
         THEN 1 ELSE 0 END AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
    COUNT(DISTINCT l_suppkey) AS n_supp,
    COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late,
    MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
  FROM j GROUP BY 1
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order p JOIN supplier s ON s.s_suppkey = p.late_supp
WHERE p.n_supp > 1 AND p.n_late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name ASC
LIMIT {Q21_TOPK}
"""


def q13_customer_distribution() -> str:
    return """
WITH ocnt AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY 1
), per_cust AS (
  SELECT COALESCE(ocnt.cnt, 0) AS c_count
  FROM customer LEFT JOIN ocnt ON customer.c_custkey = ocnt.o_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS n_custs
FROM per_cust GROUP BY c_count
"""


def q15_top_supplier() -> str:
    from .constants import Q15_DATE_HI, Q15_DATE_LO

    return f"""
WITH per_supp AS (
  SELECT l_suppkey,
    CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * (CAST(1 AS {DEC}) - CAST(l_discount AS {DEC}))) AS VARCHAR) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_DATE_LO} 00:00:00'
    AND l_shipdate < TIMESTAMP '{Q15_DATE_HI} 00:00:00'
  GROUP BY 1
)
SELECT p.l_suppkey AS suppkey, s.s_name, p.total_revenue
FROM per_supp p
JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE p.total_revenue = (SELECT MAX(total_revenue) FROM per_supp)
"""


def q19_disjunctive_revenue() -> str:
    from .constants import Q19_ALTS

    alts = " OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN 1 AND {sz} AND l.l_quantity BETWEEN {lo} AND {hi})"
        for b, sz, lo, hi in Q19_ALTS
    )
    return f"""
SELECT
  CAST(CAST(SUM(CAST(l.l_extendedprice AS {DEC}) * (CAST(1 AS {DEC}) - CAST(l.l_discount AS {DEC}))) AS VARCHAR) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE {alts}
"""


def sales_rollup() -> str:
    return f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS {DEC})) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * (CAST(1 AS {DEC}) - CAST(l_discount AS {DEC}))) AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def events_retention() -> str:
    return """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d FROM events
), cohort AS (
  SELECT user_id, MIN(d) AS cohort_d FROM ev GROUP BY 1
)
SELECT strftime(c.cohort_d, '%Y-%m-%d') AS cohort_date,
       CAST(e.d - c.cohort_d AS INT) AS day_offset,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
FROM ev e JOIN cohort c ON c.user_id = e.user_id
GROUP BY 1, 2
"""


def events_percentiles() -> str:
    return """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


def events_funnel() -> str:
    from .constants import FUNNEL_WINDOW_MS

    return f"""
WITH ev AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN event_type = 'click' THEN epoch_ms(ts) END AS c_ms
  FROM events WHERE event_type IN ('click', 'purchase')
), carried AS (
  SELECT user_id, event_id, ts, event_type,
         last_value(c_ms IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ms
  FROM ev
), purchases AS (
  SELECT user_id,
         CASE WHEN click_ms IS NOT NULL
               AND epoch_ms(ts) - click_ms <= {FUNNEL_WINDOW_MS}
              THEN 1 ELSE 0 END AS converted
  FROM carried WHERE event_type = 'purchase'
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       round(SUM(converted) / COUNT(*), 6) AS conv_rate
FROM purchases GROUP BY user_id
"""


def events_sliding_window() -> str:
    return f"""
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts) - (offs.j * INTERVAL '15 minutes'),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS {DEC})) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS offs(j)
GROUP BY 1
"""


def events_props_extract() -> str:
    return f"""
WITH ev AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events
)
SELECT event_type,
       CAST(COUNT(k) AS BIGINT) AS n_events,
       CAST(MIN(k) AS INT) AS min_k,
       CAST(MAX(k) AS INT) AS max_k,
       round(CAST(CAST(SUM(CAST(k AS {DEC})) AS VARCHAR) AS DOUBLE) / COUNT(k), 6) AS avg_k
FROM ev GROUP BY 1
"""


def events_anomaly() -> str:
    from .constants import ZSCORE_TAU

    return f"""
WITH mom AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(CAST(SUM(CAST(value AS {DEC})) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS s2
  FROM events GROUP BY 1
), stats AS (
  SELECT event_type, s1 / n AS mean, sqrt(s2 / n - (s1 / n) * (s1 / n)) AS std FROM mom
)
SELECT e.event_id, e.event_type, e.value,
       round((e.value - s.mean) / s.std, 6) AS z
FROM events e JOIN stats s USING (event_type)
WHERE ABS((e.value - s.mean) / s.std) > {ZSCORE_TAU}
"""


def events_user_ltv() -> str:
    return f"""
SELECT event_id, user_id,
       CAST(CAST(SUM(CAST(value AS {DEC})) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS cum_value
FROM events
"""


def q8_market_share() -> str:
    from .constants import Q8_NATION, Q8_REGION

    return f"""
WITH rcust AS (
  SELECT c_custkey FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = '{Q8_REGION}'
), supp AS (
  SELECT s_suppkey, (n.n_name = '{Q8_NATION}') AS is_target
  FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
), peryear AS (
  SELECT year(o.o_orderdate) AS order_year,
         SUM(CASE WHEN sp.is_target
             THEN CAST(l.l_extendedprice AS {DEC}) * (1 - CAST(l.l_discount AS {DEC}))
             ELSE CAST(0 AS {DEC}) END) AS tgt,
         SUM(CAST(l.l_extendedprice AS {DEC}) * (1 - CAST(l.l_discount AS {DEC}))) AS tot
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN rcust c ON c.c_custkey = o.o_custkey
  JOIN supp sp ON sp.s_suppkey = l.l_suppkey
  GROUP BY 1
)
SELECT CAST(order_year AS INT) AS order_year,
       round(CAST(CAST(tgt AS VARCHAR) AS DOUBLE) / CAST(CAST(tot AS VARCHAR) AS DOUBLE), 6) AS mkt_share,
       CAST(CAST(tot AS VARCHAR) AS DOUBLE) AS region_revenue
FROM peryear
"""


def q9_product_profit() -> str:
    from .constants import Q9_PART_WORD

    return f"""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS order_year,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS {DEC}) * (1 - CAST(l.l_discount AS {DEC}))) AS VARCHAR) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%{Q9_PART_WORD}%'
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY 1, 2
"""


def q16_supplier_count() -> str:
    from .constants import Q16_EXCL_BRAND, Q16_SIZES

    sizes = ", ".join(str(s) for s in Q16_SIZES)
    return f"""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS INT) AS p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> '{Q16_EXCL_BRAND}' AND p.p_size IN ({sizes})
GROUP BY 1, 2, 3
"""


def q17_small_quantity_revenue() -> str:
    from .constants import Q17_BRAND, Q17_QTY_FRAC

    return f"""
WITH li AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = '{Q17_BRAND}'
), avg_q AS (
  SELECT l_partkey,
         CAST(CAST(SUM(CAST(l_quantity AS {DEC})) AS VARCHAR) AS DOUBLE) / COUNT(*) AS aq
  FROM li GROUP BY 1
)
SELECT round(CAST(CAST(SUM(CAST(li.l_extendedprice AS {DEC})) AS VARCHAR) AS DOUBLE) / 7.0, 6) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM li JOIN avg_q ON avg_q.l_partkey = li.l_partkey
WHERE li.l_quantity < {Q17_QTY_FRAC} * avg_q.aq
"""


def q2_min_cost_supplier() -> str:
    from .constants import Q2_MAX_SIZE, Q2_REGION, Q2_TOPN, Q2_TYPE

    return f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
  FROM lineitem GROUP BY 1, 2
), rsupp AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name AS nation
  FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = '{Q2_REGION}'
), sc AS (
  SELECT p.p_partkey, p.p_name, rs.s_name, rs.s_acctbal, rs.nation, c.supply_cost
  FROM cost c
  JOIN part p ON p.p_partkey = c.l_partkey
   AND p.p_type = '{Q2_TYPE}' AND p.p_size <= {Q2_MAX_SIZE}
  JOIN rsupp rs ON rs.s_suppkey = c.l_suppkey
), mc AS (SELECT p_partkey, MIN(supply_cost) AS min_cost FROM sc GROUP BY 1)
SELECT sc.s_acctbal, sc.s_name, sc.nation,
       CAST(sc.p_partkey AS BIGINT) AS p_partkey, sc.p_name, sc.supply_cost
FROM sc JOIN mc ON mc.p_partkey = sc.p_partkey AND sc.supply_cost = mc.min_cost
ORDER BY sc.s_acctbal DESC, sc.nation, sc.s_name, sc.p_partkey
LIMIT {Q2_TOPN}
"""


def q11_important_stock() -> str:
    from .constants import Q11_FRACTION, Q11_NATION

    return f"""
WITH nsupp AS (
  SELECT s_suppkey FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = '{Q11_NATION}'
), val AS (
  SELECT l.l_partkey, SUM(CAST(l.l_extendedprice AS {DEC})) AS v
  FROM lineitem l JOIN nsupp ns ON ns.s_suppkey = l.l_suppkey
  GROUP BY 1
), tot AS (SELECT SUM(v) AS t FROM val)
SELECT CAST(l_partkey AS BIGINT) AS partkey,
       CAST(CAST(v AS VARCHAR) AS DOUBLE) AS value
FROM val, tot
WHERE CAST(CAST(v AS VARCHAR) AS DOUBLE) > {Q11_FRACTION} * CAST(CAST(t AS VARCHAR) AS DOUBLE)
"""


def q20_potential_promotion() -> str:
    from .constants import Q20_AVAIL_FRAC, Q20_NATION, Q20_PART_WORD, Q20_YEAR

    return f"""
WITH gparts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE '%{Q20_PART_WORD}%'
), shipped AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS {DEC})) AS qty_y
  FROM lineitem JOIN gparts ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR}-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '{Q20_YEAR + 1}-01-01 00:00:00'
  GROUP BY 1, 2
), avail AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS {DEC})) AS avail_qty
  FROM lineitem JOIN gparts ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR + 1}-01-01 00:00:00'
  GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT a.l_suppkey FROM avail a
  JOIN shipped sh ON sh.l_partkey = a.l_partkey AND sh.l_suppkey = a.l_suppkey
  WHERE CAST(CAST(a.avail_qty AS VARCHAR) AS DOUBLE)
        > {Q20_AVAIL_FRAC} * CAST(CAST(sh.qty_y AS VARCHAR) AS DOUBLE)
)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = '{Q20_NATION}'
WHERE s.s_suppkey IN (SELECT l_suppkey FROM cand)
"""


def q22_dormant_customers() -> str:
    from .constants import Q22_DATE_HI, Q22_DATE_LO

    return f"""
WITH avg_bal AS (
  SELECT CAST(CAST(SUM(CAST(c_acctbal AS {DEC})) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(CAST(SUM(CAST(c.c_acctbal AS {DEC})) AS VARCHAR) AS DOUBLE) AS total_acctbal
FROM customer c, avg_bal
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE c.c_acctbal > avg_bal.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{Q22_DATE_LO} 00:00:00'
      AND o.o_orderdate < TIMESTAMP '{Q22_DATE_HI} 00:00:00'
  )
GROUP BY 1
"""
