package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** SURVEY.md §2.5 window operators (W1–W8). Reference shapes: latest-wins
  * dedup (transform_customers.py:49-59), sessionization lag+cumsum
  * (transform_clickstream.py:63-88), cumulative revenue
  * (revenue_analytics.py:59-66), RFM ntile (customer_segmentation.py:42-60),
  * moving averages (sql_queries_and_dashboards.py:117-136), percent-of-total
  * (:82-93).
  *
  * Scale notes: every window here is partitioned by a high-cardinality key
  * (user_id / custkey / returnflag+month) — one hash-partition shuffle, no
  * global sort — EXCEPT w5/w6/w7 which the reference defines over a global
  * ordering. Those are inherently single-partition in any engine; our RFM
  * scoring ships an additional percent_rank formulation
  * (`w9_percent_rank_scores` below) for the 100 TB path, and w6/w7
  * operate on already-aggregated inputs (days / segments — tiny by
  * construction).
  */
object Windows extends QueryGroup {

  def defs: Map[String, QueryDef] = Map(
    // W1: row_number latest-wins dedup with a total deterministic order
    // (ts DESC, event_id DESC tiebreak — the reference's bare ts ordering
    // is non-deterministic; SURVEY §7.4.3).
    "w1_dedup_latest_event" -> QueryDef(
      build = (s, d) => {
        graft.ops.Dedup.latestWins(
          Tables.events(s, d), Seq("user_id"), Seq(col("ts"), col("event_id")))
          .select(
            col("user_id"), col("event_id"), col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
            round(col("value"), 4).as("value"))
      },
      oracle = Some("""
        SELECT user_id, event_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
               round(value, 4) AS value
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn = 1""")),

    // W2: lag — previous event timestamp per user, gap in microseconds.
    "w2_lag_event_gap" -> QueryDef(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .select(
            col("event_id"), col("user_id"),
            (unix_micros(col("ts")) - col("prev_us")).as("gap_us"))
      },
      oracle = Some("""
        SELECT event_id, user_id,
               epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events""")),

    // W3: gaps-and-islands sessionization — running sum of new-session
    // flags (gap > 30 min) per user; the reference's clickstream algorithm.
    "w3_sessionize" -> QueryDef(
      build = (s, d) => {
        graft.ops.Sessionize
          .assign(Tables.events(s, d), "user_id", "ts", "event_id", gapMinutes = 30)
          .groupBy(col("user_id"), col("session_idx"))
          .agg(
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
            count(lit(1)).as("n_events"),
            countDistinct(col("event_type")).as("n_event_types"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"),
            (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("duration_us"))
      },
      oracle = Some("""
        WITH flagged AS (
          SELECT *,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 30*60*1000000
                        OR lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS is_new
          FROM events),
        sessions AS (
          SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
          FROM flagged)
        SELECT user_id, session_idx,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
               count(*) AS n_events,
               count(DISTINCT event_type) AS n_event_types,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
        FROM sessions GROUP BY user_id, session_idx"""),
      bench = true),

    // W4: cumulative (running) revenue per returnflag over ship months.
    "w4_running_revenue" -> QueryDef(
      build = (s, d) => {
        // Both the monthly sum and the running sum stay DECIMAL (exact) and
        // only convert to double at the end — window-sum order differs
        // between engines, so double accumulation would be unstable.
        val monthly = Tables.lineitem(s, d)
          .groupBy(
            col("l_returnflag"),
            date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
          .agg(sum(expr(
            "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))"))
            .as("rev"))
        val w = Window.partitionBy(col("l_returnflag")).orderBy(col("ship_month"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        monthly.select(
          col("l_returnflag"), col("ship_month"),
          round(col("rev").cast("double"), 4).as("month_revenue"),
          round(sum(col("rev")).over(w).cast("double"), 4).as("cumulative_revenue"))
      },
      oracle = Some("""
        WITH monthly AS (
          SELECT l_returnflag, strftime(l_shipdate, '%Y-%m') AS ship_month,
                 sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev
          FROM lineitem GROUP BY 1, 2)
        SELECT l_returnflag, ship_month,
               round(CAST(rev AS DOUBLE), 4) AS month_revenue,
               round(CAST(sum(rev) OVER (PARTITION BY l_returnflag ORDER BY ship_month
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS cumulative_revenue
        FROM monthly""")),

    // W5: ntile quintile scoring (RFM) — global window with deterministic
    // unique-key tiebreaks. (The partitioned percent_rank variant for
    // scale is w9_percent_rank_scores.)
    "w5_rfm_ntile" -> QueryDef(
      build = (s, d) => {
        val rfm = Tables.orders(s, d).groupBy("o_custkey")
          .agg(
            datediff(
              to_date(to_timestamp(lit(Tables.OrdersAsOf))),
              to_date(max(col("o_orderdate")))).cast("long").as("recency_days"),
            count(lit(1)).as("frequency"),
            round(Exact.moneySum("o_totalprice"), 4).as("monetary"))
        rfm.select(
          col("o_custkey"), col("recency_days"), col("frequency"), col("monetary"),
          (lit(6L) - ntile(5).over(Window.orderBy(col("recency_days"), col("o_custkey"))).cast("long")).as("r_score"),
          ntile(5).over(Window.orderBy(col("frequency"), col("o_custkey"))).cast("long").as("f_score"),
          ntile(5).over(Window.orderBy(col("monetary"), col("o_custkey"))).cast("long").as("m_score"))
      },
      oracle = Some(s"""
        WITH rfm AS (
          SELECT o_custkey,
                 datediff('day', CAST(max(o_orderdate) AS DATE), DATE '${Tables.OrdersAsOf.take(10)}') AS recency_days,
                 count(*) AS frequency,
                 round(${Exact.sqlMoneySum("o_totalprice")}, 4) AS monetary
          FROM orders GROUP BY o_custkey)
        SELECT o_custkey, recency_days, frequency, monetary,
               6 - ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
               ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
               ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
        FROM rfm""")),

    // W6: moving average over a row frame (7-day window over daily revenue).
    "w6_moving_avg_revenue" -> QueryDef(
      build = (s, d) => {
        // Moving average as exact-decimal frame sum / frame count — engines
        // disagree on double accumulation order inside window frames, and
        // DuckDB's avg(DECIMAL) returns double while Spark's stays decimal.
        val daily = Tables.orders(s, d)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"))
          .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).as("rev"))
        val w = Window.orderBy(col("order_day")).rowsBetween(-6, 0)
        daily.select(
          col("order_day"),
          round(col("rev").cast("double"), 4).as("day_revenue"),
          round(sum(col("rev")).over(w).cast("double") / count(lit(1)).over(w), 4)
            .as("revenue_7d_ma"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_day,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM orders GROUP BY 1)
        SELECT order_day, round(CAST(rev AS DOUBLE), 4) AS day_revenue,
               round(CAST(sum(rev) OVER w AS DOUBLE)
                     / count(*) OVER w, 4) AS revenue_7d_ma
        FROM daily
        WINDOW w AS (ORDER BY order_day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""")),

    // W7: percent-of-total via an empty-frame window.
    "w7_segment_pct_of_total" -> QueryDef(
      build = (s, d) => {
        val seg = Tables.customer(s, d).groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
        seg.select(
          col("c_mktsegment"), col("cnt"),
          // floor-scaled, not round(): pct·1e4 lands exactly half-integral
          // whenever the total's 2-adic valuation is high enough, and
          // Spark HALF_UP vs DuckDB double-rounding then disagree
          (floor(col("cnt") * 1000000.0 / sum(col("cnt")).over(Window.partitionBy()))
            / 10000.0).as("pct_of_total"))
      },
      oracle = Some("""
        WITH seg AS (SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY 1)
        SELECT c_mktsegment, cnt,
               floor(cnt * 1000000.0 / sum(cnt) OVER ()) / 10000.0 AS pct_of_total
        FROM seg""")),

    // W10/A5: session aggregates with the reference's bounce/conversion
    // flags (transform_clickstream.py:121-123) on top of the shared
    // sessionizer.
    "w10_session_flags" -> QueryDef(
      build = (s, d) => {
        graft.ops.Sessionize
          .assign(Tables.events(s, d), "user_id", "ts", "event_id", gapMinutes = 30)
          .groupBy(col("user_id"), col("session_idx"))
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct(col("event_type")).as("n_event_types"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"))
          .select(
            col("user_id"), col("session_idx"), col("n_events"),
            (col("n_events") === 1).as("is_bounce"),
            (col("purchases") > 0).as("has_conversion"))
      },
      oracle = Some("""
        WITH flagged AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
          SELECT user_id, event_type,
                 CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
          FROM flagged)
        SELECT user_id, session_idx, count(*) AS n_events,
               count(*) = 1 AS is_bounce,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0 AS has_conversion
        FROM sessions GROUP BY user_id, session_idx""")),

    // W9: the 100 TB replacement for w5's global ntile — percent_rank
    // buckets computed per nation partition (no single-partition global
    // sort; each partition sorts independently after one hash shuffle).
    "w9_percent_rank_scores" -> QueryDef(
      build = (s, d) => {
        val spend = Tables.orders(s, d).join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"), col("o_custkey"))
          .agg(round(Exact.moneySum("o_totalprice"), 4).as("monetary"))
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("monetary"), col("o_custkey"))
        spend.select(
          col("c_nationkey"), col("o_custkey"), col("monetary"),
          (floor(percent_rank().over(w) * 10000) / 10000.0).as("pct_rank"),
          least(floor(percent_rank().over(w) * 5).cast("long") + 1, lit(5L)).as("m_quintile"))
      },
      oracle = Some(s"""
        WITH spend AS (
          SELECT c_nationkey, o_custkey,
                 round(${Exact.sqlMoneySum("o_totalprice")}, 4) AS monetary
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_nationkey, o_custkey)
        SELECT c_nationkey, o_custkey, monetary,
               floor(percent_rank() OVER w * 10000) / 10000.0 AS pct_rank,
               least(CAST(floor(percent_rank() OVER w * 5) AS BIGINT) + 1, 5) AS m_quintile
        FROM spend
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY monetary, o_custkey)""")),

    // W8: rank / dense_rank top-N per group — top-3 parts per supplier by
    // shipped quantity (deterministic tiebreak on partkey).
    "w8_rank_top_parts" -> QueryDef(
      build = (s, d) => {
        val qty = Tables.lineitem(s, d).groupBy("l_suppkey", "l_partkey")
          .agg(round(Exact.moneySum("l_quantity"), 4).as("total_qty"))
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("total_qty").desc, col("l_partkey"))
        qty.withColumn("part_rank", rank().over(w).cast("long"))
          .withColumn("part_dense_rank", dense_rank().over(w).cast("long"))
          .filter(col("part_rank") <= 3)
      },
      oracle = Some(s"""
        WITH qty AS (
          SELECT l_suppkey, l_partkey, round(${Exact.sqlMoneySum("l_quantity")}, 4) AS total_qty
          FROM lineitem GROUP BY 1, 2)
        SELECT l_suppkey, l_partkey, total_qty,
               rank() OVER (PARTITION BY l_suppkey ORDER BY total_qty DESC, l_partkey) AS part_rank,
               dense_rank() OVER (PARTITION BY l_suppkey ORDER BY total_qty DESC, l_partkey) AS part_dense_rank
        FROM qty QUALIFY part_rank <= 3"""),
      bench = true),

    // W11: ordered funnel — view → click (after first view) → purchase
    // (after first qualifying click), per user, collapsed to stage counts
    // and floor-scaled conversion rates. Three per-user unbounded-frame
    // window aggregates share ONE hash partitioning on user_id (a single
    // shuffle — Catalyst reuses the exchange; no ORDER BY, so no sort),
    // then a global partial-aggregated rollup. The per-stage timestamps
    // must be sequential (each min() is conditioned on the previous
    // stage's timestamp), which is what distinguishes a funnel from three
    // independent counts.
    "w11_funnel_stages" -> QueryDef(
      build = (s, d) => {
        val w = Window.partitionBy("user_id")
        Tables.events(s, d)
          .withColumn("t_view",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("t_click",
            min(when(col("event_type") === "click" && col("ts") >= col("t_view"),
              col("ts"))).over(w))
          .withColumn("t_buy",
            min(when(col("event_type") === "purchase" && col("ts") >= col("t_click"),
              col("ts"))).over(w))
          .agg(
            countDistinct(when(col("t_view").isNotNull, col("user_id"))).as("n_viewed"),
            countDistinct(when(col("t_click").isNotNull, col("user_id"))).as("n_clicked"),
            countDistinct(when(col("t_buy").isNotNull, col("user_id"))).as("n_purchased"))
          .select(col("n_viewed"), col("n_clicked"), col("n_purchased"),
            // try_divide: a zero count throws DIVIDE_BY_ZERO under Spark 4
            // ANSI where DuckDB's double division yields NULL — the rates
            // must go NULL on both engines for an empty funnel stage
            (floor(try_divide(col("n_clicked") * 10000.0, col("n_viewed"))) / 10000.0).as("click_rate"),
            (floor(try_divide(col("n_purchased") * 10000.0, col("n_clicked"))) / 10000.0).as("purchase_rate"))
      },
      oracle = Some("""
        WITH v AS (
          SELECT user_id, min(ts) AS t_view
          FROM events WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.t_view
          GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, min(e.ts) AS t_buy
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
          GROUP BY e.user_id)
        SELECT n_viewed, n_clicked, n_purchased,
               floor(n_clicked * 10000.0 / n_viewed) / 10000.0 AS click_rate,
               floor(n_purchased * 10000.0 / n_clicked) / 10000.0 AS purchase_rate
        FROM (SELECT (SELECT count(*) FROM v) AS n_viewed,
                     (SELECT count(*) FROM c) AS n_clicked,
                     (SELECT count(*) FROM p) AS n_purchased)""")),

    // W12: cohort retention — users grouped by first-activity week, then
    // the classic retention matrix (cohort x weeks-since-first, distinct
    // active users). Two keyed shuffles (first-week per user, then the
    // cohort rollup), both on user_id-derived keys; the matrix is tiny
    // (weeks x weeks) no matter how large the events table grows.
    "w12_retention_cohorts" -> QueryDef(
      build = (s, d) => {
        val weekly = Tables.events(s, d)
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("week"))
          .distinct()
        val cohort = weekly.groupBy("user_id")
          .agg(min(col("week")).as("cohort_week"))
        weekly.join(cohort, "user_id")
          .groupBy(col("cohort_week"),
            (datediff(col("week"), col("cohort_week")) / 7).cast("long")
              .as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .select(
            date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
            col("week_offset"), col("n_active"))
      },
      oracle = Some("""
        WITH weekly AS (
          SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
          FROM events),
        cohort AS (
          SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY 1)
        SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
               CAST(date_diff('day', c.cohort_week, w.week) // 7 AS BIGINT) AS week_offset,
               count(DISTINCT w.user_id) AS n_active
        FROM weekly w JOIN cohort c ON w.user_id = c.user_id
        GROUP BY 1, 2""")),

    // W13: first-order Markov transition matrix over the clickstream —
    // the user-journey model behind next-action prediction and funnel
    // anomaly detection ("purchase→view jumped 3× this week"). prev state
    // is the per-user lag by (ts, event_id) — the w2 total order — with
    // a '_start' pseudo-state so entry probabilities are part of the one
    // chain. Row probabilities are ppm via integer div of exact counts.
    //
    // Scale: one user_id-keyed corpus shuffle (the lag window — same
    // exchange w1/w2 ride), then everything runs on the |types|²-row
    // count matrix: the normalizing window partitions THAT, never the
    // events table.
    "w13_markov_transitions" -> QueryDef(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          // loud reserved-value guard (the upsertLatestWins convention):
          // a NULL event_type would be indistinguishable from "no
          // previous row" after the coalesce, and a literal '_start'
          // type would silently merge with entry transitions
          .withColumn("event_type",
            when(col("event_type").isNull || col("event_type") === "_start",
              raise_error(lit(
                "w13: event_type is NULL or the reserved '_start' token")))
              .otherwise(col("event_type")))
          .withColumn("prev_type",
            coalesce(lag(col("event_type"), 1).over(w), lit("_start")))
          .groupBy(col("prev_type"), col("event_type"))
          .agg(count(lit(1)).as("n_transitions"))
          .withColumn("prev_total",
            sum(col("n_transitions")).over(Window.partitionBy(col("prev_type"))))
          .withColumn("p_ppm", expr("n_transitions * 1000000 div prev_total"))
          .drop("prev_total")
      },
      oracle = Some("""
        WITH tr AS (
          SELECT coalesce(lag(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id), '_start') AS prev_type,
                 event_type
          FROM events),
        cnt AS (SELECT prev_type, event_type, count(*) AS n_transitions
                FROM tr GROUP BY 1, 2)
        SELECT prev_type, event_type, n_transitions,
               CAST(n_transitions * 1000000
                 // sum(n_transitions) OVER (PARTITION BY prev_type)
                 AS BIGINT) AS p_ppm
        FROM cnt"""))
  )
}
