package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Gold-layer business tables (reference: gold/churn_features.py:45-65 —
  * coalesce/greatest/least feature derivations — and the revenue rollup
  * extension flagged in SURVEY.md §2.4 A4).
  *
  * Scale notes: churn features reuse the single-shuffle per-customer
  * rollup then join the (small) per-customer aggregates — broadcast-able;
  * rollup() is one shuffle producing all grouping sets via expand.
  */
object Gold extends QueryGroup {

  def defs: Map[String, QueryDef] = Map(
    // Churn feature table: recency/frequency/monetary + engagement +
    // risk flags, the coalesce/greatest/least-heavy ML feature shape.
    "cf1_churn_features" -> QueryDef(
      build = (s, d) => {
        val asOf = to_timestamp(lit(Tables.OrdersAsOf))
        val orderFeats = Tables.orders(s, d).groupBy("o_custkey")
          .agg(
            count(lit(1)).as("frequency"),
            Exact.moneySumCents("o_totalprice").as("spend_cents"),
            datediff(to_date(asOf), to_date(max(col("o_orderdate"))))
              .cast("long").as("recency_days"))
        val eventFeats = Tables.events(s, d).groupBy(col("user_id"))
          .agg(count(lit(1)).as("event_cnt"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("error_cnt"))
        Tables.customer(s, d)
          .join(orderFeats, col("c_custkey") === col("o_custkey"), "left")
          .join(eventFeats, col("c_custkey") === col("user_id"), "left")
          .select(
            col("c_custkey"),
            coalesce(col("frequency"), lit(0L)).as("frequency"),
            (coalesce(col("spend_cents"), lit(0L)).cast("double") / 100.0).as("monetary"),
            coalesce(col("recency_days"), lit(9999L)).as("recency_days"),
            coalesce(col("event_cnt"), lit(0L)).as("event_cnt"),
            coalesce(col("error_cnt"), lit(0L)).as("error_cnt"),
            greatest(coalesce(col("recency_days"), lit(9999L)) - 365L, lit(0L))
              .as("days_dormant"),
            least(coalesce(col("frequency"), lit(0L)), lit(20L)).as("freq_capped"),
            (coalesce(col("recency_days"), lit(9999L)) > 730L &&
              coalesce(col("frequency"), lit(0L)) < 5L).as("churn_risk"))
      },
      oracle = Some("""
        WITH of AS (
          SELECT o_custkey, count(*) AS frequency,
                 sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS spend_cents,
                 datediff('day', CAST(max(o_orderdate) AS DATE), DATE '2001-09-01') AS recency_days
          FROM orders GROUP BY o_custkey),
        ef AS (
          SELECT user_id, count(*) AS event_cnt,
                 CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_cnt
          FROM events GROUP BY user_id)
        SELECT c_custkey,
               coalesce(frequency, 0) AS frequency,
               CAST(coalesce(spend_cents, 0) AS DOUBLE) / 100.0 AS monetary,
               coalesce(recency_days, 9999) AS recency_days,
               coalesce(event_cnt, 0) AS event_cnt,
               coalesce(error_cnt, 0) AS error_cnt,
               greatest(coalesce(recency_days, 9999) - 365, 0) AS days_dormant,
               least(coalesce(frequency, 0), 20) AS freq_capped,
               coalesce(recency_days, 9999) > 730 AND coalesce(frequency, 0) < 5 AS churn_risk
        FROM customer
        LEFT JOIN of ON c_custkey = o_custkey
        LEFT JOIN ef ON c_custkey = user_id""")),

    // Revenue rollup — all grouping sets (year×status, year, grand total)
    // in one pass.
    "rv1_revenue_rollup" -> QueryDef(
      build = (s, d) =>
        Tables.orders(s, d)
          .rollup(year(col("o_orderdate")).cast("long").as("order_year"),
            col("o_orderstatus"))
          .agg(count(lit(1)).as("order_cnt"),
            round(Exact.moneySum("o_totalprice"), 4).as("revenue")),
      oracle = Some(s"""
        SELECT year(o_orderdate) AS order_year, o_orderstatus,
               count(*) AS order_cnt,
               round(${Exact.sqlMoneySum("o_totalprice")}, 4) AS revenue
        FROM orders
        GROUP BY ROLLUP (order_year, o_orderstatus)"""))
  )
}
