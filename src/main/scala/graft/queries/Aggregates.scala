package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** SURVEY.md §2.4 aggregation operators (A1–A12), re-expressed over the
  * testdata star schema. Reference shapes: per-customer metric rollup
  * (customer_360_view.py:48-92), conditional 30/90-day sums (:77-90),
  * multi-dim revenue (revenue_analytics.py:40-57), KPI scalars (:269-277),
  * HAVING duplicate detection (sql_alerts_monitoring.py:93-99), z-score
  * anomaly (:147-171), freshness (quality_monitoring.py:59-84), quality
  * metrics (expectations.py:162-242).
  *
  * Scale notes: all are single-shuffle hash aggregates with map-side
  * partial aggregation; countDistinct rewrites to expand+two-phase agg
  * (fine at 100 TB when keyed by a high-cardinality group key). Global
  * (no-key) aggregates reduce to one row via partial aggs — no data
  * concentration. A12 uses approx_count_distinct, the 100 TB substitute
  * for exact distinct over heavy keys.
  */
object Aggregates extends QueryGroup {

  def defs: Map[String, QueryDef] = Map(
    // A1: hash group-by with many aggregates (count, countDistinct, sum,
    // avg, max, min, stddev) — the customer-360 per-customer rollup.
    "a1_customer_order_profile" -> QueryDef(
      build = (s, d) => {
        val o = Tables.orders(s, d)
        o.groupBy("o_custkey")
          .agg(
            count(lit(1)).as("order_cnt"),
            countDistinct(col("o_orderstatus")).as("status_cnt"),
            Exact.moneySum("o_totalprice").as("sum_d"),
            Exact.moneySumCents("o_totalprice").as("sum_cents"),
            Exact.moneySumSq("o_totalprice").as("sumsq_d"),
            round(max("o_totalprice"), 4).as("max_spend"),
            round(min("o_totalprice"), 4).as("min_spend"))
          .select(
            col("o_custkey"), col("order_cnt"), col("status_cnt"),
            round(col("sum_d"), 4).as("total_spend"),
            Exact.avg4FromCents(col("sum_cents"), col("order_cnt")).as("avg_spend"),
            col("max_spend"), col("min_spend"),
            round(Exact.stddevFrom(col("sum_d"), col("sumsq_d"), col("order_cnt")), 4)
              .as("spend_stddev"))
      },
      oracle = Some(s"""
        SELECT o_custkey, order_cnt, status_cnt,
               round(sum_d, 4) AS total_spend,
               ${Exact.sqlAvg4FromCents("sum_cents", "order_cnt")} AS avg_spend,
               max_spend, min_spend,
               round(${Exact.sqlStddevFrom("sum_d", "sumsq_d", "order_cnt")}, 4) AS spend_stddev
        FROM (
          SELECT o_custkey,
                 count(*) AS order_cnt,
                 count(DISTINCT o_orderstatus) AS status_cnt,
                 ${Exact.sqlMoneySum("o_totalprice")} AS sum_d,
                 ${Exact.sqlMoneySumCents("o_totalprice")} AS sum_cents,
                 ${Exact.sqlMoneySumSq("o_totalprice")} AS sumsq_d,
                 round(max(o_totalprice), 4) AS max_spend,
                 round(min(o_totalprice), 4) AS min_spend
          FROM orders GROUP BY o_custkey)"""),
      bench = true),

    // A2: conditional aggregation — recency-window sums in one pass
    // (sum(when(date >= asOf-N, x).otherwise(0))), injected clock.
    "a2_conditional_window_sums" -> QueryDef(
      build = (s, d) => {
        val o = Tables.orders(s, d)
        val asOf = to_timestamp(lit(Tables.OrdersAsOf))
        o.groupBy("o_custkey")
          .agg(
            round(sum(when(col("o_orderdate") >= asOf - expr("INTERVAL 90 DAYS"),
              expr("CAST(o_totalprice AS DECIMAL(18,2))"))
              .otherwise(expr("CAST(0 AS DECIMAL(18,2))"))).cast("double"), 4).as("spend_90d"),
            round(sum(when(col("o_orderdate") >= asOf - expr("INTERVAL 365 DAYS"),
              expr("CAST(o_totalprice AS DECIMAL(18,2))"))
              .otherwise(expr("CAST(0 AS DECIMAL(18,2))"))).cast("double"), 4).as("spend_365d"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("fulfilled_cnt"))
      },
      oracle = Some(s"""
        SELECT o_custkey,
               round(CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '${Tables.OrdersAsOf}' - INTERVAL 90 DAY
                              THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 4) AS spend_90d,
               round(CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '${Tables.OrdersAsOf}' - INTERVAL 365 DAY
                              THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 4) AS spend_365d,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled_cnt
        FROM orders GROUP BY o_custkey""")),

    // A3: countDistinct on a derived expression — active months per customer.
    "a3_active_months" -> QueryDef(
      build = (s, d) =>
        Tables.orders(s, d).groupBy("o_custkey")
          .agg(countDistinct(date_format(col("o_orderdate"), "yyyy-MM")).as("active_months")),
      oracle = Some("""
        SELECT o_custkey,
               count(DISTINCT strftime(o_orderdate, '%Y-%m')) AS active_months
        FROM orders GROUP BY o_custkey""")),

    // A4: multi-dimensional group-by (5 keys) — revenue rollup by
    // month × returnflag × segment × nation × priority.
    "a4_multidim_revenue" -> QueryDef(
      build = (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(
            date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
            col("l_returnflag"), col("c_mktsegment"), col("n_name"),
            col("o_orderpriority"))
          .agg(
            round(Exact.netRevenueSum("l_extendedprice", "l_discount"), 4).as("net_revenue"),
            count(lit(1)).as("line_cnt"),
            round(Exact.moneySum("l_quantity"), 4).as("total_qty"))
      },
      oracle = Some(s"""
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               l_returnflag, c_mktsegment, n_name, o_orderpriority,
               round(${Exact.sqlNetRevenueSum("l_extendedprice", "l_discount")}, 4) AS net_revenue,
               count(*) AS line_cnt,
               round(${Exact.sqlMoneySum("l_quantity")}, 4) AS total_qty
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY 1, 2, 3, 4, 5"""),
      bench = true),

    // A6: whole-table KPI scalars, incl. COUNT(DISTINCT CASE WHEN ...).
    "a6_global_kpis" -> QueryDef(
      build = (s, d) => {
        val o = Tables.orders(s, d)
        o.agg(
          count(lit(1)).as("total_orders"),
          countDistinct(col("o_custkey")).as("active_customers"),
          Exact.moneySum("o_totalprice").as("sum_d"),
          Exact.moneySumCents("o_totalprice").as("sum_cents"),
          countDistinct(when(col("o_orderstatus") === "F", col("o_custkey"))).as("customers_with_fulfilled"))
          .select(
            col("total_orders"), col("active_customers"),
            round(col("sum_d"), 4).as("gross_revenue"),
            Exact.avg4FromCents(col("sum_cents"), col("total_orders")).as("avg_order_value"),
            col("customers_with_fulfilled"))
      },
      oracle = Some(s"""
        SELECT total_orders, active_customers,
               round(sum_d, 4) AS gross_revenue,
               ${Exact.sqlAvg4FromCents("sum_cents", "total_orders")} AS avg_order_value,
               customers_with_fulfilled
        FROM (
          SELECT count(*) AS total_orders,
                 count(DISTINCT o_custkey) AS active_customers,
                 ${Exact.sqlMoneySum("o_totalprice")} AS sum_d,
                 ${Exact.sqlMoneySumCents("o_totalprice")} AS sum_cents,
                 count(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) AS customers_with_fulfilled
          FROM orders)""")),

    // A7: distribution (groupBy count) over a low-cardinality key.
    "a7_status_distribution" -> QueryDef(
      build = (s, d) =>
        Tables.orders(s, d).groupBy("o_orderstatus").agg(count(lit(1)).as("cnt")),
      oracle = Some(
        "SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY o_orderstatus")),

    // A8: HAVING-style post-aggregation filter (heavy-customer detection,
    // shape of the duplicate-detection alert).
    "a8_having_heavy_customers" -> QueryDef(
      build = (s, d) =>
        Tables.orders(s, d).groupBy("o_custkey")
          .agg(count(lit(1)).as("order_cnt"))
          .filter(col("order_cnt") > 12),
      oracle = Some("""
        SELECT o_custkey, count(*) AS order_cnt
        FROM orders GROUP BY o_custkey HAVING count(*) > 12""")),

    // A9: statistical aggregate + z-score anomaly over daily order counts.
    // The scalar (mu, sigma) side is a 1-row aggregate cross-joined back —
    // at scale this is a broadcast of one row, not a shuffle.
    "a9_daily_volume_zscore" -> QueryDef(
      build = (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"))
          .agg(count(lit(1)).as("n_orders"))
        // Exact integer sums → deterministic mu/sigma in double (see Exact).
        val stats = daily.agg(
          count(lit(1)).cast("double").as("n_days"),
          sum("n_orders").cast("double").as("s"),
          sum(col("n_orders") * col("n_orders")).cast("double").as("ss"))
        daily.crossJoin(broadcast(stats))
          .withColumn("mu", col("s") / col("n_days"))
          // try_divide on BOTH divisors: a single-day dataset ((n_days-1)=0)
          // or all-equal daily counts (sigma=0) throws DIVIDE_BY_ZERO under
          // Spark 4 ANSI where DuckDB's double division yields NULL — in
          // either engine such rows must simply not pass the z filter
          .withColumn("sigma",
            sqrt(greatest(try_divide(col("ss") - col("s") * col("s") / col("n_days"),
              col("n_days") - 1), lit(0.0))))
          .select(
            col("order_day"), col("n_orders"),
            round(try_divide(col("n_orders") - col("mu"),
              nullif(col("sigma"), lit(0.0))), 4).as("zscore"))
          .filter(abs(try_divide(col("n_orders") - col("mu"),
            nullif(col("sigma"), lit(0.0)))) > 2.0)
      },
      oracle = Some("""
        WITH daily AS (
          SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_day, count(*) AS n_orders
          FROM orders GROUP BY 1),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_days,
                         CAST(sum(n_orders) AS DOUBLE) AS s,
                         CAST(sum(n_orders * n_orders) AS DOUBLE) AS ss
                  FROM daily),
        scored AS (
          SELECT order_day, n_orders,
                 s / n_days AS mu,
                 sqrt(greatest((ss - s * s / n_days) / (n_days - 1), 0.0)) AS sigma
          FROM daily CROSS JOIN stats)
        SELECT order_day, n_orders,
               round((n_orders - mu) / sigma, 4) AS zscore
        FROM scored
        WHERE abs((n_orders - mu) / sigma) > 2.0""")),

    // A10: freshness aggregate — max timestamp per stream key vs the
    // injected clock.
    "a10_event_freshness" -> QueryDef(
      build = (s, d) =>
        Tables.events(s, d).groupBy("event_type")
          .agg(
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("latest_ts"),
            count(lit(1)).as("event_cnt"),
            // floor-scaled: the µs difference can land age_hours·1e4 exactly
            // half-integral, where Spark round (HALF_UP) and DuckDB round
            // (double-scaled) disagree
            (floor((unix_micros(to_timestamp(lit(Tables.EventsAsOf))).cast("double") -
              unix_micros(max(col("ts"))).cast("double")) / 360000.0) / 10000.0)
              .as("age_hours")),
      oracle = Some(s"""
        SELECT event_type,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS latest_ts,
               count(*) AS event_cnt,
               floor((epoch_us(TIMESTAMP '${Tables.EventsAsOf}') - epoch_us(max(ts))) / 360000.0) / 10000.0 AS age_hours
        FROM events GROUP BY event_type""")),

    // A11: quality-metrics collection — one-pass pass/fail counts per rule
    // (our fused version of the reference's per-rule filter().count()).
    "a11_quality_metrics" -> QueryDef(
      build = (s, d) => {
        val o = Tables.orders(s, d)
        o.agg(
          count(lit(1)).as("total_rows"),
          sum(when(col("o_custkey").isNotNull, 1L).otherwise(0L)).as("custkey_not_null"),
          sum(when(col("o_totalprice") > 0.0, 1L).otherwise(0L)).as("price_positive"),
          sum(when(col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L)).as("status_valid"),
          sum(when(col("o_orderdate") >= to_timestamp(lit("1995-01-01 00:00:00")), 1L)
            .otherwise(0L)).as("date_in_range"))
      },
      oracle = Some("""
        SELECT count(*) AS total_rows,
               CAST(sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS custkey_not_null,
               CAST(sum(CASE WHEN o_totalprice > 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS price_positive,
               CAST(sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS status_valid,
               CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS date_in_range
        FROM orders""")),

    // A12: approximate distinct (HLL). This declared query is the
    // ACCURACY-AUDIT variant: it runs approx_count_distinct AND the exact
    // countDistinct side by side, emitting exact counts plus in-plan
    // booleans asserting the estimate lands within 5% — the DuckDB oracle
    // produces exact + literal TRUE, so the accuracy claim itself is
    // hash-checked. The PRODUCTION shape at 100 TB is the approx-only
    // aggregation (drop the two countDistinct columns — that the estimate
    // tracks exact is what this audit certifies); running the audit is a
    // sampled/periodic job, not the per-query path.
    "a12_approx_distinct" -> QueryDef(
      build = (s, d) => {
        def within5pct(approx: org.apache.spark.sql.Column,
                       exact: org.apache.spark.sql.Column) =
          abs(approx.cast("double") - exact.cast("double")) <= exact.cast("double") * 0.05
        Tables.lineitem(s, d).groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("exact_parts"),
            countDistinct(col("l_suppkey")).as("exact_suppliers"),
            approx_count_distinct(col("l_partkey")).as("approx_parts"),
            approx_count_distinct(col("l_suppkey")).as("approx_suppliers"))
          .select(
            col("l_returnflag"), col("exact_parts"), col("exact_suppliers"),
            within5pct(col("approx_parts"), col("exact_parts")).as("parts_within_5pct"),
            within5pct(col("approx_suppliers"), col("exact_suppliers")).as("suppliers_within_5pct"))
      },
      oracle = Some("""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS exact_parts,
               count(DISTINCT l_suppkey) AS exact_suppliers,
               TRUE AS parts_within_5pct,
               TRUE AS suppliers_within_5pct
        FROM lineitem
        GROUP BY l_returnflag""")),

    // A13: exact interpolated percentiles of order value per status —
    // distribution profiling (the p50/p95 dashboards the reference's SQL
    // monitoring implies). Percentiles run on exact integer CENTS so the
    // linear interpolation (1−g)·low + g·high is bit-identical across
    // engines (DuckDB quantile_cont uses the same formula). Spark's
    // `percentile` is a single-pass typed aggregate — one keyed shuffle;
    // at 100 TB swap to approx_percentile with an a12-style in-plan
    // accuracy audit.
    "a13_price_percentiles" -> QueryDef(
      build = (s, d) => {
        val cents = "CAST(round(o_totalprice * 100) AS BIGINT)"
        Tables.orders(s, d).groupBy("o_orderstatus")
          .agg(expr(s"percentile($cents, array(0.25, 0.5, 0.75, 0.95))").as("p"))
          .select(col("o_orderstatus"),
            (floor(col("p")(0) * 100) / 1000000.0).as("p25"),
            (floor(col("p")(1) * 100) / 1000000.0).as("p50"),
            (floor(col("p")(2) * 100) / 1000000.0).as("p75"),
            (floor(col("p")(3) * 100) / 1000000.0).as("p95"))
      },
      oracle = Some("""
        SELECT o_orderstatus,
               floor(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.25) * 100) / 1000000.0 AS p25,
               floor(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.5) * 100) / 1000000.0 AS p50,
               floor(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.75) * 100) / 1000000.0 AS p75,
               floor(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.95) * 100) / 1000000.0 AS p95
        FROM orders
        GROUP BY o_orderstatus""")),

    // A14: CUBE — all 2^k grouping combinations in one pass, with
    // grouping_id() disambiguating real NULL keys from rolled-up ones
    // (rv1 covers ROLLUP). Spark expands the cube at the logical layer
    // into a single hash aggregate over the grouping-set-expanded input;
    // at 100 TB this is one shuffle whose width scales with 2^k — keep k
    // small (k=2 here), same rule as any cube engine.
    "a14_cube_revenue" -> QueryDef(
      build = (s, d) =>
        Tables.orders(s, d)
          .cube(year(col("o_orderdate")).cast("long").as("order_year"),
            col("o_orderstatus"))
          .agg(grouping_id().as("gid"),
            count(lit(1)).as("order_cnt"),
            round(Exact.moneySum("o_totalprice"), 4).as("revenue")),
      oracle = Some(s"""
        SELECT year(o_orderdate) AS order_year, o_orderstatus,
               CAST(GROUPING(order_year, o_orderstatus) AS BIGINT) AS gid,
               count(*) AS order_cnt,
               round(${Exact.sqlMoneySum("o_totalprice")}, 4) AS revenue
        FROM orders
        GROUP BY CUBE (order_year, o_orderstatus)""")),

    // A15: PIVOT — long-to-wide reshaping with an explicit pivot-value
    // list (the reference's dashboard "status columns per year" shape).
    // An explicit value list keeps the plan a single hash aggregate
    // (no extra distinct-values job) and makes the output schema static —
    // the only safe form at 100 TB.
    "a15_status_pivot" -> QueryDef(
      build = (s, d) =>
        Tables.orders(s, d)
          .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(round(Exact.moneySum("o_totalprice"), 4))
          .select(col("order_year"),
            col("F").as("revenue_f"),
            col("O").as("revenue_o"),
            col("P").as("revenue_p")),
      oracle = Some(s"""
        SELECT year(o_orderdate) AS order_year,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'F') AS DOUBLE), 4) AS revenue_f,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'O') AS DOUBLE), 4) AS revenue_o,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'P') AS DOUBLE), 4) AS revenue_p
        FROM orders
        GROUP BY year(o_orderdate)""")),

    // A16: approx_percentile accuracy audit — the production percentile
    // path a13's scaladoc promises for 100 TB (a single-pass mergeable
    // quantile sketch instead of exact percentile's per-group sort),
    // certified a12-style: exact percentiles plus in-plan booleans
    // asserting the sketch lands within 5%, so the DuckDB oracle
    // (exact + literal TRUE) hash-checks the accuracy claim itself.
    "a16_approx_percentile_audit" -> QueryDef(
      build = (s, d) => {
        val cents = "CAST(round(o_totalprice * 100) AS BIGINT)"
        def within5pct(approx: org.apache.spark.sql.Column,
                       exact: org.apache.spark.sql.Column) =
          abs(approx.cast("double") - exact) <= exact * 0.05
        Tables.orders(s, d).groupBy("o_orderstatus")
          .agg(
            expr(s"percentile($cents, array(0.5, 0.95))").as("ex"),
            expr(s"approx_percentile($cents, array(0.5, 0.95), 10000)").as("ap"))
          .select(col("o_orderstatus"),
            (floor(col("ex")(0) * 100) / 1000000.0).as("p50"),
            (floor(col("ex")(1) * 100) / 1000000.0).as("p95"),
            within5pct(col("ap")(0), col("ex")(0)).as("p50_within_5pct"),
            within5pct(col("ap")(1), col("ex")(1)).as("p95_within_5pct"))
      },
      oracle = Some("""
        SELECT o_orderstatus,
               floor(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.5) * 100) / 1000000.0 AS p50,
               floor(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.95) * 100) / 1000000.0 AS p95,
               TRUE AS p50_within_5pct,
               TRUE AS p95_within_5pct
        FROM orders
        GROUP BY o_orderstatus""")),

    // A17: one-pass column profiler (the ANALYZE/data-profiling shape —
    // per-column null count, distinct count, min/max — as a queryable
    // long-format table). All four columns profile in a SINGLE aggregation
    // over one scan; the distincts share one expand (4× row multiplier
    // map-side, still one shuffle). At 100 TB swap countDistinct for
    // approx_count_distinct per column — same plan shape, no expand.
    "a17_column_profile" -> QueryDef(
      build = (s, d) => {
        val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        val aggs = cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
            countDistinct(col(c)).as(s"${c}_distinct"),
            min(col(c)).cast("string").as(s"${c}_min"),
            max(col(c)).cast("string").as(s"${c}_max"))
        }
        val one = Tables.orders(s, d).agg(aggs.head, aggs.tail: _*)
        val stacked = cols.map { c =>
          struct(lit(c).as("column_name"), col(s"${c}_nulls").as("null_cnt"),
            col(s"${c}_distinct").as("distinct_cnt"),
            col(s"${c}_min").as("min_str"), col(s"${c}_max").as("max_str"))
        }
        one.select(explode(array(stacked: _*)).as("p")).select("p.*")
      },
      oracle = Some("""
        SELECT 'o_custkey' AS column_name,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt,
               count(DISTINCT o_custkey) AS distinct_cnt,
               CAST(min(o_custkey) AS VARCHAR) AS min_str,
               CAST(max(o_custkey) AS VARCHAR) AS max_str FROM orders
        UNION ALL
        SELECT 'o_orderstatus',
               CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus) FROM orders
        UNION ALL
        SELECT 'o_totalprice',
               CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_totalprice),
               CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_orderpriority',
               CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_orderpriority), min(o_orderpriority), max(o_orderpriority) FROM orders"""))
  ) ++ drift

  /** Epoch boundary for the a18 drift monitor — a pinned snapshot split,
    * not a data-derived median (a median would make the binning depend on
    * the engine's quantile algorithm). Events that all land on one side
    * degrade gracefully: the +1 smoothing keeps every ln() argument
    * positive, so the monitor reports the (large) drift instead of
    * dividing by zero. */
  private val DriftEpochSplit = "2024-01-16 00:00:00"

  private def drift: Map[String, QueryDef] = Map(
    // A18 (beyond reference): distribution-drift monitor — population
    // stability index of the event `value` distribution between the first
    // and second half of the snapshot window, per event_type. This is the
    // standard between-snapshots check a training-data pipeline runs
    // before admitting a new crawl epoch (PSI > 0.2 = investigate).
    //
    // Determinism contract (the t15 micro-nat pattern): bin boundaries are
    // FIXED literals (never data-derived quantiles — those differ by
    // engine); p and q are ratios of exact integers so both engines divide
    // identical doubles; each bin's (p-q)*ln(p/q) term — non-negative,
    // since both factors share a sign — is floor-scaled to integer
    // micro-nats BEFORE the sum, so libm ulps can't accumulate across
    // bins. Laplace +1 smoothing bounds ln() away from +-inf when a bin is
    // empty on one side.
    //
    // Scale: one scan; counts combine map-side into at most
    // |event_type| x 7 cells, and the window + PSI arithmetic run on that
    // tiny aggregated frame — at 100 TB the cost is the scan, full stop.
    "a18_psi_drift" -> QueryDef(
      build = (s, d) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
        val binned = Tables.events(s, d).select(
          col("event_type"),
          when(col("ts") < to_timestamp(lit(DriftEpochSplit)), 0).otherwise(1).as("epoch"),
          when(col("value") < 1.0, 0).when(col("value") < 5.0, 1)
            .when(col("value") < 20.0, 2).when(col("value") < 50.0, 3)
            .when(col("value") < 100.0, 4).when(col("value") < 200.0, 5)
            .otherwise(6).as("bin"))
        val cells = binned.groupBy("event_type", "bin").agg(
          sum(when(col("epoch") === 0, 1L).otherwise(0L)).as("c0"),
          sum(when(col("epoch") === 1, 1L).otherwise(0L)).as("c1"))
        val p = (col("c0") + 1L).cast("double") /
          sum(col("c0") + 1L).over(w).cast("double")
        val q = (col("c1") + 1L).cast("double") /
          sum(col("c1") + 1L).over(w).cast("double")
        cells
          .withColumn("contrib",
            floor((p - q) * log(p / q) * 1000000.0).cast("long"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_bins"),
            sum(col("c0")).as("epoch0_rows"),
            sum(col("c1")).as("epoch1_rows"),
            sum(col("contrib")).as("psi_micro"))
      },
      oracle = Some(s"""
        WITH binned AS (
          SELECT event_type,
                 CASE WHEN ts < TIMESTAMP '$DriftEpochSplit' THEN 0 ELSE 1 END AS epoch,
                 CASE WHEN value < 1.0 THEN 0 WHEN value < 5.0 THEN 1
                      WHEN value < 20.0 THEN 2 WHEN value < 50.0 THEN 3
                      WHEN value < 100.0 THEN 4 WHEN value < 200.0 THEN 5
                      ELSE 6 END AS bin
          FROM events),
        cells AS (
          SELECT event_type, bin,
                 CAST(sum(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
                 CAST(sum(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
          FROM binned GROUP BY 1, 2),
        ratios AS (
          SELECT event_type, c0, c1,
                 CAST(c0 + 1 AS DOUBLE) /
                   CAST(sum(c0 + 1) OVER (PARTITION BY event_type) AS DOUBLE) AS p,
                 CAST(c1 + 1 AS DOUBLE) /
                   CAST(sum(c1 + 1) OVER (PARTITION BY event_type) AS DOUBLE) AS q
          FROM cells)
        SELECT event_type, count(*) AS n_bins,
               CAST(sum(c0) AS BIGINT) AS epoch0_rows,
               CAST(sum(c1) AS BIGINT) AS epoch1_rows,
               CAST(sum(CAST(floor((p - q) * ln(p / q) * 1000000.0) AS BIGINT)) AS BIGINT) AS psi_micro
        FROM ratios GROUP BY event_type""")),

    // A19 (beyond reference): robust volume-anomaly monitor — modified
    // z-scores (Iglewicz–Hoaglin: 0.6745·(x−median)/MAD) over daily event
    // counts per type. The median/MAD pair is the monitor a9's mean/sigma
    // z-score CANNOT be: one crawler-gone-wild day inflates sigma enough
    // to hide itself (the spec plants exactly that). Emitted monitor-
    // style — every day with its score and an is_anomaly flag (|z|>3.5,
    // the I-H threshold) — not pre-filtered, so the oracle hashes the
    // whole surface and quiet corpora still verify.
    //
    // Exactness: daily counts are integers, so Spark's exact interpolating
    // `percentile` and DuckDB's `quantile_cont` both land on .0/.5 halves
    // (and .25 quarters for the MAD of half-deviations) — all exact
    // binary doubles; both engines then divide identical doubles. MAD=0
    // (a constant-volume type) nulls the score via nullif on both sides
    // and flags false.
    //
    // Scale: one corpus scan partial-aggregates to the |types|×|days|
    // daily frame (checkpointed once — three consumers with differing
    // projections would re-run the scan otherwise); both percentile aggs
    // and the joins run on that tiny frame. Exact percentile sorts
    // per-group ON the daily frame — never the events table.
    "a19_mad_anomaly" -> QueryDef(
      build = (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n_events"))
          .localCheckpoint(true)
        val med = daily.groupBy("event_type")
          .agg(expr("percentile(n_events, 0.5)").as("med"))
        val dev = daily.join(med, "event_type")
          .withColumn("adev", abs(col("n_events").cast("double") - col("med")))
        val mad = dev.groupBy("event_type")
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        // association mirrors the oracle's left-to-right (0.6745·diff)/mad
        // exactly — 0.6745·(diff/mad) can differ by an ulp and flip a
        // round()/threshold boundary between engines
        val rz = try_divide(
          lit(0.6745) * (col("n_events").cast("double") - col("med")),
          nullif(col("mad"), lit(0.0)))
        dev.join(mad, "event_type")
          .select(col("event_type"), col("day"), col("n_events"),
            round(rz, 4).as("robust_z"),
            coalesce(abs(rz) > 3.5, lit(false)).as("is_anomaly"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                 count(*) AS n_events
          FROM events GROUP BY 1, 2),
        med AS (SELECT event_type, quantile_cont(n_events, 0.5) AS med
                FROM daily GROUP BY 1),
        dev AS (SELECT d.*, med,
                       abs(CAST(n_events AS DOUBLE) - med) AS adev
                FROM daily d JOIN med USING (event_type)),
        mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
                FROM dev GROUP BY 1)
        SELECT event_type, day, n_events,
               round(0.6745 * (CAST(n_events AS DOUBLE) - med)
                 / nullif(mad, 0.0), 4) AS robust_z,
               coalesce(abs(0.6745 * (CAST(n_events AS DOUBLE) - med)
                 / nullif(mad, 0.0)) > 3.5, false) AS is_anomaly
        FROM dev JOIN mad USING (event_type)""")),

    // A20: least-squares revenue trend per market segment — the classic
    // "is this segment growing?" dashboard stat as closed-form OLS:
    // slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over the per-day revenue
    // series, x = day index since 1995-01-01, y = daily net revenue.
    //
    // Exactness (the whole design): y is an INTEGER in 1e-4-dollar units
    // (2-decimal price × 2-decimal (1−discount) is exactly 4 decimals),
    // x is an integer day index, and every moment (Σx, Σy, Σxy, Σx²)
    // accumulates in DECIMAL(38,0) — order-insensitive exact integer
    // sums on both engines, so the one closing double division is the
    // only floating step and is bit-identical cross-engine. Never
    // regr_slope(): its double Σxy is summation-order dependent and
    // flips round() boundaries run-to-run.
    //
    // Scale: two chained hash aggregates (fact→(segment,day), then
    // (segment,day)→segment), both map-side combinable; the join to
    // customer carries only (custkey, segment). No window, no sort —
    // at 100 TB this is scan + two shuffles of tiny aggregate frames.
    "a20_trend_slope" -> QueryDef(
      build = (s, d) => {
        val dec = (c: String) => expr(s"CAST($c AS DECIMAL(18,2))")
        val daily = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("segment"),
            datediff(to_date(col("o_orderdate")), lit("1995-01-01")).as("x"))
          .agg(sum((dec("l_extendedprice") * (lit(1).cast("decimal(3,2)") -
              dec("l_discount")) * 10000).cast("decimal(38,0)"))
            .cast("decimal(38,0)").as("y"))
        val m = daily.groupBy(col("segment"))
          .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
            sum(col("x").cast("decimal(38,0)")).cast("decimal(38,0)").as("sx"),
            sum(col("y")).cast("decimal(38,0)").as("sy"),
            sum(col("x").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)").as("sxy"),
            sum((col("x").cast("long") * col("x")).cast("decimal(38,0)"))
              .cast("decimal(38,0)").as("sxx"))
        // a single-day series has no defined slope (denominator = 0
        // exactly: Spark ANSI would abort, DuckDB would emit inf/NaN —
        // a crash AND a divergence); both engines drop it
        m.filter(col("n") >= 2)
          .select(col("segment"), col("n").cast("long").as("n_days"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") / 10000,
            4).as("slope_per_day"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT c_mktsegment AS segment,
                 datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS x,
                 CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
                   * 10000 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS y
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        m AS (
          SELECT segment, CAST(count(*) AS DECIMAL(38,0)) AS n,
                 CAST(sum(x) AS DECIMAL(38,0)) AS sx, sum(y) AS sy,
                 CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
                 CAST(sum(CAST(x AS BIGINT) * x) AS DECIMAL(38,0)) AS sxx
          FROM daily GROUP BY 1)
        SELECT segment, CAST(n AS BIGINT) AS n_days,
               round(CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE) / 10000, 4) AS slope_per_day
        FROM m WHERE n >= 2"""))
  )
}
