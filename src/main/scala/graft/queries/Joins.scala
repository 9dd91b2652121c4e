package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** SURVEY.md §2.3 join operators (J1–J11), re-expressed over the testdata
  * star schema. Reference shapes: customer-360 multi-way left join
  * (customer_360_view.py:201-205), fact→dim enrich (revenue_analytics.py:
  * 32-37), broadcast hint (performance_optimization.py:379-391), SCD2
  * change-detect (transform_customers.py:246-262), MERGE upsert/delete
  * (transform_customers.py:171-202, transform_support_tickets.py:133-144),
  * cross-join scalar combine (sql_queries_and_dashboards.py:66-73), as-of /
  * point-in-time join (feature_store.py:187-201).
  *
  * Scale notes: dimension sides are broadcast (explicitly or via AQE);
  * the customer-360 join pre-aggregates each fact side to one row per key
  * BEFORE joining, so the join input is |customers|, not |facts|. The as-of
  * join avoids a range-join blowup by a single partitioned sort + running
  * `last(ignoreNulls)` — one shuffle on user_id, linear in events. MERGE
  * is latest-wins row_number over (key, version) — same single shuffle as
  * the dedup it generalizes.
  */
object Joins extends QueryGroup {

  private val Cutoff = "1998-01-01 00:00:00"

  def defs: Map[String, QueryDef] = Map(
    // J1: the customer-360 core — dim left-joined with pre-aggregated fact
    // sides (orders, events), nulls coalesced to zero.
    "j1_customer_360" -> QueryDef(
      build = (s, d) => {
        val c = Tables.customer(s, d)
        val orderAgg = Tables.orders(s, d).groupBy("o_custkey")
          .agg(
            count(lit(1)).as("order_cnt"),
            round(Exact.moneySum("o_totalprice"), 4).as("total_spend"),
            date_format(max("o_orderdate"), "yyyy-MM-dd").as("last_order_day"))
        val eventAgg = Tables.events(s, d).groupBy("user_id")
          .agg(
            count(lit(1)).as("event_cnt"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchase_events"),
            date_format(max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_event_ts"))
        c.join(orderAgg, c("c_custkey") === orderAgg("o_custkey"), "left")
          .join(eventAgg, c("c_custkey") === eventAgg("user_id"), "left")
          .select(
            col("c_custkey"), col("c_name"), col("c_mktsegment"),
            coalesce(col("order_cnt"), lit(0L)).as("order_cnt"),
            coalesce(col("total_spend"), lit(0.0)).as("total_spend"),
            col("last_order_day"),
            coalesce(col("event_cnt"), lit(0L)).as("event_cnt"),
            coalesce(col("purchase_events"), lit(0L)).as("purchase_events"),
            col("last_event_ts"))
      },
      oracle = Some(s"""
        WITH order_agg AS (
          SELECT o_custkey, count(*) AS order_cnt,
                 round(${Exact.sqlMoneySum("o_totalprice")}, 4) AS total_spend,
                 strftime(max(o_orderdate), '%Y-%m-%d') AS last_order_day
          FROM orders GROUP BY o_custkey),
        event_agg AS (
          SELECT user_id, count(*) AS event_cnt,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_events,
                 strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_event_ts
          FROM events GROUP BY user_id)
        SELECT c_custkey, c_name, c_mktsegment,
               coalesce(order_cnt, 0) AS order_cnt,
               coalesce(total_spend, 0.0) AS total_spend,
               last_order_day,
               coalesce(event_cnt, 0) AS event_cnt,
               coalesce(purchase_events, 0) AS purchase_events,
               last_event_ts
        FROM customer
        LEFT JOIN order_agg ON c_custkey = o_custkey
        LEFT JOIN event_agg ON c_custkey = user_id"""),
      bench = true),

    // J2: fact→dim enrichment (row-level left join, no aggregation) with
    // derived money columns — exact decimal products.
    "j2_fact_dim_enrich" -> QueryDef(
      build = (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        li.join(o, li("l_orderkey") === o("o_orderkey"), "left")
          .join(c, o("o_custkey") === c("c_custkey"), "left")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            col("o_orderpriority"), col("c_mktsegment"),
            round(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE)"), 4).as("discount_amount"),
            round(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)"), 4).as("net_amount"))
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, o_orderpriority, c_mktsegment,
               round(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE), 4) AS discount_amount,
               round(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS net_amount
        FROM lineitem
        LEFT JOIN orders ON l_orderkey = o_orderkey
        LEFT JOIN customer ON o_custkey = c_custkey""")),

    // J3: inner equi-join + aggregation (top-at-risk shape).
    "j3_inner_join_segments" -> QueryDef(
      build = (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d).filter(col("c_acctbal") > 0)
        o.join(c, o("o_custkey") === c("c_custkey"), "inner")
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("order_cnt"),
            round(Exact.moneySum("o_totalprice"), 4).as("segment_revenue"))
      },
      oracle = Some(s"""
        SELECT c_mktsegment, count(*) AS order_cnt,
               round(${Exact.sqlMoneySum("o_totalprice")}, 4) AS segment_revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_acctbal > 0
        GROUP BY c_mktsegment""")),

    // J4: explicit broadcast join of a small dimension.
    "j4_broadcast_brand_revenue" -> QueryDef(
      build = (s, d) => {
        val li = Tables.lineitem(s, d)
        val p = Tables.part(s, d)
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .groupBy("p_brand")
          .agg(
            count(lit(1)).as("line_cnt"),
            round(Exact.netRevenueSum("l_extendedprice", "l_discount"), 4).as("brand_revenue"))
      },
      oracle = Some(s"""
        SELECT p_brand, count(*) AS line_cnt,
               round(${Exact.sqlNetRevenueSum("l_extendedprice", "l_discount")}, 4) AS brand_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand""")),

    // J5: SCD2-style change detection — current snapshot vs new snapshot,
    // keep keys that are new or whose tracked value changed.
    "j5_change_detection" -> QueryDef(
      build = (s, d) => {
        val o = Tables.orders(s, d)
        val target = o.filter(col("o_orderdate") < lit(Cutoff).cast("timestamp"))
          .groupBy(col("o_custkey").as("t_custkey"))
          .agg(count(lit(1)).as("t_orders"))
        val source = o.groupBy(col("o_custkey").as("s_custkey"))
          .agg(count(lit(1)).as("s_orders"))
        source.join(target, col("s_custkey") === col("t_custkey"), "left")
          .filter(col("t_orders").isNull || col("s_orders") =!= col("t_orders"))
          .select(
            col("s_custkey").as("custkey"), col("s_orders"),
            col("t_orders"),
            when(col("t_orders").isNull, "new").otherwise("changed").as("change_type"))
      },
      oracle = Some(s"""
        WITH target AS (
          SELECT o_custkey AS t_custkey, count(*) AS t_orders
          FROM orders WHERE o_orderdate < TIMESTAMP '$Cutoff' GROUP BY 1),
        source AS (
          SELECT o_custkey AS s_custkey, count(*) AS s_orders
          FROM orders GROUP BY 1)
        SELECT s_custkey AS custkey, s_orders, t_orders,
               CASE WHEN t_orders IS NULL THEN 'new' ELSE 'changed' END AS change_type
        FROM source LEFT JOIN target ON s_custkey = t_custkey
        WHERE t_orders IS NULL OR s_orders <> t_orders""")),

    // J6: MERGE upsert semantics as a batch operator — updates override the
    // base snapshot, latest (orderdate, orderkey) wins per customer.
    "j6_merge_upsert" -> QueryDef(
      build = (s, d) => {
        val o = Tables.orders(s, d)
        val base = o.filter(col("o_orderdate") < lit(Cutoff).cast("timestamp"))
          .withColumn("src_rank", lit(0))
        val updates = o.filter(col("o_orderdate") >= lit(Cutoff).cast("timestamp"))
          .withColumn("src_rank", lit(1))
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("src_rank").desc, col("o_orderdate").desc, col("o_orderkey").desc)
        base.unionByName(updates)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice"), 4).as("o_totalprice"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"))
      },
      oracle = Some(s"""
        WITH staged AS (
          SELECT *, CASE WHEN o_orderdate >= TIMESTAMP '$Cutoff' THEN 1 ELSE 0 END AS src_rank
          FROM orders),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY o_custkey
                    ORDER BY src_rank DESC, o_orderdate DESC, o_orderkey DESC) AS rn
          FROM staged)
        SELECT o_custkey, o_orderkey, o_orderstatus,
               round(o_totalprice, 4) AS o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d') AS order_day
        FROM ranked WHERE rn = 1""")),

    // J7: MERGE soft-delete — keys present in the delete set get status
    // 'deleted' instead of being removed.
    "j7_merge_soft_delete" -> QueryDef(
      build = (s, d) => {
        val o = Tables.orders(s, d)
        val deletes = o.filter(
          col("o_orderstatus") === "F" && col("o_orderdate") >= lit(Cutoff).cast("timestamp"))
          .select(col("o_custkey").as("del_custkey")).distinct()
        val current = o.groupBy("o_custkey")
          .agg(count(lit(1)).as("order_cnt"))
        current.join(deletes, col("o_custkey") === col("del_custkey"), "left")
          .select(
            col("o_custkey"), col("order_cnt"),
            when(col("del_custkey").isNotNull, "deleted").otherwise("active").as("status"))
      },
      oracle = Some(s"""
        WITH deletes AS (
          SELECT DISTINCT o_custkey AS del_custkey FROM orders
          WHERE o_orderstatus = 'F' AND o_orderdate >= TIMESTAMP '$Cutoff'),
        current AS (
          SELECT o_custkey, count(*) AS order_cnt FROM orders GROUP BY 1)
        SELECT o_custkey, order_cnt,
               CASE WHEN del_custkey IS NOT NULL THEN 'deleted' ELSE 'active' END AS status
        FROM current LEFT JOIN deletes ON o_custkey = del_custkey""")),

    // J8: cross join of one-row aggregates — period-over-period revenue.
    "j8_period_over_period" -> QueryDef(
      build = (s, d) => {
        val o = Tables.orders(s, d)
        val asOf = to_timestamp(lit(Tables.OrdersAsOf))
        val cur = o.filter(col("o_orderdate") >= asOf - expr("INTERVAL 365 DAYS"))
          .agg(Exact.moneySum("o_totalprice").as("cur_rev"))
        val prev = o.filter(
          col("o_orderdate") >= asOf - expr("INTERVAL 730 DAYS") &&
            col("o_orderdate") < asOf - expr("INTERVAL 365 DAYS"))
          .agg(Exact.moneySum("o_totalprice").as("prev_rev"))
        cur.crossJoin(prev).select(
          round(col("cur_rev"), 4).as("cur_rev"),
          round(col("prev_rev"), 4).as("prev_rev"),
          (floor((col("cur_rev") - col("prev_rev")) * 100.0 / col("prev_rev") * 10000) / 10000.0)
            .as("pct_change"))
      },
      oracle = Some(s"""
        WITH cur AS (
          SELECT ${Exact.sqlMoneySum("o_totalprice")} AS cur_rev FROM orders
          WHERE o_orderdate >= TIMESTAMP '${Tables.OrdersAsOf}' - INTERVAL 365 DAY),
        prev AS (
          SELECT ${Exact.sqlMoneySum("o_totalprice")} AS prev_rev FROM orders
          WHERE o_orderdate >= TIMESTAMP '${Tables.OrdersAsOf}' - INTERVAL 730 DAY
            AND o_orderdate < TIMESTAMP '${Tables.OrdersAsOf}' - INTERVAL 365 DAY)
        SELECT round(cur_rev, 4) AS cur_rev, round(prev_rev, 4) AS prev_rev,
               floor((cur_rev - prev_rev) * 100.0 / prev_rev * 10000) / 10000.0 AS pct_change
        FROM cur CROSS JOIN prev""")),

    // J9: left-semi join — customers that have at least one purchase event.
    "j9_semi_join_purchasers" -> QueryDef(
      build = (s, d) => {
        val c = Tables.customer(s, d)
        val purchases = Tables.events(s, d).filter(col("event_type") === "purchase")
        c.join(purchases, c("c_custkey") === purchases("user_id"), "left_semi")
          .select("c_custkey", "c_name", "c_mktsegment")
      },
      oracle = Some("""
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM events
                      WHERE user_id = c_custkey AND event_type = 'purchase')""")),

    // J10: as-of (point-in-time) join — for every purchase event, the
    // latest 'view' event of the same user at or before it. Implemented
    // Spark-first as a single partitioned sort + running last(ignoreNulls)
    // — no range-join blowup, one shuffle, linear in events.
    "j10_asof_join" -> QueryDef(
      build = (s, d) => {
        val e = Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "view"))
        // Views sort before purchases at equal ts so ASOF `<=` semantics
        // (a same-instant view is visible to the purchase) hold exactly.
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"),
            when(col("event_type") === "view", 0).otherwise(1), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("view_us",
            when(col("event_type") === "view", unix_micros(col("ts"))))
          .withColumn("asof_view_us", last(col("view_us"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(
            col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
            date_format(timestamp_micros(col("asof_view_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("asof_view_ts"),
            (unix_micros(col("ts")) - col("asof_view_us")).as("staleness_us"))
      },
      oracle = Some("""
        SELECT p.event_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
               strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS asof_view_ts,
               epoch_us(p.ts) - epoch_us(v.ts) AS staleness_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts <= p.ts"""),
      bench = true),

    // J11: anti join — customers with no orders at all (GDPR orphan check).
    "j11_anti_join_orphans" -> QueryDef(
      build = (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
      oracle = Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    // J12: range (interval) join — orders attributed to every overlapping
    // campaign window (windows overlap, so this is a genuine interval
    // join, not a bucketing). Runs through ops/RangeJoin's bin-bucketed
    // equi-join instead of the BroadcastNestedLoopJoin Spark would plan
    // for a raw BETWEEN condition — the shape that survives when neither
    // side broadcasts. Campaign windows are generated in-plan (120
    // windows, 20-day stride, 45-day length) so both engines see
    // identical intervals.
    "j12_range_join_campaigns" -> QueryDef(
      build = (s, d) => {
        val campaigns = s.range(120).select(
          col("id").as("campaign_id"),
          date_add(to_date(lit("1995-01-01")), (col("id") * 20).cast("int")).as("start_d"),
          date_add(to_date(lit("1995-01-01")), (col("id") * 20 + 45).cast("int")).as("end_d"))
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"),
            to_date(col("o_orderdate")).as("od"))
        graft.ops.RangeJoin
          .pointInInterval(orders, "od", campaigns, "start_d", "end_d", binDays = 45)
          .groupBy("campaign_id")
          .agg(count(lit(1)).as("n_orders"),
            Exact.moneySum("o_totalprice").as("sum_d"))
          .select(col("campaign_id"), col("n_orders"),
            round(col("sum_d"), 4).as("campaign_revenue"))
      },
      oracle = Some(s"""
        WITH campaigns AS (
          SELECT i AS campaign_id,
                 DATE '1995-01-01' + CAST(i*20 AS INT) AS start_d,
                 DATE '1995-01-01' + CAST(i*20 + 45 AS INT) AS end_d
          FROM range(0, 120) t(i))
        SELECT campaign_id, count(*) AS n_orders,
               round(${Exact.sqlMoneySum("o_totalprice")}, 4) AS campaign_revenue
        FROM orders JOIN campaigns
          ON CAST(o_orderdate AS DATE) BETWEEN start_d AND end_d
        GROUP BY campaign_id""")),

    // J13: interval-×-interval OVERLAP join — campaign-exposure
    // analytics: which user SESSIONS (w3's gaps-and-islands spans, via
    // the shared ops/Sessionize) were live during each 3-day flash-sale
    // window. Neither side is a point, so j12's point-in-interval shape
    // can't express it; a raw inequality-only join would plan as a
    // nested-loop/cartesian. ops/RangeJoin.intervalOverlap turns it into
    // a bin equi-join with a canonical-bin rule (later start bin) that
    // makes pair output duplicate-free without a distinct — one bin-keyed
    // shuffle at any scale, date-grain bounds (binDays=3 ≈ the campaign
    // length).
    "j13_session_overlap_campaigns" -> QueryDef(
      build = (s, d) => {
        val spans = graft.ops.Sessionize
          .assign(Tables.events(s, d), "user_id", "ts", "event_id", gapMinutes = 30)
          .groupBy(col("user_id"), col("session_idx"))
          .agg(to_date(min(col("ts"))).as("s_start"),
            to_date(max(col("ts"))).as("s_end"))
        val campaigns = s.range(60).select(
          col("id").as("campaign_id"),
          date_add(to_date(lit("2024-01-01")), col("id").cast("int")).as("c_start"),
          date_add(to_date(lit("2024-01-01")), (col("id") + 2).cast("int")).as("c_end"))
        graft.ops.RangeJoin
          .intervalOverlap(spans, "s_start", "s_end",
            campaigns, "c_start", "c_end", binDays = 3)
          .groupBy("campaign_id")
          .agg(count(lit(1)).as("n_sessions"),
            countDistinct(col("user_id")).as("n_users"))
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
          FROM flagged),
        spans AS (
          SELECT user_id, session_idx,
                 CAST(min(ts) AS DATE) AS s_start, CAST(max(ts) AS DATE) AS s_end
          FROM sessions GROUP BY 1, 2),
        campaigns AS (
          SELECT i AS campaign_id,
                 DATE '2024-01-01' + CAST(i AS INT) AS c_start,
                 DATE '2024-01-01' + CAST(i + 2 AS INT) AS c_end
          FROM range(0, 60) t(i))
        SELECT campaign_id, count(*) AS n_sessions,
               count(DISTINCT user_id) AS n_users
        FROM spans s JOIN campaigns c
          ON s.s_start <= c.c_end AND c.c_start <= s.s_end
        GROUP BY campaign_id""")),

    // J14: NEAREST-event join — j10's as-of picks the latest view BEFORE
    // each purchase; attribution models often want the nearest view in
    // EITHER direction (|Δt| minimized, equidistant tie → the earlier
    // view). Same zero-join formulation: one user-keyed sort, TWO frames
    // over it (backward last + forward first, both ignoreNulls), then a
    // row-local arbitration — never a |purchases|×|views| pair blowup.
    //
    // Scale: both frames share one partitioning and one sort order, so
    // Spark plans a SINGLE window exchange+sort (PushdownSpec pins one
    // Exchange); the arbitration is codegen row-local. Ties: views sort
    // before purchases at equal ts (Δ=0 resolves backward), and
    // same-ts view groups agree on the output ts, so the result is
    // partition- and task-order independent.
    "j14_nearest_view_join" -> QueryDef(
      build = (s, d) => {
        val e = Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "view"))
          // materialize the tiebreak ONCE: both frames then share one
          // identical window spec, so Spark plans a single Sort under a
          // single Window node instead of re-sorting per frame
          .withColumn("tb", when(col("event_type") === "view", 0).otherwise(1))
        val ord = Seq(col("ts"), col("tb"), col("event_id"))
        val back = Window.partitionBy(col("user_id")).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val fwd = Window.partitionBy(col("user_id")).orderBy(ord: _*)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        e.withColumn("view_us",
            when(col("event_type") === "view", unix_micros(col("ts"))))
          .withColumn("back_us", last(col("view_us"), ignoreNulls = true).over(back))
          .withColumn("fwd_us", first(col("view_us"), ignoreNulls = true).over(fwd))
          .filter(col("event_type") === "purchase")
          .withColumn("p_us", unix_micros(col("ts")))
          .withColumn("near_us",
            when(col("back_us").isNull, col("fwd_us"))
              .when(col("fwd_us").isNull, col("back_us"))
              .when(col("p_us") - col("back_us") <= col("fwd_us") - col("p_us"),
                col("back_us"))
              .otherwise(col("fwd_us")))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
            date_format(timestamp_micros(col("near_us")),
              "yyyy-MM-dd HH:mm:ss.SSSSSS").as("nearest_view_ts"),
            (col("near_us") - col("p_us")).as("delta_us"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_id, user_id, ts, event_type,
                 CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS view_us
          FROM events WHERE event_type IN ('purchase', 'view')),
        f AS (
          SELECT *,
                 last_value(view_us IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts,
                      CASE WHEN event_type = 'view' THEN 0 ELSE 1 END, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_us,
                 first_value(view_us IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts,
                      CASE WHEN event_type = 'view' THEN 0 ELSE 1 END, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_us
          FROM e),
        p AS (
          SELECT event_id, user_id, ts, epoch_us(ts) AS p_us, back_us, fwd_us,
                 CASE WHEN back_us IS NULL THEN fwd_us
                      WHEN fwd_us IS NULL THEN back_us
                      WHEN p_us - back_us <= fwd_us - p_us THEN back_us
                      ELSE fwd_us END AS near_us
          FROM f WHERE event_type = 'purchase')
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
               strftime(make_timestamp(near_us), '%Y-%m-%d %H:%M:%S.%f') AS nearest_view_ts,
               near_us - p_us AS delta_us
        FROM p"""))
  )
}
