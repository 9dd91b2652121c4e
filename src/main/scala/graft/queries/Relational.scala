package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** SURVEY.md §2.2 projections/filters (P1–P10), §2.6 sorts/limits (O1–O3),
  * §2.7 set ops (U1–U3). Reference shapes: schema-enforcing select
  * (transform_customers.py:117-123), null-key filter (transform_transactions
  * .py:54-57), SQL-string rules (quality/expectations.py:165-166), domain
  * normalization (transform_customers.py:97-101), range clamp
  * (transform_transactions.py:63-66), struct access (:104-106), LIKE rules
  * (expectations.py:69), quarantine split (expectations.py:202-207),
  * row-level security (governance/access_control.py:78-92), CDC-op filter
  * (transform_support_tickets.py:57-60), top-k (sql_queries_and_dashboards
  * .py:182-199), UNION ALL stacks (:208-253), subtract diff
  * (delta_lake_features.py:117-147).
  *
  * Scale notes: pure row-local operators — no shuffle at all except the
  * top-k (TakeOrderedAndProject: per-partition heap + driver merge of k
  * rows, never a global sort) and the set ops (hash shuffle on the full
  * row, same as a group-by). Filters/projections compile into the scan:
  * `PushedFilters`/`ReadSchema` in explain confirm the parquet reader
  * prunes both rows and columns.
  */
object Relational extends QueryGroup {

  def defs: Map[String, QueryDef] = Map(
    // P1: schema-enforcing projection with casts and renames.
    "p1_schema_projection" -> QueryDef(
      build = (s, d) =>
        Tables.customer(s, d).select(
          col("c_custkey").cast("long").as("customer_id"),
          col("c_name").as("customer_name"),
          col("c_nationkey").cast("long").as("nation_id"),
          col("c_acctbal").as("account_balance"),
          col("c_mktsegment").as("segment")),
      oracle = Some("""
        SELECT c_custkey AS customer_id, c_name AS customer_name,
               CAST(c_nationkey AS BIGINT) AS nation_id,
               c_acctbal AS account_balance,
               c_mktsegment AS segment
        FROM customer""")),

    // P2: null/invalid business-key filter.
    "p2_null_key_filter" -> QueryDef(
      build = (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull &&
            col("l_quantity") > 0)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_quantity")),
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL AND l_quantity > 0""")),

    // P3: data-driven SQL-string predicate (the quality-rule engine's
    // evaluation primitive — rules stay strings, engine applies expr()).
    "p3_rule_expr_filter" -> QueryDef(
      build = (s, d) => {
        val rule = "o_totalprice > 50000.0 AND o_orderstatus IN ('F','O') " +
          "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
        Tables.orders(s, d).filter(expr(rule))
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderstatus"))
      },
      oracle = Some("""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders
        WHERE o_totalprice > 50000.0 AND o_orderstatus IN ('F','O')
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'""")),

    // P4: domain-validation normalization — unknown values to a default.
    "p4_domain_normalize" -> QueryDef(
      build = (s, d) =>
        Tables.orders(s, d)
          .withColumn("priority_norm",
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM"),
              col("o_orderpriority")).otherwise("OTHER"))
          .groupBy("priority_norm").agg(count(lit(1)).as("cnt")),
      oracle = Some("""
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM')
                    THEN o_orderpriority ELSE 'OTHER' END AS priority_norm,
               count(*) AS cnt
        FROM orders GROUP BY 1""")),

    // P5: range predicate with clamp-to-default outside bounds.
    "p5_range_clamp" -> QueryDef(
      build = (s, d) =>
        Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_discount").between(0.0, 0.05), col("l_discount"))
            .otherwise(0.0).as("discount_capped")),
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_discount BETWEEN 0.0 AND 0.05
                    THEN l_discount ELSE 0.0 END AS discount_capped
        FROM lineitem""")),

    // P6: struct build + field extraction (nested address shape).
    "p6_struct_access" -> QueryDef(
      build = (s, d) =>
        Tables.customer(s, d)
          .withColumn("profile",
            struct(col("c_name").as("name"), col("c_mktsegment").as("segment"),
              col("c_nationkey").as("nation")))
          .select(
            col("c_custkey"),
            col("profile.name").as("profile_name"),
            col("profile").getField("segment").as("profile_segment"),
            coalesce(col("profile.nation"), lit(-1)).as("profile_nation")),
      oracle = Some("""
        SELECT c_custkey,
               struct_pack(name := c_name, segment := c_mktsegment, nation := c_nationkey).name AS profile_name,
               struct_pack(name := c_name, segment := c_mktsegment, nation := c_nationkey).segment AS profile_segment,
               coalesce(struct_pack(name := c_name, segment := c_mktsegment, nation := c_nationkey).nation, -1) AS profile_nation
        FROM customer""")),

    // P7: LIKE / NOT LIKE pattern predicates.
    "p7_like_patterns" -> QueryDef(
      build = (s, d) =>
        Tables.part(s, d)
          .filter(col("p_name").like("%bl%") && !col("p_type").like("%BRASS%"))
          .select("p_partkey", "p_name", "p_type"),
      oracle = Some("""
        SELECT p_partkey, p_name, p_type FROM part
        WHERE p_name LIKE '%bl%' AND p_type NOT LIKE '%BRASS%'""")),

    // P8: quarantine split — one pass, every row flagged with the first
    // failing rule (NULL = passed). The engine variant materializes the
    // two filtered streams from this same flag column.
    "p8_quarantine_flags" -> QueryDef(
      build = (s, d) =>
        Tables.orders(s, d).select(
          col("o_orderkey"),
          when(col("o_totalprice") <= 0, "nonpositive_price")
            .when(!col("o_orderstatus").isin("F", "O", "P"), "invalid_status")
            .when(col("o_orderdate") < lit("1995-01-01").cast("timestamp"), "date_too_old")
            .as("fail_reason"))
          .withColumn("passed", col("fail_reason").isNull),
      oracle = Some("""
        SELECT o_orderkey,
               CASE WHEN o_totalprice <= 0 THEN 'nonpositive_price'
                    WHEN o_orderstatus NOT IN ('F','O','P') THEN 'invalid_status'
                    WHEN o_orderdate < TIMESTAMP '1995-01-01 00:00:00' THEN 'date_too_old'
               END AS fail_reason,
               CASE WHEN o_totalprice <= 0 THEN 'nonpositive_price'
                    WHEN o_orderstatus NOT IN ('F','O','P') THEN 'invalid_status'
                    WHEN o_orderdate < TIMESTAMP '1995-01-01 00:00:00' THEN 'date_too_old'
               END IS NULL AS passed
        FROM orders""")),

    // P9: row-level security + masking view — session "group" is a
    // parameter; non-members see masked names and only their region's rows.
    "p9_rls_masked_view" -> QueryDef(
      build = (s, d) => {
        val allowedNations = Seq(1, 2, 3, 7, 11) // the session group's grant
        Tables.customer(s, d)
          .filter(col("c_nationkey").isin(allowedNations: _*))
          .select(
            col("c_custkey"),
            // the ONE masking rule (s6 shares it) — an inline copy here
            // would drift from the governed function silently
            graft.functions.Features.maskName(col("c_name")).as("masked_name"),
            col("c_nationkey"))
      },
      oracle = Some("""
        SELECT c_custkey,
               substring(c_name, 1, 10) || '***' AS masked_name,
               c_nationkey
        FROM customer WHERE c_nationkey IN (1, 2, 3, 7, 11)""")),

    // P10: CDC-operation filter — keep inserts/updates/deletes, drop the
    // update preimage (event_type stands in for _change_type).
    "p10_cdc_op_filter" -> QueryDef(
      build = (s, d) =>
        Tables.events(s, d)
          .filter(col("event_type").isin("signup", "click", "purchase"))
          .groupBy("event_type").agg(count(lit(1)).as("cnt")),
      oracle = Some("""
        SELECT event_type, count(*) AS cnt FROM events
        WHERE event_type IN ('signup','click','purchase')
        GROUP BY event_type""")),

    // O1: report sort (driver hash-compare is order-insensitive; the sort
    // exercise is in the plan: a global Sort node).
    "o1_sorted_report" -> QueryDef(
      build = (s, d) =>
        Tables.orders(s, d).groupBy("o_orderpriority")
          .agg(round(Exact.moneySum("o_totalprice"), 4).as("revenue"))
          .orderBy(desc("revenue"), asc("o_orderpriority")),
      oracle = Some(s"""
        SELECT o_orderpriority, round(${Exact.sqlMoneySum("o_totalprice")}, 4) AS revenue
        FROM orders GROUP BY o_orderpriority""")),

    // O2: top-k — orderBy+limit plans as TakeOrderedAndProject (per-
    // partition heap, no global sort). Deterministic via orderkey tiebreak.
    "o2_topk_orders" -> QueryDef(
      build = (s, d) =>
        Tables.orders(s, d)
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
          .limit(50)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice")),
      oracle = Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""")),

    // O3: limit sampling — deterministic (ordered) limit so the DuckDB
    // oracle can hash-check the exact row set (VERDICT r1 item 4).
    "o3_limit_sample" -> QueryDef(
      build = (s, d) =>
        Tables.orders(s, d)
          .orderBy(asc("o_orderkey"))
          .limit(100)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice")),
      oracle = Some("""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice
        FROM orders ORDER BY o_orderkey ASC LIMIT 100""")),

    // U1: UNION ALL metric stack (freshness/row-count dashboard shape).
    "u1_union_all_metrics" -> QueryDef(
      build = (s, d) => {
        def metric(name: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("row_cnt")).select(lit(name).as("table_name"), col("row_cnt"))
        metric("orders", Tables.orders(s, d))
          .unionByName(metric("lineitem", Tables.lineitem(s, d)))
          .unionByName(metric("customer", Tables.customer(s, d)))
          .unionByName(metric("events", Tables.events(s, d)))
      },
      oracle = Some("""
        SELECT 'orders' AS table_name, count(*) AS row_cnt FROM orders
        UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        UNION ALL SELECT 'customer', count(*) FROM customer
        UNION ALL SELECT 'events', count(*) FROM events""")),

    // U2: except/subtract — version-diff of distinct key sets.
    "u2_except_versions" -> QueryDef(
      build = (s, d) => {
        val o = Tables.orders(s, d)
        val before = o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select("o_custkey")
        val after = o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .select("o_custkey")
        before.except(after)
      },
      oracle = Some("""
        SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'""")),

    // U3: intersect — keys active in both periods.
    "u3_intersect_versions" -> QueryDef(
      build = (s, d) => {
        val o = Tables.orders(s, d)
        val before = o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select("o_custkey")
        val after = o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .select("o_custkey")
        before.intersect(after)
      },
      oracle = Some("""
        SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'"""))
  )
}
