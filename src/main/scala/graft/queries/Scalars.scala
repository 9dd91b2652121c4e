package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Features

/** SURVEY.md §2.8 scalar functions + §2.10 feature/masking functions, each
  * exercised through a projection query. Reference shapes: string cleanup
  * (transform_customers.py:84-94), date derivations (transform_transactions
  * .py:85-91), conditional math (churn_features.py:45-65; customer_
  * segmentation.py:70-99), collect_list(struct) sequences (transform_
  * clickstream.py:107-109), SQL feature UDFs (feature_store.py:127-162).
  *
  * Scale notes: all row-local, codegen'd, zero shuffles (s4 excepted: one
  * group-by shuffle to assemble per-order arrays). No JVM UDFs anywhere —
  * every function is a Catalyst expression, so whole-stage codegen spans
  * the full projection.
  */
object Scalars extends QueryGroup {

  def defs: Map[String, QueryDef] = Map(
    // S1: string functions — lower/upper/emulated-initcap/concat_ws/
    // regexp_replace/substring/split/instr/length/reverse/lpad.
    "s1_string_funcs" -> QueryDef(
      build = (s, d) =>
        Tables.customer(s, d).select(
          col("c_custkey"),
          lower(col("c_name")).as("name_lower"),
          upper(col("c_mktsegment")).as("segment_upper"),
          initcap(lower(col("c_mktsegment"))).as("segment_title"),
          concat_ws("|", col("c_name"), col("c_mktsegment")).as("name_seg"),
          regexp_replace(col("c_name"), "[0-9]", "").as("name_nodigits"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          // split_part parity under Spark 4 ANSI: element_at throws on a
          // '#'-less value where DuckDB's split_part returns '' — one
          // malformed name in regenerated testdata would abort the query
          coalesce(try_element_at(split(col("c_name"), "#"), lit(2)), lit(""))
            .as("name_id_part"),
          length(col("c_name")).cast("long").as("name_len"),
          reverse(col("c_name")).as("name_rev"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
          instr(col("c_name"), "#").cast("long").as("hash_pos")),
      oracle = Some("""
        SELECT c_custkey,
               lower(c_name) AS name_lower,
               upper(c_mktsegment) AS segment_upper,
               upper(substring(lower(c_mktsegment), 1, 1)) || substring(lower(c_mktsegment), 2) AS segment_title,
               concat_ws('|', c_name, c_mktsegment) AS name_seg,
               regexp_replace(c_name, '[0-9]', '', 'g') AS name_nodigits,
               substring(c_name, 1, 8) AS name_prefix,
               split_part(c_name, '#', 2) AS name_id_part,
               length(c_name) AS name_len,
               reverse(c_name) AS name_rev,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
               instr(c_name, '#') AS hash_pos
        FROM customer""")),

    // S2: date/time functions — year/month/dayofweek/date_trunc/datediff/
    // date_add/epoch seconds, against the injected clock.
    "s2_date_funcs" -> QueryDef(
      build = (s, d) =>
        Tables.orders(s, d).select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("order_year"),
          month(col("o_orderdate")).cast("long").as("order_month_num"),
          dayofweek(col("o_orderdate")).cast("long").as("order_dow"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          datediff(
            to_date(to_timestamp(lit(Tables.OrdersAsOf))),
            to_date(col("o_orderdate"))).cast("long").as("days_since"),
          date_format(date_add(to_date(col("o_orderdate")), 30), "yyyy-MM-dd").as("due_day"),
          // floor, not cast: cast-to-long truncates toward zero while
          // the oracle's `//` floors — they diverge by 1 on any
          // pre-1970 timestamp (a latent trap under testdata drift)
          floor(unix_micros(col("o_orderdate").cast("timestamp")) / lit(1000000L))
            .cast("long").as("epoch_s")),
      oracle = Some(s"""
        SELECT o_orderkey,
               year(o_orderdate) AS order_year,
               month(o_orderdate) AS order_month_num,
               dayofweek(o_orderdate) + 1 AS order_dow,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               datediff('day', CAST(o_orderdate AS DATE), DATE '${Tables.OrdersAsOf.take(10)}') AS days_since,
               strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_day,
               epoch_us(o_orderdate) // 1000000 AS epoch_s
        FROM orders""")),

    // S3: math + conditional — coalesce/nullif/greatest/least/abs/sqrt/ln/
    // multi-branch CASE (the RFM segment-map shape).
    "s3_math_conditional" -> QueryDef(
      build = (s, d) =>
        Tables.customer(s, d).select(
          col("c_custkey"),
          round(abs(col("c_acctbal")), 4).as("abs_bal"),
          round(sqrt(abs(col("c_acctbal"))), 4).as("sqrt_bal"),
          round(log(abs(col("c_acctbal")) + 1.0), 4).as("ln_bal"),
          round(greatest(col("c_acctbal"), lit(0.0)), 4).as("bal_floor0"),
          round(least(col("c_acctbal"), lit(5000.0)), 4).as("bal_cap5k"),
          // floor(x*1e4)/1e4 instead of round(x,4): division results can
          // land exactly on .00005 where Spark and DuckDB round() disagree;
          // floor on identical IEEE doubles is engine-independent.
          coalesce(
            floor(col("c_acctbal") / nullif(col("c_nationkey").cast("double"), lit(0.0)) * 10000) / 10000.0,
            lit(-1.0)).as("bal_per_nation"),
          when(col("c_acctbal") < 0, "debtor")
            .when(col("c_acctbal") < 1000, "low")
            .when(col("c_acctbal") < 5000, "mid")
            .when(col("c_acctbal") < 8000, "high")
            .otherwise("top").as("balance_band")),
      oracle = Some("""
        SELECT c_custkey,
               round(abs(c_acctbal), 4) AS abs_bal,
               round(sqrt(abs(c_acctbal)), 4) AS sqrt_bal,
               round(ln(abs(c_acctbal) + 1.0), 4) AS ln_bal,
               round(greatest(c_acctbal, 0.0), 4) AS bal_floor0,
               round(least(c_acctbal, 5000.0), 4) AS bal_cap5k,
               coalesce(floor(c_acctbal / nullif(CAST(c_nationkey AS DOUBLE), 0.0) * 10000) / 10000.0, -1.0) AS bal_per_nation,
               CASE WHEN c_acctbal < 0 THEN 'debtor'
                    WHEN c_acctbal < 1000 THEN 'low'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    WHEN c_acctbal < 8000 THEN 'high'
                    ELSE 'top' END AS balance_band
        FROM customer""")),

    // S4: array/struct — ordered per-order line sequence via
    // sort_array(collect_list(struct(...))) (the event-sequence shape),
    // reduced back to scalars for comparison.
    "s4_array_sequence" -> QueryDef(
      build = (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sort_array(collect_list(struct(col("l_linenumber"), col("l_partkey"))))
            .as("lines"))
          .select(
            col("l_orderkey"),
            size(col("lines")).cast("long").as("n_lines"),
            element_at(col("lines"), 1).getField("l_partkey").as("first_part"),
            element_at(col("lines"), -1).getField("l_partkey").as("last_part")),
      // (l_orderkey, l_linenumber) is NOT unique in the testdata, so the
      // oracle must mirror sort_array's full (linenumber, partkey) order.
      oracle = Some("""
        WITH ranked AS (
          SELECT l_orderkey, l_partkey,
                 row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS rn_a,
                 row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber DESC, l_partkey DESC) AS rn_d,
                 count(*) OVER (PARTITION BY l_orderkey) AS n_lines
          FROM lineitem)
        SELECT l_orderkey, n_lines,
               max(CASE WHEN rn_a = 1 THEN l_partkey END) AS first_part,
               max(CASE WHEN rn_d = 1 THEN l_partkey END) AS last_part
        FROM ranked GROUP BY l_orderkey, n_lines""")),

    // S5/F1: feature functions (age_bucket, engagement_score) as pure
    // Column expressions over customer-360 metrics.
    "s5_feature_functions" -> QueryDef(
      build = (s, d) => {
        val asOf = to_timestamp(lit(Tables.OrdersAsOf))
        val metrics = Tables.orders(s, d).groupBy("o_custkey")
          .agg(
            count(lit(1)).as("order_cnt"),
            Exact.moneySumCents("o_totalprice").as("spend_cents"),
            datediff(to_date(asOf), to_date(max(col("o_orderdate"))))
              .cast("long").as("recency_days"),
            datediff(to_date(asOf), to_date(min(col("o_orderdate"))))
              .cast("long").as("tenure_days"))
        metrics.select(
          col("o_custkey"),
          Features.ageBucket(col("tenure_days")).as("age_bucket"),
          Features.engagementScore(
            col("order_cnt"), col("order_cnt"), col("recency_days"), col("spend_cents"))
            .as("engagement_score"))
      },
      oracle = Some(s"""
        WITH metrics AS (
          SELECT o_custkey, count(*) AS order_cnt,
                 ${Exact.sqlMoneySumCents("o_totalprice")} AS spend_cents,
                 datediff('day', CAST(max(o_orderdate) AS DATE), DATE '${Tables.OrdersAsOf.take(10)}') AS recency_days,
                 datediff('day', CAST(min(o_orderdate) AS DATE), DATE '${Tables.OrdersAsOf.take(10)}') AS tenure_days
          FROM orders GROUP BY o_custkey)
        SELECT o_custkey,
               CASE WHEN tenure_days < 180 THEN 'new'
                    WHEN tenure_days < 720 THEN 'active'
                    WHEN tenure_days < 1800 THEN 'established'
                    ELSE 'veteran' END AS age_bucket,
               CAST(least(order_cnt, 100) * 2000 + least(order_cnt * 10, 100) * 3000 +
                    greatest(300000 - recency_days * 1500, 0) +
                    least(spend_cents // 500, 200000) AS DOUBLE) / 10000.0 AS engagement_score
        FROM metrics""")),

    // S7: JSON functions — schema-full from_json and path-based
    // get_json_object over the events.props JSON payload column.
    "s7_json_funcs" -> QueryDef(
      build = (s, d) =>
        Tables.events(s, d).select(
          col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType))))
            .getField("k").as("k_parsed"),
          get_json_object(col("props"), "$.k").cast("long").as("k_path"))
          .withColumn("k_bucket", floor(col("k_parsed") / 10).cast("long")),
      oracle = Some("""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_parsed,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_path,
               CAST(floor(CAST(json_extract(props, '$.k') AS BIGINT) / 10) AS BIGINT) AS k_bucket
        FROM events""")),

    // §1.2 MapType — the last Spark complex type this engine left
    // unexercised: each user's per-event-type counts built as a real
    // in-plan MAP (map_from_entries over the sorted entry list — sorted
    // so the map's physical entry order is deterministic even though
    // lookups don't depend on it), then consumed with the map API
    // (element_at lookups with null-absent semantics, map_contains_key,
    // cardinality). The OUTPUT is plain columns: maps never cross the
    // oracle boundary (engines disagree on map serialization order), so
    // DuckDB mirrors the semantics with FILTER aggregates — the point
    // is the map operators run inside the Spark plan, oracle-checked
    // through their lookups.
    //
    // Scale: one keyed aggregation (user_id, event_type) with map-side
    // combine, then a per-user map of ≤ |event types| entries — bounded
    // fan-in, workload-sized maps, no shuffle beyond the two groupBys
    // that share the user_id partitioning.
    "s8_event_type_map" -> QueryDef(
      build = (s, d) =>
        Tables.events(s, d)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("user_id"))
          .agg(map_from_entries(
            sort_array(collect_list(struct(col("event_type"), col("n")))))
            .as("m"))
          .select(
            col("user_id"),
            coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
            coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"),
            col("m.error").isNotNull.as("had_error"),
            map_contains_key(col("m"), "signup").as("signed_up"),
            cardinality(col("m")).cast("long").as("n_types")),
      oracle = Some("""
        SELECT user_id,
               CAST(coalesce(count(*) FILTER (WHERE event_type = 'click'), 0) AS BIGINT) AS n_click,
               CAST(coalesce(count(*) FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT) AS n_purchase,
               count(*) FILTER (WHERE event_type = 'error') > 0 AS had_error,
               count(*) FILTER (WHERE event_type = 'signup') > 0 AS signed_up,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        FROM events GROUP BY user_id""")),

    // F2: masking functions applied as a governed view projection.
    "s6_masking_funcs" -> QueryDef(
      build = (s, d) =>
        Tables.customer(s, d).select(
          col("c_custkey"),
          Features.maskName(col("c_name")).as("masked_name"),
          Features.maskEmail(
            concat(lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", "")),
              lit("@example.com"))).as("masked_email")),
      oracle = Some("""
        SELECT c_custkey,
               substring(c_name, 1, 10) || '***' AS masked_name,
               substring(lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')), 1, 1)
                 || '***@' || 'example.com' AS masked_email
        FROM customer"""))
  )
}
