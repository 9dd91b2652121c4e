package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Planted-fixture semantics tests for the round-4 pipeline additions:
  * repetition profiling (t11), chunk-level corpus dedup (t12), semantic
  * dedup (d8), funnel staging (w11), and the cube/pivot/percentile-audit
  * aggregates (a14/a15/a16). The DuckDB oracle gate checks these against
  * SQL on the real testdata; these specs pin the *intended* semantics on
  * hand-built inputs where the right answer is obvious.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft_pipeline_fixture").toString

    val varied = (1 to 20).map(i => s"tok$i").mkString(" ")
    Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam", "en", "web", 49L),
      (2L, varied, "en", "web", varied.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    // Chunk fixture lives in the same documents table via doc ids 1/2 —
    // t12 instead gets its own planted pair through chunkDocs below.

    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0), // exact dup of vec 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1)) // orthogonal
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")

    def us(s: Long) = s * 1000000L * 1000L // seconds → nanos
    Seq(
      // user 10: full funnel in order
      (1L, us(100), 10L, "view", 1.0, "{}"),
      (2L, us(200), 10L, "click", 1.0, "{}"),
      (3L, us(300), 10L, "purchase", 1.0, "{}"),
      // user 20: purchase BEFORE any view — must not count as purchased
      (4L, us(50), 20L, "purchase", 1.0, "{}"),
      (5L, us(150), 20L, "view", 1.0, "{}"),
      (6L, us(250), 20L, "click", 1.0, "{}"),
      // user 30: view only
      (7L, us(400), 30L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")

    dir
  }

  private lazy val chunkDir: String = {
    val dir = Files.createTempDirectory("graft_chunk_fixture").toString
    val chunkA = (1 to 10).map(i => s"a$i").mkString(" ")
    val chunkB = (1 to 10).map(i => s"b$i").mkString(" ")
    val chunkC = (1 to 10).map(i => s"c$i").mkString(" ")
    Seq(
      (1L, s"$chunkA $chunkB", "en", "web", 0L),
      (2L, s"$chunkA $chunkC", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("t11: pure-repetition doc flagged, varied doc not") {
    val rows = SparkEntry.queries("t11_repetition_profile")(spark, fixtureDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Boolean]("is_repetitive"))
    assert(rows(1L).getAs[Long]("top_token_cnt") == 10L)
    assert(rows(1L).getAs[Double]("dup_bigram_frac") == 0.8888) // 8/9 floor-scaled
    assert(!rows(2L).getAs[Boolean]("is_repetitive"))
    assert(rows(2L).getAs[Long]("dup_bigram_cnt") == 0L)
  }

  test("t12: shared chunk deduped to the lowest (doc_id, chunk_idx)") {
    val rows = SparkEntry.queries("t12_chunk_dedup")(spark, chunkDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Long]("n_chunks") == 2L)
    assert(rows(1L).getAs[Long]("n_kept") == 2L)
    assert(rows(2L).getAs[Long]("n_chunks") == 2L)
    assert(rows(2L).getAs[Long]("n_kept") == 1L)
    assert(rows(2L).getAs[Long]("n_dup_chunks") == 1L)
  }

  test("d8: exact-duplicate embedding marked dup with first-wins representative") {
    val rows = SparkEntry.queries("d8_semdedup")(spark, fixtureDir)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(!rows(0L).getAs[Boolean]("is_dup"), "first occurrence is the keeper")
    assert(rows(1L).getAs[Boolean]("is_dup"))
    assert(rows(1L).getAs[Long]("rep_id") == 0L)
    assert(!rows(2L).getAs[Boolean]("is_dup"), "orthogonal vector is no dup")
  }

  test("w11: funnel stages are sequential, not independent counts") {
    val r = SparkEntry.queries("w11_funnel_stages")(spark, fixtureDir).collect()(0)
    assert(r.getAs[Long]("n_viewed") == 3L)
    // user 20 clicked after view → counted; user 30 never clicked
    assert(r.getAs[Long]("n_clicked") == 2L)
    // only user 10 purchased AFTER a qualifying click
    assert(r.getAs[Long]("n_purchased") == 1L)
  }

  private lazy val madDir: String = {
    val dir = Files.createTempDirectory("graft_mad_fixture").toString
    // 'view': 8 ordinary days (97..104 events, MAD 2) + one 1000-event
    // spike; 'click': constant 10/day → MAD 0 (the null-score path)
    val dayCounts = Seq(100, 101, 99, 102, 98, 103, 97, 104, 1000)
    def nanos(day: Int, k: Int) = (day.toLong * 86400L + k.toLong) * 1000000000L
    val rows =
      (for {
        (n, day) <- dayCounts.zipWithIndex
        k <- 0 until n
      } yield (day.toLong * 100000L + k, nanos(day, k), 1L, "view", 1.0, "{}")) ++
        (for (day <- 0 until 3; k <- 0 until 10)
          yield (900000L + day * 100L + k, nanos(day, k), 2L, "click", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("a19: MAD flags the spike day; ordinary days and MAD=0 types stay quiet") {
    val rows = SparkEntry.queries("a19_mad_anomaly")(spark, madDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val spike = rows(("view", "1970-01-09"))
    // median 101, MAD 2 → robust z = 0.6745 * 899 / 2 ≈ 303.2
    assert(spike.getAs[Long]("n_events") == 1000L)
    assert(spike.getAs[Boolean]("is_anomaly"), s"spike must flag: $spike")
    assert(spike.getAs[Double]("robust_z") > 300.0, s"spike z: $spike")
    val quiet = rows(("view", "1970-01-08")) // 104 events → z ≈ 1.01
    assert(!quiet.getAs[Boolean]("is_anomaly"), s"ordinary day flagged: $quiet")
    assert(math.abs(quiet.getAs[Double]("robust_z")) < 2.0)
    val const = rows(("click", "1970-01-02"))
    assert(const.isNullAt(const.fieldIndex("robust_z")),
      s"MAD=0 must null the score, not divide: $const")
    assert(!const.getAs[Boolean]("is_anomaly"))
  }

  test("w13: transition matrix counts and row-normalized ppm on the funnel fixture") {
    // user 10: _start→view→click→purchase; user 20 (ts order 50,150,250):
    // _start→purchase→view→click; user 30: _start→view
    val rows = SparkEntry.queries("w13_markov_transitions")(spark, fixtureDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows(("_start", "view")) == ((2L, 666666L)), s"$rows")
    assert(rows(("_start", "purchase")) == ((1L, 333333L)), s"$rows")
    assert(rows(("view", "click")) == ((2L, 1000000L)), s"$rows")
    assert(rows(("click", "purchase")) == ((1L, 1000000L)), s"$rows")
    assert(rows(("purchase", "view")) == ((1L, 1000000L)), s"$rows")
    assert(rows.size == 5, s"exactly the five observed transitions: $rows")
  }

  test("w13: NULL event_type raises the loud reserved-token guard") {
    val dir = Files.createTempDirectory("graft_w13_guard").toString
    Seq(
      (1L, 1000000000L, 1L, "view", 1.0, "{}"),
      (2L, 2000000000L, 1L, null.asInstanceOf[String], 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val e = intercept[Exception] {
      SparkEntry.queries("w13_markov_transitions")(spark, dir).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("reserved"), s"expected the w13 guard, got: $msgs")
  }

  test("a14 cube: grand-total row matches ungrouped revenue") {
    val sf = "/root/testdata/sf0.001"
    val cube = SparkEntry.queries("a14_cube_revenue")(spark, sf).collect()
    val grand = cube.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1, "exactly one grand-total row")
    val direct = graft.core.Tables.orders(spark, sf)
      .agg(round(graft.queries.Exact.moneySum("o_totalprice"), 4).as("r"), count(lit(1)).as("n"))
      .collect()(0)
    assert(grand(0).getAs[Double]("revenue") == direct.getAs[Double]("r"))
    assert(grand(0).getAs[Long]("order_cnt") == direct.getAs[Long]("n"))
    // cube = 2^2 grouping sets: every gid 0..3 present
    assert(cube.map(_.getAs[Long]("gid")).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("a15 pivot: wide columns reassemble the status distribution") {
    val sf = "/root/testdata/sf0.001"
    val piv = SparkEntry.queries("a15_status_pivot")(spark, sf).collect()
    val total = piv.flatMap(r => Seq("revenue_f", "revenue_o", "revenue_p").map { c =>
      if (r.isNullAt(r.fieldIndex(c))) BigDecimal(0) else BigDecimal(r.getAs[Double](c))
    }).sum
    val direct = graft.core.Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(round(graft.queries.Exact.moneySum("o_totalprice"), 4).as("r"))
      .collect().map(r => BigDecimal(r.getAs[Double]("r"))).sum
    assert((total - direct).abs < BigDecimal("0.01"))
  }

  test("a16: sketch percentiles certified within 5% of exact") {
    val res = SparkEntry.queries("a16_approx_percentile_audit")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getAs[Boolean]("p50_within_5pct"), s"p50 audit failed for $r")
      assert(r.getAs[Boolean]("p95_within_5pct"), s"p95 audit failed for $r")
    }
  }
}
