package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline
import graft.quality.Quality

/** Quality engine semantics: action routing (warn/drop/fail/quarantine),
  * one-pass metrics, and the pipeline runner's DAG execution + gates.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, 10.0, "F"), (2L, -5.0, "O"), (3L, 7.0, "X"), (4L, 0.0, "F"))
    .toDF("id", "price", "status")

  private val rules = Seq(
    Quality.Rule("price_positive", "price > 0", Quality.Quarantine),
    Quality.Rule("status_valid", "status IN ('F','O')", Quality.Drop),
    Quality.Rule("id_present", "id IS NOT NULL", Quality.Fail),
    Quality.Rule("price_under_100", "price < 100", Quality.Warn))

  test("action routing: quarantine rows carry reasons, drop rows vanish, clean is the rest") {
    val res = Quality.apply(df, rules)
    val quarantined = res.quarantined.collect()
      .map(r => r.getLong(0) -> r.getAs[String]("quarantine_reason")).toMap
    assert(quarantined == Map(2L -> "price_positive", 4L -> "price_positive"))
    val clean = res.clean.collect().map(_.getLong(0)).toSet
    assert(clean == Set(1L)) // 3 dropped (bad status), 2 & 4 quarantined
    assert(res.failures.isEmpty)
  }

  test("metrics count failures per rule in one pass") {
    val m = Quality.apply(df, rules).metrics.collect()
      .map(r => r.getAs[String]("rule_name") ->
        (r.getAs[Long]("failed_rows"), r.getAs[Long]("total_rows"))).toMap
    assert(m("price_positive") == (2L, 4L))
    assert(m("status_valid") == (1L, 4L))
    assert(m("id_present") == (0L, 4L))
    assert(m("price_under_100") == (0L, 4L))
  }

  test("fail rules report violations without throwing") {
    val res = Quality.apply(df, Seq(Quality.Rule("impossible", "price > 1000", Quality.Fail)))
    assert(res.failures == Seq("impossible"))
  }

  test("pipeline: DAG order, expectation gate aborts on fail rule") {
    val pipe = new Pipeline(spark)
    pipe.table("base") { _ => df }
    pipe.table("derived", deps = Seq("base"),
      rules = Seq(Quality.Rule("positive", "price > 0", Quality.Drop))) { in =>
      in("base").withColumn("double_price", col("price") * 2)
    }
    val out = pipe.run()
    assert(out("derived").count() == 2) // ids 1 and 3 have price > 0
    assert(pipe.metrics.get.collect().nonEmpty)

    val failing = new Pipeline(spark)
    failing.table("bad",
      rules = Seq(Quality.Rule("no_negatives", "price >= 0", Quality.Fail))) { _ => df }
    val err = intercept[IllegalArgumentException](failing.run())
    assert(err.getMessage.contains("no_negatives"))
  }

  test("pipeline retry: a flaky table succeeds on the second retry") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val pipe = new Pipeline(spark)
    pipe.table("flaky",
      policy = Pipeline.RetryPolicy(maxRetries = 2)) { _ =>
      if (attempts.incrementAndGet() < 3) sys.error("transient ingest failure")
      df
    }
    pipe.table("downstream", deps = Seq("flaky")) { in => in("flaky") }
    val out = pipe.run()
    assert(attempts.get() == 3, s"expected 3 attempts, saw ${attempts.get()}")
    assert(out("downstream").count() == df.count())
  }

  test("pipeline retry: a persistent failure exhausts retries and stops dependents") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val dependentRan = new java.util.concurrent.atomic.AtomicInteger(0)
    val pipe = new Pipeline(spark)
    pipe.table("broken",
      policy = Pipeline.RetryPolicy(maxRetries = 2, minRetryIntervalMillis = 10)) { _ =>
      attempts.incrementAndGet(); sys.error("permanent failure")
    }
    pipe.table("dependent", deps = Seq("broken")) { in =>
      dependentRan.incrementAndGet(); in("broken")
    }
    val err = intercept[RuntimeException](pipe.run())
    assert(err.getMessage.contains("permanent failure"))
    assert(attempts.get() == 3, "1 attempt + 2 retries")
    assert(dependentRan.get() == 0, "dependent must never build after upstream failure")
  }

  test("pipeline timeout: a hung table times out; retryOnTimeout=false fails fast") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val pipe = new Pipeline(spark)
    pipe.table("hung",
      policy = Pipeline.RetryPolicy(maxRetries = 2, timeoutMillis = 200,
        retryOnTimeout = false)) { _ =>
      attempts.incrementAndGet(); Thread.sleep(10000); df
    }
    val err = intercept[Pipeline.TaskTimeoutException](pipe.run())
    assert(err.getMessage.contains("timed out after 200ms"))
    assert(attempts.get() == 1, "retryOnTimeout=false must not re-attempt")

    // and with retryOnTimeout (the reference default), timeouts DO retry
    val retried = new java.util.concurrent.atomic.AtomicInteger(0)
    val pipe2 = new Pipeline(spark)
    pipe2.table("hung_then_ok",
      policy = Pipeline.RetryPolicy(maxRetries = 1, timeoutMillis = 500)) { _ =>
      if (retried.incrementAndGet() == 1) Thread.sleep(10000)
      df
    }
    assert(pipe2.run()("hung_then_ok").count() == df.count())
    assert(retried.get() == 2)
  }

  test("pipeline: cycle detection") {
    val pipe = new Pipeline(spark)
    pipe.table("a", deps = Seq("b")) { in => in("b") }
    pipe.table("b", deps = Seq("a")) { in => in("a") }
    val err = intercept[IllegalArgumentException](pipe.run())
    assert(err.getMessage.contains("cycle"))
  }
}
