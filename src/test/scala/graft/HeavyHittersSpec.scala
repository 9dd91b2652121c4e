package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters

/** The Misra–Gries guarantees (undercount, N/k error bound, heavy-token
  * capture) must hold under EVERY partitioning — they are what makes
  * t25's booleans deterministic despite the sketch content not being so.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def guarantees(tokens: Seq[String], k: Int, parts: Seq[Int]): Unit = {
    val n = tokens.size.toLong
    val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (p <- parts) {
      val df = tokens.toDF("token").repartition(p)
      val sk = df.agg(HeavyHitters.sketch(k)(col("token")).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.token"), col("e.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sk.size <= k, s"parts=$p: ${sk.size} counters exceed k=$k")
      sk.foreach { case (t, est) =>
        assert(est <= exact(t), s"parts=$p: $t overcounted ($est > ${exact(t)})")
        assert((exact(t) - est) * k <= n,
          s"parts=$p: $t error ${exact(t) - est} exceeds N/k = ${n / k}")
      }
      exact.foreach { case (t, c) =>
        if (c * k > n)
          assert(sk.contains(t), s"parts=$p: heavy token $t (freq $c, N=$n) lost")
      }
    }
  }

  test("guarantees hold on a Zipf-ish stream under 1/3/7/32 partitions") {
    val rnd = new scala.util.Random(11)
    // Zipf-ish: token i drawn with weight ~ 1/(i+1)
    val tokens = Seq.fill(20000) {
      val r = rnd.nextDouble()
      val i = math.min((1.0 / (r + 0.01) - 1.0).toInt, 400)
      s"tok$i"
    }
    guarantees(tokens, k = 16, parts = Seq(1, 3, 7, 32))
  }

  test("guarantees hold on the adversarial uniform stream (k+1 equal tokens)") {
    // k+1 tokens of equal frequency force maximal decrement churn — no
    // token is heavy (freq·k ≤ N), so capture is vacuous, but the error
    // bound must still hold for every surviving counter
    val tokens = (0 until 17).flatMap(i => Seq.fill(100)(s"u$i"))
    guarantees(tokens, k = 16, parts = Seq(1, 4, 32))
  }

  test("streaming sketch state merges across micro-batches (st16's claim)") {
    // 4 files, 1 per trigger: the complete-mode aggregation folds each
    // batch into the state-store buffer; the drained sketch must cover
    // ALL rows (n_total) and capture a heavy token whose occurrences are
    // SPREAD across batches — only cross-batch merge can see its mass
    val dir = java.nio.file.Files.createTempDirectory("graft_hh_stream_").toString
    val tokens = (0 until 4).flatMap(f =>
      Seq.fill(50)("hot") ++ (0 until 200).map(i => s"cold_${f}_$i"))
    tokens.toDF("token").repartition(4)
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .agg(HeavyHitters.sketch(16)(col("token")).as("sk"),
        count(lit(1)).as("n_total"))
    val row = graft.streaming.Streams.runToMemory(stream, "complete").collect()(0)
    assert(row.getAs[Long]("n_total") == tokens.size.toLong,
      s"sketch state lost rows across batches: $row")
    val sk = row.getSeq[org.apache.spark.sql.Row](0)
      .map(e => e.getString(0) -> e.getLong(1)).toMap
    // 'hot' has freq 200 over N=1000 → 200·16 > 1000: must be captured,
    // and within the N/k undercount bound
    assert(sk.contains("hot"), s"cross-batch heavy token lost: $sk")
    assert(sk("hot") <= 200L && (200L - sk("hot")) * 16 <= tokens.size,
      s"error bound violated for the cross-batch token: ${sk.get("hot")}")
  }

  test("t25 booleans are all true and exact top-10 is deterministic") {
    val rows = SparkEntry.queries("t25_heavy_hitters")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 10, s"expected exact top-10, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("captured_ok"), s"capture violated: $r")
      assert(r.getAs[Boolean]("est_ok"), s"error bound violated: $r")
    }
  }
}
