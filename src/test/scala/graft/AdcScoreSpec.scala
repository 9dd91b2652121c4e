package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** The native adc_score expression must be BIT-identical to the chained
  * element_at fold it replaces (both sequential left-to-right adds over
  * lut[s][codes[s]]), propagate nulls identically on the reachable cases,
  * resolve through the session extension, and run inside whole-stage
  * codegen.
  */
class AdcScoreSpec extends SparkSpec {
  import spark.implicits._

  private val NSub = 16
  private val K = 23 // centroids per subspace in the synthetic LUT

  /** The exact DataFrame-level fold adc_score replaced (pre-r16
    * IvfIndex.adcScore) — the bit-parity reference. */
  private def foldScore(lut: org.apache.spark.sql.Column,
      codes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (1 to NSub).map { s =>
      element_at(element_at(lut, s), element_at(codes, s))
    }.reduce(_ + _)

  test("adc_score is bit-identical to the element_at fold on random LUT/codes") {
    val rnd = new Random(7)
    val rows = (1 to 400).map { i =>
      (i.toLong,
        Array.fill(NSub)(Array.fill(K)(rnd.nextDouble() * 2 - 1)),
        Array.fill(NSub)(rnd.nextInt(K) + 1))
    }
    val df = rows.toDF("id", "lut", "codes")
    val cmp = df.select(
      call_function("adc_score", $"lut", $"codes").as("native"),
      foldScore($"lut", $"codes").as("fold"))
    assert(cmp.filter($"native" =!= $"fold").count() == 0)
  }

  test("adc_score null semantics") {
    val lutOk = Array.fill(NSub)(Array.fill(K)(1.0))
    val df = Seq(
      (1L, Some(lutOk), Some(Array.fill(NSub)(1))),
      (2L, None, Some(Array.fill(NSub)(1))),
      (3L, Some(lutOk), None),
      // outer length mismatch (codes shorter than the LUT) → null
      (4L, Some(lutOk), Some(Array.fill(NSub - 1)(1))))
      .toDF("id", "lut", "codes")
    val got = df.select($"id",
      call_function("adc_score", $"lut", $"codes").as("s"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(NSub.toDouble))
    assert(got(2L).isEmpty, "null lut must produce null")
    assert(got(3L).isEmpty, "null codes must produce null")
    assert(got(4L).isEmpty, "outer length mismatch must produce null")
  }

  test("adc_score stays inside whole-stage codegen") {
    // range-derived frame forces a real codegen stage (a literal frame
    // constant-folds to LocalTableScan, which only exercises eval)
    val df = spark.range(200)
      .select(
        transform(sequence(lit(1), lit(NSub)),
          s => transform(sequence(lit(1), lit(K)),
            r => (s * lit(100) + r + $"id").cast("double"))).as("lut"),
        transform(sequence(lit(1), lit(NSub)),
          s => (pmod($"id" + s, lit(K)) + 1).cast("int")).as("codes"))
    val res = df.select(
      call_function("adc_score", $"lut", $"codes").as("native"),
      foldScore($"lut", $"codes").as("fold"))
    assert(res.filter($"native" =!= $"fold").count() == 0)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined,
      s"adc_score fell out of codegen:\n$plan")
    assert(plan.contains("adc_score"))
  }
}
