package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** The native vec_dot expression must be BIT-identical to the
  * higher-order-function fold it replaces (both sequential left-to-right),
  * resolve through the session extension, and run inside whole-stage
  * codegen.
  */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot is bit-identical to aggregate(zip_with) on random vectors") {
    val rnd = new Random(5)
    val rows = (1 to 500).map { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextDouble() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      call_function("vec_dot", $"a", $"b").as("native"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof"))
    // exact bit equality, not tolerance — both folds are sequential
    assert(cmp.filter($"native" =!= $"hof").count() == 0)
  }

  test("vec_dot null/empty semantics") {
    val df = Seq(
      (1L, Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (2L, None, Some(Array(1.0))),
      (3L, Some(Array.empty[Double]), Some(Array.empty[Double])),
      (4L, Some(Array(1.0, 2.0, 3.0)), Some(Array(1.0, 2.0))))
      .toDF("id", "a", "b")
    val got = df.select($"id", call_function("vec_dot", $"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(11.0))
    assert(got(2L).isEmpty, "null input must produce null")
    assert(got(3L).contains(0.0))
    assert(got(4L).isEmpty,
      "length mismatch must produce null (aggregate(zip_with) parity), not a truncated dot")
  }

  test("vec_dot resolves from SQL text and stays inside whole-stage codegen") {
    // literal inputs constant-fold to a LocalTableScan (which exercises the
    // interpreted eval); a range-derived frame forces a real codegen stage
    spark.range(100)
      .select(array($"id".cast("double"), lit(1.0)).as("a"),
        array(lit(2.0), $"id".cast("double")).as("b"))
      .createOrReplaceTempView("vd")
    val res = spark.sql("SELECT sum(vec_dot(a, b)) AS s FROM vd")
    // Σ (2i + i) over 0..99 = 3·4950
    assert(res.collect()(0).getDouble(0) == 3.0 * 4950)
    // AQE renders whole-stage-codegen stages as "*(n)" operator prefixes
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined,
      s"vec_dot fell out of codegen:\n$plan")
    assert(plan.contains("vec_dot"))
  }
}
