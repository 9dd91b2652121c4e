package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of a named query and time
  * two consecutive runs (first run pays JIT/codegen warmup).
  *
  * Usage: runMain graft.Explain <queryName> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    // GraftSession, not a bare builder: queries resolve the extension-
    // registered functions (vec_dot) and run under the engine's standard
    // AQE/shuffle settings — the plan printed is the plan that ships
    val spark = graft.core.GraftSession.local(cpus)
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[explain] run$i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
