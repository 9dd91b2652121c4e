package graft

/** Dev tool: write `.explain("formatted")` for named queries (default:
  * every benched query) to `<outDir>/<name>_<suffix>.txt` — the
  * before/after plan evidence the optimization rounds commit under
  * plans/rN/ (guide §1: capture the plan shape, not just the seconds).
  *
  * Usage: runMain graft.PlanSnap <outDir> <suffix> [name1,name2,...]
  * Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *        SPARK_GRAFT_CPUS (default 32).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names: Seq[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.benchQueries.keySet.toSeq.sorted
    val spark = core.GraftSession.local(cpus)
    for (n <- names) {
      val out = new java.io.File(outDir, s"${n}_$suffix.txt")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val w = new java.io.PrintWriter(out, "UTF-8")
        try w.println(plan) finally w.close()
        println(s"[plansnap] wrote ${out.getPath}")
      } catch {
        case e: Throwable =>
          println(s"[plansnap] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
