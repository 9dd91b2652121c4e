package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = core.GraftSession.local(8)
    for (n <- args) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString.take(9000))
    }
    spark.stop()
  }
}
