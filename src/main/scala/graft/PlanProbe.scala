package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan inspector (not part of the driver contract). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val p = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(s"=== PLAN $name\n$p")
    }
  }
}
