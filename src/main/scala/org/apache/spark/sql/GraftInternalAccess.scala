package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] access shim (the standard Spark-connector
  * pattern): `graft.sources.SharingCdcSource.getBatch` must hand the
  * streaming engine a DataFrame over a streaming-flagged LogicalRelation
  * — exactly what Spark's own FileStreamSource does via
  * `Dataset.ofRows`, which is `private[sql]`. Nothing else from the
  * internal surface is exposed. */
object GraftInternalAccess {
  def ofRows(session: classic.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session, plan)
}
