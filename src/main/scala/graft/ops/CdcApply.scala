package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply (reference: CDF-driven upsert/delete composition in
  * transform_support_tickets.py:42-147, SURVEY.md §2.9 ST11): from a
  * change stream with per-row operations, produce the current state —
  * latest op per key wins, deletes drop the key.
  *
  * One shuffle on the key; dedup + op dispatch fuse into a single
  * window pass (W1 + P10 + J6/J7 composed).
  */
object CdcApply {

  /** @param changes rows with `opCol` in (insert, update, delete) — any
    *                `preimage` ops must be filtered upstream (P10)
    * @param versionCols ordering columns, latest wins (ties broken by the
    *                later column list order; a FULL tie falls through to
    *                the op column — descending, so 'update' > 'insert' >
    *                'delete' lexically — making the pick deterministic
    *                for feeds whose version column is coarser than the
    *                real op order, instead of shuffle-order roulette
    *                between runs)
    */
  def latestState(
      changes: DataFrame, key: String, opCol: String,
      versionCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(versionCols.map(col(_).desc) :+ col(opCol).desc: _*)
    changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= "delete")
      .drop("_rn")
  }
}
