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

  /** Tie policy, stated explicitly: when a key's changes FULLY tie on
    * `versionCols` (a feed whose version column is coarser than the real
    * op order), the surviving op is chosen by this rank — update beats
    * insert beats delete. "Row-bearing op wins" is a deliberate choice:
    * a same-version delete+update pair reads as "the key was rewritten
    * within this version, its final state is the update's row" (the
    * Delta-CDF batch reading where postimages describe the version's end
    * state). Pipelines that want delete-wins-at-tie should emit a finer
    * version column instead — op order inside one version is not
    * recoverable from a tied feed. */
  private val OpRank = Map("update" -> 2, "insert" -> 1, "delete" -> 0)

  /** @param changes rows with `opCol` in (insert, update, delete) — any
    *                `preimage` ops must be filtered upstream (P10)
    * @param versionCols ordering columns, latest wins (ties broken by the
    *                later column list order; a FULL tie falls through to
    *                the explicit [[OpRank]] — update > insert > delete —
    *                making the pick a stated policy instead of
    *                shuffle-order roulette between runs)
    */
  def latestState(
      changes: DataFrame, key: String, opCol: String,
      versionCols: Seq[String]): DataFrame = {
    // a NULL op must fail LOUDLY: under three-valued logic it would slip
    // through `=!= "delete"` as NULL and silently vanish its key from
    // the output — indistinguishable from a delete, for a row that is
    // actually a malformed feed (e.g. a when() mapping with no
    // otherwise). An UNKNOWN non-null op ranks below delete (-1) and is
    // applied as an upsert if it wins — deliberately lenient, since a
    // row-bearing op of any spelling describes the key's final state.
    val opRank = OpRank.foldLeft(
      when(col(opCol).isNull, raise_error(lit(
        s"CdcApply.latestState: NULL $opCol — malformed change feed " +
          "(every change row needs an operation)"))).otherwise(lit(-1))) {
      case (acc, (op, r)) => when(col(opCol) === op, lit(r)).otherwise(acc)
    }
    val w = Window.partitionBy(col(key))
      .orderBy(versionCols.map(col(_).desc) :+ opRank.desc: _*)
    changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= "delete")
      .drop("_rn")
  }
}
