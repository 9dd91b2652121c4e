package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-feed row derivation — the engine's structural equivalent of
  * Delta CDF rows (`_change_type` in insert / delete / update_preimage /
  * update_postimage; reference: ingest_support_tickets.py:67-74,
  * delta_lake_features.py:350-368).
  *
  * `diff(old, new, keys)` computes the change rows between two snapshots:
  * one full-outer join on the key (a single key shuffle — the same cost as
  * any MERGE at scale) and a single projection pass. Updates are detected
  * by struct inequality over the non-key columns and emit BOTH preimage
  * and postimage rows via one `explode` — the join is never re-evaluated
  * per change type (no 4-way self-union of the same join subtree).
  */
object ChangeFeed {

  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
  val CommitTimestampCol = "_commit_timestamp"

  /** Change rows turning snapshot `old` into snapshot `next`.
    * Unchanged keys emit nothing. Output schema: key cols, then `next`'s
    * non-key cols (preimage rows carry the OLD values), then
    * `_change_type`.
    */
  def diff(old: DataFrame, next: DataFrame, keyCols: Seq[String]): DataFrame = {
    val dataCols = next.columns.filterNot(keyCols.contains).toSeq
    // schema evolution: a mergeSchema commit adds columns the old snapshot
    // lacks — pad them as typed NULLs so the diff composes with evolution
    // and preimages read like Delta's (old versions surface null for
    // later-added columns). A null→value transition is then an update.
    val nextTypes = next.schema.fields.map(f => f.name -> f.dataType).toMap
    val oldPadded = dataCols.filterNot(old.columns.contains)
      .foldLeft(old)((d, c) => d.withColumn(c, lit(null).cast(nextTypes(c))))
    val o = oldPadded.select(
      keyCols.map(col) :+ struct(dataCols.map(col): _*).as("_pre"): _*)
    val n = next.select(
      keyCols.map(col) :+ struct(dataCols.map(col): _*).as("_post"): _*)
    val joined = o.join(n, keyCols, "full_outer")
    // Unchanged keys need an empty array of the SAME struct type as the
    // populated branches — slice(arr, 1, 0) of a sample element gets the
    // type without a hand-written cast string.
    val empty = slice(array(struct(lit("insert").as("t"), col("_post").as("v"))), 1, 0)
    val chgTyped = when(col("_pre").isNull,
        array(struct(lit("insert").as("t"), col("_post").as("v"))))
      .when(col("_post").isNull,
        array(struct(lit("delete").as("t"), col("_pre").as("v"))))
      .when(col("_pre") =!= col("_post"),
        array(
          struct(lit("update_preimage").as("t"), col("_pre").as("v")),
          struct(lit("update_postimage").as("t"), col("_post").as("v"))))
      .otherwise(empty)
    joined
      .select(keyCols.map(col) :+ explode(chgTyped).as("_chg"): _*)
      .select(
        keyCols.map(col) ++
          dataCols.map(c => col(s"_chg.v.$c").as(c)) :+
          col("_chg.t").as(ChangeTypeCol): _*)
  }

  /** Initial-commit feed: every row is an insert. */
  def allInserts(df: DataFrame): DataFrame =
    df.withColumn(ChangeTypeCol, lit("insert"))
}
