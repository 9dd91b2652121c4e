package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type 2 as reusable DataFrame operators (reference: the two-phase
  * close-and-insert in transform_customers.py:220-287 — whose phase-2
  * re-insert join re-reads the just-updated table and is subtly wrong;
  * SURVEY.md §2.11 M14. This implementation replaces it with (a) a
  * history rebuild via lead(), and (b) a union-staged single-pass merge.)
  *
  * Scale notes: fromHistory is one hash-partition shuffle on the business
  * key + a per-key sort. applyUpdates dedups the updates side in ONE
  * window pass (checkpointed — it feeds both the close join and the
  * insert join) and joins the current table by key; the current table is
  * scanned twice (close projection + current-values projection) but
  * never self-joined and never re-sorted. Invariants (exactly one
  * current row per key; interval endpoints chain) are property-tested in
  * Scd2Spec.
  */
object Scd2 {

  /** Rebuild the full SCD2 history from a change log: one row per
    * (key, version) with effective range and currency flag. Consecutive
    * duplicate values of `tracked` are collapsed (no-op changes ignored).
    */
  def fromHistory(
      changes: DataFrame, key: String, ts: String, tracked: String): DataFrame = {
    // tracked desc as the secondary order: equal-ts changes would
    // otherwise produce a DIFFERENT history per shuffle order (the same
    // tie applyUpdates already breaks this way); the earlier-ordered tied
    // value gets a zero-length period, deterministically
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tracked).desc)
    changes
      .withColumn("_prev", lag(col(tracked), 1).over(w))
      .withColumn("_first", row_number().over(w) === 1)
      // null-SAFE change test, with the first observation kept explicitly:
      // `_prev =!= tracked` is NULL (filtered) for a value→NULL
      // transition, silently erasing the NULL period — and `_prev.isNull`
      // cannot distinguish "first row" from "previous value was NULL", so
      // consecutive NULL observations would fail to collapse
      .filter(col("_first") || !(col("_prev") <=> col(tracked)))
      .withColumn("effective_start", col(ts))
      .withColumn("effective_end", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("effective_end").isNull)
      .drop("_prev", "_first", ts)
  }

  /** Union-staged single-pass SCD2 merge: apply a batch of updates to an
    * existing SCD2 table. Changed keys get their current row closed and a
    * new current row appended; unchanged keys pass through untouched.
    *
    * @param current  SCD2 table (key, tracked, effective_start,
    *                 effective_end, is_current)
    * @param updates  new observations (key, tracked, ts)
    */
  def applyUpdates(
      current: DataFrame, updates: DataFrame,
      key: String, ts: String, tracked: String): DataFrame = {
    // dedup to the latest update per key; the tracked value is the final
    // tiebreak so a ts tie resolves deterministically under any shuffle
    // order, not by whichever row arrives first
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col(tracked).desc)
    // a NULL-ts update must fail LOUDLY: inserted for a new key it would
    // freeze that key forever (every later `_new_ts > effective_start`
    // compare goes NULL, so no close and no insert ever fires again) —
    // and it would be silently dropped for an existing key, an
    // inconsistency worse than either behavior alone.
    // localCheckpoint: the deduped frame feeds BOTH the close join and
    // the insert join — uncached, the updates scan + window shuffle
    // would run twice.
    val latestUpdate = updates
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
      .select(col(key), col(tracked).as("_new_val"),
        when(col(ts).isNull, raise_error(lit(
          "Scd2.applyUpdates requires non-null ts on every update: a " +
            "NULL-ts row would freeze its key (interval compares go NULL)")))
          .otherwise(col(ts)).as("_new_ts"),
        lit(true).as("_has_upd"))
      .localCheckpoint(true)

    val joined = current.join(latestUpdate, Seq(key), "left")
    // null-SAFE change test, with an explicit has-an-update marker:
    // `_new_val.isNotNull` cannot distinguish "no update for this key"
    // from "update to NULL", and `=!=` goes NULL (no close) when either
    // side is NULL — a NULL-valued current row would keep TWO current
    // rows after a real update. A STALE update (ts not after the current
    // row's start) is ignored rather than writing an inverted interval.
    val changedCurrent = col("is_current") && col("_has_upd") &&
      !(col("_new_val") <=> col(tracked)) &&
      col("_new_ts") > col("effective_start")

    // Existing rows: close the current row of changed keys, keep the rest.
    val kept = joined.select(
      col(key), col(tracked),
      col("effective_start"),
      when(changedCurrent, col("_new_ts")).otherwise(col("effective_end"))
        .as("effective_end"),
      when(changedCurrent, lit(false)).otherwise(col("is_current")).as("is_current"))

    // New version rows for changed keys + first-ever rows for new keys —
    // the SAME null-safe gate as the close above, so the exactly-one-
    // current invariant holds for NULL values and stale updates alike.
    val currentVals = current.filter(col("is_current"))
      .select(col(key), col(tracked).as("_cur_val"),
        col("effective_start").as("_cur_start"), lit(true).as("_has_cur"))
    val inserts = latestUpdate.join(currentVals, Seq(key), "left")
      .filter(col("_has_cur").isNull ||
        (!(col("_cur_val") <=> col("_new_val")) && col("_new_ts") > col("_cur_start")))
      .select(
        col(key), col("_new_val").as(tracked),
        col("_new_ts").as("effective_start"),
        lit(null).cast(current.schema("effective_end").dataType).as("effective_end"),
        lit(true).as("is_current"))

    kept.unionByName(inserts)
  }
}
